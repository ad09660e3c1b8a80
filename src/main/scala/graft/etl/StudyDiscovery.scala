package graft.etl

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

/** Driver-side study file discovery (reference: src/etl_for_all_studies/
  * pipeline.py:52-98). File *selection* stays on the driver exactly as
  * in the reference; the resulting paths feed `spark.read`.
  *
  * Rules: the first (sorted) `metadata_*.tsv` names the study; the
  * accession is the stem minus the prefix. The expression file is the
  * first sorted match of `expression_<acc>.tsv`, else `expression_*.
  * tsv`, else any `*.tsv` whose stem contains the accession.
  */
case class StudyFiles(studyAccession: String, metadataFile: Path, expressionFile: Path)

class StudyProcessingError(msg: String) extends RuntimeException(msg)

object StudyDiscovery {

  private def glob(dir: Path, pattern: String): Seq[Path] = {
    val m = java.nio.file.FileSystems.getDefault.getPathMatcher(s"glob:$pattern")
    if (!Files.isDirectory(dir)) Seq.empty
    else {
      // Files.list holds an open DirectoryStream — close it, or a run
      // over thousands of studies leaks an fd per call
      val s = Files.list(dir)
      try s.iterator.asScala
        .filter(p => m.matches(p.getFileName))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
  }

  private def stem(p: Path): String = {
    val n = p.getFileName.toString
    val i = n.lastIndexOf('.')
    if (i >= 0) n.substring(0, i) else n
  }

  def discoverStudyFiles(studyDir: Path): StudyFiles = {
    val metadataCandidates = glob(studyDir, "metadata_*.tsv")
    if (metadataCandidates.isEmpty)
      throw new StudyProcessingError(
        s"Study directory $studyDir missing metadata or expression TSV files")
    val metadataFile = metadataCandidates.head
    val accession = stem(metadataFile).replace("metadata_", "")
    if (accession.isEmpty)
      throw new StudyProcessingError(
        s"Unable to derive study accession from metadata file $metadataFile")

    val preferred = Seq(s"expression_$accession.tsv", "expression_*.tsv")
      .iterator
      .map(p => glob(studyDir, p).filterNot(_ == metadataFile))
      .find(_.nonEmpty)
      .getOrElse(Seq.empty)
    val candidates =
      if (preferred.nonEmpty) preferred
      else glob(studyDir, "*.tsv")
        .filter(p => p != metadataFile && stem(p).contains(accession))

    if (candidates.isEmpty)
      throw new StudyProcessingError(
        s"Study directory $studyDir missing metadata or expression TSV files")
    StudyFiles(accession, metadataFile, candidates.head)
  }

  /** All study directories under the input dir, sorted (pipeline.py:319-323). */
  def discoverStudyDirs(inputDir: Path): Seq[Path] =
    if (!Files.isDirectory(inputDir)) Seq.empty
    else {
      val s = Files.list(inputDir)
      try s.iterator.asScala
        .filter(Files.isDirectory(_))
        .toSeq.sortBy(_.getFileName.toString)
      finally s.close()
    }
}
