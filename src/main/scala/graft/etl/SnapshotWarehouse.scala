package graft.etl

import java.util.UUID

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Snapshot-isolated parquet warehouse: cross-TABLE atomic publish.
  *
  * [[ParquetWarehouse]] makes each single-table write crash-recoverable,
  * but a load that touches several tables (the ETL writes 5 dims + the
  * fact append, `EtlJob.processUnioned`) has windows where a crash — or
  * a concurrent reader — observes a MIXED generation: new dims with old
  * facts, or `replaceStudyPartitions`' gap between the partition delete
  * and the re-append. The reference gives readers all-or-nothing per
  * study through its per-study transaction (reference
  * src/pipeline.py:271-301: rollback on error, commit at end); this
  * backend extends that contract to multi-table reader isolation, the
  * way a lakehouse table format does:
  *
  *  - data lives in IMMUTABLE segment directories
  *    (`<table>/seg-<uuid>`); nothing is ever deleted or renamed in
  *    place by a write;
  *  - a tiny versioned manifest (`_manifests/v%08d.json`) names, per
  *    table, the segment list that IS that table, plus per-segment
  *    `study_key` exclusion lists (how partition replace expresses
  *    deletion without deleting);
  *  - a load stages any number of segments, then publishes them ALL
  *    with one atomic manifest rename. A crash before the rename leaves
  *    only orphan directories no manifest references — readers never
  *    see any of the load. There is no observable intermediate state.
  *
  * Reader guarantees:
  *  - `read` resolves the manifest once at plan time; because segments
  *    are immutable, the resolved plan stays valid — and keeps
  *    returning its own consistent snapshot — even if a replace commits
  *    (or ten commits land) while the query runs. This closes
  *    [[ParquetWarehouse.replaceStudyPartitions]]'s delete-then-append
  *    window entirely: the old generation's files still exist.
  *  - `readAt(version)` is time travel to any unvacuumed snapshot.
  *
  * Writer model: SINGLE writer per warehouse (the reference's model;
  * its SQLite deployments cannot do better). Conflicts are still
  * DETECTED, not silently merged: commit refuses to overwrite an
  * existing manifest version and throws [[ConcurrentWriteException]] —
  * best-effort on filesystems whose rename does not fail on an existing
  * destination (object stores without atomic rename need a real
  * catalog, the standard lakehouse caveat).
  *
  * Scale: the manifest is driver-side metadata — bytes per table, one
  * small file per commit, independent of data volume. Reads plan a
  * union over the segment list, whose growth is bounded by
  * construction: any transaction that leaves a touched table above
  * `autoCompactSegments` segments folds it back to one segment inside
  * the SAME commit (so a daily append loop can never accumulate an
  * unbounded union), `compact` does the same on demand, and `vacuum`
  * drops unreferenced segments and pre-current manifests once no
  * reader needs them (retention is the operator's contract, as in
  * every table format). Fact segments stay hive-partitioned by
  * `study_key`, so F7 partition pruning and exclusion-list pruning
  * both happen at the scan.
  */
class SnapshotWarehouse(spark: SparkSession, val baseDir: String,
    autoCompactSegments: Int = 16) extends Warehouse {
  import SnapshotWarehouse._
  import Warehouse.schemas

  private def fs: FileSystem =
    new HPath(baseDir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private val manifestDir = new HPath(s"$baseDir/_manifests")

  // ---- manifest resolution -------------------------------------------

  private def listVersions(): Seq[Long] =
    if (!fs.exists(manifestDir)) Nil
    else fs.listStatus(manifestDir).toSeq.map(_.getPath.getName)
      .filter(n => n.startsWith("v") && n.endsWith(".json"))
      .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
      .sorted

  /** Latest committed snapshot version (0 = empty warehouse). */
  def currentVersion(): Long = listVersions().lastOption.getOrElse(0L)

  private[etl] def manifestAt(version: Long): Manifest =
    if (version == 0L) Manifest(0L, Map.empty)
    else {
      val p = new HPath(manifestDir, f"v$version%08d.json")
      if (!fs.exists(p))
        throw new IllegalArgumentException(
          s"snapshot v$version does not exist (vacuumed, or never committed)")
      val in = fs.open(p)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      parseManifest(text)
    }

  private[etl] def currentManifest(): Manifest = manifestAt(currentVersion())

  private[etl] def readTable(m: Manifest, table: String): DataFrame = {
    val schema = schemas(table)
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    m.tables.getOrElse(table, Nil).foldLeft(empty) { (acc, seg) =>
      val df = spark.read.schema(schema).parquet(s"$baseDir/${seg.path}")
      val visible =
        if (seg.exclude.isEmpty) df
        // study_key is a segment partition column, so the exclusion
        // prunes directories at the scan — no row-level delete files
        else df.where(!col("study_key").isin(seg.exclude: _*))
      acc.unionByName(visible)
    }
  }

  // ---- Warehouse surface (each op = one single-op transaction) -------

  def read(table: String): DataFrame = readTable(currentManifest(), table)

  /** Time travel: the table exactly as snapshot `version` published it. */
  def readAt(table: String, version: Long): DataFrame =
    readTable(manifestAt(version), table)

  def writeDim(table: String, df: DataFrame): Unit =
    transact(_.writeDim(table, df))

  def appendFacts(table: String, df: DataFrame): Unit =
    transact(_.appendFacts(table, df))

  def replaceStudyPartitions(table: String, df: DataFrame, studyKeys: Seq[Long]): Unit =
    transact(_.replaceStudyPartitions(table, df, studyKeys))

  // ---- transactions ---------------------------------------------------

  /** Run `f` against a transaction view of the CURRENT snapshot: reads
    * see the base snapshot plus this transaction's own writes
    * (read-your-writes — the ETL reads a dim back right after
    * upserting it); nothing becomes visible to any other reader until
    * the single manifest rename at the end. If `f` throws, NOTHING is
    * published — staged segments are orphans that the next [[vacuum]]
    * sweeps, which is the crash story too (a killed JVM is
    * indistinguishable from a thrown `f`).
    */
  def transact[A](f: SnapshotTxn => A): A = {
    val base = currentManifest()
    val txn = new SnapshotTxn(spark, baseDir, base, this)
    val out = f(txn)
    // maintenance rides the SAME commit: a table this transaction
    // touched whose segment list outgrew the cadence threshold folds
    // back to one segment before the manifest rename, so a daily
    // append loop can never accumulate an unbounded read-side union
    // (the ADVICE-flagged failure mode of manual-only compaction).
    // Untouched tables are never rewritten behind a caller's back.
    if (autoCompactSegments > 0)
      txn.pendingTables.collect {
        case (table, segs) if segs.size > autoCompactSegments => table
      }.foreach(t => txn.rewrite(t, null))
    commit(base, txn.pendingTables)
    out
  }

  private def commit(base: Manifest, pending: Map[String, Seq[Segment]]): Unit = {
    if (pending.isEmpty) return
    val next = Manifest(base.version + 1, base.tables ++ pending)
    if (!fs.exists(manifestDir)) fs.mkdirs(manifestDir)
    val tmp = new HPath(manifestDir, s"_tmp_${UUID.randomUUID().toString.replace("-", "")}.json")
    val out = fs.create(tmp, false)
    try out.write(renderManifest(next).getBytes("UTF-8"))
    finally out.close()
    val target = new HPath(manifestDir, f"v${next.version}%08d.json")
    // the version file is the commit point: exactly one writer can
    // create v(N+1). exists + rename is best-effort CAS (atomic on
    // HDFS, where rename-onto-existing fails; racy only on filesystems
    // without that contract — single-writer is the documented model)
    if (fs.exists(target) || !fs.rename(tmp, target)) {
      fs.delete(tmp, false)
      throw new ConcurrentWriteException(
        s"snapshot v${next.version} was committed by another writer " +
          s"(base was v${base.version}); retry against the new snapshot")
    }
  }

  // ---- maintenance -----------------------------------------------------

  /** Fold `table` back to a single segment (same visible rows, one
    * directory) and commit that as a new snapshot. Old segments become
    * garbage for [[vacuum]]; readers mid-flight on older snapshots are
    * untouched because nothing is deleted here.
    */
  def compact(table: String): Unit = transact(_.rewrite(table, null))

  /** Delete every segment directory not referenced by the newest
    * `keepVersions` manifests, and every manifest older than those.
    * Destroys time travel past the retention horizon and any
    * still-running reader of it — the standard lakehouse vacuum
    * contract: `keepVersions` IS the reader-retention horizon
    * (default 1 = only the current snapshot survives).
    */
  def vacuum(keepVersions: Int = 1): Unit = {
    require(keepVersions >= 1, s"keepVersions must be >= 1, got $keepVersions")
    val versions = listVersions()
    val kept = versions.takeRight(keepVersions)
    val live = kept.flatMap(v => manifestAt(v).tables.values.flatten.map(_.path)).toSet
    schemas.keys.foreach { table =>
      val dir = new HPath(s"$baseDir/$table")
      if (fs.exists(dir)) fs.listStatus(dir).foreach { st =>
        val rel = s"$table/${st.getPath.getName}"
        if (st.getPath.getName.startsWith("seg-") && !live.contains(rel))
          fs.delete(st.getPath, true)
      }
    }
    versions.dropRight(keepVersions).foreach { v =>
      fs.delete(new HPath(manifestDir, f"v$v%08d.json"), false)
    }
    fs.listStatus(manifestDir).foreach { st =>
      if (st.getPath.getName.startsWith("_tmp_")) fs.delete(st.getPath, false)
    }
  }
}

/** The transaction view: implements [[Warehouse]] so every existing
  * consumer — `Dims`, `StudyState`, the whole `EtlJob` publish phase —
  * runs unchanged inside a transaction. Writes stage immutable
  * segments and buffer manifest entries; reads resolve pending entries
  * first, then the base snapshot.
  */
final class SnapshotTxn private[etl] (spark: SparkSession, baseDir: String,
    base: SnapshotWarehouse.Manifest, owner: SnapshotWarehouse) extends Warehouse {
  import SnapshotWarehouse._
  import Warehouse.schemas

  private val pending = scala.collection.mutable.LinkedHashMap[String, Seq[Segment]]()

  private[etl] def pendingTables: Map[String, Seq[Segment]] = pending.toMap

  private def entry(table: String): Seq[Segment] =
    pending.getOrElse(table, base.tables.getOrElse(table, Nil))

  def read(table: String): DataFrame =
    owner.readTable(Manifest(base.version, base.tables ++ pending), table)

  /** Fact tables partition by study_key inside each segment (F7
    * pruning); dims are wholesale single-file rewrites, the
    * ParquetWarehouse discipline.
    */
  private def writeSegment(table: String, df: DataFrame): Segment = {
    val rel = s"$table/seg-${UUID.randomUUID().toString.replace("-", "")}"
    val partitioned = table.startsWith("fact")
    val w =
      (if (partitioned) df.write.partitionBy("study_key") else df.coalesce(1).write)
        .mode(SaveMode.ErrorIfExists)
    w.parquet(s"$baseDir/$rel")
    Segment(rel, Nil)
  }

  def writeDim(table: String, df: DataFrame): Unit = {
    // the incoming frame's plan may READ this table's current segments
    // (read-modify-write, e.g. StudyState.upsert) — safe, because the
    // write lands in a fresh directory and the sources are immutable;
    // ParquetWarehouse needed a 3-rename dance for exactly this
    pending(table) = Seq(writeSegment(table, df))
  }

  def appendFacts(table: String, df: DataFrame): Unit =
    pending(table) = entry(table) :+ writeSegment(table, df)

  /** S7 delete-then-insert without the delete: prior segments get the
    * studies masked via their exclusion lists (directory-pruned at
    * scan), the replacement rows land as one new segment. A study
    * whose recomputation is EMPTY still loses its stale rows — the
    * exclusion does that part, no rows required.
    */
  def replaceStudyPartitions(table: String, df: DataFrame, studyKeys: Seq[Long]): Unit = {
    if (studyKeys.isEmpty) return
    val masked = entry(table).map(s =>
      s.copy(exclude = (s.exclude ++ studyKeys).distinct.sorted))
    pending(table) = masked :+ writeSegment(table, df)
  }

  /** Rewrite `table` as one segment holding exactly its current visible
    * rows (`df == null` ⇒ read them from this transaction's view) —
    * the compaction primitive.
    */
  private[etl] def rewrite(table: String, df: DataFrame): Unit = {
    val rows = Option(df).getOrElse(read(table))
    pending(table) = Seq(writeSegment(table, rows))
  }
}

class ConcurrentWriteException(msg: String) extends RuntimeException(msg)

object SnapshotWarehouse {

  /** One immutable data directory plus the study keys masked out of it
    * (how replace expresses deletion without deleting).
    */
  case class Segment(path: String, exclude: Seq[Long])

  case class Manifest(version: Long, tables: Map[String, Seq[Segment]])

  /** Hand-rendered for a stable field order; parsed with Jackson (on
    * the Spark classpath) for robustness.
    */
  private[etl] def renderManifest(m: Manifest): String = {
    def seg(s: Segment): String =
      s"""{"path":${graft.JsonUtil.quote(s.path)},"exclude":[${s.exclude.mkString(",")}]}"""
    val tables = m.tables.toSeq.sortBy(_._1).map { case (t, segs) =>
      s"${graft.JsonUtil.quote(t)}:[${segs.map(seg).mkString(",")}]"
    }.mkString(",")
    s"""{"version":${m.version},"tables":{$tables}}"""
  }

  private[etl] def parseManifest(text: String): Manifest = {
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(text)
    val tables = scala.collection.mutable.LinkedHashMap[String, Seq[Segment]]()
    val it = root.get("tables").fields()
    while (it.hasNext) {
      val e = it.next()
      val segs = scala.collection.mutable.ArrayBuffer[Segment]()
      e.getValue.forEach { s =>
        val ex = scala.collection.mutable.ArrayBuffer[Long]()
        s.get("exclude").forEach(x => ex += x.asLong())
        segs += Segment(s.get("path").asText(), ex.toSeq)
      }
      tables(e.getKey) = segs.toSeq
    }
    Manifest(root.get("version").asLong(), tables.toMap)
  }
}
