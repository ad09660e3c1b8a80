package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Measure the PRODUCTION BPE encode tier (`Bpe.encode`, broadcast
  * rank map + lowest-rank-first per-word loop) at a production merge
  * count: the corpus trains what it can, the rank list is padded with
  * never-matching sentinel merges (rhs is the empty string, which no
  * word piece can ever be) to M = 30000 — padding exercises
  * exactly what a production merge table costs the encode: map size,
  * not extra work, because per-word cost is O(appliedMerges × |word|)
  * hash lookups independent of M. The ordered-scan form
  * (`encodeWordOrdered`, O(M × |word|) per word) is measured
  * driver-side on a bounded sample for the comparison row.
  *
  *   Test/runMain graft.ops.ProbeBpeEncode [sfDir]
  */
object ProbeBpeEncode {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-probe-bpe")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(spark.sparkContext.defaultParallelism)
      .cache()
    val nDocs = docs.count()

    def timed[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }

    val (merges, tFit) = timed(Bpe.learnMerges(docs, numMerges = 1024))
    println(f"bpe-probe: corpus=$sfDir docs=$nDocs trained=${merges.size} merges in $tFit%.1f s")

    val padded = merges ++ (merges.size + 1 to 30000).map(i =>
      Bpe.Merge(i, s"pad$i", "", s"pad$i", 0L))

    def encodeTokens(ms: Seq[Bpe.Merge]): (Long, Double) = {
      val (row, t) = timed(
        Bpe.encode(docs, ms).agg(sum(col("n_tokens"))).head.getLong(0))
      (row, t)
    }
    // warm once (JIT + scan cache), then measure twice and keep the min
    encodeTokens(merges)
    val tTrained = (1 to 2).map(_ => encodeTokens(merges)).minBy(_._2)
    val tPadded = (1 to 2).map(_ => encodeTokens(padded)).minBy(_._2)
    println(f"bpe-probe: encode ranked M=${merges.size}%5d -> ${tTrained._1} tokens in ${tTrained._2}%6.2f s")
    println(f"bpe-probe: encode ranked M=30000 -> ${tPadded._1} tokens in ${tPadded._2}%6.2f s")

    // ordered-scan comparison, bounded driver-side sample
    val sample = docs.orderBy("doc_id").limit(100)
      .select("text").collect().map(_.getString(0))
    val words = sample.flatMap(t =>
      Option(t).toSeq.flatMap(_.trim.toLowerCase.split("\\s+").filter(_.nonEmpty)))
    val ranks = padded.map(m => (m.lhs, m.rhs) -> m.rank).toMap
    val ordered = padded.sortBy(_.rank).map(m => (m.lhs, m.rhs))
    val (nr, tRanked) = timed(words.map(w => Bpe.encodeWordRanked(ranks, w).size).sum)
    val (no, tOrdered) = timed(words.map(w => Bpe.encodeWordOrdered(ordered, w).size).sum)
    require(nr == no, s"strategy token counts diverged: $nr vs $no")
    println(f"bpe-probe: per-word @M=30000 over ${words.length} words: " +
      f"ranked $tRanked%.3f s vs ordered-scan $tOrdered%.3f s " +
      f"(${tOrdered / math.max(tRanked, 1e-9)}%.0fx)")
    spark.stop()
  }
}
