package graft.streaming

import graft.SparkSpec
import graft.ops.{ScoredCand, TopKBuf, TopKCandAgg}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** x30's production-state contract: streaming ANN serving keeps
  * EXACTLY k structs per query in the state store (update mode +
  * bounded TopKCandAgg), never a query's full candidate history, and
  * the multi-batch drain (re-rank the union of updates) equals the
  * global top-k because the running top-k is monotone.
  */
case class QCand(query_id: Long, nc: Double, neighbor_id: Long)

class TopKServingStateSpec extends SparkSpec {

  private val K = 3

  test("aggregator buffer never exceeds k through reduce and merge") {
    val agg = new TopKCandAgg(K)
    var buf = agg.zero
    for (i <- 1 to 100) {
      buf = agg.reduce(buf, ScoredCand(-1.0 / i, i.toLong))
      assert(buf.cands.size <= K, s"buffer grew past k after $i reduces")
    }
    val merged = agg.merge(buf, agg.reduce(agg.zero, ScoredCand(-2.0, 999L)))
    assert(merged.cands.size == K)
    // best-first canonical order, new global best at the head
    assert(merged.cands.head == ScoredCand(-2.0, 999L))
  }

  test("bounded fold is partition-invariant: merge of any split equals top-k of the whole") {
    val agg = new TopKCandAgg(K)
    val cands = (1 to 40).map(i => ScoredCand(-(i * 7 % 23).toDouble, i.toLong))
    val whole = cands.foldLeft(agg.zero)(agg.reduce)
    for (cut <- Seq(1, 7, 20, 39)) {
      val (a, b) = cands.splitAt(cut)
      val split = agg.merge(a.foldLeft(agg.zero)(agg.reduce),
        b.foldLeft(agg.zero)(agg.reduce))
      assert(split == whole, s"split at $cut diverged from the whole fold")
    }
    val expect = cands.sortBy(c => (c.nc, c.neighbor_id)).take(K)
    assert(whole.cands == expect)
  }

  test("update-mode serving: state rows = keys (not candidates); drained updates re-rank to the global top-k") {
    val s = spark
    import s.implicits._
    implicit val sq = s.sqlContext
    val topk = udaf(new TopKCandAgg(K),
      org.apache.spark.sql.Encoders.product[ScoredCand])
    val source = MemoryStream[QCand]
    val q = source.toDF()
      .groupBy(col("query_id"))
      .agg(topk(col("nc"), col("neighbor_id")).as("tk"))
      .writeStream.format("memory").queryName("topk_serve")
      .outputMode("update").start()
    try {
      // batch 1: query 1 sees middling candidates, query 2 one
      source.addData(
        QCand(1L, -0.50, 11L), QCand(1L, -0.40, 12L), QCand(1L, -0.60, 13L),
        QCand(1L, -0.30, 14L), QCand(2L, -0.90, 21L))
      q.processAllAvailable()
      // batch 2: a new global best for query 1 (must displace), plus a
      // loser that must NOT surface
      source.addData(QCand(1L, -0.95, 15L), QCand(1L, -0.05, 16L))
      q.processAllAvailable()
      val st = q.lastProgress.stateOperators
      assert(st.nonEmpty && st.head.numRowsTotal == 2L,
        s"state must hold one bounded buffer per KEY (2), got " +
          s"${st.map(_.numRowsTotal).mkString(",")}")
      // the drain x30 runs: union every update's candidates, re-rank
      val drained = s.table("topk_serve")
        .select(col("query_id"), explode(col("tk").getField("cands")).as("__c"))
        .select(col("query_id"), col("__c.nc").as("nc"),
          col("__c.neighbor_id").as("neighbor_id"))
        .distinct()
        .withColumn("rank", row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("query_id"))
            .orderBy(col("nc").asc, col("neighbor_id").asc)))
        .where(col("rank") <= K)
        .as[(Long, Double, Long, Int)].collect().toSet
      val expect = Set(
        (1L, -0.95, 15L, 1), (1L, -0.60, 13L, 2), (1L, -0.50, 11L, 3),
        (2L, -0.90, 21L, 1))
      assert(drained == expect,
        s"multi-batch drain must equal the global top-k: $drained")
    } finally q.stop()
  }
}
