package graft.ops

import graft.GraftSession
import graft.functions.VectorMath

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Decompose p64's recall loss: coarse-cell capture (cosine cells vs
  * the L2 target) vs PQ ranking loss (ADC over all pairs, no cells).
  * Test/runMain graft.tools.ProbePq [sfDir]
  */
object ProbePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.getOrCreate("graft-probe-pq")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val exact = Pq.l2TopK(emb, k = 5).cache()
    val total = exact.count()

    def recall(approx: org.apache.spark.sql.DataFrame): Double = {
      val hits = exact.select("query_id", "neighbor_id")
        .join(approx.select("query_id", "neighbor_id"),
          Seq("query_id", "neighbor_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("hit"))
      exact.select("query_id", "neighbor_id").groupBy("query_id")
        .agg(count(lit(1)).as("t"))
        .join(hits, Seq("query_id"), "left")
        .select(avg(coalesce(col("hit"), lit(0L)).cast("double") / col("t")))
        .head.getDouble(0)
    }

    // 1. current p64
    println(f"p64 as-shipped recall@5 = ${recall(Pq.ivfPqTopK(emb, k = 5))}%.3f")

    // 2. coarse-cell capture alone: exact pairs whose endpoints share
    //    a probed cell (cosine cells, nProbe=2)
    val cells = Similarity.ivfRankedCells(emb, 8, 2, "vec_id", "embedding",
      "vid", "v", "nrm")
    val r1 = cells.where(col("__rk") === 1).select(col("vid").as("neighbor_id"), col("cell"))
    val pr = cells.where(col("__rk") <= 2).select(col("vid").as("query_id"), col("cell"))
    val coCell = pr.join(r1, Seq("cell")).select("query_id", "neighbor_id").distinct()
    println(f"cosine-cell capture of exact-L2 pairs = ${recall(coCell)}%.3f")

    // 3. PQ ranking alone: ADC over ALL pairs (no cells), m x ksub grid;
    //    also the refine ceiling: exact top-5 captured in ADC top-20
    for ((m, ks) <- Seq((4, 8), (8, 8), (8, 16), (16, 8), (16, 16))) {
      val cbs = Pq.fitPqCodebooks(emb, m = m, ksub = ks, iters = 2)
      val subd = cbs.head.head._2.length
      val enc = emb.select(col("vec_id").as("neighbor_id") +: (0 until m).map(j =>
        slice(transform(col("embedding"), _.cast("double")), j * subd + 1, subd).as(s"svb_$j")): _*)
      val coded = enc.select(col("neighbor_id") +: (0 until m).map(j =>
        sort_array(array(cbs(j).map { case (cid, cv) =>
          struct(VectorMath.l2sq(col(s"svb_$j"), typedlit(cv)).as("d"), lit(cid).as("cid"))
        }: _*)).getItem(0).getField("cid").as(s"code_$j")): _*)
      val q = emb.select(col("vec_id").as("query_id") +: (0 until m).map(j =>
        slice(transform(col("embedding"), _.cast("double")), j * subd + 1, subd).as(s"sva_$j")): _*)
        .select(col("query_id") +: (0 until m).map { j =>
          map_from_arrays(typedlit(cbs(j).map(_._1)),
            array(cbs(j).map { case (_, cv) => VectorMath.l2sq(col(s"sva_$j"), typedlit(cv)) }: _*))
            .as(s"lut_$j")
        }: _*)
      val adc = (0 until m).map(j => element_at(col(s"lut_$j"), col(s"code_$j"))).reduce(_ + _)
      val pairs = q.join(broadcast(coded), col("query_id") =!= col("neighbor_id"))
        .withColumn("a", adc)
      val w = Window.partitionBy(col("query_id")).orderBy(col("a").asc, col("neighbor_id").asc)
      val rankedAll = pairs.withColumn("rank", row_number().over(w)).cache()
      val top = rankedAll.where(col("rank") <= 5)
      val top20 = rankedAll.where(col("rank") <= 20)
      println(f"ADC-only recall@5, m=$m ksub=$ks = ${recall(top)}%.3f; " +
        f"exact-top5 in ADC-top20 (refine ceiling) = ${recall(top20)}%.3f")
      rankedAll.unpersist()
    }

    // 4. L2 coarse cells (PQ machinery m=1) + exact ranking: how well
    //    do L2 cells capture vs cosine cells
    val l2cb = Pq.fitPqCodebooks(emb, m = 1, ksub = 8, iters = 3)
    val vd = emb.select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val entries = l2cb.head.map { case (cid, cv) =>
      struct(VectorMath.l2sq(col("v"), typedlit(cv)).as("d"), lit(cid).as("cid")) }
    val ranked = vd.select(col("vec_id"),
      posexplode(slice(sort_array(array(entries: _*)), 1, 2)).as(Seq("p", "s")))
      .select(col("vec_id"), col("s.cid").as("cell"), (col("p") + 1).as("rk"))
    val l2r1 = ranked.where(col("rk") === 1).select(col("vec_id").as("neighbor_id"), col("cell"))
    val l2pr = ranked.where(col("rk") <= 2).select(col("vec_id").as("query_id"), col("cell"))
    val l2co = l2pr.join(l2r1, Seq("cell")).select("query_id", "neighbor_id").distinct()
    println(f"L2-cell capture of exact-L2 pairs (nProbe=2) = ${recall(l2co)}%.3f")

    spark.stop()
  }
}
