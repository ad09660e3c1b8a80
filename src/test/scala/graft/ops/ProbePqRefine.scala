package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Measure the IVF-PQ exact-refine step on BOTH sides of
  * `Pq.BroadcastRefineMaxRows` at a corpus that actually exceeds the
  * cap: the sf0.1 embeddings (2000 vectors) replicate 32× with
  * identity shifts and a per-replica coordinate-0 nudge (the
  * MakeSfScale discipline — distinct vectors, same cluster geometry)
  * to 64000 vectors. At that size the default cap (50000) routes the
  * refine through the id-equi-join fallback (the shortlist shuffles
  * against the vector table, once carrying a full query vector per
  * row); raising the cap routes it through the broadcast path. Same
  * result either way (PqSpec pins bit-equality across the cap); this
  * probe prices the difference so BASELINE.md carries the >cap
  * envelope as a number.
  *
  *   Test/runMain graft.ops.ProbePqRefine [srcSfDir] [passes]
  */
object ProbePqRefine {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val spark = GraftSession.getOrCreate("graft-probe-pq-refine")
    spark.sparkContext.setLogLevel("WARN")
    val out = "/tmp/emb64k.parquet"
    if (!new java.io.File(out).exists()) {
      val reps = spark.range(0, 32).select(col("id").as("__r"))
      spark.read.parquet(s"$src/embeddings.parquet")
        .crossJoin(reps)
        .withColumn("vec_id", col("vec_id") + col("__r") * 100000000L)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => when(i === 0, x + (col("__r").cast("float") / lit(1000.0f)))
            .otherwise(x)))
        .drop("__r")
        .repartition(32).write.mode("overwrite").parquet(out)
    }
    val emb = spark.read.parquet(out)
    val n = emb.count()
    println(s"pq-refine-probe: corpus $n vectors at $out (cap ${Pq.BroadcastRefineMaxRows})")

    def timeTopK(label: String): Unit = {
      val secs = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val rows = Pq.ivfPqTopK(emb, k = 5).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"pq-refine-probe:   $label pass: $rows rows in $dt%7.1f s")
        dt
      }
      println(f"pq-refine-probe: $label min = ${secs.min}%7.1f s over $passes passes")
    }

    val prev = Pq.BroadcastRefineMaxRows
    try {
      // n = 64000 > 50000: the id-equi-join fallback engages at the default
      Pq.BroadcastRefineMaxRows = 50000L
      timeTopK("fallback (equi-join refine)")
      Pq.BroadcastRefineMaxRows = 200000L
      timeTopK("broadcast refine")
    } finally Pq.BroadcastRefineMaxRows = prev
    spark.stop()
  }
}
