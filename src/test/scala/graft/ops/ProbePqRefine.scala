package graft.ops

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Measure the IVF-PQ exact-refine step in ALL THREE regimes of the
  * `refineCapRows` knob at a corpus that actually exceeds the cap:
  * the sf0.1 embeddings (2000 vectors) replicate with identity shifts
  * and a per-replica coordinate-0 nudge (the MakeSfScale discipline —
  * distinct vectors, same cluster geometry) to `reps × 2000` vectors
  * (default 250 reps = 500k, past the production 250k cap).
  *
  * At 500k with the production cap the SHARDED path engages (2 slices
  * ≤ MaxRefineShards); forcing the cap high routes broadcast, forcing
  * it to n/(MaxRefineShards+1) routes the plain id-equi-join fallback.
  * Same result all three ways (PqSpec pins bit-equality); this probe
  * prices the regimes so BASELINE.md carries the >cap envelope as
  * numbers instead of a comment.
  *
  *   Test/runMain graft.ops.ProbePqRefine [srcSfDir] [passes] [reps]
  */
object ProbePqRefine {
  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val passes = if (args.length > 1) args(1).toInt else 2
    val reps = if (args.length > 2) args(2).toInt else 250
    val spark = GraftSession.getOrCreate("graft-probe-pq-refine")
    spark.sparkContext.setLogLevel("WARN")
    val out = s"/tmp/emb_refine_${reps}x.parquet"
    if (!new java.io.File(out).exists()) {
      val repDf = spark.range(0, reps).select(col("id").as("__r"))
      spark.read.parquet(s"$src/embeddings.parquet")
        .crossJoin(repDf)
        .withColumn("vec_id", col("vec_id") + col("__r") * 100000000L)
        .withColumn("embedding", transform(col("embedding"),
          (x, i) => when(i === 0, x + (col("__r").cast("float") / lit(1000.0f)))
            .otherwise(x)))
        .drop("__r")
        .repartition(32).write.mode("overwrite").parquet(out)
    }
    val emb = spark.read.parquet(out)
    val n = emb.count()
    println(s"pq-refine-probe: corpus $n vectors at $out " +
      s"(production cap ${Pq.BroadcastRefineMaxRows}, shard ceiling ${Pq.MaxRefineShards})")

    def timeTopK(label: String, cap: Long): Unit = {
      val secs = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        val rows = Pq.ivfPqTopK(emb, k = 5, refineCapRows = cap).count()
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"pq-refine-probe:   $label pass: $rows rows in $dt%7.1f s")
        dt
      }
      println(f"pq-refine-probe: $label min = ${secs.min}%7.1f s over $passes passes")
    }

    // cap small enough that shards would exceed the ceiling -> fallback
    val fallbackCap = math.max(1L, n / (Pq.MaxRefineShards + 1) - 1L)
    timeTopK(s"fallback (equi-join refine, cap=$fallbackCap)", fallbackCap)
    // production cap: n=500k -> 2 shards -> SHARDED broadcast refine
    timeTopK(s"sharded refine (cap=${Pq.BroadcastRefineMaxRows})",
      Pq.BroadcastRefineMaxRows)
    // cap above n: single whole-corpus broadcast (memory permitting)
    timeTopK(s"broadcast refine (cap=${n + 1})", n + 1)
    spark.stop()
  }
}
