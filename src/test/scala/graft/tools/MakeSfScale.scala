package graft

import org.apache.spark.sql.functions._

/** Builds the 10× (sf1-equivalent) scaling-probe fixture from the
  * sf0.1 testdata:
  *
  *   Test/runMain graft.MakeSfScale [srcDir] [outDir] [k]
  *
  * Each table is replicated k times with deterministic IDENTITY
  * shifts, because a plain k-way copy would measure the wrong problem
  * on exactly the queries the probe targets:
  *
  *  - documents: doc_id shifts by replica; one per-replica salt token
  *    appends to the text, so cross-replica texts are NOT
  *    byte-duplicates (a bare copy turns the whole corpus into k-way
  *    dup groups and floods every dedup candidate join). The planted
  *    within-replica dup/near-dup structure scales k× untouched.
  *  - embeddings: vec_id shifts; coordinate 0 gets a per-replica
  *    +r/1000 nudge — distinct vectors, same cluster geometry.
  *  - lineitem: l_orderkey shifts, so c2/c5's sample key
  *    (orderkey*100+linenumber) gains k× distinct samples — the
  *    sufficient-statistics path scales in n, which is the axis under
  *    test.
  *  - events: event_id/user_id shift; timestamps keep their window
  *    distribution (k× rows per hour bucket).
  *
  * The tiny dims (region/nation/part/orders/customer/supplier) copy
  * verbatim — they are lookup sides, not scaling axes, and BenchOne's
  * warm-up reads region.
  */
object MakeSfScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val out = if (args.length > 1) args(1) else "/tmp/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val Shift = 100000000L

    val spark = GraftSession.getOrCreate("graft-make-sfscale")
    spark.sparkContext.setLogLevel("WARN")
    val reps = spark.range(0, k).select(col("id").as("__r"))
    def replicate(table: String)(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val df = f(spark.read.parquet(s"$src/$table.parquet").crossJoin(reps)).drop("__r")
      df.repartition(32).write.mode("overwrite").parquet(s"$out/$table.parquet")
      println(f"sfscale: $table%-12s ${(System.nanoTime() - t0) / 1e9}%6.1f s")
    }

    replicate("documents")(_
      .withColumn("doc_id", col("doc_id") + col("__r") * Shift)
      .withColumn("text", concat(col("text"), lit(" zrep"), col("__r"))))
    replicate("embeddings")(_
      .withColumn("vec_id", col("vec_id") + col("__r") * Shift)
      .withColumn("embedding", transform(col("embedding"),
        (x, i) => when(i === 0, x + (col("__r").cast("float") / lit(1000.0f)))
          .otherwise(x))))
    replicate("lineitem")(_
      .withColumn("l_orderkey", col("l_orderkey") + col("__r") * Shift))
    replicate("events")(_
      .withColumn("event_id", col("event_id") + col("__r") * Shift)
      .withColumn("user_id", col("user_id") + col("__r") * Shift))

    Seq("region", "nation", "part", "orders", "customer", "supplier")
      .foreach { t =>
        spark.read.parquet(s"$src/$t.parquet")
          .write.mode("overwrite").parquet(s"$out/$t.parquet")
      }
    println(s"sfscale: wrote $out at ${k}x $src")
    spark.stop()
  }
}
