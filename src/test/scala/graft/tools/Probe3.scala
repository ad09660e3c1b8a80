package graft

import graft.ops.{Dedup, Hashing}
import org.apache.spark.sql.functions._

/** Narrow p4 hot-stage repro, warm JVM, two runs each:
  * runMain graft.Probe3 <sfDir>
  */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-probe3")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE3 $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    // warm-up: full docs scan + a shuffle
    docs.groupBy("doc_id").count().count()

    val tokens = docs
      .repartition(32, col("doc_id"))
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("w"))
      .withColumn("h", Hashing.hex64(col("token")))

    time("tokens: groupBy only")(tokens.drop("h").count())
    time("tokens: +hex64 forced")(tokens.where(col("h") >= 0).count())
    time("tokens: +hex64 forced (2nd)")(tokens.where(col("h") >= 0).count())
    time("simhash run1")(Dedup.simhash(docs).count())
    time("simhash run2")(Dedup.simhash(docs).count())
    time("simhashPairs run1")(Dedup.simhashPairs(docs).count())
    time("simhashPairs run2")(Dedup.simhashPairs(docs).count())
    spark.stop()
  }
}
