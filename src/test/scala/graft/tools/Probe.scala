package graft

import graft.ops.{Dedup, Hashing}
import org.apache.spark.sql.functions._

/** Micro-profiling of op sub-steps: runMain graft.Probe <sfDir> */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-probe")
    import spark.implicits._
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    time("docs.count")(docs.count())
    time("shingleRows(8).count")(Dedup.shingleRows(docs, 8).count())
    time("shingle+hex64.count") {
      Dedup.shingleRows(docs, 8).withColumn("x", Hashing.hex64(col("shingle")))
        .where(col("x") > 0).count()
    }
    time("minhashSignatures.count")(Dedup.minhashSignatures(docs, 8, 16).count())
    time("minhashSignatureArrays.count")(Dedup.minhashSignatureArrays(docs, 8, 16).count())
    val tokens = docs
      .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
      .where(col("token") =!= "")
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("w"))
      .withColumn("h", Hashing.hex64(col("token")))
    time("p4 tokens.count")(tokens.count())
    val bitsDf = (0 until 60).toDF("bit")
    time("p4 crossJoin bits count") {
      tokens.crossJoin(broadcast(bitsDf)).count()
    }
    time("p4 contrib+agg count") {
      tokens.crossJoin(broadcast(bitsDf))
        .withColumn("contrib",
          col("w") * (expr("shiftright(h, bit)").bitwiseAND(1) * 2 - 1))
        .groupBy(col("doc_id"), col("bit")).agg(sum(col("contrib")).as("s"))
        .count()
    }
    spark.stop()
  }
}
