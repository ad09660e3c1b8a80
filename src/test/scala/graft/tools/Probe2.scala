package graft

import org.apache.spark.sql.functions._

/** Narrower repro: explode+groupBy pathology. runMain graft.Probe2 <sfDir> */
object Probe2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-probe2")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32, col("doc_id"))

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE2 $name%-44s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val tok = docs.select(col("doc_id"),
      explode(split(trim(lower(col("text"))), "\\s+")).as("token"))
    time("explode.count")(tok.count())
    time("explode.groupBy(id,token).count") {
      tok.groupBy("doc_id", "token").count().count()
    }
    time("explode.filter.groupBy.count") {
      tok.where(col("token") =!= "").groupBy("doc_id", "token").count().count()
    }
    val tok2 = docs.select(col("doc_id"), explode(split(lit("a b c d e f g h i j"), " ")).as("token"))
    time("literal explode.groupBy.count") {
      tok2.groupBy("doc_id", "token").count().count()
    }
    time("distinct(id,token).count")(tok.distinct().count())
    spark.stop()
  }
}
