package graft.ops
import graft.GraftSession
import org.apache.spark.sql.functions._
object ProbeP2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-probe-p2")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def timed[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val a = body
      println(f"p2-probe: $label%-30s ${(System.nanoTime() - t0) / 1e9}%8.1f s  -> $a")
      a
    }
    val n = 8; val tau = 0.5
    val sh = Dedup.shingleRows(docs, n).localCheckpoint(true)
    timed("shingle rows")(sh.count())
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val dfreq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("__df"))
    timed("distinct shingles")(dfreq.count())
    timed("max shingle df")(dfreq.agg(max(col("__df"))).head.getLong(0))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("__df").asc, col("shingle").asc)
    val prefix = sh.join(dfreq, "shingle")
      .withColumn("__pos", row_number().over(w))
      .join(sizes, Seq("doc_id"))
      .where(col("__pos") <= col("sz") - ceil(col("sz") * tau) + 1L)
      .select(col("doc_id"), col("shingle"), col("sz")).localCheckpoint(true)
    timed("prefix rows")(prefix.count())
    timed("max prefix-shingle df")(prefix.groupBy("shingle").count()
      .agg(max(col("count"))).head.getLong(0))
    val pa = prefix.toDF("id_a", "shingle", "sz_a")
    val pb = prefix.toDF("id_b", "shingle", "sz_b")
    val cand = pa.join(pb, pa("shingle") === pb("shingle") && pa("id_a") < pb("id_b"))
      .where(col("sz_b") >= ceil(col("sz_a") * tau) &&
        col("sz_a") >= ceil(col("sz_b") * tau))
      .select("id_a", "id_b").distinct().localCheckpoint(true)
    timed("candidate pairs")(cand.count())
    val shared = cand
      .join(sh.toDF("id_a", "shingle"), "id_a")
      .join(sh.toDF("id_b", "shingle"), Seq("id_b", "shingle"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("shared"))
    timed("verified shared counts")(shared.count())
    spark.stop()
  }
}
