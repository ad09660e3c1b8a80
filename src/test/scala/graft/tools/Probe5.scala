package graft

import graft.etl.ExpressionMatrix
import org.apache.spark.sql.functions._

/** Wide-TSV melt timings: runMain graft.Probe5 <expressionTsv> */
object Probe5 {
  def main(args: Array[String]): Unit = {
    val path = args.headOption.getOrElse(
      "/tmp/scale_study/input/GSE99999/expression_GSE99999.tsv")
    val spark = GraftSession.getOrCreate("graft-probe5")

    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROBE5 $name%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s  rows=$n")
    }

    val header = spark.read.text(path).limit(1).head.getString(0).split("\t")
    val samples = header.tail.toSeq
    println(s"PROBE5 columns=${header.length}")

    time("csv melt (current)")(
      ExpressionMatrix.load(spark, path, samples).count())
    time("csv melt (current, 2nd)")(
      ExpressionMatrix.load(spark, path, samples).count())

    // text + split + posexplode alternative
    def textMelt(): Long = {
      val lines = spark.read.text(path)
      val first = lines.limit(1).head.getString(0)
      val cols = first.split("\t", -1).toSeq
      val keepIdx = cols.zipWithIndex.tail.map(_._2)
      val names = array(cols.tail.map(lit): _*)
      lines.where(col("value") =!= first)
        .select(split(col("value"), "\t", -1).as("f"))
        .select(trim(element_at(col("f"), 1)).as("gene_id"),
          posexplode(slice(col("f"), 2, cols.size - 1)).as(Seq("i", "__raw")))
        .where(col("gene_id") =!= "")
        .select(col("gene_id"),
          element_at(names, col("i") + 1).as("sample_accession"),
          col("__raw").cast("double").as("expression_value"))
        .where(col("expression_value").isNotNull)
        .count()
    }
    time("text melt (alt)")(textMelt())
    time("text melt (alt, 2nd)")(textMelt())
    spark.stop()
  }
}
