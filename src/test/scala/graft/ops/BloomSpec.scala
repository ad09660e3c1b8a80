package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The Bloom-prefiltered decontamination contract: byte-identical to
  * the exact broadcast-set formulation (no false negatives), including
  * under a badly undersized filter where the fpp balloons — false
  * positives cost probe rows, never output rows.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private def canon(df: org.apache.spark.sql.DataFrame): Set[(Long, Long, Long)] =
    df.select(col("doc_id"), col("bench_id"), col("shared_ngrams"))
      .as[(Long, Long, Long)].collect().toSet

  test("bloom decontamination equals the exact formulation on real testdata") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val bench = docs.where(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val exact = TextStats.contaminationPairs(docs, bench, n = 3, minShared = 3)
    val bloom = TextStats.contaminationPairsBloom(docs, bench, n = 3,
      minShared = 3, expectedGrams = 1L << 16, fpp = 0.01)
    val e = canon(exact)
    assert(e.nonEmpty, "fixture must contain contamination for the test to bite")
    assert(canon(bloom) == e)
  }

  test("undersized bloom (fpp ballooned) still emits the exact output") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "prefix words then alpha beta gamma delta tail"), // shares 3-grams
      (3L, "totally unrelated text with no overlap at all here"),
      (50L, "alpha beta gamma delta epsilon zeta") // the benchmark doc
    ).toDF("doc_id", "text")
    val bench = docs.where(col("doc_id") === 50L)
      .select(col("doc_id").as("bench_id"), col("text"))
    val exact = canon(TextStats.contaminationPairs(docs, bench, n = 3, minShared = 2))
    // expectedGrams=1: every bucket saturates, fpp -> ~1; output must not move
    val tiny = canon(TextStats.contaminationPairsBloom(docs, bench, n = 3,
      minShared = 2, expectedGrams = 1L, fpp = 0.5))
    assert(exact.nonEmpty && tiny == exact)
  }
}
