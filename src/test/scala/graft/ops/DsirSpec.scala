package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixture-level behavior of p58 DSIR importance selection: the score
  * of every document is hand-derivable from the bucket counts and
  * integer micro-logs, so the whole fit→score path pins exactly.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  test("p58: target-like docs score positive, raw-only docs negative — exact micro-log arithmetic") {
    val B = 16
    // the two fixture words must land in different buckets for the
    // hand-derivation below; verified, not assumed
    val bA = (Hashing.hex64Local("delta") % B).toInt
    val bB = (Hashing.hex64Local("omega") % B).toInt
    assert(bA != bB, s"fixture words collide in bucket $bA — pick new words")
    val docs = ((1L to 4L).map((_, "delta delta")) ++
      (5L to 8L).map((_, "omega omega"))).toDF("doc_id", "text")
    val out = Dsir.selectByImportance(docs, col("doc_id") <= 4, buckets = B)
      .select("doc_id", "n_feat", "dsir_micro", "keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    // counts: delta (target word) tcnt=8 rcnt=8; omega tcnt=0 rcnt=8;
    // T = 8 + 16, R = 16 + 16 — Laplace-smoothed ratios
    val sAlpha = UnigramLm.microLog(9, 24) - UnigramLm.microLog(9, 32)
    val sBeta = UnigramLm.microLog(1, 24) - UnigramLm.microLog(9, 32)
    assert(sAlpha > 0 && sBeta < 0)
    (1L to 4L).foreach { i =>
      assert(out(i) == ((i, 2L, 2 * sAlpha, true)), s"doc $i: ${out(i)}")
    }
    (5L to 8L).foreach { i =>
      assert(out(i) == ((i, 2L, 2 * sBeta, false)), s"doc $i: ${out(i)}")
    }
  }

  test("p58: blank documents score zero and are not kept") {
    val docs = Seq((1L, "alpha"), (2L, "   ")).toDF("doc_id", "text")
    val out = Dsir.selectByImportance(docs, col("doc_id") === 1L, buckets = 8)
      .select("doc_id", "n_feat", "dsir_micro", "keep")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(out(2L) == ((2L, 0L, 0L, false)), s"got ${out(2L)}")
  }

  test("p58: guards") {
    val docs = Seq((1L, "alpha")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Dsir.bucketScores(docs, lit(true), buckets = 1)
    }
    intercept[IllegalArgumentException] {
      Dsir.scoreDocs(docs, Array.emptyLongArray)
    }
  }
}
