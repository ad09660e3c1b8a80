package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import CurationPipeline._

/** The declarative pipeline contract: a YAML stage list delegates to
  * the SAME verified operators as hand-composed code (differential
  * against [[Curation.curate]] and the standalone ops), and config
  * errors die at load time with the stage index named.
  */
class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = spark.read
    .parquet("/root/testdata/sf0.001/documents.parquet")

  test("config encoding the p30 funnel equals the hand-composed run") {
    val cfg = loadString(
      """pipeline:
        |  stages:
        |    - kind: quality_gate
        |      min_quality: 0.78
        |    - kind: normalized_dedup
        |    - kind: near_dup_drop
        |      max_hamming: 3
        |    - kind: token_budget
        |      budget_tokens: 800
        |      strata: source
        |""".stripMargin)
    val declarative = CurationPipeline.run(docs, cfg)
      .collect().map(_.toSeq).toSet
    val composed = Curation.curate(docs, minQuality = 0.78,
      budgetTokens = 800L, maxHamming = 3, strata = Seq("source"))
      .collect().map(_.toSeq).toSet
    assert(declarative.nonEmpty && declarative == composed)
  }

  test("quality_linear stage matches the standalone scorer and a top-level list fails loudly") {
    val cfg = loadString(
      """pipeline:
        |  stages:
        |    - kind: quality_linear
        |      min_logit: 0.0
        |""".stripMargin)
    val staged = CurationPipeline.run(docs, cfg)
      .select("doc_id").as[Long].collect().toSet
    val direct = TextStats.scoreLinear(docs, nFeatures = 1024, threshold = 0.0)
      .where(col("keep")).select("doc_id").as[Long].collect().toSet
    assert(staged.nonEmpty && staged == direct)
    // the scorer is a real filter on this corpus, not a pass-through
    assert(staged.size < docs.count())
    // a stage list pasted without its 'pipeline:' wrapper must raise
    // the config error naming the shape, not a ClassCastException
    val e = intercept[PipelineConfigError] {
      loadString("- kind: quality_linear\n  min_logit: 0.0\n")
    }
    assert(e.getMessage.contains("top level must be a mapping"))
  }

  test("lang_filter, pii_redact and exact_dedup stages match the standalone ops") {
    val d = Seq(
      (1L, "s0", "the cat and the dog are here with the other ones"),
      (2L, "s0", "the cat and the dog are here with the other ones"), // exact dup
      (3L, "s0", "der hund und die katze sind auch noch da"),
      (4L, "s1", "the mail is a.b@example.com and that is the address")
    ).toDF("doc_id", "source", "text")
    val cfg = loadString(
      """pipeline:
        |  stages:
        |    - kind: exact_dedup
        |    - kind: lang_filter
        |      keep: en
        |    - kind: pii_redact
        |""".stripMargin)
    val out = CurationPipeline.run(d, cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    // dup 2 dropped, German 3 dropped, email in 4 redacted, 1 intact
    assert(out.keySet == Set(1L, 4L))
    assert(out(4L) == "the mail is <EMAIL> and that is the address")
    assert(out(1L) == "the cat and the dog are here with the other ones")
    // shape preserved by intermediate stages
    assert(CurationPipeline.run(d, cfg).columns.toSeq ==
      Seq("doc_id", "source", "text"))
  }

  test("boilerplate_drop stage rewrites text through the line filter") {
    val d = Seq(
      (1L, "s0", "MENU\nreal content one"),
      (2L, "s0", "MENU\nreal content two"),
      (3L, "s0", "MENU\nreal content three")
    ).toDF("doc_id", "source", "text")
    val cfg = loadString(
      """pipeline:
        |  stages:
        |    - kind: boilerplate_drop
        |      min_docs: 3
        |""".stripMargin)
    val out = CurationPipeline.run(d, cfg)
      .select("doc_id", "text").as[(Long, String)].collect().toMap
    assert(out(1L) == "real content one" && out(3L) == "real content three")
  }

  test("hash_sample and split_assign stages match the standalone samplers") {
    val d = (1L to 500L).map(i => (i, s"s${i % 2}", s"text $i"))
      .toDF("doc_id", "source", "text")
    val cfg = loadString(
      """pipeline:
        |  stages:
        |    - kind: hash_sample
        |      pct: 20
        |    - kind: split_assign
        |      splits: train:80, val:10, test:10
        |""".stripMargin)
    val out = CurationPipeline.run(d, cfg)
    assert(out.columns.toSeq == Seq("doc_id", "source", "text", "split"))
    val got = out.select("doc_id", "split").as[(Long, String)].collect().toMap
    val wantIds = Sampling.bernoulliByHash(d, col("doc_id"), 20)
      .select("doc_id").as[Long].collect().toSet
    assert(got.keySet == wantIds && got.nonEmpty)
    // the sampled docs inherit the production split: pct-20 is a
    // bucket prefix of the train cut
    assert(got.values.forall(_ == "train"))
  }

  test("idiomatic YAML lists parse as name lists, not stringified garbage") {
    val d = Seq(
      (1L, "s0", "the cat and the dog are here with the other ones"),
      (2L, "s0", "der hund und die katze sind auch noch da")
    ).toDF("doc_id", "source", "text")
    val cfg = loadString(
      """pipeline:
        |  stages:
        |    - kind: lang_filter
        |      keep: [en, de]
        |""".stripMargin)
    // both languages kept — a toString'd list would yield '[en'/'de]'
    // and silently filter everything
    assert(CurationPipeline.run(d, cfg).count() == 2)
    val cfg2 = loadString(
      """pipeline:
        |  stages:
        |    - kind: split_assign
        |      splits: [ "train:80", "val:10", "test:10" ]
        |""".stripMargin)
    assert(CurationPipeline.run(d, cfg2).columns.contains("split"))
  }

  test("config errors fail at load with the stage named") {
    def err(yaml: String): String =
      intercept[PipelineConfigError](loadString(yaml)).getMessage
    assert(err("pipeline:\n  stages:\n    - kind: no_such_stage\n")
      .contains("unknown stage kind 'no_such_stage'"))
    assert(err(
      """pipeline:
        |  stages:
        |    - kind: token_budget
        |      budget_tokens: 10
        |      strata: source
        |    - kind: exact_dedup
        |""".stripMargin).contains("must be the final stage"))
    assert(err("pipeline:\n  stages:\n    - kind: quality_gate\n")
      .contains("missing 'min_quality'"))
    assert(err("pipeline:\n  stages: []\n").contains("non-empty"))
    assert(err(
      """pipeline:
        |  stages:
        |    - kind: split_assign
        |      splits: train:80, val:20
        |    - kind: exact_dedup
        |""".stripMargin).contains("must be the final stage"))
    assert(err(
      """pipeline:
        |  stages:
        |    - kind: split_assign
        |      splits: train-80
        |""".stripMargin).contains("not name:pct"))
    assert(err("nothing: here\n").contains("pipeline"))
    assert(err(
      """pipeline:
        |  stages:
        |    - kind: near_dup_drop
        |      max_hamming: lots
        |""".stripMargin).contains("not a number"))
    // a present-but-null value is a MISSING field, never a bare NPE
    assert(err("pipeline:\n  stages:\n    - kind: quality_gate\n      min_quality:\n")
      .contains("missing 'min_quality'"))
  }
}
