package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class OpsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the cat sat on the mat"),
    (2L, "the cat sat on the mat"),            // exact dup of 1
    (3L, "the cat sat on the big mat"),        // near dup
    (4L, "der hund und die katze ist da"),     // German-ish
    (5L, "el perro y la casa es de los gatos") // Spanish-ish
  ).toDF("doc_id", "text")

  test("hash sampling: deterministic, rate-bounded, stratified-k exact") {
    val d = (1L to 2000L).map(i => (i, s"lang${i % 4}")).toDF("doc_id", "lang")
    val s1 = Sampling.bernoulliByHash(d, col("doc_id"), 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val s2 = Sampling.bernoulliByHash(d, col("doc_id"), 20)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1 == s2) // deterministic: same rows every run
    // 20% of 2000 with hash scatter: a generous band, not a coin flip
    assert(s1.size > 300 && s1.size < 500, s"got ${s1.size}")
    // membership is stable under appends: the sample of a subset is
    // the subset of the sample
    val subset = Sampling.bernoulliByHash(d.where(col("doc_id") <= 1000), col("doc_id"), 20)
      .select("doc_id").as[Long].collect().toSet
    assert(subset == s1.filter(_ <= 1000L).toSet)
    assert(Sampling.bernoulliByHash(d, col("doc_id"), 0).count() == 0)
    assert(Sampling.bernoulliByHash(d, col("doc_id"), 100).count() == 2000)

    val strat = Sampling.stratifiedTopK(d, Seq("lang"), col("doc_id"), 7)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(strat.size == 4 && strat.values.forall(_ == 7L))
    // a stratum smaller than k yields the whole stratum
    val tiny = Sampling.stratifiedTopK(d.where(col("doc_id") <= 2), Seq("lang"),
      col("doc_id"), 7)
    assert(tiny.count() == 2)
  }

  test("capPerGroup: keeps the k best per stratum, deterministic tie cut, rank annotated") {
    val d = Seq(
      // srcA: scores force order 3, 1, 2; k=2 drops doc 2
      (1L, "srcA", 0.7), (2L, "srcA", 0.3), (3L, "srcA", 0.9),
      // srcB: an exact tie at 0.5 — the LOWER doc_id survives the cut
      (4L, "srcB", 0.5), (5L, "srcB", 0.5), (6L, "srcB", 0.5),
      // srcC smaller than k: kept whole
      (7L, "srcC", 0.1)).toDF("doc_id", "source", "score")
    val out = Sampling.capPerGroup(d, Seq("source"), col("score"),
        col("doc_id"), k = 2)
      .select("source", "doc_id", "cap_rank")
      .as[(String, Long, Int)].collect().toSet
    assert(out == Set(
      ("srcA", 3L, 1), ("srcA", 1L, 2),
      ("srcB", 4L, 1), ("srcB", 5L, 2),
      ("srcC", 7L, 1)), s"got $out")
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(d, Seq(), col("score"), col("doc_id"), 2)
    }
    intercept[IllegalArgumentException] {
      Sampling.capPerGroup(d, Seq("source"), col("score"), col("doc_id"), 0)
    }
  }

  test("split assign: total partition, bernoulli-consistent, guards") {
    val d = (1L to 2000L).map(i => (i, s"lang${i % 4}")).toDF("doc_id", "lang")
    val splits = Seq(("train", 80), ("val", 10), ("test", 10))
    val assigned = Sampling.splitAssign(d, col("doc_id"), splits)
    // total partition: every row labeled, rough proportions hold
    val byName = assigned.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byName.keySet == Set("train", "val", "test"))
    assert(byName.values.sum == 2000L)
    assert(byName("train") > 1400 && byName("train") < 1800, s"got $byName")
    // the SAME hash space as bernoulliByHash: a pct-20 sample is a
    // bucket prefix, so it must land entirely inside 'train' (cut 80)
    val sampleIds = Sampling.bernoulliByHash(d, col("doc_id"), 20)
      .select("doc_id").as[Long].collect().toSet
    val trainIds = assigned.where(col("split") === "train")
      .select("doc_id").as[Long].collect().toSet
    assert(sampleIds.subsetOf(trainIds))
    // deterministic across runs
    val again = Sampling.splitAssign(d, col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(assigned.select("doc_id", "split").as[(Long, String)]
      .collect().toMap == again)
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(d, col("doc_id"), Seq(("a", 50), ("b", 40)))
    }
    intercept[IllegalArgumentException] {
      Sampling.splitAssign(d, col("doc_id"), Seq.empty)
    }
  }

  test("p81: split by component is family-ATOMIC — a pair in the dup graph can never straddle splits") {
    // a planted dup graph whose families would be split apart by the
    // per-document hash: chains {1,2,3}, {10,11}, and singletons
    val docs = (1L to 200L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val comp = ConnectedComponents.connectedComponents(edges)
    val splits = Seq(("train", 80), ("val", 10), ("test", 10))
    val byFam = Sampling.splitAssignByComponent(docs, comp, splits)
      .select("doc_id", "family", "split").as[(Long, Long, String)]
      .collect()
    // total partition survives the re-keying
    assert(byFam.length == 200 && byFam.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    val byId = byFam.map(r => r._1 -> r).toMap
    // family label = component min id; singletons are their own family
    assert(Seq(1L, 2L, 3L).map(byId(_)._2).toSet == Set(1L))
    assert(Seq(10L, 11L).map(byId(_)._2).toSet == Set(10L))
    assert(byId(50L)._2 == 50L)
    // the INVARIANT: every edge's endpoints share a split — and the
    // family split equals splitAssign of the family key, so a family
    // lands exactly where a single doc with that id would
    Seq((1L, 2L), (2L, 3L), (10L, 11L)).foreach { case (a, b) =>
      assert(byId(a)._3 == byId(b)._3, s"pair ($a,$b) straddles splits")
    }
    val famKeyed = Sampling.splitAssign(
        docs.where(col("doc_id").isin(1L, 10L, 50L)), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(byId(3L)._3 == famKeyed(1L) && byId(11L)._3 == famKeyed(10L) &&
      byId(50L)._3 == famKeyed(50L))
  }

  test("a17: Kish ESS — equal weights give exactly n; a dominant weight collapses toward 1; zero mass gates NULL") {
    // equal weights: (n·w)²/(n·w²) = n exactly (double-exact here)
    val eq = (1L to 100L).map(i => (i, "g", 7L)).toDF("doc_id", "g", "w")
    val e1 = Sampling.effectiveSampleSize(eq, Seq("g"), col("w")).collect().head
    assert(e1.getAs[Long]("n_rows") == 100L && e1.getAs[Long]("sum_w") == 700L)
    assert(e1.getAs[Double]("ess") == 100.0)
    // one overwhelming weight: ESS ~ 1 despite n = 101
    val dom = ((1L to 100L).map(i => (i, "g", 1L)) :+ ((999L, "g", 1000000L)))
      .toDF("doc_id", "g", "w")
    val e2 = Sampling.effectiveSampleSize(dom, Seq("g"), col("w")).collect().head
    assert(e2.getAs[Double]("ess") < 1.01,
      s"dominant weight must collapse ESS toward 1: ${e2.getAs[Double]("ess")}")
    // all-zero weight mass: NULL, not a division error
    val zs = (1L to 5L).map(i => (i, "g", 0L)).toDF("doc_id", "g", "w")
    val e3 = Sampling.effectiveSampleSize(zs, Seq("g"), col("w")).collect().head
    assert(e3.isNullAt(e3.fieldIndex("ess")))
    // weight mass past the 9e7 one-division envelope fails LOUD
    // instead of silently losing mantissa ulps
    val over = Seq((1L, "g", 91000000L)).toDF("doc_id", "g", "w")
    val err = intercept[Exception] {
      Sampling.effectiveSampleSize(over, Seq("g"), col("w")).collect()
    }
    assert(err.getMessage.contains("one-division envelope"))
    // negative weight mass fails LOUD per row (round 13): ESS is
    // undefined for negative mass and a negative sum would bypass the
    // one-sided envelope guard above
    val neg = Seq((1L, "g", 5L), (2L, "g", -3L)).toDF("doc_id", "g", "w")
    val errNeg = intercept[Exception] {
      Sampling.effectiveSampleSize(neg, Seq("g"), col("w")).collect()
    }
    assert(errNeg.getMessage.contains("weight must be >= 0"))
  }

  test("weighted sampling: exact k, deterministic, scale-invariant, weight-sensitive") {
    val d = (1L to 2000L).map(i => (i, s"lang${i % 4}", (i % 50) + 1L))
      .toDF("doc_id", "lang", "w")
    val s1 = Sampling.weightedTopK(d, Seq("lang"), col("w"), k = 10,
      key = col("doc_id"))
    val got = s1.groupBy("lang").count().as[(String, Long)].collect().toMap
    assert(got.size == 4 && got.values.forall(_ == 10L))
    // deterministic across runs
    val ids1 = s1.select("doc_id").as[Long].collect().toSet
    assert(Sampling.weightedTopK(d, Seq("lang"), col("w"), k = 10,
      key = col("doc_id")).select("doc_id").as[Long].collect().toSet == ids1)
    // ln(u)/w ranking is invariant under uniform weight scaling — the
    // mixture knob moves RELATIVE weights only
    val scaled = Sampling.weightedTopK(d, Seq("lang"),
      col("w") * lit(1000L), k = 10, key = col("doc_id"))
      .select("doc_id").as[Long].collect().toSet
    assert(scaled == ids1)
    // an overwhelming weight wins its stratum's draw
    val heavy = d.withColumn("w",
      when(col("doc_id") === 7L, lit(1000000000000L)).otherwise(lit(1L)))
    assert(Sampling.weightedTopK(heavy, Seq("lang"), col("w"), k = 10,
      key = col("doc_id")).where(col("doc_id") === 7L).count() == 1)
    // a stratum smaller than k survives whole
    assert(Sampling.weightedTopK(d.where(col("doc_id") <= 2), Seq("lang"),
      col("w"), k = 10, key = col("doc_id")).count() == 2)
    // a non-positive weight fails loudly instead of winning (negative
    // flips ln(u)/w positive) or silently losing (zero -> -Infinity)
    val bad = d.withColumn("w",
      when(col("doc_id") === 5L, lit(-1L)).otherwise(col("w")))
    val e = intercept[Exception] {
      Sampling.weightedTopK(bad, Seq("lang"), col("w"), k = 10,
        key = col("doc_id")).count()
    }
    assert(e.getMessage.contains("weight must be > 0"))
  }

  test("standardize: hand-checked z, constant and singleton groups gate to null") {
    val d = Seq(
      ("a", 1.0), ("a", 2.0), ("a", 3.0), // mu 2, sigma 1 -> z -1, 0, 1
      ("b", 5.0), ("b", 5.0),             // sigma 0 -> null
      ("c", 7.0)                          // singleton: sigma null -> null
    ).toDF("g", "v")
    val out = Profiling.standardize(d, Seq("g"), "v")
      .select("g", "v", "z").as[(String, Double, Option[Double])]
      .collect().toSet
    assert(out == Set(
      ("a", 1.0, Some(-1.0)), ("a", 2.0, Some(0.0)), ("a", 3.0, Some(1.0)),
      ("b", 5.0, None), ("b", 5.0, None), ("c", 7.0, None)))
  }

  test("winsorize: clips to the group band, interior values untouched") {
    val d = (Seq(-100.0) ++ (1 to 99).map(_.toDouble) ++ Seq(1000.0))
      .map(("g", _)).toDF("g", "v")
    val out = Profiling.winsorize(d, Seq("g"), "v", pLo = 0.05, pHi = 0.95)
      .select("v", "v_clipped").as[(Double, Double)].collect().toMap
    // extremes clip onto the band edges; interior points are identical
    assert(out(-100.0) > -100.0 && out(-100.0) <= 6.0)
    assert(out(1000.0) < 1000.0 && out(1000.0) >= 94.0)
    assert(out(50.0) == 50.0 && out(10.0) == 10.0 && out(90.0) == 90.0)
    intercept[IllegalArgumentException] {
      Profiling.winsorize(d, Seq("g"), "v", pLo = 0.9, pHi = 0.1)
    }
  }

  test("reshard: dense per-shard positions, deterministic, lossless") {
    val d = (1L to 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val sharded = Sampling.shardByHash(d, col("doc_id"), 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(sharded.length == 1000) // lossless: one output row per input
    assert(sharded.map(_._1).toSet == (1L to 1000L).toSet)
    assert(sharded.forall { case (_, s, _) => s >= 0 && s < 8 })
    // positions are dense 1..n within every shard — the training read
    // order has no gaps and no collisions
    sharded.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length))
    }
    // deterministic: identical assignment on a re-run
    val again = Sampling.shardByHash(d, col("doc_id"), 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(sharded.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    // nShards=1 degenerates to a single global order
    val one = Sampling.shardByHash(d, col("doc_id"), 1)
    assert(one.where(col("shard") =!= 0).count() == 0)
    assert(one.agg(max(col("pos"))).head.getInt(0) == 1000)
  }

  test("boilerplate lines: planted template dropped per-source, order kept") {
    val corpus = Seq(
      // src0: three docs share header/footer template lines
      (1L, "src0", "MENU\nunique alpha text\nCOPYRIGHT"),
      (2L, "src0", "MENU\nunique beta text\nCOPYRIGHT"),
      (3L, "src0", "MENU\nunique gamma text\nCOPYRIGHT"),
      // src1: same MENU line but only ONE doc in this source has it —
      // thresholds are per-source, so here it survives
      (4L, "src1", "MENU\nsolo delta text"),
      // src0: a doc that is ONLY template lines drops to empty
      (5L, "src0", "MENU\nCOPYRIGHT")
    ).toDF("doc_id", "source", "text")
    val out = TextStats.dropBoilerplateLines(corpus, minDocs = 2)
      .select("doc_id", "text_clean", "n_kept", "n_dropped")
      .as[(Long, String, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(out.size == 5) // every input doc present, including all-dropped
    assert(out(1L) == ((1L, "unique alpha text", 1L, 2L)))
    assert(out(2L) == ((2L, "unique beta text", 1L, 2L)))
    assert(out(3L) == ((3L, "unique gamma text", 1L, 2L)))
    assert(out(4L) == ((4L, "MENU\nsolo delta text", 2L, 0L))) // per-source
    assert(out(5L) == ((5L, "", 0L, 2L)))
    // multi-line survivors keep original line order
    val ordered = TextStats.dropBoilerplateLines(
      Seq((6L, "s", "z last\na first\nm mid"),
        (7L, "s", "other\ndoc")).toDF("doc_id", "source", "text"),
      minDocs = 2)
      .where(col("doc_id") === 6L).select("text_clean").as[String].head()
    assert(ordered == "z last\na first\nm mid")
    intercept[IllegalArgumentException] {
      TextStats.dropBoilerplateLines(corpus, minDocs = 1)
    }
  }

  test("tfidf top terms: distinctive terms outrank ubiquitous ones") {
    val corpus = Seq(
      (1L, "apple banana apple"),
      (2L, "banana cherry"),
      (3L, "banana banana banana")).toDF("doc_id", "text")
    val top = TextStats.topTermsTfidf(corpus, k = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("term")).toMap
    // banana appears in every doc -> idf = ln(1) = 0, never the top
    // term where any alternative exists
    assert(top(1L) == "apple")  // tf=2, df=1
    assert(top(2L) == "cherry") // tf=1, df=1 beats banana's zero idf
    assert(top(3L) == "banana") // only term present, tfidf 0 still ranks
    val all = TextStats.topTermsTfidf(corpus, k = 5)
    assert(all.count() == 2 + 2 + 1) // no invented rows beyond the vocabulary
  }

  test("chunking: window boundaries, remainders, and degenerate lengths") {
    val d = Seq(
      (1L, "abcdefghij"), // len 10
      (2L, "abcde"),      // len == size
      (3L, "abcdef"),     // len == size + 1 -> second chunk is remainder
      (4L, "")            // empty -> one empty chunk
    ).toDF("doc_id", "text")
    val chunks = TextStats.chunkText(d, size = 5, stride = 3).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getString(2)).toMap
    // doc 1: k = ceil((10-5)/3)+1 = 3 chunks at offsets 0,3,6
    assert(chunks((1L, 0L)) == "abcde")
    assert(chunks((1L, 1L)) == "defgh")
    assert(chunks((1L, 2L)) == "ghij") // remainder, shorter than size
    assert(chunks((2L, 0L)) == "abcde" && !chunks.contains((2L, 1L)))
    assert(chunks((3L, 0L)) == "abcde" && chunks((3L, 1L)) == "def")
    assert(chunks((4L, 0L)) == "")
    // every character position is covered by at least one chunk
    val covered = chunks.collect { case ((1L, i), c) => (i * 3, i * 3 + c.length) }
    assert(covered.exists(_._1 == 0) && covered.map(_._2).max == 10)
  }

  test("sequence packing: exact fill, remainder tail, boundary-spanning docs") {
    // shard A token stream: 3 + 4 + 6 = 13 tokens into L=5 sequences
    // -> seqs of 5, 5, 3; doc 2 spans the 0/1 cut, doc 3 spans 1/2
    val d = Seq(
      ("A", 1L, "t t t"),
      ("A", 2L, "t t t t"),
      ("A", 3L, "t t t t t t"),
      ("A", 4L, "   "),        // zero tokens: occupies no sequence
      ("B", 5L, "t t")).toDF("lang", "doc_id", "text")
    val packed = TextStats.packSequences(d, seqLen = 5, Seq("lang"), "doc_id")
    val rows = packed.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)) -> r.getLong(3)).toMap
    assert(rows == Map(
      ("A", 0L, 1L) -> 3L, ("A", 0L, 2L) -> 2L,   // seq 0: full
      ("A", 1L, 2L) -> 2L, ("A", 1L, 3L) -> 3L,   // seq 1: full
      ("A", 2L, 3L) -> 3L,                        // seq 2: remainder
      ("B", 0L, 5L) -> 2L))
    // invariants: no sequence overfills; token mass is conserved
    val perSeq = packed.groupBy("lang", "seq_id")
      .agg(sum("tokens_in_seq").as("fill")).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(perSeq.values.forall(_ <= 5L))
    assert(perSeq.values.sum == 13L + 2L)
  }

  test("p87 pagerank: hand-computed damped iterations; dangling nodes shed mass; no-in-link nodes settle at teleport") {
    val nodes = Seq(1L, 2L, 3L).toDF("doc_id")
    // 2 -> 1, 3 -> 1, 3 -> 2; node 1 is dangling (sheds its mass)
    val edges = Seq((2L, 1L), (3L, 1L), (3L, 2L)).toDF("src", "dst")
    val r1 = PageRank.pageRank(nodes, edges, iters = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // iter 1 off uniform 1e6: c(1) = 1e6/1 + 1e6/2 = 15e5 ->
    // 150000 + 85*15e5 DIV 100 = 1425000; c(2) = 5e5 -> 575000;
    // node 3 has no in-links -> teleport only
    assert(r1(1L).getAs[Long]("pr_micro") == 1425000L)
    assert(r1(2L).getAs[Long]("pr_micro") == 575000L)
    assert(r1(3L).getAs[Long]("pr_micro") == 150000L)
    assert(r1(1L).getAs[Long]("n_out") == 0 && r1(1L).getAs[Long]("n_in") == 2)
    assert(r1(3L).getAs[Long]("n_out") == 2 && r1(3L).getAs[Long]("n_in") == 0)
    val r2 = PageRank.pageRank(nodes, edges, iters = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // iter 2: c(1) = 575000 + 150000/2 = 650000 -> 150000 + 552500;
    // c(2) = 150000/2 = 75000 -> 150000 + 63750
    assert(r2(1L).getAs[Long]("pr_micro") == 702500L)
    assert(r2(2L).getAs[Long]("pr_micro") == 213750L)
    assert(r2(3L).getAs[Long]("pr_micro") == 150000L)
  }

  test("p87 pagerank: plan depth is CONSTANT in the iteration count (per-round lineage cut)") {
    // without the per-round localCheckpoint the optimized plan nests
    // one join+agg layer per iteration and analysis cost grows
    // quadratically — a user raising iters toward convergence (10-20)
    // must not hit that cliff, so the plan size must not see iters
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("doc_id")
    val edges = Seq((2L, 1L), (3L, 1L), (3L, 2L), (4L, 3L)).toDF("src", "dst")
    def planNodes(iters: Int): Int =
      PageRank.pageRank(nodes, edges, iters).queryExecution.optimizedPlan
        .collect { case p => p }.size
    val depth2 = planNodes(2)
    val depth12 = planNodes(12)
    assert(depth2 == depth12,
      s"plan grew with iterations: $depth2 nodes at iters=2, $depth12 at iters=12")
    // and the deeper run still computes: every node carries a rank
    val r = PageRank.pageRank(nodes, edges, iters = 12).collect()
    assert(r.length == 4 && r.forall(_.getAs[Long]("pr_micro") >= 150000L))
  }

  test("p87 pagerank: superseded round tables are RECLAIMED, not GC-deferred (block-manager footprint)") {
    // Dataset.unpersist is a no-op after localCheckpoint(true) (the
    // blocks live on the internal RDD, outside the CacheManager), so
    // the loop must drop the RDD itself — otherwise every round's rank
    // table pins blocks for the JVM lifetime. Pin via the persistent-
    // RDD registry: across a whole 8-iteration run only the FINAL rank
    // table may remain registered (plus nothing from e/spine/superseded
    // rounds), i.e. a delta of 1, not iters+3.
    val sc = spark.sparkContext
    val nodes = (1L to 40L).toDF("doc_id")
    val edges = (2L to 40L).map(i => (i, i - 1L)).toDF("src", "dst")
    val before = sc.getPersistentRDDs.keySet
    val out = PageRank.pageRank(nodes, edges, iters = 8)
    val after = sc.getPersistentRDDs.keySet
    val leaked = (after -- before).size
    assert(leaked <= 1,
      s"pageRank left $leaked persisted RDDs registered (expected <= 1: the final rank table)")
    // and the surviving checkpoint still computes
    assert(out.count() == 40L)
  }

  test("connected components: chains propagate, components stay separate") {
    // 1-2-3-4-5 is a diameter-4 chain (min label must hop 4 times),
    // {10,11,12} a triangle, {20} a self-loop
    val edges = Seq((2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L),
      (10L, 11L), (11L, 12L), (10L, 12L), (20L, 20L)).toDF("id_a", "id_b")
    val cc = ConnectedComponents.connectedComponents(edges).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((1L to 5L).forall(cc(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(cc(_) == 10L))
    assert(cc(20L) == 20L)
    assert(cc.size == 9)
    // a too-small propagation budget no longer throws or returns
    // partial labels: the call auto-routes to star contraction and
    // still lands the exact answer
    val routed = ConnectedComponents.connectedComponents(edges, maxIter = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(routed == cc)
  }

  test("blocked near-dup: subset of exact pairs; near-zero angles always survive") {
    val rng = new scala.util.Random(9)
    def vecClose(b: Array[Double]) = b.map(_ + (rng.nextDouble() - 0.5) * 0.01).toSeq
    val bases = (0 until 5).map(_ => Array.fill(16)(rng.nextDouble() - 0.5))
    // 3 tight copies of each base (angle ~0) + lone noise vectors
    val rows = bases.zipWithIndex.flatMap { case (bs, gi) =>
      (0 until 3).map(j => (gi * 10L + j, vecClose(bs)))
    } ++ (100L to 119L).map(i => (i, Array.fill(16)(rng.nextDouble() - 0.5).toSeq))
    val emb = rows.toDF("vec_id", "embedding")
    val exact = Similarity.cosineDupPairs(emb, tau = 0.9)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val blocked = Similarity.cosineDupPairsBlocked(emb, tau = 0.9, planes = 4, bands = 3)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(blocked.subsetOf(exact)) // blocking never invents pairs
    // each tight triple's 3 pairs sit at ~0 angle: sign patterns agree
    // on every plane, so every band co-buckets them — full recall
    val tight = bases.indices.flatMap { gi =>
      Seq((gi * 10L, gi * 10L + 1), (gi * 10L, gi * 10L + 2), (gi * 10L + 1, gi * 10L + 2))
    }.toSet
    assert(tight.subsetOf(exact))
    assert(tight.subsetOf(blocked))
  }

  test("int8 quantization: scale, codes, zero vectors, error bound") {
    val emb = Seq(
      (1L, Seq(1.27, -1.27, 0.635, 0.0)), // exact grid: zero error
      (2L, Seq(0.0, 0.0, 0.0)),           // zero vector -> scale 0, codes 0
      (3L, Seq(0.1, 0.2, -0.05))).toDF("vec_id", "embedding")
    val out = Similarity.quantizeInt8(emb).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2), r.getDouble(3)))).toMap
    val (s1, q1, m1) = out(1L)
    assert(math.abs(s1 - 0.01) < 1e-12) // 1.27/127
    assert(q1 == 127L - 127L + 64L + 0L) // codes 127,-127,64(round .5 away),0
    // only 0.635 has a residual: (0.635 - 64*0.01)^2 / 4 = 6.25e-6
    assert(math.abs(m1 - 6.25e-6) < 1e-12)
    val (s2, q2, m2) = out(2L)
    assert(s2 == 0.0 && q2 == 0L && m2 == 0.0)
    // per-component reconstruction error is bounded by (scale/2)^2
    val (s3, _, m3) = out(3L)
    assert(m3 <= s3 * s3 / 4.0 + 1e-15)
  }

  test("normalized dedup collapses case/punctuation/whitespace variants only") {
    val variants = docs.unionByName(Seq(
      (11L, "THE CAT sat on the mat!!!"),   // case+punct variant of 1/2
      (14L, "der hund,  und die katze; ist da") // punct+spacing variant of 4
    ).toDF("doc_id", "text"))
    val groups = Dedup.normalizedDupGroups(variants).collect()
      .map(r => r.getAs[Long]("keep_id") -> r.getAs[Long]("n_copies")).toMap
    // 1,2,11 collapse (keep 1); 4,14 collapse (keep 4); 3 and 5 stay unique
    assert(groups == Map(1L -> 3L, 4L -> 2L))
  }

  test("salted join returns exactly the plain join's rows on skewed keys") {
    val big = (1 to 2000).map(i => (if (i % 10 < 7) 0L else i % 13L, i.toLong))
      .toDF("k", "payload")
    val small = Seq((0L, "hot"), (3L, "a"), (7L, "b"), (99L, "absent")).toDF("k", "label")
    val plain = big.join(small, Seq("k")).groupBy("k", "label")
      .agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val salted = SkewJoin.saltedJoin(big, small, Seq("k"), factor = 5)
      .groupBy("k", "label").agg(count(lit(1)).as("n"), sum("payload").as("s"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    assert(salted == plain)
    assert(plain.exists(_._1 == 0L)) // the hot key is actually exercised
  }

  test("custom expressions are SQL-callable via GraftExtensions") {
    val r = spark.sql(
      """SELECT graft_erf(1.0) AS e,
        |       graft_md5_hex64('abc') AS h,
        |       graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       graft_tdist_p2(0.0, 10.0) AS t0,
        |       graft_tdist_p2(2.228, 10.0) AS t1""".stripMargin).head()
    assert(math.abs(r.getAs[Double]("e") - 0.8427007929) < 2e-7)
    assert(r.getAs[Long]("h") ==
      java.lang.Long.parseLong("900150983cd24fb".take(15), 16))
    assert(r.getAs[Double]("d") == 11.0)
    assert(r.getAs[Double]("t0") == 1.0) // t=0 is the distribution median
    // 2.228 is the classic t_{0.025, df=10} critical value
    assert(math.abs(r.getAs[Double]("t1") - 0.05) < 1e-4)
  }

  test("NFC normalization composes canonical equivalents; unicodeDupGroups collapses them") {
    // precomposed U+00E9 vs decomposed e + U+0301: byte-different,
    // canonically equivalent — NFC must map both to identical strings
    // (and leave ASCII untouched on the allocation-free fast path)
    val r = spark.sql(
      """SELECT graft_nfc_normalize('caf\u00e9') AS a,
        |       graft_nfc_normalize('cafe\u0301') AS b,
        |       graft_nfc_normalize('plain ascii') AS c""".stripMargin).head()
    assert(r.getAs[String]("a") == r.getAs[String]("b"))
    assert(r.getAs[String]("a") == "caf\u00e9")
    assert(r.getAs[String]("c") == "plain ascii")

    val docs = Seq(
      (1L, "caf\u00e9 society"), (2L, "cafe\u0301 society"), // NFC dups
      (3L, "cafe society")                                   // NOT equivalent
    ).toDF("doc_id", "text")
    val groups = Dedup.unicodeDupGroups(docs).collect()
    assert(groups.length == 1)
    assert(groups.head.getAs[Long]("n_copies") == 2L)
    assert(groups.head.getAs[Long]("keep_id") == 1L)
  }

  test("md5 hex64 expression equals the hex-string route bit-for-bit") {
    // Hashing.hex64 is the codegen digest-bytes->long expression; the
    // oracle computes ('0x' || substr(md5(x),1,15))::BIGINT. Pin the
    // Spark-side equivalence against conv(substring(md5)) on ASCII,
    // unicode, empty, and long inputs.
    val strs = Seq("", "a", "the cat", "ümläut π中文", "x" * 10000,
      "0", " leading", "trailing ").toDF("s")
    val got = strs.select(
      Hashing.hex64(col("s")).as("fast"),
      conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long").as("ref")).collect()
    got.foreach(r => assert(r.getLong(0) == r.getLong(1)))
  }

  test("exact dedup groups duplicates and keeps lowest id") {
    val got = Dedup.exactDupGroups(docs).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("n_copies") == 2)
    assert(got(0).getAs[Long]("keep_id") == 1L)
  }

  test("p84 paragraph dedup: global first-occurrence-wins, within-doc repeats dedup, reassembly keeps order") {
    val corpus = Seq(
      (1L, "alpha\n\nbeta\n\nalpha"),  // within-doc repeat of 'alpha'
      (2L, "beta\n\ngamma"),           // 'beta' already owned by doc 1
      (3L, "alpha\n\nbeta")            // full copy: keeps nothing
    ).toDF("doc_id", "text")
    val out = Dedup.paragraphDedup(corpus).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[Long]("n_paras") == 3)
    assert(out(1L).getAs[Long]("n_kept") == 2)
    assert(out(1L).getAs[String]("kept_text") == "alpha\n\nbeta",
      "order preserved, second 'alpha' dropped")
    assert(out(1L).getAs[Long]("kept_chars") == 9)
    assert(out(2L).getAs[Long]("n_kept") == 1 &&
      out(2L).getAs[String]("kept_text") == "gamma",
      "'beta' keeper sits at (1, 2)")
    assert(out(3L).getAs[Long]("n_paras") == 2 &&
      out(3L).getAs[Long]("n_kept") == 0 &&
      out(3L).getAs[String]("kept_text") == "",
      "a doc whose every paragraph is owned elsewhere keeps nothing")
  }

  test("prefix-filtered jaccard equals the full inverted index exactly") {
    // random short texts over a tiny alphabet produce heavy shingle
    // collisions AND many sub-threshold pairs — the prefix filter must
    // reproduce the full plan's output exactly (no lost pair, no extra)
    val rng = new scala.util.Random(42)
    val corpus = (1L to 60L).map { i =>
      (i, (1 to 12 + rng.nextInt(20)).map(_ => "ab".charAt(rng.nextInt(2))).mkString)
    }.toDF("doc_id", "text")
    for (tau <- Seq(0.3, 0.5, 0.8)) {
      def canon(df: org.apache.spark.sql.DataFrame) = df
        .select("id_a", "id_b", "shared", "sz_a", "sz_b")
        .collect().map(_.toSeq).toSet
      val full = canon(Dedup.ngramJaccardPairsFull(corpus, n = 3, tau))
      val pref = canon(Dedup.ngramJaccardPairsPrefix(corpus, n = 3, tau))
      assert(pref == full, s"tau=$tau: prefix filter diverged from full index")
      assert(full.nonEmpty, s"tau=$tau: fixture produced no pairs — test is vacuous")
    }
  }

  test("ngram jaccard: identical docs have jaccard 1, near-dups high") {
    val pairs = Dedup.ngramJaccardPairs(docs, n = 4, tau = 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs((1L, 3L)) > 0.3 && pairs((1L, 3L)) < 1.0)
    assert(!pairs.contains((4L, 5L)))
  }

  test("minhash: exact dups estimated 1.0; candidates include near-dups") {
    val got = Dedup.minhashDupPairs(docs, n = 4, numHashes = 16,
      rowsPerBand = 4, tau = 0.3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Double]("est_jaccard")).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got.contains((1L, 3L))) // near-dup shares at least one band
  }

  test("simhash: identical docs hamming 0; unrelated docs not paired") {
    val got = Dedup.simhashPairs(docs, maxHamming = 3)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.getAs[Long]("hamming")).toMap
    assert(got((1L, 2L)) == 0L)
    assert(!got.contains((4L, 5L)))
  }

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(2.0f, 0.0f, 0.0f)),   // parallel to 1
    (3L, Array(0.0f, 1.0f, 0.0f)),   // orthogonal to 1
    (4L, Array(-1.0f, 0.0f, 0.0f)),  // opposite to 1
    (5L, Array(1.0f, 0.1f, 0.0f))    // near 1
  ).toDF("vec_id", "embedding")

  test("cosine top-k: exact ranking with deterministic tie-break") {
    val got = Similarity.cosineTopK(vecs, k = 2)
      .where($"query_id" === 1L).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 5L))
    assert(math.abs(got(0).getAs[Double]("cosine") - 1.0) < 1e-12)
  }

  test("lsh cosine top-k: parallel vectors share a bucket, found at rank 1") {
    val got = Similarity.lshCosineTopK(vecs, k = 1, planes = 4)
      .where($"query_id" === 1L).collect()
    assert(got.length == 1)
    assert(got(0).getAs[Long]("neighbor_id") == 2L) // identical direction
    assert(math.abs(got(0).getAs[Double]("cosine") - 1.0) < 1e-12)
  }

  test("ivf cosine top-k: probed cells contain the parallel vector; self excluded") {
    // nCentroids=2 -> centroids are vectors 1 and 2 (both +x): every
    // vector lands in one of two +x cells; nProbe=2 searches both, so
    // recall here equals the exact search.
    val got = Similarity.ivfCosineTopK(vecs, k = 2, nCentroids = 2, nProbe = 2)
      .where($"query_id" === 1L).orderBy("rank").collect()
    assert(got.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(2L, 5L))
    assert(math.abs(got(0).getAs[Double]("cosine") - 1.0) < 1e-12)
    // nProbe=1 searches a single cell: results come only from cells
    // (still rank-1 parallel neighbor for vector 1)
    val one = Similarity.ivfCosineTopK(vecs, k = 1, nCentroids = 2, nProbe = 1)
      .where($"query_id" === 1L).collect()
    assert(one.head.getAs[Long]("neighbor_id") == 2L)
  }

  test("p59 hard negatives: same-label neighbors excluded BEFORE ranking, never starved") {
    // 2D fan: 1 and 2 are near-parallel but share label 0 — the hard
    // negative for 1 must be 3 (nearest WRONG label), not a filtered
    // leftover of the unlabeled top-k
    val lv = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f), 0),
      (3L, Array(0.9f, 0.44f), 1),
      (4L, Array(0.0f, 1.0f), 1)).toDF("vec_id", "embedding", "label")
    // minid/1-cell: all vectors share one inverted list — recall exact
    val got = Similarity.ivfHardNegatives(lv, k = 1, nCentroids = 1,
        nProbe = 1, codebook = "minid")
      .collect().map(r => r.getAs[Long]("query_id") ->
        (r.getAs[Long]("neighbor_id"), r.getAs[Int]("query_label"),
          r.getAs[Int]("neighbor_label"))).toMap
    assert(got(1L)._1 == 3L, s"anchor 1's hard negative: ${got(1L)}")
    assert(got(3L)._1 == 2L, s"anchor 3's hard negative: ${got(3L)}")
    assert(got.values.forall(v => v._2 != v._3),
      s"a pair leaked matching labels: $got")
    intercept[IllegalArgumentException] {
      Similarity.ivfHardNegatives(lv, k = 0)
    }
  }

  test("similarity edge cases: empty table, null/empty vectors, string ids") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    assert(Similarity.lshCosineTopK(empty, k = 3).count() == 0)
    assert(Similarity.ivfCosineTopK(empty, k = 3).count() == 0)
    assert(Similarity.lshBucket(empty, planes = 4).count() == 0)

    // null and zero-length vectors are dropped, not bucketed together
    val mixed = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(1.0f, 0.1f)), (3L, Seq(-1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
      .unionByName(Seq((4L, null.asInstanceOf[Seq[Float]]), (5L, Seq.empty[Float]))
        .toDF("vec_id", "embedding"))
    val buckets = Similarity.lshBucket(mixed, planes = 4).collect()
    assert(buckets.map(_.getLong(0)).toSet == Set(1L, 2L, 3L))
    val topk = Similarity.lshCosineTopK(mixed, k = 2)
    assert(!topk.select("query_id").as[Long].collect().exists(q => q == 4L || q == 5L))

    // string ids flow through the IVF centroid literals
    val strIds = Seq(("a", Seq(1.0f, 0.0f)), ("b", Seq(0.9f, 0.1f)), ("c", Seq(0.0f, 1.0f)))
      .toDF("doc", "embedding")
    val ivf = Similarity.ivfCosineTopK(strIds, k = 2, nCentroids = 2, nProbe = 2,
      id = "doc").collect()
    assert(ivf.nonEmpty)
    assert(ivf.forall(r => Set("a", "b", "c").contains(r.getAs[String]("query_id"))))
  }

  test("shingles: texts shorter than n produce no shingles (sequence(1,0) guard)") {
    val d = Seq((1L, "abc"), (2L, ""), (3L, ""), (4L, "exactly8")).toDF("doc_id", "text")
    assert(Dedup.shingleRows(d, 8).count() == 1) // only the 8-char doc
    // two empty docs must NOT surface as a jaccard-1.0 duplicate pair
    assert(Dedup.ngramJaccardPairs(d, 8, 0.1).count() == 0)
  }

  test("cosine dup pairs finds parallel vectors") {
    val got = Similarity.cosineDupPairs(vecs, tau = 0.99)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.contains((1L, 3L)))
  }

  test("lang id picks the language with most stopword hits") {
    val got = TextStats.langIdColumns(docs).select("doc_id", "lang_pred")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == "en")
    assert(got(4L) == "de")
    assert(got(5L) == "es")
  }

  test("token counts: whitespace and BPE-ish") {
    val df = Seq((1L, "Hello, world! 42"), (2L, ""), (3L, "  a  b  "))
      .toDF("doc_id", "text")
      .select($"doc_id", TextStats.tokenCountWs($"text").as("ws"),
        TextStats.tokenCountBpe($"text").as("bpe"))
    val m = df.collect().map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m(1L)._1 == 3)
    // bpe: "hello" "," " world" "!" " 42" -> 5
    assert(m(1L)._2 == 5)
    assert(m(2L) == ((0, 0)))
    assert(m(3L)._1 == 2)
  }

  test("quality columns in range; stopword-rich text scores higher") {
    val q = TextStats.withQualityColumns(docs).collect()
    q.foreach { r =>
      assert(r.getAs[Double]("quality_score") >= 0 && r.getAs[Double]("quality_score") <= 1)
      assert(r.getAs[Double]("punct_ratio") >= 0 && r.getAs[Double]("punct_ratio") <= 1)
    }
    val by = q.map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("stopword_ratio")).toMap
    assert(by(1L) > by(4L)) // English stopwords present in doc 1 only
  }

  test("fingerprint matches hand-computed polynomial hash") {
    val got = Seq(Tuple1("ab")).toDF("text")
      .select(TextStats.fingerprint($"text")).head.getLong(0)
    assert(got == 97L * 131L + 98L) // 12805, same as the DuckDB probe
  }

  test("multimodal: stub decode plumbing preserves schema, deterministic") {
    val media = Multimodal.asMedia(docs)
    assert(media.schema("content").dataType.typeName == "binary")
    val cols1 = Multimodal.withStubFeatures(media, featureDims = 4)
    assert(cols1.columns.toSeq ==
      Seq("doc_id", "media_type", "byte_len", "width", "height", "f0", "f1", "f2", "f3"))
    val r = cols1.where($"doc_id" === 1L).head
    assert(r.getAs[Int]("width") >= 16 && r.getAs[Int]("width") < 1921)
    // identical content (docs 1 & 2) -> identical stub features
    val f1 = cols1.where($"doc_id" === 1L).select("f0", "width").head
    val f2 = cols1.where($"doc_id" === 2L).select("f0", "width").head
    assert(f1 == f2)

    import spark.implicits._
    val typed = media.as[Multimodal.MediaRecord]
    val decoded = Multimodal.decodePartitions(typed, numPartitions = 2)
    assert(decoded.rdd.getNumPartitions == 2)
    val d = decoded.collect().map(x => x.doc_id -> x).toMap
    assert(d(1L).features.length == 4)
    assert(d(1L).width == d(2L).width) // determinism across records
    assert(d(1L).byte_len == "the cat sat on the mat".length)
  }

  test("multimodal: REAL PNG round trip — decoded stats equal the generative formula exactly") {
    import spark.implicits._
    val d = Seq((1L, "the cat sat on the mat"), (7L, "another doc")).toDF("doc_id", "text")
    val pngs = Multimodal.renderPngs(d).collect()
    // payloads are real PNGs (magic bytes), not stand-ins
    pngs.foreach { p =>
      assert((p.png(0) & 0xff) == 0x89 && p.png(1) == 'P' && p.png(2) == 'N' && p.png(3) == 'G',
        s"doc ${p.doc_id} payload is not a PNG")
    }
    val stats = Multimodal.decodeImages(Multimodal.renderPngs(d))
      .collect().map(s => s.doc_id -> s).toMap
    d.as[(Long, String)].collect().foreach { case (id, t) =>
      val h = graft.functions.Md5Hex64Math.hashBytes(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val (w, ht, a, b, c) = Multimodal.imageParams(h)
      val s = stats(id)
      assert(s.width == w && s.height == ht && s.n_pixels == w.toLong * ht)
      var (er, eg, eb) = (0L, 0L, 0L)
      for (y <- 0 until ht; x <- 0 until w) {
        er += (a * x + b * y + c) % 256L
        eg += (a * x + b * y + c + 85L) % 256L
        eb += (a * x + b * y + c + 170L) % 256L
      }
      // PNG is lossless: the decode must recover the EXACT pixels
      assert(s.sum_r == er && s.sum_g == eg && s.sum_b == eb,
        s"doc $id: decoded sums (${s.sum_r},${s.sum_g},${s.sum_b}) != generated ($er,$eg,$eb)")
    }
    // a non-image payload fails loudly, never returns garbage stats
    val bad = Seq(Multimodal.PngRecord(9L, Array[Byte](1, 2, 3))).toDS()
    intercept[Exception] { Multimodal.decodeImages(bad).collect() }
  }

  test("multimodal: REAL WAV round trip — decoded samples equal the generative formula exactly") {
    import spark.implicits._
    val d = Seq((1L, "the cat sat on the mat"), (7L, "another doc")).toDF("doc_id", "text")
    val wavs = Multimodal.renderWavs(d).collect()
    wavs.foreach { w =>
      assert(new String(w.wav.slice(0, 4), "US-ASCII") == "RIFF" &&
        new String(w.wav.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc ${w.doc_id} payload is not a WAV")
    }
    val stats = Multimodal.decodeAudio(Multimodal.renderWavs(d))
      .collect().map(s => s.doc_id -> s).toMap
    d.as[(Long, String)].collect().foreach { case (id, t) =>
      val h = graft.functions.Md5Hex64Math.hashBytes(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val (n, a, c) = Multimodal.audioParams(h)
      val s = stats(id)
      assert(s.sample_rate == 8000 && s.n_samples == n.toLong)
      var (es, ea) = (0L, 0L)
      for (t0 <- 0L until n.toLong) {
        val v = ((a * t0 + c) % 65536L) - 32768L
        es += v; ea += math.abs(v)
      }
      assert(s.sum_amp == es && s.sum_abs == ea,
        s"doc $id: decoded (${s.sum_amp},${s.sum_abs}) != generated ($es,$ea)")
    }
    val bad = Seq(Multimodal.WavRecord(9L, Array[Byte](1, 2, 3, 4))).toDS()
    intercept[Exception] { Multimodal.decodeAudio(bad).collect() }
  }

  test("multimodal: REAL AVI round trip — container parses, per-frame sums equal the generative formula exactly") {
    import spark.implicits._
    val d = Seq((1L, "the cat sat on the mat"), (7L, "another doc")).toDF("doc_id", "text")
    val avis = Multimodal.renderAvis(d).collect()
    avis.foreach { a =>
      assert(new String(a.avi.slice(0, 4), "US-ASCII") == "RIFF" &&
        new String(a.avi.slice(8, 12), "US-ASCII") == "AVI ",
        s"doc ${a.doc_id} payload is not an AVI")
      // the container's declared geometry round-trips through the parser
      val (declared, w, h, frames) = Multimodal.parseAvi(a.avi)
      assert(declared == frames.length && w > 0 && h > 0)
      // each frame is a real PNG payload (MPNG fourcc = PNG frames)
      frames.foreach(f => assert((f(0) & 0xff) == 0x89 && f(1) == 'P'))
    }
    val stats = Multimodal.decodeVideos(Multimodal.renderAvis(d))
      .collect().groupBy(_.doc_id)
    d.as[(Long, String)].collect().foreach { case (id, t) =>
      val h = graft.functions.Md5Hex64Math.hashBytes(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val (w, ht, nf, a, b, c) = Multimodal.videoParams(h)
      val rows = stats(id).sortBy(_.frame_no)
      assert(rows.length == nf, s"doc $id: ${rows.length} frames decoded, params say $nf")
      assert(rows.map(_.frame_no).toSeq == (0 until nf))
      rows.foreach { s =>
        assert(s.width == w && s.height == ht && s.n_pixels == w.toLong * ht)
        var (er, eg, eb) = (0L, 0L, 0L)
        for (y <- 0 until ht; x <- 0 until w) {
          val base = a * x + b * y + c + 31L * s.frame_no
          er += base % 256L; eg += (base + 85L) % 256L; eb += (base + 170L) % 256L
        }
        // PNG frames are lossless: exact recovery per frame
        assert(s.sum_r == er && s.sum_g == eg && s.sum_b == eb,
          s"doc $id frame ${s.frame_no}: (${s.sum_r},${s.sum_g},${s.sum_b}) != ($er,$eg,$eb)")
      }
    }
    // a corrupted container (frame-count lie) fails loudly: rewrite the
    // avih dwTotalFrames of a valid payload and expect the demux check
    val good = avis.head.avi.clone()
    // avih dwTotalFrames sits at RIFF(12) + LIST hdr(12) + 'avih'+size(8) + 16
    val tfOff = 12 + 12 + 8 + 16
    good(tfOff) = (good(tfOff) + 1).toByte
    val lied = Seq(Multimodal.AviRecord(9L, good)).toDS()
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decodeVideos(lied).collect()
    }
    assert(e.getMessage != null)
    // non-AVI bytes fail at the container gate
    val bad = Seq(Multimodal.AviRecord(10L, Array[Byte](1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12))).toDS()
    intercept[Exception] { Multimodal.decodeVideos(bad).collect() }
  }

  test("multimodal p90: MJPEG round trip — JPEG frames through the SAME demux; structure exact, pixels within a JPEG bound") {
    import spark.implicits._
    val d = Seq((1L, "the cat sat on the mat"), (7L, "another doc"),
      (13L, "a third body of text rides here")).toDF("doc_id", "text")
    val avis = Multimodal.renderAvis(d, frameFormat = "jpg").collect()
    avis.foreach { a =>
      val (declared, w, h, frames) = Multimodal.parseAvi(a.avi)
      assert(declared == frames.length && w > 0 && h > 0)
      // each frame is a real JFIF/JPEG payload (MJPG fourcc): SOI marker
      frames.foreach(f => assert((f(0) & 0xff) == 0xff && (f(1) & 0xff) == 0xd8,
        s"doc ${a.doc_id}: frame does not start with a JPEG SOI marker"))
    }
    val stats = Multimodal.decodeVideos(
        Multimodal.renderAvis(d, frameFormat = "jpg"))
      .collect().groupBy(_.doc_id)
    d.as[(Long, String)].collect().foreach { case (id, t) =>
      val h = graft.functions.Md5Hex64Math.hashBytes(
        t.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val (w, ht, nf, a, b, c) = Multimodal.videoParams(h)
      val rows = stats(id).sortBy(_.frame_no)
      // STRUCTURE replays exactly — the p90 oracle contract
      assert(rows.length == nf && rows.map(_.frame_no).toSeq == (0 until nf))
      rows.foreach(s => assert(s.width == w && s.height == ht &&
        s.n_pixels == w.toLong * ht))
      // PIXELS are approximate (lossy) but must track the generative
      // formula: mean per-pixel channel deviation of the frame SUM
      // under a JPEG error bound — a fake decode (zeros, header echo)
      // lands hundreds off, a real one single digits
      rows.foreach { s =>
        var (er, eg, eb) = (0L, 0L, 0L)
        for (y <- 0 until ht; x <- 0 until w) {
          val base = a * x + b * y + c + 31L * s.frame_no
          er += base % 256L; eg += (base + 85L) % 256L; eb += (base + 170L) % 256L
        }
        val n = (w.toLong * ht).toDouble
        val dev = math.max(math.abs(s.sum_r - er) / n,
          math.max(math.abs(s.sum_g - eg) / n, math.abs(s.sum_b - eb) / n))
        assert(dev <= 32.0,
          s"doc $id frame ${s.frame_no}: mean channel deviation $dev — not a real decode")
      }
      // and frames are DISTINCT (the +31 per-frame offset survives the
      // codec): a constant fake would collapse them
      assert(rows.map(_.sum_r).distinct.length == nf,
        s"doc $id: decoded frames are not distinct")
    }
  }

  test("multimodal: resize fits bounding box preserving aspect; no upscale") {
    import spark.implicits._
    val decoded = Seq((1L, 1920, 1080), (2L, 100, 50), (3L, 10, 2000))
      .toDF("doc_id", "width", "height")
    val r = Multimodal.withResize(decoded, maxW = 640, maxH = 360)
      .select("doc_id", "resized_w", "resized_h")
      .collect().map(x => x.getLong(0) -> ((x.getInt(1), x.getInt(2)))).toMap
    assert(r(1L) == ((640, 360)))       // exact 3x downscale
    assert(r(2L) == ((100, 50)))        // already fits: untouched
    assert(r(3L) == ((1, 360)))         // extreme aspect clamps to >= 1
  }

  test("multimodal: frame sampling chunks video payloads with stride") {
    import spark.implicits._
    testFramesBody(Multimodal.asMedia(docs))  // doc_id % 3 == 2 -> video
  }

  test("p45: tercile buckets split each group 3-ways; null scores and degenerate groups gate NULL") {
    val d = ((1 to 9).map(i => ("en", i.toLong, Some(i.toDouble))) :+
      (("en", 10L, Option.empty[Double])) :+      // null score
      (("zz", 11L, Some(5.0)))                    // singleton group
      ).toDF("lang", "id", "score")
    val out = Profiling.tercileBuckets(d, Seq("lang"), "score")
      .select("id", "bucket").as[(Long, Option[String])].collect().toMap
    // 1..9: terciles at ~3.67 and ~6.33 -> 1-3 tail, 4-6 middle, 7-9 head
    (1L to 3L).foreach(i => assert(out(i).contains("tail"), s"id $i: ${out(i)}"))
    (4L to 6L).foreach(i => assert(out(i).contains("middle"), s"id $i: ${out(i)}"))
    (7L to 9L).foreach(i => assert(out(i).contains("head"), s"id $i: ${out(i)}"))
    assert(out(10L).isEmpty, "null score must gate to NULL bucket")
    // a singleton group has t1 = t2 = its own value; score > t2 is
    // false -> tail (the degenerate-but-defined case, not NULL)
    assert(out(11L).contains("tail"))
    // row conservation: every input row has a verdict
    assert(out.size == 11)
  }

  test("p48: mixture calibration — binding source keeps all, rates integer-exact, unlisted sources fail closed") {
    // a:10 docs, b:30, c:5 (unlisted). targets 50/50 -> the achievable
    // total is bound by a: T = min(10*100/50, 30*100/50) = 20, so a
    // wants 10 (rate 10000 = keep everything) and b wants 10 of 30
    // (rate 3333 bps, floor-exact)
    val d = ((1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 40).map(i => (i.toLong, "b")) ++
      (41 to 45).map(i => (i.toLong, "c"))).toDF("doc_id", "source")
    val out = Sampling.calibrateMixture(d, Seq(("a", 50), ("b", 50)), col("doc_id"))
      .select("doc_id", "source", "rate_bps", "keep")
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.length == 45) // verdict for every row, kept or not
    val bySource = out.groupBy(_._2)
    assert(bySource("a").forall(r => r._3 == 10000L && r._4))
    assert(bySource("b").forall(_._3 == 3333L))
    assert(bySource("c").forall(r => r._3 == 0L && !r._4))
    // determinism: a second run verdicts identically
    val again = Sampling.calibrateMixture(d, Seq(("a", 50), ("b", 50)), col("doc_id"))
      .select("doc_id", "source", "rate_bps", "keep")
      .as[(Long, String, Long, Boolean)].collect()
    assert(out.toSet == again.toSet)
    // invalid targets die loudly
    intercept[IllegalArgumentException] {
      Sampling.calibrateMixture(d, Seq(("a", 60), ("b", 30)), col("doc_id"))
    }
  }

  test("x28 core: per-group mixture rates derive independently; a missing target source zeroes ONLY its group") {
    // window 0: a:10, b:30 (the p48 fixture) -> a 10000, b 3333.
    // window 1: a:20, b:5  -> T = min(20*100/50, 5*100/50) = 10,
    //   a wants 5 of 20 (2500 bps), b wants 5 of 5 (10000 bps).
    // window 2: a:4 only -> b absent -> total 0 -> BOTH rate 0, with
    //   b present in the grid at n_docs 0 (fail-closed, visible).
    val counts = Seq(
      (0L, "a", 10L), (0L, "b", 30L),
      (1L, "a", 20L), (1L, "b", 5L),
      (2L, "a", 4L)).toDF("w", "source", "n")
    val out = Sampling.mixtureRatesPerGroup(counts,
        Seq(("a", 50), ("b", 50)), Seq("w"))
      .select("w", "source", "n_docs", "rate_bps")
      .as[(Long, String, Long, Long)].collect().toSet
    assert(out == Set(
      (0L, "a", 10L, 10000L), (0L, "b", 30L, 3333L),
      (1L, "a", 20L, 2500L), (1L, "b", 5L, 10000L),
      (2L, "a", 4L, 0L), (2L, "b", 0L, 0L)))
    // the batch calibrator IS this derivation with one constant group
    // (shared-definition parity, the x23/p37 discipline)
    val docs = ((1 to 10).map(i => (i.toLong, "a")) ++
      (11 to 40).map(i => (i.toLong, "b"))).toDF("doc_id", "source")
    val batch = Sampling.calibrateMixture(docs, Seq(("a", 50), ("b", 50)),
        col("doc_id"))
      .select("source", "rate_bps").distinct()
      .as[(String, Long)].collect().toSet
    val oneGroup = Sampling.mixtureRatesPerGroup(
        docs.groupBy($"source").agg(count(lit(1)).as("n"))
          .withColumn("g", lit(0)),
        Seq(("a", 50), ("b", 50)), Seq("g"))
      .select("source", "rate_bps").as[(String, Long)].collect().toSet
    assert(batch == oneGroup)
    intercept[IllegalArgumentException] {
      Sampling.mixtureRatesPerGroup(counts, Seq(("a", 100)), Nil)
    }
  }

  test("p46: keep-best dedup retains the higher-quality rendition regardless of id order") {
    // two renditions of one page (same words, so they share a
    // normalized-dedup group): the LOW id is the junk-punctuated
    // crawl, the HIGH id the clean one — keep-smallest would pick the
    // junk; keep-best must pick the clean rendition
    val pair = Seq(
      (1L, "THE-CAT,,SAT!!ON##THE..MAT"),
      (9L, "the cat sat on the mat"),
      (5L, "a lone unique document about the weather today")
    ).toDF("doc_id", "text")
    val out = Dedup.dedupKeepBest(pair)
      .select("n_copies", "keep_id", "best_quality")
      .as[(Long, Long, Double)].collect()
    assert(out.length == 2)
    val dupGroup = out.find(_._1 == 2L).get
    // the clean rendition (id 9, lower punct ratio) must win despite
    // the larger id
    assert(dupGroup._2 == 9L, s"kept ${dupGroup._2}, expected the clean rendition")
    // the singleton reports itself
    assert(out.find(_._1 == 1L).get._2 == 5L)
    // tie case: byte-identical texts -> identical quality -> lowest id
    val tie = Seq((7L, "same text here"), (3L, "same text here"))
      .toDF("doc_id", "text")
    val kept = Dedup.dedupKeepBest(tie).select("keep_id").as[Long].head()
    assert(kept == 3L)
  }

  private def testFramesBody(media: org.apache.spark.sql.DataFrame): Unit = {
    val frames = Multimodal.sampleFrames(media, frameBytes = 4, stride = 2)
      .orderBy("doc_id", "frame_no").collect()
    assert(frames.nonEmpty)
    // every sampled frame index is a stride multiple; chunks cover the
    // payload: frame k starts at byte k*frameBytes
    assert(frames.forall(_.getAs[Int]("frame_no") % 2 == 0))
    val byDoc = frames.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (id, fs) =>
      val content = media.where($"doc_id" === id).head.getAs[Array[Byte]]("content")
      fs.foreach { f =>
        val k = f.getAs[Int]("frame_no")
        val expected = content.slice(k * 4, k * 4 + 4)
        assert(f.getAs[Array[Byte]]("frame_bytes").toSeq == expected.toSeq)
      }
      // last sampled frame may be short; all others are full
      assert(fs.init.forall(_.getAs[Long]("frame_len") == 4L))
    }
  }
}
