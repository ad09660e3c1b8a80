package graft.stats

import graft.SparkSpec
import graft.functions.ErfMath
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property tests for the statistical core (SURVEY.md §5:
  * rank-sum preservation, Spearman symmetry, BH monotonicity and
  * range). Distributed-invariant properties run through the real Spark
  * operators on the shared local session; pure-math properties (erf)
  * run against the scalar implementation directly. Spark-backed
  * properties use fewer trials (each trial is a full local Spark job).
  */
object StatsPropertySpec extends Properties("graft.stats") {

  private lazy val spark = SparkSpec.session

  // Spark-backed properties: 10 trials each is plenty — each trial is a
  // multi-stage distributed job, and the invariants are structural, not
  // numeric-tail-hunting.
  private val few = Test.Parameters.default.withMinSuccessfulTests(10)
  private def sparkProp(g: Properties => Unit): Unit = g(this)

  private val valueVec: Gen[List[Double]] =
    Gen.choose(2, 24).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(-1e6, 1e6).map(v => math.rint(v) / 8.0)))

  propertyWithSeed("rank sum = n(n+1)/2 under ties", None) = Prop.forAllNoShrink(valueVec) { xs =>
    val s = spark
    import s.implicits._
    val df = xs.zipWithIndex.map { case (v, i) => (i, v) }.toDF("i", "v")
    val ranked = Ranks.fractionalRank(df, Seq(lit(1)), col("v"), "r")
    val got = ranked.agg(sum("r")).as[Double].head()
    val n = xs.size.toDouble
    math.abs(got - n * (n + 1) / 2.0) < 1e-6
  }

  propertyWithSeed("rho(x,x)=1, rho(x,rev(x))=-1", None) =
    Prop.forAllNoShrink(Gen.choose(3, 20)) { n =>
      val s = spark
      import s.implicits._
      val up = (1 to n).map(_.toDouble)
      val rows =
        up.zipWithIndex.map { case (v, i) => ("a", i, v) } ++
          up.zipWithIndex.map { case (v, i) => ("b", i, v) } ++
          up.zipWithIndex.map { case (v, i) => ("c", i, up(n - 1 - i)) }
      val df = rows.toDF("item", "sk", "v").withColumn("fam", lit("f"))
      val out = Spearman.pairCorrelations(df, Seq("fam"), "item", "sk", "v")
        .select("item_a", "item_b", "rho").as[(String, String, Double)].collect()
        .map { case (a, b, r) => (a, b) -> r }.toMap
      math.abs(out(("a", "b")) - 1.0) < 1e-9 &&
        math.abs(out(("a", "c")) + 1.0) < 1e-9 &&
        math.abs(out(("b", "c")) + 1.0) < 1e-9
    }

  private val pVec: Gen[List[Double]] =
    Gen.choose(1, 30).flatMap(n => Gen.listOfN(n, Gen.chooseNum(0.0, 1.0)))

  propertyWithSeed("BH q in [0,1], monotone in p, q(max p) = max p", None) =
    Prop.forAllNoShrink(pVec) { ps =>
      val s = spark
      import s.implicits._
      val df = ps.zipWithIndex.map { case (p, i) => (i, p) }.toDF("i", "p")
        .withColumn("fam", lit("f"))
      val out = BenjaminiHochberg.qValues(df, Seq(col("fam")), col("p"), "q")
        .select("p", "q").as[(Double, Double)].collect().sortBy(_._1)
      val inRange = out.forall { case (_, q) => q >= 0.0 && q <= 1.0 + 1e-12 }
      val monotone = out.map(_._2).sliding(2).forall {
        case Array(q1, q2) => q1 <= q2 + 1e-12
        case _             => true
      }
      val m = ps.size.toDouble
      val best = out.head._2 <= out.head._1 * m + 1e-12
      val worst = math.abs(out.last._2 - math.min(ps.max, 1.0)) < 1e-12
      inRange && monotone && best && worst
    }

  property("erf odd, bounded, monotone; normCdf complements") =
    Prop.forAll(Gen.chooseNum(-6.0, 6.0), Gen.chooseNum(-6.0, 6.0)) { (x, y) =>
      math.abs(ErfMath.erf(x) + ErfMath.erf(-x)) < 1e-7 &&
        math.abs(ErfMath.erf(x)) < 1.0 + 1e-12 &&
        (x >= y || ErfMath.erf(x) <= ErfMath.erf(y) + 1e-9) &&
        math.abs(ErfMath.normCdf(x) + ErfMath.normCdf(-x) - 1.0) < 1e-7
    }

  propertyWithSeed("spearman p in [0,1], depends only on |rho|", None) =
    Prop.forAllNoShrink(Gen.chooseNum(-0.999, 0.999), Gen.choose(3, 1000)) { (rho, n) =>
      val s = spark
      import s.implicits._
      val df = Seq((rho, n), (-rho, n)).toDF("rho", "n")
      val ps = df.select(PValues.spearmanP(col("rho"), col("n")).as("p"))
        .as[Double].collect()
      ps.forall(p => p >= 0.0 && p <= 1.0) && math.abs(ps(0) - ps(1)) < 1e-12
    }

  propertyWithSeed("exact t-dist p == commons-math3 TDistribution at n in [3,100]", None) =
    Prop.forAllNoShrink(Gen.chooseNum(-0.999, 0.999), Gen.choose(3, 100)) { (rho, n) =>
      val s = spark
      import s.implicits._
      val df = Seq((rho, n)).toDF("rho", "n")
      val got = df.select(PValues.spearmanPExact(col("rho"), col("n")).as("p"))
        .as[Double].head()
      val t = rho * math.sqrt((n - 2.0) / (1.0 - rho * rho))
      val dist = new org.apache.commons.math3.distribution.TDistribution(n - 2.0)
      val want = 2.0 * (1.0 - dist.cumulativeProbability(math.abs(t)))
      // the incomplete-beta identity and the CDF route are the same
      // function computed two ways; agreement is to numerical noise
      math.abs(got - want) < 1e-9 && got >= 0.0 && got <= 1.0
    }

  propertyWithSeed("normal-approx p converges to exact p by n ~ 30", None) =
    Prop.forAllNoShrink(Gen.chooseNum(-0.95, 0.95), Gen.choose(30, 500)) { (rho, n) =>
      val s = spark
      import s.implicits._
      val df = Seq((rho, n)).toDF("rho", "n")
      val Array(approx, exact) = df.select(
        PValues.spearmanP(col("rho"), col("n")).as("a"),
        PValues.spearmanPExact(col("rho"), col("n")).as("e"))
        .as[(Double, Double)].collect().flatMap(t => Array(t._1, t._2))
      // documented tolerance (SURVEY §7.4.2): the A&S erf approximation
      // carries ~1.5e-7; the t->normal gap at n>=30 stays under ~2e-2
      // absolute and shrinks as 1/n
      math.abs(approx - exact) < 0.02 + 30.0 / (n * n)
    }

  // Pins the round-3 typed-aggregate exact plan (SpearmanStat, one agg
  // pass) to the independent window formulation (two fractional-rank
  // windows + corr) on random INCOMPLETE matrices with forced ties —
  // same pairs, same n, rho equal to 1e-9.
  private val incompleteMatrix: Gen[List[(String, Int, Double)]] = for {
    nItems <- Gen.choose(2, 5)
    nSamples <- Gen.choose(2, 10)
    cells <- Gen.sequence[List[Option[(String, Int, Double)]], Option[(String, Int, Double)]](
      for { i <- (0 until nItems).toList; s <- (0 until nSamples).toList } yield
        for {
          present <- Gen.prob(0.75)
          // 5 distinct values → heavy ties
          v <- Gen.choose(0, 4)
        } yield if (present) Some((s"g$i", s, v.toDouble)) else None)
  } yield cells.flatten

  propertyWithSeed("typed-agg exact path == windowed exact path (incomplete, tied)", None) =
    Prop.forAllNoShrink(incompleteMatrix) { rows =>
      rows.isEmpty || {
        val s = spark
        import s.implicits._
        val df = rows.toDF("item", "sk", "v").withColumn("fam", lit("f"))
        def key(r: org.apache.spark.sql.Row) = (r.getString(0), r.getString(1))
        val agg = Spearman.pairCorrelations(df, Seq("fam"), "item", "sk", "v")
          .select("item_a", "item_b", "n_samples", "rho").collect()
          .map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap
        val win = Spearman.pairCorrelationsWindowed(df, Seq("fam"), "item", "sk", "v")
          .select("item_a", "item_b", "n_samples", "rho").collect()
          .map(r => key(r) -> ((r.getLong(2), r.getDouble(3)))).toMap
        agg.keySet == win.keySet && agg.forall { case (k, (n, rho)) =>
          win(k)._1 == n && math.abs(win(k)._2 - rho) < 1e-9
        }
      }
    }

  // Cap trials globally: the Spark-backed properties dominate runtime.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)
}
