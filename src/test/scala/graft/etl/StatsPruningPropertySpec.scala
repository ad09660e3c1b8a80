package graft.etl

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** SOUNDNESS of the manifest stats pruner, adversarially checked: for
  * random segments (concrete row values, NULLs included) and random
  * predicates over the supported algebra — comparisons, IN, AND/OR,
  * NOT, IS [NOT] NULL, <=>, and LEGACY-mode casts — a segment that
  * CONTAINS a row where the predicate is TRUE must never be pruned.
  * (`mayMatch == false` while some row satisfies the predicate would
  * be silent data loss in deleteWhere/readWhere — the one failure mode
  * this operator is not allowed to have. The opposite direction —
  * keeping a segment with no matches — is mere inefficiency and is
  * intentionally unconstrained.)
  *
  * Row evaluation here is an independent re-implementation of the
  * THREE-VALUED predicate semantics (Kleene logic, string comparison
  * in unsigned UTF-8 byte order, integral narrowing casts that WRAP as
  * Spark's LEGACY mode does), so the property cannot share a bug with
  * the pruner.
  */
class StatsPruningPropertySpec extends AnyFunSuite {

  /** Raw-scalacheck runner (scalatestplus is not on the offline
    * classpath): fail the scalatest case with the falsifying args.
    */
  private def check2000(prop: Prop): Unit = {
    val params = org.scalacheck.Test.Parameters.default
      .withMinSuccessfulTests(2000)
    val res = org.scalacheck.Test.check(params, prop)
    assert(res.passed, s"property falsified: ${res.status}")
  }

  private case class Row(a: Option[Long], b: Option[Long], s: Option[String])

  // string pool includes multi-byte and boundary-ordering values
  private val strGen = Gen.oneOf("", "a", "ab", "de", "en", "zh", "z",
    "é", "中文", "src0", "src10", "src2")
  // occasional beyond-int-range values so narrowing-cast WRAP semantics
  // are actually exercised (the round-13 ADVICE soundness hole)
  private val longValGen = Gen.frequency(
    4 -> Gen.chooseNum(-50L, 50L),
    1 -> Gen.oneOf((1L << 32) + 5L, -(1L << 33) - 7L, (1L << 33) + 5L,
      Int.MaxValue.toLong + 1L, Int.MinValue.toLong - 1L))
  // ~1/6 NULLs per column so all-null / no-null / mixed segments all
  // occur; Gen.const(None) first so shrinking tends toward NULL cases
  private def nullable[A](g: Gen[A]): Gen[Option[A]] =
    Gen.frequency(1 -> Gen.const(Option.empty[A]), 5 -> g.map(Option(_)))
  private val rowGen = for {
    a <- nullable(longValGen)
    b <- nullable(longValGen)
    s <- nullable(strGen)
  } yield Row(a, b, s)
  private val segGen = Gen.nonEmptyListOf(rowGen)

  private def attr(n: String) = UnresolvedAttribute(n)
  private def ref(n: String) =
    AttributeReference(n, if (n == "s") StringType else LongType)()
  private def litL(x: Long) = Literal(x, LongType)
  private def litS(x: String) = Literal(UTF8String.fromString(x), StringType)
  // GraftSession runs ANSI off, so casts here carry LEGACY (wrap) mode
  private def castTo(e: Expression, t: org.apache.spark.sql.types.DataType) =
    Cast(e, t, None, EvalMode.LEGACY)

  /** Random predicate over columns a, b (long) and s (string). */
  private def predGen(depth: Int): Gen[Expression] = {
    val leafLong = for {
      n <- Gen.oneOf("a", "b")
      x <- Gen.chooseNum(-60L, 60L)
      e <- Gen.oneOf[Expression](
        EqualTo(attr(n), litL(x)), EqualTo(litL(x), attr(n)),
        GreaterThan(attr(n), litL(x)), GreaterThan(litL(x), attr(n)),
        GreaterThanOrEqual(attr(n), litL(x)), LessThan(attr(n), litL(x)),
        LessThan(litL(x), attr(n)), LessThanOrEqual(attr(n), litL(x)),
        In(attr(n), Seq(litL(x), litL(x + 3), litL(x - 7))),
        EqualNullSafe(attr(n), litL(x)),
        EqualNullSafe(attr(n), Literal(null, LongType)))
    } yield e
    val leafStr = for {
      x <- strGen
      y <- strGen
      e <- Gen.oneOf[Expression](
        EqualTo(attr("s"), litS(x)), EqualTo(litS(x), attr("s")),
        GreaterThan(attr("s"), litS(x)), LessThan(attr("s"), litS(x)),
        GreaterThanOrEqual(litS(x), attr("s")),
        LessThanOrEqual(litS(x), attr("s")),
        In(attr("s"), Seq(litS(x), litS(y))),
        EqualNullSafe(attr("s"), litS(x)),
        EqualNullSafe(Literal(null, StringType), attr("s")))
    } yield e
    // Cast shapes (round 14): narrowing column casts (must NOT prune on
    // the un-cast bounds — LEGACY mode wraps), identity/widening casts
    // (value-preserving — may prune), and literal casts both ways
    val leafCast = for {
      n <- Gen.oneOf("a", "b")
      x <- longValGen
      e <- Gen.oneOf[Expression](
        EqualTo(castTo(ref(n), org.apache.spark.sql.types.IntegerType),
          Literal(x.toInt, org.apache.spark.sql.types.IntegerType)),
        GreaterThan(castTo(ref(n), org.apache.spark.sql.types.IntegerType),
          Literal(x.toInt, org.apache.spark.sql.types.IntegerType)),
        LessThan(Literal(x.toShort, org.apache.spark.sql.types.ShortType),
          castTo(ref(n), org.apache.spark.sql.types.ShortType)),
        EqualTo(castTo(ref(n), LongType), litL(x)),
        EqualTo(ref(n), castTo(Literal(x.toInt,
          org.apache.spark.sql.types.IntegerType), LongType)),
        EqualTo(castTo(ref(n), org.apache.spark.sql.types.IntegerType),
          castTo(litL(x), org.apache.spark.sql.types.IntegerType)),
        IsNull(castTo(ref(n), org.apache.spark.sql.types.IntegerType)),
        IsNotNull(castTo(ref(n), org.apache.spark.sql.types.IntegerType)))
    } yield e
    val leafNull = for {
      n <- Gen.oneOf("a", "b", "s")
      e <- Gen.oneOf[Expression](IsNull(attr(n)), IsNotNull(attr(n)))
    } yield e
    val leaf = Gen.frequency(
      3 -> leafLong, 3 -> leafStr, 2 -> leafCast, 2 -> leafNull)
    if (depth <= 0) leaf
    else Gen.frequency(
      4 -> leaf,
      2 -> (for { l <- predGen(depth - 1); r <- predGen(depth - 1) } yield And(l, r)),
      2 -> (for { l <- predGen(depth - 1); r <- predGen(depth - 1) } yield Or(l, r)),
      2 -> predGen(depth - 1).map(Not(_)))
  }

  // ---- independent 3-valued evaluator --------------------------------

  /** Evaluate an operand to a long value; outer None = not a
    * long-domain expression, inner None = SQL NULL. LEGACY casts wrap.
    */
  private def longOf(row: Row, e: Expression): Option[Option[Long]] = e match {
    case UnresolvedAttribute(Seq("a")) => Some(row.a)
    case UnresolvedAttribute(Seq("b")) => Some(row.b)
    case a: AttributeReference if a.name == "a" => Some(row.a)
    case a: AttributeReference if a.name == "b" => Some(row.b)
    case Literal(null, LongType)  => Some(None)
    case Literal(v: Long, _)  => Some(Some(v))
    case Literal(v: Int, _)   => Some(Some(v.toLong))
    case Literal(v: Short, _) => Some(Some(v.toLong))
    case Cast(c, t, _, _) => longOf(row, c).map(_.map { v =>
      import org.apache.spark.sql.types._
      t match {
        case LongType    => v
        case IntegerType => v.toInt.toLong
        case ShortType   => v.toShort.toLong
        case ByteType    => v.toByte.toLong
        case other       => fail(s"unexpected cast target in generator: $other")
      }
    })
    case _ => None
  }

  private def strOf(row: Row, e: Expression): Option[Option[String]] = e match {
    case UnresolvedAttribute(Seq("s"))      => Some(row.s)
    case a: AttributeReference if a.name == "s" => Some(row.s)
    case Literal(null, StringType)          => Some(None)
    case Literal(v: UTF8String, StringType) => Some(Some(v.toString))
    case _                                  => None
  }

  /** Three-way comparison under `row`: outer None = operands not
    * comparable (generator never produces that), inner None = at least
    * one operand is SQL NULL (comparison result is NULL).
    */
  private def cmp(row: Row, l: Expression, r: Expression): Option[Option[Int]] =
    (longOf(row, l), longOf(row, r)) match {
      case (Some(x), Some(y)) =>
        Some(for (a <- x; b <- y) yield java.lang.Long.compare(a, b))
      case _ => (strOf(row, l), strOf(row, r)) match {
        case (Some(x), Some(y)) =>
          Some(for (a <- x; b <- y) yield StatsPruning.cmpUtf8(a, b))
        case _ => None
      }
    }

  /** NULL-or-value of an operand, type-erased, for IS NULL / <=>. */
  private def valOf(row: Row, e: Expression): Option[Any] =
    longOf(row, e).getOrElse(strOf(row, e).getOrElse(
      fail(s"generator produced an unexpected operand: $e")))

  /** Ground truth: Kleene evaluation of `pred` on `row`; None = NULL. */
  private def eval3(row: Row, pred: Expression): Option[Boolean] = pred match {
    case And(l, r) => (eval3(row, l), eval3(row, r)) match {
      case (Some(false), _) | (_, Some(false)) => Some(false)
      case (Some(true), Some(true))            => Some(true)
      case _                                   => None
    }
    case Or(l, r) => (eval3(row, l), eval3(row, r)) match {
      case (Some(true), _) | (_, Some(true)) => Some(true)
      case (Some(false), Some(false))        => Some(false)
      case _                                 => None
    }
    case Not(q) => eval3(row, q).map(!_)
    case EqualTo(l, r)            => cmp(row, l, r).get.map(_ == 0)
    case GreaterThan(l, r)        => cmp(row, l, r).get.map(_ > 0)
    case GreaterThanOrEqual(l, r) => cmp(row, l, r).get.map(_ >= 0)
    case LessThan(l, r)           => cmp(row, l, r).get.map(_ < 0)
    case LessThanOrEqual(l, r)    => cmp(row, l, r).get.map(_ <= 0)
    case IsNull(e)    => Some(valOf(row, e).isEmpty)
    case IsNotNull(e) => Some(valOf(row, e).nonEmpty)
    case EqualNullSafe(l, r) => (valOf(row, l), valOf(row, r)) match {
      case (None, None)       => Some(true)
      case (Some(_), None)    => Some(false)
      case (None, Some(_))    => Some(false)
      case (Some(_), Some(_)) => Some(cmp(row, l, r).get.get == 0)
    }
    case In(a, vs) =>
      // SQL IN: TRUE on a non-null match, NULL if the probe is null or
      // a null member prevented proving FALSE, else FALSE
      if (valOf(row, a).isEmpty) None
      else {
        val results = vs.map(v => eval3(row, EqualTo(a, v)))
        if (results.exists(_.contains(true))) Some(true)
        else if (results.contains(None)) None
        else Some(false)
      }
    case other => fail(s"generator produced an unexpected node: $other")
  }

  private def sat(row: Row, pred: Expression): Boolean =
    eval3(row, pred).contains(true)

  private val utf8Lt =
    Ordering.fromLessThan[String]((x, y) => StatsPruning.cmpUtf8(x, y) < 0)

  test("mayMatch NEVER prunes a segment containing a TRUE row (nulls + NOT + IS NULL + <=> + casts, 2000 cases)") {
    val prop = Prop.forAll(segGen, predGen(3)) { (rows, pred) =>
      // bounds exactly as collectSegStats would stamp them: min/max of
      // the NON-NULL values only, column dropped when every value is
      // null; null counts exact; row count = physical rows
      val as = rows.flatMap(_.a); val bs = rows.flatMap(_.b)
      val ssv = rows.flatMap(_.s)
      val lb = Map.newBuilder[String, (Long, Long)]
      if (as.nonEmpty) lb += ("a" -> (as.min, as.max))
      if (bs.nonEmpty) lb += ("b" -> (bs.min, bs.max))
      val sb =
        if (ssv.isEmpty) Map.empty[String, (String, String)]
        else Map("s" -> (ssv.min(utf8Lt), ssv.max(utf8Lt)))
      val nulls = Map(
        "a" -> rows.count(_.a.isEmpty).toLong,
        "b" -> rows.count(_.b.isEmpty).toLong,
        "s" -> rows.count(_.s.isEmpty).toLong)
      val anyMatch = rows.exists(sat(_, pred))
      // soundness: a real match forces mayMatch; no constraint otherwise
      !anyMatch || StatsPruning.mayMatch(pred, lb.result(), sb, nulls, rows.size.toLong)
    }
    check2000(prop)
  }

  test("pruning effectiveness smoke: clearly-disjoint predicates do prune (not everything degenerates to true)") {
    val lb = Map("a" -> (10L, 20L))
    val sb = Map("s" -> ("de", "en"))
    assert(!StatsPruning.mayMatch(EqualTo(attr("a"), litL(99L)), lb, sb))
    assert(!StatsPruning.mayMatch(GreaterThan(attr("a"), litL(20L)), lb, sb))
    assert(!StatsPruning.mayMatch(EqualTo(attr("s"), litS("zh")), lb, sb))
    assert(!StatsPruning.mayMatch(LessThan(attr("s"), litS("de")), lb, sb))
  }

  test("null-stats effectiveness: IS NULL / IS NOT NULL / NOT / all-null comparisons prune where provable") {
    val lb = Map("a" -> (10L, 20L))
    val sb = Map("s" -> ("de", "en"))
    // 100 rows: a never null, s always null (so s has no bounds), b mixed
    val nulls = Map("a" -> 0L, "s" -> 100L, "b" -> 40L)
    val rows = 100L
    // IS NULL on a no-null column prunes
    assert(!StatsPruning.mayMatch(IsNull(attr("a")), lb, Map.empty, nulls, rows))
    // IS NOT NULL on an all-null column prunes
    assert(!StatsPruning.mayMatch(IsNotNull(attr("s")), lb, Map.empty, nulls, rows))
    // any comparison over an all-null column prunes even without bounds
    assert(!StatsPruning.mayMatch(EqualTo(attr("s"), litS("fr")), lb, Map.empty, nulls, rows))
    assert(!StatsPruning.mayMatch(In(attr("s"), Seq(litS("fr"), litS("zh"))),
      lb, Map.empty, nulls, rows))
    // NOT pushes through: NOT(a = x) prunes only when bounds pin a == x
    assert(!StatsPruning.mayMatch(Not(EqualTo(attr("a"), litL(15L))),
      Map("a" -> (15L, 15L)), Map.empty, nulls, rows))
    assert(StatsPruning.mayMatch(Not(EqualTo(attr("a"), litL(15L))), lb, sb, nulls, rows))
    // NOT(a > 5) = a <= 5 on non-null rows: disjoint from [10, 20]
    assert(!StatsPruning.mayMatch(Not(GreaterThan(attr("a"), litL(5L))),
      lb, sb, nulls, rows))
    // <=> NULL is IS NULL; <=> literal prunes like equality
    assert(!StatsPruning.mayMatch(
      EqualNullSafe(attr("a"), Literal(null, LongType)), lb, Map.empty, nulls, rows))
    assert(!StatsPruning.mayMatch(EqualNullSafe(attr("a"), litL(99L)),
      lb, Map.empty, nulls, rows))
    // mixed-null column: nothing null-based prunes
    assert(StatsPruning.mayMatch(IsNull(attr("b")), lb, Map.empty, nulls, rows))
    assert(StatsPruning.mayMatch(IsNotNull(attr("b")), lb, Map.empty, nulls, rows))
  }

  test("cast soundness: a narrowing column cast never prunes on the un-cast bounds; value-preserving casts still do") {
    import org.apache.spark.sql.types.IntegerType
    val lb = Map("a" -> ((1L << 33), (1L << 34)))
    // cast(a AS int) = 5 matches a = 2^33 + 5 under LEGACY wrap, yet the
    // long bounds exclude 5 — the pruner must KEEP (the ADVICE finding)
    assert(StatsPruning.mayMatch(
      EqualTo(castTo(ref("a"), IntegerType), Literal(5, IntegerType)), lb))
    // identity cast and widening LITERAL cast stay prunable
    assert(!StatsPruning.mayMatch(
      EqualTo(castTo(ref("a"), LongType), litL(5L)), lb))
    assert(!StatsPruning.mayMatch(
      EqualTo(attr("a"), castTo(Literal(5, IntegerType), LongType)), lb))
    // a narrowing literal cast whose value does NOT fit degrades to keep
    assert(StatsPruning.mayMatch(
      EqualTo(castTo(ref("a"), IntegerType),
        castTo(litL((1L << 33) + 5L), IntegerType)), lb))
  }
}
