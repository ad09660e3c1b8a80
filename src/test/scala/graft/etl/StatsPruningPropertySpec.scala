package graft.etl

import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** SOUNDNESS of the manifest stats pruner, adversarially checked: for
  * random segments (concrete row values) and random predicates over
  * the supported algebra, a segment that CONTAINS a matching row must
  * never be pruned. (`mayMatch == false` while some row satisfies the
  * predicate would be silent data loss in deleteWhere/readWhere — the
  * one failure mode this operator is not allowed to have. The
  * opposite direction — keeping a segment with no matches — is mere
  * inefficiency and is intentionally unconstrained.)
  *
  * Row evaluation here is an independent re-implementation of the
  * predicate semantics (including string comparison in unsigned UTF-8
  * byte order, Spark's order), so the property cannot share a bug
  * with the pruner.
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

  private case class Row(a: Long, b: Long, s: String)

  // string pool includes multi-byte and boundary-ordering values
  private val strGen = Gen.oneOf("", "a", "ab", "de", "en", "zh", "z",
    "é", "中文", "src0", "src10", "src2")
  // occasional beyond-int-range values so narrowing-cast WRAP semantics
  // are actually exercised (the round-13 ADVICE soundness hole)
  private val longValGen = Gen.frequency(
    4 -> Gen.chooseNum(-50L, 50L),
    1 -> Gen.oneOf((1L << 32) + 5L, -(1L << 33) - 7L, (1L << 33) + 5L,
      Int.MaxValue.toLong + 1L, Int.MinValue.toLong - 1L))
  private val rowGen = for {
    a <- longValGen
    b <- longValGen
    s <- strGen
  } yield Row(a, b, s)
  private val segGen = Gen.nonEmptyListOf(rowGen)

  private def attr(n: String) = UnresolvedAttribute(n)
  private def ref(n: String) = AttributeReference(n, LongType)()
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
        In(attr(n), Seq(litL(x), litL(x + 3), litL(x - 7))))
    } yield e
    val leafStr = for {
      x <- strGen
      y <- strGen
      e <- Gen.oneOf[Expression](
        EqualTo(attr("s"), litS(x)), EqualTo(litS(x), attr("s")),
        GreaterThan(attr("s"), litS(x)), LessThan(attr("s"), litS(x)),
        GreaterThanOrEqual(litS(x), attr("s")),
        LessThanOrEqual(litS(x), attr("s")),
        In(attr("s"), Seq(litS(x), litS(y))))
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
          castTo(litL(x), org.apache.spark.sql.types.IntegerType)))
    } yield e
    val leaf = Gen.oneOf(leafLong, leafStr, leafCast)
    if (depth <= 0) leaf
    else Gen.frequency(
      3 -> leaf,
      2 -> (for { l <- predGen(depth - 1); r <- predGen(depth - 1) } yield And(l, r)),
      2 -> (for { l <- predGen(depth - 1); r <- predGen(depth - 1) } yield Or(l, r)))
  }

  /** Ground truth: does `row` satisfy `pred`? Independent evaluator. */
  private def sat(row: Row, pred: Expression): Boolean = pred match {
    case And(l, r) => sat(row, l) && sat(row, r)
    case Or(l, r)  => sat(row, l) || sat(row, r)
    case EqualTo(l, r)            => cmp(row, l, r).contains(0)
    case GreaterThan(l, r)        => cmp(row, l, r).exists(_ > 0)
    case GreaterThanOrEqual(l, r) => cmp(row, l, r).exists(_ >= 0)
    case LessThan(l, r)           => cmp(row, l, r).exists(_ < 0)
    case LessThanOrEqual(l, r)    => cmp(row, l, r).exists(_ <= 0)
    case In(a, vs) => vs.exists(v => cmp(row, a, v).contains(0))
    case other => fail(s"generator produced an unexpected node: $other")
  }

  /** Three-way comparison of two operand expressions under `row`;
    * None when the operands mix types (generator never does).
    */
  private def cmp(row: Row, l: Expression, r: Expression): Option[Int] = {
    def longOf(e: Expression): Option[Long] = e match {
      case UnresolvedAttribute(Seq("a")) => Some(row.a)
      case UnresolvedAttribute(Seq("b")) => Some(row.b)
      case a: AttributeReference if a.name == "a" => Some(row.a)
      case a: AttributeReference if a.name == "b" => Some(row.b)
      case Literal(v: Long, _)  => Some(v)
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Short, _) => Some(v.toLong)
      // LEGACY (non-ANSI) integral cast semantics: narrowing WRAPS —
      // exactly what Spark would compute at runtime in GraftSession
      case Cast(c, t, _, _) => longOf(c).map { v =>
        import org.apache.spark.sql.types._
        t match {
          case LongType    => v
          case IntegerType => v.toInt.toLong
          case ShortType   => v.toShort.toLong
          case ByteType    => v.toByte.toLong
          case other       => fail(s"unexpected cast target in generator: $other")
        }
      }
      case _ => None
    }
    def strOf(e: Expression): Option[String] = e match {
      case UnresolvedAttribute(Seq("s"))        => Some(row.s)
      case Literal(v: UTF8String, StringType)   => Some(v.toString)
      case _                                    => None
    }
    (longOf(l), longOf(r)) match {
      case (Some(x), Some(y)) => Some(java.lang.Long.compare(x, y))
      case _ => (strOf(l), strOf(r)) match {
        case (Some(x), Some(y)) => Some(StatsPruning.cmpUtf8(x, y))
        case _ => None
      }
    }
  }

  test("mayMatch NEVER prunes a segment that contains a matching row (long + string algebra, 2000 cases)") {
    val prop = Prop.forAll(segGen, predGen(3)) { (rows, pred) =>
      // bounds exactly as collectStats would stamp them for this segment
      val lb = Map(
        "a" -> (rows.map(_.a).min, rows.map(_.a).max),
        "b" -> (rows.map(_.b).min, rows.map(_.b).max))
      val sb = Map("s" -> (
        rows.map(_.s).min(Ordering.fromLessThan[String](
          (x, y) => StatsPruning.cmpUtf8(x, y) < 0)),
        rows.map(_.s).max(Ordering.fromLessThan[String](
          (x, y) => StatsPruning.cmpUtf8(x, y) < 0))))
      val anyMatch = rows.exists(sat(_, pred))
      // soundness: a real match forces mayMatch; no constraint otherwise
      !anyMatch || StatsPruning.mayMatch(pred, lb, sb)
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
