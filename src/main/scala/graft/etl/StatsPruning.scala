package graft.etl

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions._

/** Manifest-level MIN/MAX segment statistics + predicate pruning
  * (round 13) — the lakehouse file-skipping idea one level up, applied
  * to whole segments before any Spark job is planned.
  *
  * Why: [[SnapshotWarehouse.deleteWhere]] probes every live segment
  * with the predicate. Parquet row-group stats make each probe cheap,
  * but a probe is still a Spark JOB per segment — at a 100k-segment
  * lake a takedown would launch 100k jobs to discover that 99,999
  * segments hold nothing. With per-segment long-column (min, max)
  * bounds stamped in the manifest at write time, provably-disjoint
  * segments are skipped DRIVER-SIDE with zero I/O; the same bounds
  * serve [[SnapshotWarehouse.readWhere]]'s query-side pruning (the
  * generalization of the stamped study-set skip to arbitrary range
  * predicates).
  *
  * Collection is footer-only: the stats (and the row count) come from
  * the parquet footers the write already produced — O(files) metadata
  * reads, never a second pass over the data. Sound under NULLs and
  * exclusions: min/max cover the non-null values of ALL physical rows
  * (a superset of the visible rows), and a comparison predicate is
  * never TRUE on NULL, so "bounds disjoint ⇒ no row matches" holds.
  */
object StatsPruning {

  /** Unsigned byte-lexicographic UTF-8 comparison — the ONE string
    * order every layer here agrees on: Spark's UTF8String, parquet's
    * UTF8 column statistics comparator, and this pruner. (Plain
    * java.lang.String.compareTo is UTF-16 code-UNIT order, which
    * diverges above the BMP — never use it for pruning decisions.)
    */
  def cmpUtf8(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    x.length - y.length
  }

  /** A string value longer than this is not stamped — bounds stay
    * small in the manifest, and lang/source-class takedown keys are
    * always short. A segment whose min or max exceeds it simply drops
    * that column from the stats (cannot skip ≠ skip wrongly).
    */
  val MaxStatString = 64

  /** Bundle of footer-derived segment statistics: exact physical row
    * count, per-column INT64 (min, max), per-column UTF-8 string
    * (min, max), and per-column exact NULL counts (round 14 — what
    * lets `IS NULL` / `IS NOT NULL` takedown probes prune driver-side,
    * and lets comparison predicates prune ALL-NULL segments that have
    * no value bounds at all).
    */
  final case class SegStats(rows: Long,
      longBounds: Map[String, (Long, Long)],
      strBounds: Map[String, (String, String)],
      nullCounts: Map[String, Long])

  /** Merge per-column INT64 (min, max) and UTF-8 string (min, max)
    * across every parquet file under `dir` (recursing into hive
    * partition subdirectories), plus the exact row count from the
    * block metadata. A column is dropped from its map the moment ANY
    * block lacks usable statistics — unknown must mean "cannot skip",
    * never "skip wrongly".
    */
  def collectStats(conf: Configuration, dir: HPath)
      : (Long, Map[String, (Long, Long)], Map[String, (String, String)]) = {
    val s = collectSegStats(conf, dir)
    (s.rows, s.longBounds, s.strBounds)
  }

  /** Full-stats variant of [[collectStats]], adding per-column exact
    * null counts. Null counts are tracked for EVERY top-level column
    * regardless of physical type (an all-null probe is type-agnostic);
    * a column whose null count any block fails to report is dropped
    * from the null map the same way bounds are.
    */
  def collectSegStats(conf: Configuration, dir: HPath): SegStats = {
    val fs = dir.getFileSystem(conf)
    def files(p: HPath): Seq[org.apache.hadoop.fs.FileStatus] = {
      val sts = fs.listStatus(p).toSeq
      sts.filter(_.isDirectory).flatMap(d => files(d.getPath)) ++
        sts.filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
    var rows = 0L
    val mins = scala.collection.mutable.Map[String, Long]()
    val maxs = scala.collection.mutable.Map[String, Long]()
    val smins = scala.collection.mutable.Map[String, String]()
    val smaxs = scala.collection.mutable.Map[String, String]()
    val poisoned = scala.collection.mutable.Set[String]()
    val nulls = scala.collection.mutable.Map[String, Long]()
    val nullPoisoned = scala.collection.mutable.Set[String]()
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    files(dir).foreach { st =>
      val footer = org.apache.parquet.hadoop.ParquetFileReader.readFooter(
        conf, st.getPath, org.apache.parquet.format.converter.ParquetMetadataConverter.NO_FILTER)
      footer.getBlocks.forEach { b =>
        rows += b.getRowCount
        b.getColumns.forEach { c =>
          // top-level columns only — nested paths don't map to a
          // prunable predicate attribute
          if (c.getPath.size() == 1) {
            val name = c.getPath.toDotString
            val pt = c.getPrimitiveType
            val s = c.getStatistics
            // null counts are type-agnostic: every top-level column
            // tracks them, independently of whether value bounds exist
            if (s == null || !s.isNumNullsSet) nullPoisoned += name
            else nulls(name) = nulls.getOrElse(name, 0L) + s.getNumNulls
            pt.getPrimitiveTypeName match {
              case PrimitiveTypeName.INT64 =>
                if (s == null || s.isEmpty) poisoned += name
                else if (s.hasNonNullValue) {
                  val mn = s.genericGetMin.asInstanceOf[java.lang.Long].longValue()
                  val mx = s.genericGetMax.asInstanceOf[java.lang.Long].longValue()
                  mins(name) = math.min(mins.getOrElse(name, Long.MaxValue), mn)
                  maxs(name) = math.max(maxs.getOrElse(name, Long.MinValue), mx)
                } // all-null block: contributes no values; bounds stay sound
              case PrimitiveTypeName.BINARY
                  if pt.getLogicalTypeAnnotation ==
                    org.apache.parquet.schema.LogicalTypeAnnotation.stringType() =>
                if (s == null || s.isEmpty) poisoned += name
                else if (s.hasNonNullValue) {
                  val mn = s.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                    .toStringUsingUTF8
                  val mx = s.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                    .toStringUsingUTF8
                  if (mn.length > MaxStatString || mx.length > MaxStatString)
                    poisoned += name
                  else {
                    smins(name) = smins.get(name) match {
                      case Some(cur) if cmpUtf8(cur, mn) <= 0 => cur; case _ => mn }
                    smaxs(name) = smaxs.get(name) match {
                      case Some(cur) if cmpUtf8(cur, mx) >= 0 => cur; case _ => mx }
                  }
                }
              case _ => ()
            }
          }
        }
      }
    }
    val lstats = (mins.keySet -- poisoned).map(n => n -> (mins(n), maxs(n))).toMap
    val sstats = (smins.keySet -- poisoned).map(n => n -> (smins(n), smaxs(n))).toMap
    val nstats = (nulls.keySet -- nullPoisoned).map(n => n -> nulls(n)).toMap
    SegStats(rows, lstats, sstats, nstats)
  }

  /** Conservative "may any row satisfy `pred`?" against per-column
    * bounds. TRUE means "cannot prove otherwise — keep the segment";
    * only provable disjointness skips. Handles the AND/OR algebra and
    * the long- and string-literal comparison/IN shapes (string order =
    * [[cmpUtf8]], the order parquet stats and Spark share); anything
    * else is unknown.
    */
  /** Rank in the integral-widening chain, or -1 for non-integral. */
  private def integralRank(t: org.apache.spark.sql.types.DataType): Int = {
    import org.apache.spark.sql.types._
    t match {
      case ByteType => 0; case ShortType => 1
      case IntegerType => 2; case LongType => 3
      case _ => -1
    }
  }

  /** Does every value of type `from` survive a cast to `to` unchanged
    * (under the comparison semantics the pruner replays)? Only identity
    * and integral WIDENING qualify. Narrowing is NOT value-preserving:
    * with ANSI off a narrowing cast WRAPS, so cast(long_col AS int) = 5
    * can match a row whose long value is 2^32+5 while the long bounds
    * prove "disjoint" — pruning on the un-cast bounds there would be
    * silent data loss (the round-13 ADVICE finding).
    */
  private def valuePreservingCast(from: org.apache.spark.sql.types.DataType,
      to: org.apache.spark.sql.types.DataType): Boolean =
    from == to || {
      val (f, t) = (integralRank(from), integralRank(to))
      f >= 0 && t >= 0 && f <= t
    }

  /** Does `v` round-trip a cast to integral type `t` unchanged? (A
    * literal cast is value-preserving exactly when the value fits.)
    */
  private def fitsIn(v: Long, t: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    t match {
      case LongType    => true
      case IntegerType => v >= Int.MinValue && v <= Int.MaxValue
      case ShortType   => v >= Short.MinValue && v <= Short.MaxValue
      case ByteType    => v >= Byte.MinValue && v <= Byte.MaxValue
      case _           => false
    }
  }

  /** Null-stats-aware variant (round 14): `nulls` carries per-column
    * exact NULL counts over the segment's PHYSICAL rows and `rows` the
    * physical row count (-1 = unknown). This enables three new prunes,
    * each sound because visible rows ⊆ physical rows:
    *  - `IS NULL` on a column with null count 0 can never be TRUE;
    *  - `IS NOT NULL` on an ALL-null column can never be TRUE;
    *  - any comparison/IN over an ALL-null column can never be TRUE
    *    (NULL operands never compare TRUE) — this prunes segments that
    *    have no value bounds at all because every value is NULL.
    * `NOT` pushes through the algebra with K3 ("is TRUE") De Morgan
    * semantics; `Not(cmp)` prunes via the complement operator, and
    * `<=>` against a null literal degrades to IS NULL.
    */
  def mayMatch(pred: Expression, bounds: Map[String, (Long, Long)],
      strBounds: Map[String, (String, String)] = Map.empty,
      nulls: Map[String, Long] = Map.empty, rows: Long = -1L): Boolean = {
    def attrName(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference  => Some(a.name)
      // only strip a Cast that provably preserves every child value —
      // which requires KNOWING the child type, so an unresolved child
      // (type unknown) degrades to "unknown → keep", never to a guess
      case Cast(c: AttributeReference, t, _, _)
        if valuePreservingCast(c.dataType, t) => Some(c.name)
      case _ => None
    }
    def litLong(e: Expression): Option[Long] = e match {
      case Literal(v: Int, _)   => Some(v.toLong)
      case Literal(v: Long, _)  => Some(v)
      case Literal(v: Short, _) => Some(v.toLong)
      case Literal(v: Byte, _)  => Some(v.toLong)
      // the analyzer widens int literals against long columns with a
      // value-preserving Cast that only folds in the optimizer; a
      // NARROWING literal cast wraps under non-ANSI, so it is only
      // taken when the value provably fits the target type unchanged
      case Cast(c, t, _, _) => litLong(c).filter(v => fitsIn(v, t))
      case _ => None
    }
    def range(name: String): Option[(Long, Long)] = bounds.get(name)
    def litStr(e: Expression): Option[String] = e match {
      case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) => Some(v.toString)
      case Literal(v: String, _) => Some(v)
      case _ => None
    }
    def srange(name: String): Option[(String, String)] = strBounds.get(name)
    // strips ANY cast chain — sound ONLY for NULLNESS reasoning (a cast
    // of NULL is NULL under every eval mode, so column-all-null
    // propagates through arbitrary casts; VALUE reasoning must use
    // attrName, which only strips value-preserving casts)
    def nullPropAttr(e: Expression): Option[String] = e match {
      case a: UnresolvedAttribute => Some(a.name)
      case a: AttributeReference  => Some(a.name)
      case Cast(c, _, _, _)       => nullPropAttr(c)
      case _                      => None
    }
    def allNull(n: String): Boolean = rows >= 0L && nulls.get(n).contains(rows)
    def noNull(n: String): Boolean = nulls.get(n).contains(0L)
    def isNullLit(e: Expression): Boolean = e match {
      case Literal(v, _) => v == null
      case _             => false
    }
    def isNonNullLit(e: Expression): Boolean = e match {
      case Literal(v, _) => v != null
      case _             => false
    }
    def flip(op: String): String = op match {
      case ">" => "<"; case ">=" => "<="; case "<" => ">"; case "<=" => ">="
      case "=" => "="; case "!=" => "!="
    }
    // normalize `l OP r` to (column, literal, op-with-column-first),
    // flipping the operator when the literal is on the left
    def norm[A](l: Expression, r: Expression, op: String,
        lift: Expression => Option[A]): Option[(String, A, String)] =
      (attrName(l), lift(r)) match {
        case (Some(n), Some(x)) => Some((n, x, op))
        case _ => (attrName(r), lift(l)) match {
          case (Some(n), Some(x)) => Some((n, x, flip(op)))
          case _ => None
        }
      }
    def possibleIn[A](lohi: Option[(A, A)], x: A, op: String,
        cmp: (A, A) => Int): Boolean =
      lohi.forall { case (lo, hi) =>
        op match {
          case "="  => cmp(x, lo) >= 0 && cmp(x, hi) <= 0
          case ">"  => cmp(hi, x) > 0
          case ">=" => cmp(hi, x) >= 0
          case "<"  => cmp(lo, x) < 0
          case "<=" => cmp(lo, x) <= 0
          // col != x is impossible only when the bounds pin every
          // non-null value to exactly x
          case "!=" => !(cmp(lo, hi) == 0 && cmp(x, lo) == 0)
        }
      }
    val cmpL = (a: Long, b: Long) => java.lang.Long.compare(a, b)
    // a comparison prunes if EITHER typed view proves disjointness
    // (a column is long- or string-stamped, never both); a comparison
    // whose column operand is ALL-null — or whose literal operand IS
    // null — is never TRUE regardless of the operator
    def binop(l: Expression, r: Expression, op: String): Boolean =
      if (isNullLit(l) || isNullLit(r)) false
      else if (Seq(l, r).flatMap(nullPropAttr(_)).exists(allNull)) false
      else {
        val longSide = norm(l, r, op, litLong)
          .forall { case (n, x, o) => possibleIn(range(n), x, o, cmpL) }
        val strSide = norm(l, r, op, litStr)
          .forall { case (n, x, o) => possibleIn(srange(n), x, o, cmpUtf8) }
        longSide && strSide
      }
    // "may p be TRUE on some physical row?"
    def go(p: Expression): Boolean = p match {
      case And(l, r) => go(l) && go(r)
      case Or(l, r)  => go(l) || go(r)
      case Not(q)    => goNot(q)
      case EqualTo(l, r)            => binop(l, r, "=")
      case GreaterThan(l, r)        => binop(l, r, ">")
      case GreaterThanOrEqual(l, r) => binop(l, r, ">=")
      case LessThan(l, r)           => binop(l, r, "<")
      case LessThanOrEqual(l, r)    => binop(l, r, "<=")
      case IsNull(e) => attrName(e) match {
        // only a bare / value-preserving-cast column proves "never
        // null" — a cross-family cast can MANUFACTURE nulls
        case Some(n) if noNull(n) => false
        case _                    => true
      }
      case IsNotNull(e) => nullPropAttr(e) match {
        case Some(n) if allNull(n) => false
        case _                     => true
      }
      case EqualNullSafe(l, r) =>
        // col <=> NULL is IS NULL; with a non-null literal the TRUE set
        // equals EqualTo's (the both-null case is impossible); two
        // non-literal sides could BOTH be null — no claim
        if (isNullLit(l)) go(IsNull(r))
        else if (isNullLit(r)) go(IsNull(l))
        else if (isNonNullLit(l) || isNonNullLit(r)) binop(l, r, "=")
        else true
      case In(a, vs) =>
        if (nullPropAttr(a).exists(allNull)) false
        else attrName(a) match {
          case Some(n) =>
            val ls = vs.flatMap(litLong(_))
            val ss = vs.flatMap(litStr(_))
            if (ls.size == vs.size)
              range(n).forall { case (lo, hi) => ls.exists(x => x >= lo && x <= hi) }
            else if (ss.size == vs.size)
              srange(n).forall { case (lo, hi) =>
                ss.exists(x => cmpUtf8(x, lo) >= 0 && cmpUtf8(x, hi) <= 0) }
            else true // mixed / non-literal members: unknown
          case None => true
        }
      case _ => true
    }
    // "may NOT(p) be TRUE?" — K3 'is TRUE' De Morgan: Not(And) is TRUE
    // iff either conjunct is FALSE; Not(cmp) is TRUE iff the operands
    // are non-null and the complement comparison holds
    def goNot(p: Expression): Boolean = p match {
      case Not(q)    => go(q)
      case And(l, r) => goNot(l) || goNot(r)
      case Or(l, r)  => goNot(l) && goNot(r)
      case IsNull(e)    => go(IsNotNull(e))
      case IsNotNull(e) => go(IsNull(e))
      case EqualTo(l, r)            => binop(l, r, "!=")
      case GreaterThan(l, r)        => binop(l, r, "<=")
      case GreaterThanOrEqual(l, r) => binop(l, r, "<")
      case LessThan(l, r)           => binop(l, r, ">=")
      case LessThanOrEqual(l, r)    => binop(l, r, ">")
      case In(a, vs) =>
        // NOT IN is TRUE iff the column is non-null and differs from
        // every member — impossible only when the bounds pin a single
        // value that IS a (literal) member
        if (nullPropAttr(a).exists(allNull)) false
        else attrName(a) match {
          case Some(n) =>
            val ls = vs.flatMap(litLong(_))
            val ss = vs.flatMap(litStr(_))
            if (ls.size == vs.size)
              range(n).forall { case (lo, hi) => !(lo == hi && ls.contains(lo)) }
            else if (ss.size == vs.size)
              srange(n).forall { case (lo, hi) =>
                !(cmpUtf8(lo, hi) == 0 && ss.exists(x => cmpUtf8(x, lo) == 0)) }
            else true
          case None => true
        }
      case _ => true
    }
    go(pred)
  }
}
