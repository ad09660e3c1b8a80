package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Growable pair-of-doubles buffer for [[SpearmanStat]]. The aggregate
  * state IS the (va, vb) sample vectors — rank statistics have no
  * smaller sufficient statistic (the fractional rank of a value depends
  * on the whole per-pair sample multiset), so the best a distributed
  * plan can do is ship the raw vectors once, compactly, and do all
  * sorting/ranking executor-side at merge completion.
  */
final class SpearmanPairBuffer(initialCapacity: Int = 16) {
  var n: Int = 0
  var va: Array[Double] = new Array[Double](initialCapacity)
  var vb: Array[Double] = new Array[Double](initialCapacity)

  def append(a: Double, b: Double): Unit = {
    if (n == va.length) {
      val cap = math.max(va.length * 2, 16)
      va = java.util.Arrays.copyOf(va, cap)
      vb = java.util.Arrays.copyOf(vb, cap)
    }
    va(n) = a
    vb(n) = b
    n += 1
  }

  def appendAll(other: SpearmanPairBuffer): Unit = {
    if (other.n > 0) {
      if (n + other.n > va.length) {
        val cap = math.max(va.length * 2, n + other.n)
        va = java.util.Arrays.copyOf(va, cap)
        vb = java.util.Arrays.copyOf(vb, cap)
      }
      System.arraycopy(other.va, 0, va, n, other.n)
      System.arraycopy(other.vb, 0, vb, n, other.n)
      n += other.n
    }
  }
}

/** Exact Spearman sufficient statistics as ONE aggregation pass:
  * `spearman_stat(va, vb)` over the rows of a gene pair returns
  * `struct(n_samples, rho, min_a, max_a, min_b, max_b)` where `rho` is
  * the tie-averaged fractional-rank Pearson correlation over exactly
  * the rows of the group (= the shared-sample intersection when fed a
  * pair self-join; reference semantics
  * src/etl_for_all_studies/correlation.py:17-30,95-162).
  *
  * Plan shape this buys (vs two per-pair rank windows + `corr`): the
  * join output P·n rows never shuffle. Map-side partial aggregation
  * packs each pair's (va, vb) vectors into a compact primitive buffer
  * (16 bytes/row, pair key stored once per map partition instead of
  * once per row), the single exchange carries those buffers, and the
  * final merge sorts two n-element primitive arrays per pair and
  * computes rho from rank sums — no window machinery, no P·n-row sort,
  * one shuffle. Measured on the 4-study scale fixture (7,140 pairs ×
  * 5,000 samples/study) this replaced two 35.7 M-row window sorts.
  *
  * Ranking detail: mean fractional rank is (n+1)/2 exactly (ranks
  * always sum to n(n+1)/2, ties or not), so rho needs one pass of
  * centered products; per-element ranks come from two binary searches
  * on the sorted copy (average of the tie-run positions).
  *
  * Null/NaN policy: rows where either value is NULL are skipped (the
  * upstream melt drops cast-nulls — F3/F4 — same caller contract as
  * `Ranks.fractionalRankLowCard`); NaN values rank greatest-tied,
  * matching Spark/window NaN ordering.
  */
case class SpearmanStat(
    left: Expression,
    right: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[SpearmanPairBuffer] with BinaryLike[Expression] {

  override def prettyName: String = "graft_spearman_stat"
  override def nullable: Boolean = false

  override def dataType: DataType = SpearmanStat.outputType

  override def createAggregationBuffer(): SpearmanPairBuffer = new SpearmanPairBuffer()

  override def update(buffer: SpearmanPairBuffer, input: InternalRow): SpearmanPairBuffer = {
    val a = left.eval(input)
    val b = right.eval(input)
    if (a != null && b != null) {
      // NaN → +Inf: Arrays.sort puts NaN last but binary-search
      // comparisons can't see it; +Inf reproduces Spark's
      // NaN-sorts-greatest window ordering for ranking purposes.
      val x = a.asInstanceOf[Double]
      val y = b.asInstanceOf[Double]
      buffer.append(
        if (java.lang.Double.isNaN(x)) Double.PositiveInfinity else x,
        if (java.lang.Double.isNaN(y)) Double.PositiveInfinity else y)
    }
    buffer
  }

  override def merge(buffer: SpearmanPairBuffer, input: SpearmanPairBuffer): SpearmanPairBuffer = {
    buffer.appendAll(input)
    buffer
  }

  override def eval(buffer: SpearmanPairBuffer): Any = {
    val n = buffer.n
    if (n == 0) {
      InternalRow(0L, Double.NaN, Double.NaN, Double.NaN, Double.NaN, Double.NaN)
    } else {
      val sa = java.util.Arrays.copyOf(buffer.va, n)
      val sb = java.util.Arrays.copyOf(buffer.vb, n)
      java.util.Arrays.sort(sa)
      java.util.Arrays.sort(sb)
      val m = (n + 1) / 2.0 // exact mean of fractional ranks
      var cov = 0.0
      var varA = 0.0
      var varB = 0.0
      var i = 0
      while (i < n) {
        val ra = SpearmanStat.fractionalRank(sa, buffer.va(i)) - m
        val rb = SpearmanStat.fractionalRank(sb, buffer.vb(i)) - m
        cov += ra * rb
        varA += ra * ra
        varB += rb * rb
        i += 1
      }
      val rho = if (varA > 0.0 && varB > 0.0) cov / math.sqrt(varA * varB) else Double.NaN
      InternalRow(n.toLong, rho, sa(0), sa(n - 1), sb(0), sb(n - 1))
    }
  }

  override def serialize(buffer: SpearmanPairBuffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buffer.n)
    bb.putInt(buffer.n)
    var i = 0
    while (i < buffer.n) { bb.putDouble(buffer.va(i)); i += 1 }
    i = 0
    while (i < buffer.n) { bb.putDouble(buffer.vb(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): SpearmanPairBuffer = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = new SpearmanPairBuffer(math.max(n, 1))
    buf.n = n
    var i = 0
    while (i < n) { buf.va(i) = bb.getDouble; i += 1 }
    i = 0
    while (i < n) { buf.vb(i) = bb.getDouble; i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpearmanStat =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpearmanStat =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SpearmanStat =
    copy(left = newLeft, right = newRight)
}

object SpearmanStat {
  val outputType: StructType = StructType(Seq(
    StructField("n_samples", LongType, nullable = false),
    StructField("rho", DoubleType, nullable = false),
    StructField("min_a", DoubleType, nullable = false),
    StructField("max_a", DoubleType, nullable = false),
    StructField("min_b", DoubleType, nullable = false),
    StructField("max_b", DoubleType, nullable = false)))

  /** 1-based tie-averaged rank of `x` within ascending-sorted `sorted`:
    * average of the positions of x's tie run, via two binary searches
    * (first index ≥ x, first index > x). All-primitive, no boxing.
    */
  def fractionalRank(sorted: Array[Double], x: Double): Double = {
    // lower bound: first i with sorted(i) >= x
    var lo = 0
    var hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) < x) lo = mid + 1 else hi = mid
    }
    val first = lo
    // upper bound: first i with sorted(i) > x
    hi = sorted.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (sorted(mid) <= x) lo = mid + 1 else hi = mid
    }
    // tie run occupies 1-based positions first+1 .. lo
    (first + 1 + lo) / 2.0
  }
}

object SpearmanStatFn {
  /** `spearman_stat(va, vb)` as an aggregate Column; see [[SpearmanStat]]. */
  def apply(va: Column, vb: Column): Column =
    graft.functions.exprToColumn(
      SpearmanStat(
        graft.functions.columnToExpr(va.cast("double")),
        graft.functions.columnToExpr(vb.cast("double"))).toAggregateExpression())
}
