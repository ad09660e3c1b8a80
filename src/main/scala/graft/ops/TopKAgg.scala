package graft.ops

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** One scored ANN candidate: `nc` is the NEGATED cosine (so ascending
  * order = best-first — the rankTopK tie order: cosine desc, ties to
  * the lowest neighbor id).
  */
case class ScoredCand(nc: Double, neighbor_id: Long)

/** The aggregation buffer, wrapped so the k-bounded candidate list
  * rides a product encoder (struct with one array field) through the
  * streaming state store.
  */
case class TopKBuf(cands: Seq[ScoredCand])

/** Bounded top-k aggregation — the x20 max-struct discipline
  * generalized from k = 1 to k: the buffer holds AT MOST k candidates
  * at every point of the fold (`reduce` and `merge` both re-truncate),
  * so when this runs as a STREAMING aggregation the state store keeps
  * k structs per key — never a key's full candidate history, which is
  * what `collect_list` state would grow into. This is what makes
  * update-mode ANN serving (x30) a production envelope: per-key state
  * is O(k), and key eviction is MEASURED, not asserted — x30 keys on
  * (event-time window, query) under a watermark on RocksDB, and
  * WatermarkEvictionSpec pins numRowsRemoved > 0 with drained == batch
  * for this exact aggregator shape.
  *
  * Semantics contract (pinned in TopKServingStateSpec): the bounded
  * fold loses NOTHING — top-k is a monotone statistic, so the k-bounded
  * merge of any partition of the input equals the top-k of the whole
  * input, and in a multi-batch stream each emitted update is the
  * running top-k of everything seen, whose final value (equivalently:
  * the re-ranked union of all updates) is the global top-k.
  */
class TopKCandAgg(k: Int) extends Aggregator[ScoredCand, TopKBuf, TopKBuf] {
  require(k >= 1, s"k must be >= 1, got $k")
  private val ord: Ordering[ScoredCand] =
    Ordering.by((c: ScoredCand) => (c.nc, c.neighbor_id))
  def zero: TopKBuf = TopKBuf(Vector.empty)
  // k is serving-sized (single digits to low hundreds); the per-element
  // re-sort of <= k+1 entries is cheaper than heap bookkeeping at that
  // size and keeps the buffer canonically ordered for the state store
  def reduce(b: TopKBuf, a: ScoredCand): TopKBuf =
    TopKBuf((b.cands :+ a).sorted(ord).take(k))
  def merge(b1: TopKBuf, b2: TopKBuf): TopKBuf =
    TopKBuf((b1.cands ++ b2.cands).sorted(ord).take(k))
  def finish(r: TopKBuf): TopKBuf = r
  def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  def outputEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
}
