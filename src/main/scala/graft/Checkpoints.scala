package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic block reclamation for eagerly `localCheckpoint(true)`'d
  * frames.
  *
  * `Dataset.unpersist()` is a NO-OP on a checkpointed frame:
  * `localCheckpoint` persists the internal `RDD[InternalRow]` directly
  * (not through the `CacheManager`), so `uncacheQuery` finds nothing and
  * the superseded blocks linger until the `ContextCleaner`/GC happens to
  * reclaim them. Iterative operators (PageRank, connected components,
  * blocked Spearman) that promise "footprint stays at one table per
  * round" must therefore unpersist the RDD itself: the checkpointed
  * frame's analyzed plan is a [[LogicalRDD]] leaf whose `rdd` IS the
  * persisted one.
  *
  * Only call this once nothing will read the frame again — the
  * checkpoint truncated its lineage, so a dropped frame cannot be
  * recomputed.
  */
object Checkpoints {

  /** Drop the persisted blocks behind a `localCheckpoint(true)`'d frame
    * now (non-blocking). No-op for frames that are not checkpoint
    * leaves (e.g. `cache()`'d ones — use `Dataset.unpersist` there).
    */
  def drop(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(false)
      case _             => ()
    }
}
