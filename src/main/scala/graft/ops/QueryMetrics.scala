package graft.ops

import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

import java.util.concurrent.atomic.AtomicLong

/** Task-level shuffle accounting for a single query execution — the
  * quantitative half of the plan audits. A plan-shape assertion says
  * "no exchange on the corpus"; this says HOW MANY BYTES actually
  * crossed the wire, which is the number a 1000-executor run bills
  * for. Used by ShuffleBudgetSpec to prove shuffle-volume claims (the
  * Spearman O(I·n)-vs-O(P·n) design, broadcast-only star joins)
  * instead of asserting them.
  *
  * Listener events are delivered asynchronously; [[measure]] polls for
  * quiescence after the action rather than reaching into the private
  * listener bus. Totals are for the WHOLE execution window, so run one
  * query at a time.
  */
object QueryMetrics {

  final case class ShuffleTotals(
      shuffleWriteBytes: Long,
      shuffleReadBytes: Long,
      shuffleRecordsWritten: Long,
      tasks: Long)

  def measure(df: DataFrame): ShuffleTotals = {
    val spark = df.sparkSession
    val write = new AtomicLong
    val read = new AtomicLong
    val records = new AtomicLong
    val tasks = new AtomicLong
    val listener = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) {
          write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          records.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          tasks.incrementAndGet()
          ()
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.write.mode("overwrite").format("noop").save()
      // quiesce: the bus is async — wait until the task counter stops
      // moving (bounded), so trailing onTaskEnd events are counted
      var last = -1L
      var spins = 0
      while (tasks.get() != last && spins < 50) {
        last = tasks.get()
        Thread.sleep(100)
        spins += 1
      }
    } finally spark.sparkContext.removeSparkListener(listener)
    ShuffleTotals(write.get(), read.get(), records.get(), tasks.get())
  }
}
