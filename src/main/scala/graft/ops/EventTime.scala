package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType, TimestampNTZType, TimestampType}

/** Canonicalizes the physical encoding of an event-time column.
  *
  * The `events` table has shipped under two equally-valid parquet
  * encodings of `ts`:
  *
  *  - `TIMESTAMP(NANOS)`, which Spark surfaces as a raw `Long` of
  *    nanoseconds since epoch under
  *    `spark.sql.legacy.parquet.nanosAsLong` (Spark has no ns
  *    timestamp type);
  *  - `TIMESTAMP(MICROS)`, surfaced as `TimestampType` (LTZ) or
  *    `TimestampNTZType` depending on `isAdjustedToUTC` /
  *    `spark.sql.parquet.inferTimestampNTZ.enabled`.
  *
  * Every event-time operator in this engine (hourly truncation,
  * session gaps, as-of ordering, band joins) does integer arithmetic
  * on a canonical `Long` of NANOSECONDS derived here, so a testdata
  * regeneration that flips the physical encoding changes nothing
  * downstream. Nanos (not micros) is canonical because it is lossless
  * for both encodings: the ns-encoded table keeps sub-µs ordering and
  * gap precision (the DuckDB oracle compares `epoch_ns` too), and the
  * µs-encoded table maps exactly onto multiples of 1000.
  *
  * The µs branch goes through `unix_micros`, which requires the
  * session-local `TimestampType`; `TimestampNTZType` is cast to it
  * first, an identity mapping because [[graft.GraftSession]] pins
  * `spark.sql.session.timeZone=UTC` — the same "naive timestamp is
  * UTC epoch" convention the DuckDB oracle applies.
  *
  * Overflow: µs-since-epoch ×1000 stays below 2^63 until the year
  * 2262 — the same horizon as any ns-precision epoch Long.
  */
object EventTime {

  /** Canonical event time in ns since epoch, as a Column over `df`'s
    * physical `tsCol` encoding. Fails loudly (column + encoding named)
    * on an encoding no branch covers, instead of letting a
    * DATATYPE_MISMATCH surface from deep inside a query plan.
    */
  def tsNanos(df: DataFrame, tsCol: String = "ts"): Column =
    tsNanosOf(df.schema(tsCol).dataType, col(tsCol), tsCol)

  def tsNanosOf(dt: DataType, c: Column, name: String = "ts"): Column = dt match {
    case LongType => c
    case TimestampType => unix_micros(c) * lit(1000L)
    case TimestampNTZType => unix_micros(c.cast(TimestampType)) * lit(1000L)
    case other =>
      throw new IllegalArgumentException(
        s"event-time column '$name' has unsupported physical type $other; " +
          "expected Long (raw parquet ns under nanosAsLong), TIMESTAMP, or " +
          "TIMESTAMP_NTZ")
  }

  /** `df` with a canonical `ts_ns: Long` column appended. */
  def withTsNanos(df: DataFrame, tsCol: String = "ts"): DataFrame =
    df.withColumn("ts_ns", tsNanos(df, tsCol))

  /** ns → µs by integer truncation, over any SQL expression string
    * (a column name, or an aggregate like `min(ts_ns)`). Integer DIV,
    * never Column./ (double division): at 2^60 magnitudes a double
    * loses sub-µs precision and can flip events across hour/gap
    * boundaries.
    */
  def nsToMicros(tsNsExpr: String): Column =
    expr(s"CAST(($tsNsExpr - pmod($tsNsExpr, 1000)) DIV 1000 AS BIGINT)")
}
