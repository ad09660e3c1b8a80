package graft

import graft.ops.EventTime
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema contract against the driver-provided testdata.
  *
  * Round-5 lesson: the testdata regenerated `events.ts` from parquet
  * TIMESTAMP(NANOS) (read as raw Long ns under nanosAsLong) to native
  * timestamp[us], and nine event-time queries silently vanished from
  * the correctness file because the engine assumed one physical
  * encoding. This spec fails LOUDLY, naming the table, column, and
  * offending physical type, the next time a regeneration shifts an
  * encoding outside what the engine canonicalizes.
  */
class SchemaContractSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def available = new java.io.File(sfDir).isDirectory

  /** Logical column families the engine accepts per table: each column
    * maps to the set of physical types the engine's read path (and,
    * for `ts`, EventTime's canonicalization) is known to handle.
    */
  private val integral: Set[DataType] = Set(LongType, IntegerType)
  private val eventTime: Set[DataType] =
    Set(LongType, TimestampType, TimestampNTZType)
  private val contract: Map[String, Map[String, Set[DataType]]] = Map(
    "events" -> Map(
      "event_id" -> integral, "ts" -> eventTime, "user_id" -> integral,
      "event_type" -> Set(StringType), "value" -> Set(DoubleType),
      "props" -> Set(StringType)),
    "documents" -> Map(
      "doc_id" -> integral, "text" -> Set(StringType),
      "lang" -> Set(StringType), "source" -> Set(StringType),
      "n_chars" -> integral),
    "embeddings" -> Map(
      "vec_id" -> integral,
      "embedding" -> Set(ArrayType(FloatType), ArrayType(FloatType, false),
        ArrayType(DoubleType), ArrayType(DoubleType, false)),
      "label" -> integral),
    "lineitem" -> Map(
      "l_orderkey" -> integral, "l_linenumber" -> integral,
      "l_quantity" -> Set(DoubleType, LongType, IntegerType),
      "l_extendedprice" -> Set(DoubleType), "l_discount" -> Set(DoubleType),
      "l_returnflag" -> Set(StringType)),
    "orders" -> Map(
      "o_orderkey" -> integral, "o_custkey" -> integral,
      "o_totalprice" -> Set(DoubleType), "o_orderpriority" -> Set(StringType),
      // d6 canonicalizes the change-feed date through EventTime — the
      // same accepted-encoding set as events.ts
      "o_orderdate" -> eventTime, "o_orderstatus" -> Set(StringType)),
    "customer" -> Map(
      "c_custkey" -> integral, "c_mktsegment" -> Set(StringType),
      "c_nationkey" -> integral),
    "nation" -> Map(
      "n_nationkey" -> integral, "n_regionkey" -> integral,
      "n_name" -> Set(StringType)),
    "region" -> Map("r_regionkey" -> integral, "r_name" -> Set(StringType)),
    "supplier" -> Map(
      "s_suppkey" -> integral, "s_nationkey" -> integral,
      "s_name" -> Set(StringType)),
    "part" -> Map("p_partkey" -> integral, "p_brand" -> Set(StringType))
  )

  test("every testdata table satisfies the engine's column contract") {
    assume(available, s"$sfDir not present")
    val violations = contract.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      val f = new java.io.File(s"$sfDir/$table.parquet")
      if (!f.exists()) Seq(s"$table: file missing at ${f.getPath}")
      else {
        val schema = spark.read.parquet(f.getPath).schema
        cols.toSeq.sortBy(_._1).flatMap { case (name, accepted) =>
          schema.find(_.name == name) match {
            case None =>
              Some(s"$table.$name: column missing (have ${schema.fieldNames.mkString(",")})")
            case Some(field) if !accepted.contains(field.dataType) =>
              Some(s"$table.$name: physical type ${field.dataType.simpleString} " +
                s"not in accepted set {${accepted.map(_.simpleString).mkString(", ")}}")
            case _ => None
          }
        }
      }
    }
    assert(violations.isEmpty,
      s"\ntestdata schema contract violated:\n  ${violations.mkString("\n  ")}")
  }

  test("EventTime canonicalizes every accepted ts encoding to identical ns") {
    import spark.implicits._
    val usSinceEpoch = 1754954096123456L // 2025-08-11T...Z, µs precision
    // Long-ns encoding: raw ns pass through untouched (lossless)
    val nsDf = Seq(usSinceEpoch * 1000L + 789L).toDF("ts")
    assert(nsDf.select(EventTime.tsNanos(nsDf)).head.getLong(0) ==
      usSinceEpoch * 1000L + 789L)
    // TimestampType (LTZ) encoding
    val ltzDf = Seq(usSinceEpoch).toDF("us").select(timestamp_micros(col("us")).as("ts"))
    assert(ltzDf.schema("ts").dataType == TimestampType)
    assert(ltzDf.select(EventTime.tsNanos(ltzDf).as("ns")).head.getLong(0) ==
      usSinceEpoch * 1000L)
    // TimestampNTZType encoding (UTC session: identity with LTZ)
    val ntzDf = ltzDf.select(col("ts").cast(TimestampNTZType).as("ts"))
    assert(ntzDf.schema("ts").dataType == TimestampNTZType)
    assert(ntzDf.select(EventTime.tsNanos(ntzDf).as("ns")).head.getLong(0) ==
      usSinceEpoch * 1000L)
  }

  test("EventTime rejects an unsupported ts encoding loudly, naming it") {
    import spark.implicits._
    val bad = Seq("2025-01-01").toDF("ts")
    val e = intercept[IllegalArgumentException](EventTime.tsNanos(bad))
    assert(e.getMessage.contains("'ts'"))
    assert(e.getMessage.toLowerCase.contains("string"))
  }

  test("nsToMicros truncates by integer division (no double precision loss)") {
    import spark.implicits._
    // 2^60-magnitude value where double division is lossy: the exact
    // µs is representable, the double quotient rounds
    val ns = 1152921504606846975L // 2^60 - 1
    val df = Seq(ns).toDF("ts_ns")
    assert(df.select(EventTime.nsToMicros("ts_ns")).head.getLong(0) == ns / 1000L)
  }

  test("a whole event query is encoding-invariant: hourly agg over Long-ns and timestamp[us] frames is identical") {
    // The round-5 failure mode, end-to-end: the same events through
    // both physical encodings must produce byte-identical aggregates.
    // (Scalar canonicalization above is necessary but not sufficient —
    // a query could still branch on the raw column somewhere.)
    import spark.implicits._
    val baseUs = 1754954096000000L
    val rows = (0 until 500).map { i =>
      (i.toLong, baseUs + i * 137_000_000L, s"type${i % 3}", i * 0.25)
    }
    val nsDf = rows.map { case (id, us, ty, v) => (id, us * 1000L + (id % 997), ty, v) }
      .toDF("event_id", "ts", "event_type", "value")
    val usDf = rows.toDF("event_id", "us", "event_type", "value")
      .select(col("event_id"), timestamp_micros(col("us")).as("ts"),
        col("event_type"), col("value"))
    def agg(df: org.apache.spark.sql.DataFrame): Set[(java.sql.Timestamp, String, Long, Double)] =
      EventTime.withTsNanos(df)
        .groupBy(date_trunc("hour",
          timestamp_micros(EventTime.nsToMicros("ts_ns"))).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("value")).as("s"))
        .as[(java.sql.Timestamp, String, Long, Double)].collect().toSet
    // sub-µs digits in the ns frame cannot move an event across an
    // hour boundary, so the two aggregates are identical
    assert(agg(nsDf) == agg(usDf))
  }
}
