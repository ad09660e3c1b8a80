package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** As-of (most-recent-at-or-before) join — the canonical time-series
  * operator Spark has no built-in for.
  *
  * Semantics: every left row picks, within its key group, the right
  * row with the greatest right time <= left time (ties on time: the
  * right row joins the co-timed left row). Left rows with no prior
  * right row keep nulls — left-outer as-of.
  *
  * Spark shape: NOT a range join (O(L·R) nested loop) and NOT a
  * per-row subquery. Union both sides tagged, sort each key group by
  * (time, side), and carry the right side's values forward with
  * last(ignoreNulls) over the preceding-rows frame. One shuffle on the
  * key, one sort — the same cost as a window aggregate, which is what
  * makes it usable at 100 TB (keys distribute; a key group's sort is
  * the inherent lower bound of as-of semantics). DuckDB's native
  * ASOF JOIN is the oracle.
  */
object AsOfJoin {

  /** @param left      probe side; all its columns are kept
    * @param right     reference side: exactly (keys..., time, payload...)
    * @param keys      equi-join key column names (both sides)
    * @param time      ordering column name (both sides, same type)
    * @param payload   right-side value columns carried to the output
    *                  (null when no right row at-or-before)
    */
  def asof(left: DataFrame, right: DataFrame, keys: Seq[String], time: String,
      payload: Seq[String]): DataFrame = {
    require(payload.nonEmpty, "as-of join needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(!leftCols.exists(payload.contains),
      s"payload ${payload.mkString(",")} collides with a left column")

    // Tagged union: right rows sort BEFORE left rows at equal time so a
    // co-timed right row is visible to the left row (<= semantics).
    // The payload travels as ONE struct per right row: last(ignoreNulls)
    // then picks the latest right ROW atomically — per-column carry
    // would skip null payload fields and mix values from different
    // right rows (true as-of, like DuckDB ASOF, must not).
    val pStruct = struct(payload.map(col): _*)
    val pType = {
      val f = right.select(pStruct.as("__p")).schema("__p").dataType
      f
    }
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__p", lit(null).cast(pType))
    val r = right
      // SQL equi/inequality semantics: a null key or null time never
      // matches anything — but window partitioning GROUPS nulls, so
      // such right rows must not enter the union at all (left rows
      // with null keys then correctly keep a null payload)
      .where((keys :+ time).map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__side", lit(0))
      .withColumn("__p", pStruct)
      .select((leftCols.map(c =>
        if (keys.contains(c) || c == time) col(c)
        else lit(null).cast(left.schema(c).dataType).as(c)) :+
        col("__side") :+ col("__p")): _*)

    // __p as the final sort key: right rows tied on (time) are peers
    // otherwise, and last() would pick whichever the shuffle left
    // last — ordering by the payload struct makes the pick (the
    // largest payload tuple) deterministic
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(time).asc, col("__side").asc, col("__p").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r.select(l.columns.map(col): _*))
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(w))
    carried.where(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(c => col(s"__p.$c").as(c)): _*)
  }
}
