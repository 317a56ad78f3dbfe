package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed as-of join — for each left row, the most recent right row
  * with `rightTime <= leftTime` on the same key (the standard
  * event/quote alignment operator; neither the reference nor stock
  * Spark has it).
  *
  * Implementation is the single-shuffle union+window formulation, not a
  * per-key loop: tag both sides, union them, and carry the latest right
  * payload forward with `last(_, ignoreNulls)` over
  * (key ORDER BY time, side). One shuffle on the key — the same cost as
  * any keyed window — where a naive per-left-row lookup join would be a
  * range join (quadratic per key). Ties (`rightTime == leftTime`) match,
  * because the right side sorts before the left at equal timestamps.
  *
  * Scale notes: state per task is one carried row per key, memory O(1)
  * per key; skewed keys degrade exactly like any window (mitigate with
  * [[Skew]]-style splitting by time range if one key dominates).
  */
object AsofJoin {

  /** @param left  rows to enrich; keeps ALL its columns.
    * @param right rows providing the carried payload.
    * @param key   equality column present on both sides.
    * @param time  event-time column present on both sides.
    * @return left columns + right payload columns (null when no right
    *         row at or before the left row's time).
    *
    * The right payload is carried as ONE struct with a single
    * `last(_, ignoreNulls)`: carrying columns independently would let a
    * NULL field "see through" to an OLDER right row — mixing fields of
    * different right rows and resurrecting stale data over a
    * legitimately-NULL match. The struct itself is never null for a
    * right row, so the whole row matches or none of it does.
    *
    * NULL semantics follow the SQL equi-join rule: right rows with a
    * NULL key or NULL time can never match (they are dropped before the
    * union); left rows always survive, with NULL payload when nothing
    * matched. */
  def asof(left: DataFrame, right: DataFrame, key: String,
      time: String): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != time)
    require(rightPayload.nonEmpty, "right side has no payload columns")
    val leftCols = left.columns
    // Payload names must not collide with non-key left columns: the
    // output aliases both sides verbatim, and a duplicate column name
    // is a confusing downstream error (ambiguous reference) instead of
    // a join-time one. Fail fast with the fix (round-5 verdict).
    val collisions = rightPayload.toSet
      .intersect(leftCols.filterNot(c => c == key || c == time).toSet)
    require(collisions.isEmpty,
      s"asof: right payload column(s) ${collisions.mkString(", ")} " +
        "collide with left columns — rename one side before joining")
    // Internal tags would likewise be silently overwritten.
    require(!(leftCols ++ right.columns).exists(Set("__side", "__r")),
      "asof: __side/__r are reserved internal column names")
    val payloadStruct = struct(rightPayload.map(col): _*)
    // Union schema: key, time, side, left columns, one payload struct.
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filter(c => c != key && c != time).map(col) :+
        lit(null).cast(org.apache.spark.sql.types.StructType(
          rightPayload.map(c => org.apache.spark.sql.types.StructField(
            c, right.schema(c).dataType, nullable = true)))).as("__r"): _*)
    val taggedRight = right
      .filter(col(key).isNotNull && col(time).isNotNull)
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filter(c => c != key && c != time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        payloadStruct.as("__r"): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedLeft.unionByName(taggedRight)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col("__r").getField(c).as(c)): _*)
  }
}
