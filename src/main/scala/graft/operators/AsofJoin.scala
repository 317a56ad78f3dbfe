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
    *         row at or before the left row's time). */
  def asof(left: DataFrame, right: DataFrame, key: String,
      time: String): DataFrame = {
    val rightPayload = right.columns.filter(c => c != key && c != time)
    require(rightPayload.nonEmpty, "right side has no payload columns")
    val leftCols = left.columns
    // Union schema: key, time, side, left columns, right payload.
    val taggedLeft = left
      .withColumn("__side", lit(1))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filter(c => c != key && c != time).map(col) ++
        rightPayload.map(c => lit(null).cast(right.schema(c).dataType)
          .as(s"__r_$c")): _*)
    val taggedRight = right
      .withColumn("__side", lit(0))
      .select(Seq(col(key), col(time), col("__side")) ++
        leftCols.filter(c => c != key && c != time)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightPayload.map(c => col(c).as(s"__r_$c")): _*)
    val w = Window.partitionBy(key)
      .orderBy(col(time).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(taggedLeft.unionByName(taggedRight)) {
      case (df, c) =>
        df.withColumn(s"__r_$c", last(col(s"__r_$c"), ignoreNulls = true)
          .over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"__r_$c").as(c)): _*)
  }
}
