package graft

import org.apache.spark.sql.functions._

import graft.operators.AsofJoin

/** As-of join semantics: latest right row at-or-before each left row. */
class AsofJoinSpec extends SparkTestBase {

  import spark.implicits._

  test("asof picks the latest right row at or before each left time") {
    val trades = Seq(
      ("A", 0L, 100.0), ("A", 1L, 101.0), ("A", 3L, 102.0),
      ("A", 7L, 103.0), ("B", 2L, 200.0), ("B", 9L, 201.0))
      .toDF("sym", "t", "px")
    val quotes = Seq(
      ("A", 1L, 10.0), ("A", 5L, 11.0), ("B", 2L, 20.0), ("B", 10L, 21.0))
      .toDF("sym", "t", "bid")
    val out = AsofJoin.asof(trades, quotes, "sym", "t")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
      .toSet
    assert(out == Set(
      ("A", 0L, None),        // before any quote
      ("A", 1L, Some(10.0)),  // tie: quote at t=1 matches
      ("A", 3L, Some(10.0)),
      ("A", 7L, Some(11.0)),
      ("B", 2L, Some(20.0)),
      ("B", 9L, Some(20.0))), out.toString)
  }

  test("asof carries the payload row-atomically when fields are NULL") {
    // Right row at t=5 has bid=NULL, sz=50: a per-column carry would
    // "see through" the NULL to the older bid=10 while taking sz=50 —
    // stitching two right rows together. The struct carry must return
    // the t=5 row as-is: (NULL, 50).
    val left = Seq(("A", 6L)).toDF("sym", "t")
    val right = Seq(
      ("A", 1L, Some(10.0), Some(17L)),
      ("A", 5L, None: Option[Double], Some(50L)))
      .toDF("sym", "t", "bid", "sz")
    val out = AsofJoin.asof(left, right, "sym", "t").collect()
    assert(out.length == 1)
    assert(out.head.isNullAt(2), "NULL bid must not resurrect older row")
    assert(out.head.getLong(3) == 50L)
  }

  test("asof never matches NULL keys or NULL times (SQL join semantics)") {
    val left = Seq((Some("A"), 5L), (None: Option[String], 5L))
      .toDF("sym", "t")
    val right = Seq(
      (Some("A"), Some(1L), 10.0),             // legitimate match
      (None: Option[String], Some(2L), 66.0),  // NULL key: never matches
      (Some("A"), None: Option[Long], 77.0))   // NULL time: never matches
      .toDF("sym", "t", "bid")
    val out = AsofJoin.asof(left, right, "sym", "t").collect()
      .map(r => (Option(r.getString(0)), Option(r.get(2)))).toSet
    assert(out == Set(
      (Some("A"), Some(10.0)),
      (None, None)), out.toString)
  }

  test("asof preserves every left row and all left columns") {
    val left = Tables(spark, sf, "events")
      .select(col("user_id"), col("ts").cast("long").as("t"),
        col("event_type"), col("value"))
    val right = left.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("t"), col("value").as("last_purchase"))
      .groupBy("user_id", "t").agg(max("last_purchase").as("last_purchase"))
    val out = AsofJoin.asof(left, right, "user_id", "t")
    assert(out.count() == left.count())
    assert(out.columns.toSeq ==
      Seq("user_id", "t", "event_type", "value", "last_purchase"))
    // Carried value is never from the future: join back and check.
    val bad = out.filter(col("last_purchase").isNotNull)
      .join(right.groupBy("user_id")
        .agg(min("t").as("first_rt")), "user_id")
      .filter(col("t") < col("first_rt"))
    assert(bad.count() == 0)
  }

  test("asof rejects right payload columns colliding with left columns") {
    // Both sides carry a non-key `px`: the output would otherwise hold
    // TWO `px` columns and fail only on the first downstream reference.
    val left = Seq(("A", 1L, 1.0)).toDF("sym", "t", "px")
    val right = Seq(("A", 1L, 2.0)).toDF("sym", "t", "px")
    val err = intercept[IllegalArgumentException] {
      AsofJoin.asof(left, right, "sym", "t")
    }
    assert(err.getMessage.contains("px"), err.getMessage)
    assert(err.getMessage.contains("rename"), err.getMessage)
    // Reserved internal names are guarded too.
    val err2 = intercept[IllegalArgumentException] {
      AsofJoin.asof(left.withColumnRenamed("px", "__side"),
        Seq(("A", 1L, 2.0)).toDF("sym", "t", "bid"), "sym", "t")
    }
    assert(err2.getMessage.contains("reserved"), err2.getMessage)
  }
}
