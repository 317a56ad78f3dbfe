package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Bridge to Spark's `private[sql]` Dataset factory: execute an
  * already-parsed (and rewritten) logical plan as a DataFrame.
  *
  * The engine routes catalog-qualified mpp reads by rewriting
  * `UnresolvedRelation` nodes on the PARSED plan (never on raw SQL
  * text, which cannot distinguish a relation from a column reference
  * whose qualifier collides with a catalog alias). Turning the
  * rewritten plan back into a DataFrame needs `Dataset.ofRows`, which
  * Spark scopes `private[sql]` — hence this one accessor compiled into
  * the `org.apache.spark.sql` package, the same pattern open-source
  * Spark extensions (Delta, Qbeast) use. Nothing in Spark is modified.
  */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    spark match {
      case c: classic.SparkSession => classic.Dataset.ofRows(c, plan)
      case other => throw new IllegalStateException(
        s"expected a classic SparkSession, got ${other.getClass.getName}")
    }
}
