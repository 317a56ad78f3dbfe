package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, SubqueryExpression, Literal => CatalystLiteral}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.util.V2ExpressionSQLBuilder
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.mpp.MppEngine

/** Row-level DML for the DSv2 catalog surface (reference W2/W3,
  * `/root/reference/src/execution/mpp_physical_update.cpp:21-119`, on the
  * catalog-qualified path).
  *
  * DELETE rides Spark's designed hook: [[ColocatedTable]] implements
  * `SupportsDeleteV2`, so `DELETE FROM cat.t WHERE …` plans as a stock
  * `DeleteFromTableExec` that hands the condition to the engine — no
  * session extensions required. UPDATE has no such interface short of
  * `SupportsRowLevelOperations`, whose group-based `ReplaceData` plan
  * would force a SECOND, Spark-managed COW write path (a from-scratch
  * V2 `BatchWrite` + swap/commit protocol) duplicating the engine's
  * rewrite machinery while losing its match-pruning and
  * no-op-change-skip optimizations. Instead — following the V1-write
  * bridge precedent that keeps catalog INSERT bit-identical to the
  * dialect — [[Dsv2UpdateRule]] (installed by
  * [[graft.mpp.MppExtensions]]) rewrites an analyzed `UpdateTable` over
  * a [[ColocatedTable]] into a command that delegates to
  * [[MppEngine.update]]: same COW rewrite, same bucket pruning, same
  * partition-column row movement, one code path for both surfaces.
  *
  * Result-shape convention: stock Spark row-level DML returns an empty
  * result, so these do too; the engine dialect keeps the reference's
  * `Count BIGINT` (`mpp_physical_update.cpp:104-111`).
  */
object Dsv2UpdateRule extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case u @ UpdateTable(rel, assignments, condition) =>
      colocated(rel) match {
        case Some(ct)
            if assignments.forall(a => a.key.resolved && a.value.resolved) &&
              condition.forall(_.resolved) =>
          condition.filter(SubqueryExpression.hasSubquery).foreach { _ =>
            throw new UnsupportedOperationException(
              "UPDATE with subqueries is not supported on MPP tables " +
                "(reference parity: update conditions are pushed per " +
                "shard as plain predicates)")
          }
          val sets = assignments.map { a =>
            val name = a.key match {
              case attr: Attribute => attr.name
              case other => throw new UnsupportedOperationException(
                s"UPDATE of nested field ${other.sql} is not supported " +
                  "on MPP tables")
            }
            name -> sqlOf(a.value)
          }
          GraftDsv2Update(ct.owner.warehouse, ct.name(), sets,
            condition.map(sqlOf))
        case _ => u
      }
  }

  private def colocated(p: LogicalPlan): Option[ColocatedTable] = p match {
    case SubqueryAlias(_, child) => colocated(child)
    case r: DataSourceV2Relation => r.table match {
      case ct: ColocatedTable => Some(ct)
      case _ => None
    }
    case _ => None
  }

  /** Render an analyzed expression back to SQL the engine re-parses
    * against the table's own scan: qualifiers are stripped (the
    * analyzer qualified attributes with `cat.schema.t`, which would not
    * resolve against the engine's bare relation). */
  private def sqlOf(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
}

/** Driver-side command carrying one catalog-path UPDATE; resolves the
  * owning engine by warehouse at run time (same idiom as
  * [[GraftCatalog.engine]]) and delegates to its COW update. */
final case class GraftDsv2Update(warehouse: String, table: String,
    sets: Seq[(String, String)], where: Option[String])
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def run(spark: SparkSession): Seq[Row] = {
    val engine = MppEngine.registry.getOrElse(warehouse,
      new MppEngine(spark, warehouse))
    engine.update(table, sets, where)
    Nil
  }
}

/** V2 `Predicate` → ANSI SQL for the `SupportsDeleteV2` path: Spark's
  * own pushdown SQL builder (the JDBC connectors' machinery) with one
  * override — literals render through the Catalyst `Literal.sql` so
  * every type round-trips exactly (`DATE '…'`, escaped strings,
  * typed decimals), not the connector `toString`. */
object PredicateSql extends V2ExpressionSQLBuilder {

  override protected def visitLiteral(l: V2Literal[_]): String =
    CatalystLiteral(l.value, l.dataType).sql

  /** None when the predicate tree contains anything the builder cannot
    * express — the caller then reports `canDeleteWhere = false` and
    * Spark raises its standard untranslatable-condition error. */
  def translate(p: Predicate): Option[String] =
    try Some(build(p)) catch { case scala.util.control.NonFatal(_) => None }
}
