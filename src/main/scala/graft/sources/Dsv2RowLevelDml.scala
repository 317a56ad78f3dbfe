package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, EqualTo, Expression, SubqueryExpression, Literal => CatalystLiteral}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, InsertStarAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.connector.expressions.{Literal => V2Literal}
import org.apache.spark.sql.connector.expressions.filter.Predicate
import org.apache.spark.sql.connector.util.V2ExpressionSQLBuilder
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.mpp.{MergeWhenMatched, MergeWhenNotBySource, MergeWhenNotMatched, MppEngine}

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
          // Both the WHERE condition AND the SET values: a scalar
          // subquery in an assignment would survive to sqlOf and render
          // unparseable SQL — reject it with the same clean error
          // (round-6 ADVICE).
          (condition.toSeq ++ assignments.map(_.value))
            .filter(SubqueryExpression.hasSubquery).foreach { _ =>
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

  private[sources] def colocated(p: LogicalPlan): Option[ColocatedTable] = p match {
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
  private[sources] def sqlOf(e: Expression): String =
    e.transform {
      case a: AttributeReference => a.withQualifier(Seq.empty)
    }.sql
}

/** Catalog-path MERGE: `MERGE INTO cat.t USING … ON t.pc = s.pc WHEN
  * …` over a [[ColocatedTable]] bridges the analyzed
  * [[MergeIntoTable]] onto [[MppEngine.merge]]'s bucket-local COW
  * upsert — the same one-write-path argument as [[Dsv2UpdateRule]] (a
  * `SupportsRowLevelOperations` group-based plan would duplicate the
  * engine's staging/swap machinery). Full ANSI clause surface in
  * declaration order: any number of `WHEN MATCHED [AND cond] THEN
  * UPDATE SET …|DELETE` and `WHEN NOT MATCHED [AND cond] THEN INSERT`
  * clauses (star, by-name, or explicit column lists). The remaining
  * engine contract: ON equates the partition column, an explicit
  * INSERT must set the partition column to the source's, and `WHEN NOT
  * MATCHED BY SOURCE` / schema evolution raise clean unsupported
  * errors instead of Spark's generic rewrite failure. */
object Dsv2MergeRule extends Rule[LogicalPlan] {

  import Dsv2UpdateRule.{colocated, sqlOf}

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable if colocated(m.targetTable).isDefined &&
        m.childrenResolved =>
      val ct = colocated(m.targetTable).get
      val pc = ct.partitionColumn
      def unsupported(what: String): Nothing =
        throw new UnsupportedOperationException(
          s"MERGE INTO ${ct.name()}: $what is not supported on MPP " +
            "tables (supported: ON <target>.<partition col> = " +
            "<source>.<partition col>, WHEN MATCHED [AND cond] THEN " +
            "UPDATE/DELETE, WHEN NOT MATCHED [AND cond] THEN INSERT)")
      if (m.withSchemaEvolution) unsupported("WITH SCHEMA EVOLUTION")
      val tgtOut = m.targetTable.outputSet
      val srcOut = m.sourceTable.outputSet
      // Only act once the merge is fully resolved (star actions
      // expanded, references bound); until then leave the node for the
      // analyzer to keep resolving.
      val exprsResolved = m.mergeCondition.resolved &&
        (m.matchedActions ++ m.notMatchedActions ++
          m.notMatchedBySourceActions).forall(_.resolved)
      if (!exprsResolved) m
      else {
        m.mergeCondition match {
          case EqualTo(a: AttributeReference, b: AttributeReference)
              if Set(a, b).exists(tgtOut.contains) &&
                Set(a, b).exists(srcOut.contains) &&
                a.name.equalsIgnoreCase(pc) &&
                b.name.equalsIgnoreCase(pc) => // bucket-local, supported
          case _ => unsupported(
            s"an ON condition other than equality on $pc")
        }
        // Source attribute references render as __src_<name> — the
        // engine's joined-frame namespace.
        def xlate(e: Expression): String = {
          if (SubqueryExpression.hasSubquery(e))
            unsupported("a subquery in a MERGE clause")
          sqlOf(e.transform {
            case a: AttributeReference if srcOut.contains(a) =>
              a.withName(s"__src_${a.name}")
          })
        }
        // By-name star shape: every assignment is `col = src.col` (the
        // analyzer marks expanded stars fromStar; literal by-name
        // spellings are detected by value) — collapses to SET */INSERT *.
        def byName(assigns: Seq[Assignment], fromStar: Boolean): Boolean =
          fromStar || (assigns.nonEmpty && assigns.forall { a =>
            (a.key, a.value) match {
              case (k: AttributeReference, v: AttributeReference) =>
                srcOut.contains(v) && v.name.equalsIgnoreCase(k.name)
              case _ => false
            }
          })
        def keyName(a: Assignment): String =
          a.key match {
            case attr: Attribute => attr.name
            case other => unsupported(s"assignment to nested field ${other.sql}")
          }
        val matched: Seq[MergeWhenMatched] = m.matchedActions.map {
          case UpdateStarAction(cond) =>
            MergeWhenMatched.Update(cond.map(xlate), Nil)
          case UpdateAction(cond, assigns, fromStar) =>
            if (byName(assigns, fromStar))
              MergeWhenMatched.Update(cond.map(xlate), Nil)
            else MergeWhenMatched.Update(cond.map(xlate),
              assigns.map(a => keyName(a) -> xlate(a.value)))
          case DeleteAction(cond) => MergeWhenMatched.Delete(cond.map(xlate))
          case other => unsupported(s"WHEN MATCHED action $other")
        }
        val notMatched: Seq[MergeWhenNotMatched] = m.notMatchedActions.map {
          case InsertStarAction(cond) =>
            MergeWhenNotMatched(cond.map(xlate), None)
          case InsertAction(cond, assigns) =>
            if (byName(assigns, fromStar = false))
              MergeWhenNotMatched(cond.map(xlate), None)
            else MergeWhenNotMatched(cond.map(xlate),
              Some(assigns.map(a => keyName(a) -> xlate(a.value))))
          case other => unsupported(s"WHEN NOT MATCHED action $other")
        }
        // BY SOURCE actions see target rows only — ANSI forbids source
        // references in them and the analyzer already enforces it, so
        // xlate's __src_ rewrite is a no-op on these expressions.
        val notBySource: Seq[MergeWhenNotBySource] =
          m.notMatchedBySourceActions.map {
            case DeleteAction(cond) =>
              MergeWhenNotBySource.Delete(cond.map(xlate))
            case UpdateAction(cond, assigns, _) =>
              MergeWhenNotBySource.Update(cond.map(xlate),
                assigns.map(a => keyName(a) -> xlate(a.value)))
            case other =>
              unsupported(s"WHEN NOT MATCHED BY SOURCE action $other")
          }
        GraftDsv2Merge(ct.owner.warehouse, ct.name(), m.sourceTable,
          matched, notMatched, notBySource)
      }
  }
}

/** Driver-side command carrying one catalog-path MERGE; the source
  * plan executes lazily inside the engine's merge (full-outer join per
  * affected bucket). */
final case class GraftDsv2Merge(warehouse: String, table: String,
    source: LogicalPlan, matched: Seq[MergeWhenMatched],
    notMatched: Seq[MergeWhenNotMatched],
    notBySource: Seq[MergeWhenNotBySource] = Nil)
    extends LeafRunnableCommand {

  override val output: Seq[Attribute] = Nil

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(spark: SparkSession): Seq[Row] = {
    val engine = MppEngine.registry.getOrElse(warehouse,
      new MppEngine(spark, warehouse))
    val src = org.apache.spark.sql.GraftSqlBridge.ofRows(spark, source)
    engine.merge(table, src, matched, notMatched, notBySource)
    Nil
  }
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
