package graft.mpp

import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{DataType, StringType, StructType}

/** `SparkSessionExtensions` installer: injected delegating parser for the
  * distributed DDL/DML dialect + the shard-pruning optimizer rule.
  *
  * Mirrors the reference's extension registration
  * (`/root/reference/src/mpp_extension.cpp:18-25`: parser extension +
  * storage hooks): the stock parser handles everything it can, and only
  * the `PARTITION BY (c) WITH BUCKETS n` dialect (plus DML on registered
  * distributed tables) is intercepted — the same "stock parse first"
  * split as `mpp_parser_extension.cpp:13-20`.
  *
  * Usage: `--conf spark.sql.extensions=graft.mpp.MppExtensions`, or
  * `SparkSession.builder.withExtensions(new MppExtensions()(_))`.
  */
class MppExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((_, delegate) => new MppParser(delegate))
    ext.injectOptimizerRule(_ => BucketPruning.rule)
  }
}

/** Delegating parser: routes dialect statements to [[MppSqlCommand]],
  * everything else to the session's stock parser. */
final class MppParser(delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    if (MppParser.intercepts(sqlText)) MppSqlCommand(sqlText)
    else delegate.parsePlan(sqlText)

  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

object MppParser {

  private val CreateDialect =
    """(?is).*\)\s*PARTITION\s+BY\s*\(\s*\w+\s*\)\s*WITH\s+BUCKETS\s+\d+\s*;?\s*$""".r
  private val CtasDialect =
    """(?is)^\s*CREATE\s+TABLE\s+\w+\s+PARTITION\s+BY\s*\(\s*\w+\s*\)\s*WITH\s+BUCKETS\s+\d+\s+AS\s+.*$""".r
  /** Reference entry point: `ATTACH 'db' AS x (TYPE mpp[, ENDPOINT …])`
    * (`/root/reference/src/storage/mpp_storage_extension.cpp:8-41`).
    * Here the attached path is the engine warehouse; ENDPOINT is
    * accepted and recorded as the coordinator node for parity. */
  private[mpp] val AttachDialect =
    """(?is)^\s*ATTACH\s+'([^']+)'\s+AS\s+(\w+)\s*\(\s*TYPE\s+mpp\s*(?:,\s*ENDPOINT\s+'([^']+)')?\s*\)\s*;?\s*$""".r
  private[mpp] val DetachDialect =
    """(?is)^\s*DETACH\s+(\w+)\s*;?\s*$""".r
  private val DmlHead =
    """(?is)^\s*(INSERT\s+INTO|UPDATE|DELETE\s+FROM|DROP\s+TABLE(?:\s+IF\s+EXISTS)?)\s+(\w+)\b.*""".r

  /** True iff the statement belongs to the distributed dialect: the
    * CREATE suffix, or DML whose target is a registered distributed
    * table of the current engine. */
  def intercepts(sql: String): Boolean = sql match {
    case CreateDialect() => true
    case CtasDialect() => true
    case AttachDialect(_, _, _) => true
    case DetachDialect(name) =>
      MppEngine.current.exists(_.attachedAs.contains(name))
    case DmlHead(_, table) =>
      MppEngine.current.exists(_.catalog.state.liveTable(table).isDefined)
    case _ => false
  }
}

/** Runnable command wrapping one dialect statement; executes through the
  * current [[MppEngine]] and returns its result rows. */
final case class MppSqlCommand(sqlText: String) extends LeafRunnableCommand {

  override val output: Seq[Attribute] =
    Seq(AttributeReference("result", StringType, nullable = true)())

  override def run(spark: SparkSession): Seq[Row] = {
    sqlText.trim match {
      case MppParser.AttachDialect(path, name, endpoint) =>
        // Reference lifecycle: ATTACH creates the catalog and registers
        // the coordinator endpoint (mpp_catalog.cpp:39-55). Warehouse ≡
        // attached database path.
        val e = new MppEngine(spark, path)
        e.attachedAs = Some(name)
        Option(endpoint).foreach { ep =>
          val Array(host, port) = ep.split(":", 2)
          e.masterAddNode(host, port.toInt)
        }
        Seq(Row(s"ATTACH $name"))
      case MppParser.DetachDialect(_) =>
        MppEngine.current = None
        Seq(Row("DETACH"))
      case _ =>
        val engine = MppEngine.current.getOrElse(
          throw new IllegalStateException("no active MppEngine"))
        engine.sql(sqlText).collect().toSeq
          .map(r => Row(r.toSeq.map(String.valueOf).mkString("|")))
    }
  }
}
