package graft.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, InSubquery, ListQuery}
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.catalog.Catalog
import graft.table.LakehouseTable

/** Routes `DELETE FROM t WHERE k IN (SELECT …)` — and the COMPOSITE
  * form `(k1, k2) IN (SELECT …)` — on a graft table with
  * `'write.delete.mode'='equality'` to the EQUALITY-delete tier: the
  * subquery's key set commits as ONE key-valued delete file — no data
  * scan, no COW rewrite, no driver-side key materialization — the SQL
  * face of the keyed-CDC shape [[LakehouseTable.deleteEq]] provides
  * natively (whose composite overload is field-list-valued for exactly
  * this). (Literal `k = v` / `k IN (v, …)` deletes already reach
  * the tier through the SupportsDelete path; subqueries never can,
  * because DSv2 source filters carry only literals.)
  *
  * Injected as a RESOLUTION rule ([[graft.GraftExtensions]]): it must
  * fire before the analyzer's DML-rewrite batch turns the statement
  * into a group-based ReplaceData plan. Anything but an uncorrelated
  * attribute-tuple IN-subquery on an equality-mode writable graft
  * table is left untouched for the existing paths (metadata-only
  * truncate, MOR position vector, or group-based copy-on-write). */
case class EqDeleteRoute(session: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // The analyzer's RewriteDeleteFromTable runs in the same Resolution
    // batch and wins the race, so by the time an injected rule sees the
    // statement it is already a group-based ReplaceData. The original
    // WHERE condition and the row-level command ride along — enough to
    // recognize `DELETE … WHERE k IN (SELECT …)` and divert it.
    case rd: org.apache.spark.sql.catalyst.plans.logical.ReplaceData
        if rd.condition.resolved =>
      graftDeleteTarget(rd.table) match {
        case Some(op)
            if op.isWritable &&
              op.props.get("write.delete.mode").contains("equality") =>
          rd.condition match {
            case InSubquery(attrs, lq: ListQuery)
                if lq.outerAttrs.isEmpty &&
                  attrs.forall(_.isInstanceOf[AttributeReference]) &&
                  lq.plan.output.size == attrs.size =>
              GraftEqDeleteCommand(op.backingCatalog, op.backingNamespace,
                op.backingTable,
                attrs.map(_.asInstanceOf[AttributeReference].name), lq.plan)
            case _ => plan
          }
        case _ => plan
      }
    // kept for completeness: a DeleteFromTable that survives to this
    // rule un-rewritten (e.g. a future Spark reorders the batch)
    case DeleteFromTable(target, cond) if cond.resolved =>
      org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(target) match {
        case r: DataSourceV2Relation =>
          r.table match {
            case t: GraftSqlTable
                if t.isWritable &&
                  t.props.get("write.delete.mode").contains("equality") =>
              cond match {
                case InSubquery(attrs, lq: ListQuery)
                    if lq.outerAttrs.isEmpty &&
                      attrs.forall(_.isInstanceOf[AttributeReference]) &&
                      lq.plan.output.size == attrs.size =>
                  GraftEqDeleteCommand(t.backingCatalog, t.backingNamespace,
                    t.backingTable,
                    attrs.map(_.asInstanceOf[AttributeReference].name), lq.plan)
                case _ => plan
              }
            case _ => plan
          }
        case _ => plan
      }
    case _ => plan
  }

  /** The graft row-level operation behind a DELETE target, if that is
    * what `rel` is. Spark wraps the table in its (sql-private)
    * RowLevelOperationTable; one reflective `operation` call unwraps it
    * to the GraftRowLevelOperation this module constructed. */
  private def graftDeleteTarget(
      rel: LogicalPlan): Option[GraftRowLevelOperation] =
    org.apache.spark.sql.catalyst.analysis.EliminateSubqueryAliases(rel) match {
      case r: DataSourceV2Relation
          if r.table.getClass.getName ==
            "org.apache.spark.sql.connector.write.RowLevelOperationTable" =>
        r.table.getClass.getMethod("operation").invoke(r.table) match {
          case op: GraftRowLevelOperation
              if op.command() ==
                org.apache.spark.sql.connector.write.RowLevelOperation.Command.DELETE =>
            Some(op)
          case _ => None
        }
      case _ => None
    }
}

/** Eagerly-executed command backing [[EqDeleteRoute]]: runs the key
  * subquery as a normal distributed job and hands the resulting
  * DataFrame to [[LakehouseTable.deleteEq]] — one key-file write + one
  * layered OpEqDelete commit. The key plan is carried as a field (not
  * a child) so the command stays a leaf for the eager-execution
  * machinery while still executing the subquery exactly once here. */
case class GraftEqDeleteCommand(
    backing: Catalog,
    ns: String,
    tbl: String,
    keys: Seq[String],
    keysPlan: LogicalPlan) extends LeafRunnableCommand {
  override def innerChildren: Seq[org.apache.spark.sql.catalyst.plans.QueryPlan[_]] =
    Seq(keysPlan)
  override def run(session: SparkSession): Seq[Row] = {
    // LogicalPlan → DataFrame through public surfaces only: execute the
    // plan, convert the InternalRow RDD back to external rows (the
    // converter builds per partition — it is not serializable)
    val qe = session.sessionState.executePlan(keysPlan)
    val schema = qe.analyzed.schema
    val rows: RDD[Row] = qe.toRdd.mapPartitions { it =>
      val conv = CatalystTypeConverters.createToScalaConverter(schema)
      it.map(ir => conv(ir.copy()).asInstanceOf[Row])
    }
    // null-bearing tuples can never satisfy SQL (k1,k2) IN (…) — a row
    // is deleted only when the predicate is TRUE — so they drop here
    // (exact SQL semantics) instead of tripping deleteEq's feed guard
    val keyDf = session.createDataFrame(rows, schema).na.drop("any")
    LakehouseTable.load(backing, session, ns, tbl).deleteEq(keys, keyDf)
    Seq.empty
  }
}
