package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.plans.logical.{Command, GlobalLimit, Limit, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/**
 * Catalyst optimizer rule enforcing the reference's row cap (`MAX_ROWS_LIMIT`,
 * `config.py:9`) at the PLAN level: when `spark.graft.maxRows` is set, any
 * query whose root is not already limited gets wrapped in a `Limit`. Unlike
 * the validator's textual `LIMIT` injection (A10, substring semantics kept
 * for parity), this rule cannot be fooled by an alias containing "limit" and
 * composes with every API path (SQL, DataFrame, streaming excluded).
 *
 * Injected via [[graft.GraftExtensions]] (`injectOptimizerRule`). Idempotent
 * by construction: once the root is a GlobalLimit the rule is a no-op, so the
 * optimizer's fixed-point iteration terminates.
 */
case class EnforceMaxRows(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val confValue = spark.conf.getOption("spark.graft.maxRows")
    confValue.map(_.toInt) match {
      case None => plan
      case Some(maxRows) =>
        plan match {
          case _: Command => plan // utility/DDL plans are not row-producing
          case GlobalLimit(_, _) => plan
          case p if p.maxRows.exists(_ <= maxRows) => plan // provably small
          case p if p.isStreaming => plan
          case p => Limit(Literal(maxRows), p)
        }
    }
  }
}
