package graft.observe

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Alert rule evaluation (ref internal/alerting/evaluator.go:62-243 +
  * operator table internal/alerting/types.go:54-113).
  *
  * The reference polls PromQL and compares each returned series against a
  * threshold with an operator in {gt, gte, lt, lte, eq}; series that
  * match are `firing`, others `resolved`. Here the metric source is any
  * DataFrame of (series, value) rows — typically an aggregation the
  * engine just computed — and the comparison is a codegen'd column
  * expression, so rule evaluation distributes with the data.
  */
object Alerts {

  final case class Rule(name: String, op: String, threshold: Double)

  /** ref types.go operator semantics */
  def compare(value: Column, op: String, threshold: Double): Column = op match {
    case "gt"  => value > threshold
    case "gte" => value >= threshold
    case "lt"  => value < threshold
    case "lte" => value <= threshold
    case "eq"  => value === threshold
    case other => throw new IllegalArgumentException(s"unknown operator: $other")
  }

  /** Evaluate one rule against every series row of `metrics`
    * (seriesCol, valueCol). Output: series, value, rule, state. */
  def evaluate(metrics: DataFrame, seriesCol: String, valueCol: String,
               rule: Rule): DataFrame =
    metrics.select(
      col(seriesCol).as("series"),
      col(valueCol).as("value"),
      lit(rule.name).as("rule"),
      when(compare(col(valueCol), rule.op, rule.threshold), "firing")
        .otherwise("resolved").as("state"))

  /** Evaluate many rules (unioned — each rule sees every series). */
  def evaluateAll(metrics: DataFrame, seriesCol: String, valueCol: String,
                  rules: Seq[Rule]): DataFrame =
    rules.map(evaluate(metrics, seriesCol, valueCol, _))
      .reduce(_.unionAll(_))
      .orderBy(col("rule"), col("series"))
}
