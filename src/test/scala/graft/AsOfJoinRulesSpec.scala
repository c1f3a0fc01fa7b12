package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** The optimizer rules that restore predicate pushdown and column
  * pruning through the custom AsOfJoinPlan node: a filter/projection
  * written ABOVE the as-of join must reach the parquet scans BELOW it.
  */
class AsOfJoinRulesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def asofQuery = {
    val ev = Tables(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), expr("ts div 1000").as("p_us"),
        col("event_id").as("purchase_id"))
    AsOfJoin.asof(clicks, purchases, Seq("user_id"), Seq("p_user"),
      "us", "p_us")
  }

  test("left-only filter above asof is pushed into the left scan") {
    val q = asofQuery.where(col("event_id") < 100)
    val plan = q.queryExecution.explainString(FormattedMode)
    assert(plan.contains("LessThan(event_id,100)"),
      s"filter not pushed to scan:\n$plan")
    // and the filter is gone from above the join
    assert(!q.queryExecution.optimizedPlan.toString.linesIterator.next()
      .toLowerCase.startsWith("filter"))
    // semantics unchanged vs filtering before the join
    val ev = Tables(spark, dir, "events")
    val clicksF = ev.where(col("event_type") === "click" &&
        col("event_id") < 100)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), expr("ts div 1000").as("p_us"),
        col("event_id").as("purchase_id"))
    val expect = AsOfJoin.asof(clicksF, purchases, Seq("user_id"),
      Seq("p_user"), "us", "p_us").collect().toSet
    assert(q.collect().toSet == expect && expect.nonEmpty)
  }

  test("right-side predicates are NOT pushed (matched-or-null values)") {
    val q = asofQuery.where(col("purchase_id").isNotNull)
    val opt = q.queryExecution.optimizedPlan.toString
    // the null-filter must stay above the join: pushing it would turn
    // the left-outer semantics into inner prematurely
    assert(opt.linesIterator.next().startsWith("Filter"))
    val total = asofQuery.count()
    assert(q.count() <= total)
  }

  test("projection above asof prunes unused right columns at the scan") {
    val q = asofQuery.select(col("event_id"), col("p_us"))
    val plan = q.queryExecution.explainString(FormattedMode)
    // the purchase-side scan must not read event_id (purchase_id
    // unused); both scans appear, so check the pruned ReadSchema shape
    val schemas = plan.linesIterator.filter(_.contains("ReadSchema")).toList
    assert(schemas.size == 2)
    assert(schemas.exists(s => s.contains("ts") && !s.contains("event_id")),
      s"right scan not pruned:\n$plan")
    assert(q.count() > 0)
  }
}
