package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin

/** Tests the custom-Catalyst as-of join (AsOfJoinPlan/Strategy/Exec)
  * against inline expected values and against the built-in-composed
  * formulation on real data.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def trades = Seq(
    // (symbol, ts, trade_id)
    ("A", 10L, 1L), ("A", 20L, 2L), ("A", 30L, 3L),
    ("B", 15L, 4L), ("B", 25L, 5L),
    ("C", 5L, 6L) // no quotes for C
  ).toDF("sym", "t_ts", "trade_id")

  private def quotes = Seq(
    // (symbol, ts, price)
    ("A", 8L, 1.0), ("A", 20L, 2.0), ("A", 29L, 3.0),
    ("B", 16L, 4.0),
    ("D", 1L, 9.0) // no trades for D
  ).toDF("sym", "q_ts", "price")

  private val expected = Set(
    // trade_id -> (matched q_ts, price); ties (ts equal) DO match
    Row(1L, 8L, 1.0), Row(2L, 20L, 2.0), Row(3L, 29L, 3.0),
    Row(4L, null, null), Row(5L, 16L, 4.0), Row(6L, null, null))

  test("asof custom exec: backward join with ties and misses") {
    val out = AsOfJoin.asof(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts")
      .select(col("trade_id"), col("q_ts"), col("price"))
    assert(out.collect().toSet == expected)
  }

  test("asof composed: identical semantics from built-ins") {
    val out = AsOfJoin.asofComposed(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts")
      .select(col("trade_id"), col("q_ts"), col("price"))
    assert(out.collect().toSet == expected)
  }

  test("asof handles null keys and null timestamps as non-matching") {
    val l = Seq((Option("A"), Option(10L), 1L), (None, Option(10L), 2L),
      (Option("A"), None, 3L)).toDF("k", "ts", "id")
    val r = Seq((Option("A"), Option(5L), 100L), (None, Option(1L), 101L))
      .toDF("k", "ts", "rid")
    val out = AsOfJoin.asof(l, r, Seq("k"), Seq("k"), "ts", "ts")
      .select(col("id"), col("rid")).collect().toSet
    assert(out == Set(Row(1L, 100L), Row(2L, null), Row(3L, null)))
    // the COMPOSED formulation must agree: window PARTITIONING groups
    // null key tuples together, so without explicit guards the
    // null-key left row (id=2) would match the null-key right row
    // (rid=101) and the two implementations would diverge
    val composed = AsOfJoin.asofComposed(l, r, Seq("k"), Seq("k"),
      "ts", "ts")
      .select(col("id"), col("rid")).collect().toSet
    assert(composed == out,
      "asofComposed must enforce SQL null-equality like AsOfJoinExec")
  }

  test("asof custom exec matches composed formulation on events (self)") {
    val dir = "/root/testdata/sf0.001"
    val ev = Tables(spark, dir, "events")
    val clicks = ev.where(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id").as("p_user"), expr("ts div 1000").as("p_us"))
      .agg(max(col("event_id")).as("purchase_id"))
    val a = AsOfJoin.asof(clicks, purchases, Seq("user_id"), Seq("p_user"),
        "us", "p_us")
      .select(col("event_id"), col("purchase_id"), col("p_us")).collect().toSet
    val b = AsOfJoin.asofComposed(clicks, purchases, Seq("user_id"),
        Seq("p_user"), "us", "p_us")
      .select(col("event_id"), col("purchase_id"), col("p_us")).collect().toSet
    assert(a.nonEmpty && a == b)
  }

  test("asof tolerance: boundary match kept at exactly tol, nulled " +
      "one past it, in BOTH implementations") {
    // trade 1 at t=10 matches quote at 8 (lag 2); trade 2 at 20
    // matches quote at 20 (lag 0); trade 3 at 30 matches quote at 29
    // (lag 1). tol=1: trade 1's match nulls, 2 and 3 survive.
    val expectedTol = Set(
      Row(1L, null, null), Row(2L, 20L, 2.0), Row(3L, 29L, 3.0),
      Row(4L, null, null), Row(5L, null, null), Row(6L, null, null))
    // trade 5 at 25 vs quote at 16: lag 9 > 1 → nulled too
    val a = AsOfJoin.asof(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts", Some(1L))
      .select(col("trade_id"), col("q_ts"), col("price")).collect().toSet
    val b = AsOfJoin.asofComposed(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts", Some(1L))
      .select(col("trade_id"), col("q_ts"), col("price")).collect().toSet
    assert(a == expectedTol)
    assert(b == expectedTol)
    // tol=2 restores trade 1's boundary match (lag == tol matches)
    val c = AsOfJoin.asof(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts", Some(2L))
      .select(col("trade_id"), col("q_ts"), col("price")).collect().toSet
    assert(c(Row(1L, 8L, 1.0)))
    // tolerance 0: only exact-ts matches survive
    val d = AsOfJoin.asof(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts", Some(0L))
      .select(col("trade_id"), col("q_ts"), col("price")).collect().toSet
    assert(d(Row(2L, 20L, 2.0)) && d(Row(1L, null, null)))
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(trades, quotes, Seq("sym"), Seq("sym"),
        "t_ts", "q_ts", Some(-5L))
    }
  }

  test("asof plan shows custom exec node and sorted-merge requirements") {
    val plan = AsOfJoin.asof(trades, quotes, Seq("sym"), Seq("sym"),
      "t_ts", "q_ts").queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix
    assert(plan.contains("AsOfJoin ") && plan.contains("Sort ") &&
      plan.contains("Exchange hashpartitioning"))
  }
}
