package graft

import org.apache.spark.sql.functions._

/** Round-12 gates q162-q167: SCD2 semantics on a hand-built history,
  * interpolation arithmetic on a pinned series, LOO encoding identity,
  * and the HLL sketch-cube mergeability property on known data.
  */
class Queries13Spec extends SparkSpec {
  import spark.implicits._

  test("SCD2 change detection keeps first + changed versions only") {
    // key 1: no change (one history row); key 2: balance change (two)
    val snap = Seq(
      (1L, 10.0, "A", 1), (1L, 10.0, "A", 2),
      (2L, 10.0, "A", 1), (2L, 99.0, "A", 2)
    ).toDF("c_custkey", "c_acctbal", "c_mktsegment", "version")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_custkey")).orderBy(col("version"))
    val kept = snap
      .withColumn("pb", lag(col("c_acctbal"), 1).over(w))
      .withColumn("pv", lag(col("version"), 1).over(w))
      .where(col("pv").isNull || !(col("pb") <=> col("c_acctbal")))
      .withColumn("valid_to", lead(col("version"), 1).over(w))
    val rows = kept.select(col("c_custkey"), col("version"), col("valid_to"))
      .collect().map(r => (r.getLong(0), r.getInt(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toSet
    assert(rows === Set((1L, 1, -1), (2L, 1, 2), (2L, 2, -1)))
  }

  test("q164 interpolation fills the midpoint exactly") {
    // anchors at t=0 (v=10) and t=100 (v=30); missing at t=25 → 15.0
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("t"))
      .rowsBetween(Long.MinValue, 0)
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("t"))
      .rowsBetween(0, Long.MaxValue)
    val df = Seq((1L, 0L, Some(10.0)), (1L, 25L, None),
      (1L, 100L, Some(30.0)), (1L, 200L, None))
      .toDF("u", "t", "x")
      .withColumn("pt", last(when(col("x").isNotNull, col("t")), ignoreNulls = true).over(wA))
      .withColumn("px", last(col("x"), ignoreNulls = true).over(wA))
      .withColumn("nt", first(when(col("x").isNotNull, col("t")), ignoreNulls = true).over(wD))
      .withColumn("nx", first(col("x"), ignoreNulls = true).over(wD))
      .withColumn("fx", when(col("x").isNotNull, col("x"))
        .when(col("pt").isNotNull && col("nt").isNotNull,
          col("px") + (col("nx") - col("px")) *
            ((col("t") - col("pt")).cast("double") / (col("nt") - col("pt")).cast("double"))))
    val fx = df.orderBy(col("t")).select(col("fx")).collect()
      .map(r => if (r.isNullAt(0)) null else r.getDouble(0))
    assert(fx(0) === 10.0)
    assert(fx(1) === 15.0) // 10 + 20 * 25/100
    assert(fx(2) === 30.0)
    assert(fx(3) === null) // trailing edge: no next anchor, stays null
  }

  test("LOO encoding sums back to the group total analytically") {
    // sum_i (S - y_i)/(n-1) = S for every group — conservation law
    val df = Seq(("a", 1.0), ("a", 2.0), ("a", 6.0), ("b", 4.0), ("b", 8.0))
      .toDF("k", "y")
    val stats = df.groupBy(col("k"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"))
    val loo = df.join(stats, "k")
      .withColumn("loo", (col("s") - col("y")) / (col("n") - 1))
    val back = loo.groupBy(col("k")).agg(sum(col("loo")).as("sb"), first(col("s")).as("s"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    back.foreach { case (k, sb, s) =>
      assert(math.abs(sb - s) < 1e-9, s"group $k: $sb != $s")
    }
    // and the encoding of y=1 in group a is (9-1)/2 = 4
    val a1 = loo.where(col("k") === "a" && col("y") === 1.0).select(col("loo")).head().getDouble(0)
    assert(a1 === 4.0)
  }

  test("q171 nearest-join tie goes to the EARLIER purchase") {
    // click at t=100; purchases at t=40 and t=160 — both 60 away
    val wA = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("t"), col("id"))
      .rowsBetween(Long.MinValue, -1)
    val wD = org.apache.spark.sql.expressions.Window
      .partitionBy(col("u")).orderBy(col("t"), col("id"))
      .rowsBetween(1, Long.MaxValue)
    val pTs = when(col("et") === "purchase", col("t"))
    val out = Seq((1L, 40L, 1L, "purchase"), (1L, 100L, 2L, "click"),
      (1L, 160L, 3L, "purchase"))
      .toDF("u", "t", "id", "et")
      .withColumn("prev_p", last(pTs, ignoreNulls = true).over(wA))
      .withColumn("next_p", first(pTs, ignoreNulls = true).over(wD))
      .where(col("et") === "click")
      .withColumn("nearest",
        when(col("prev_p").isNull, col("next_p"))
          .when(col("next_p").isNull, col("prev_p"))
          .when(col("t") - col("prev_p") <= col("next_p") - col("t"),
            col("prev_p"))
          .otherwise(col("next_p")))
      .head()
    assert(out.getAs[Long]("nearest") === 40L)
  }

  test("q175 weighted-percentile threshold lands on the exact boundary") {
    // values 1,2,3 with weights 1,1,2 (W=4): wp50 needs cumw*2 >= 4
    // → cumw >= 2 → value 2 (cumw 1,2,4); wp75 needs 4cumw >= 12 → 3
    val df = Seq((1.0, 1L), (2.0, 1L), (3.0, 2L)).toDF("v", "w")
    val win = org.apache.spark.sql.expressions.Window
      .orderBy(col("v")).rowsBetween(Long.MinValue, 0)
    val tot = df.agg(sum(col("w"))).head().getLong(0)
    val cum = df.withColumn("cumw", sum(col("w")).over(win))
    val r = cum.agg(
      min(when(col("cumw") * 2 >= tot, col("v"))).as("wp50"),
      min(when(col("cumw") * 4 >= tot * 3, col("v"))).as("wp75")).head()
    assert(r.getDouble(0) === 2.0)
    assert(r.getDouble(1) === 3.0)
  }

  test("HLL union of disjoint partition sketches tracks the direct sketch") {
    val ids = (0L until 5000L).toDF("id")
      .withColumn("part", pmod(col("id"), lit(4)))
    val cells = ids.groupBy(col("part"))
      .agg(hll_sketch_agg(col("id"), lit(12)).as("sk"))
    val unionEst = cells
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("e"))
      .head().getLong(0)
    val directEst = ids
      .agg(hll_sketch_estimate(hll_sketch_agg(col("id"), lit(12))).as("e"))
      .head().getLong(0)
    assert(math.abs(unionEst - directEst).toDouble / directEst <= 0.01,
      s"union $unionEst vs direct $directEst")
    assert(math.abs(unionEst - 5000L).toDouble / 5000.0 <= 0.05)
  }
}
