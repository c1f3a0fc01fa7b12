package graft

import org.apache.spark.sql.functions._

/** Pins for the q204-q220 gate families: bucketed-agg zero-shuffle,
  * theta-join plan shape, recursion depth math, window group limits,
  * mask classes, and the hashing-trick feature hash.
  */
class Queries27Spec extends SparkSpec {
  import spark.implicits._

  test("q217 heap-walk recursion yields floor(log2(k)) depth") {
    Seq(1L, 2L, 3L, 7L, 8L, 1023L).toDF("k")
      .createOrReplaceTempView("q27s_keys")
    val rows = spark.sql(
      """WITH RECURSIVE walk(node, anc, d) AS (
        |  SELECT k, k, 0 FROM q27s_keys
        |  UNION ALL
        |  SELECT node, anc DIV 2, d + 1 FROM walk WHERE anc > 1)
        |SELECT node, max(d) AS depth FROM walk GROUP BY node"""
        .stripMargin).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(rows == Map(1L -> 0, 2L -> 1, 3L -> 1, 7L -> 2, 8L -> 3,
      1023L -> 9))
  }

  test("q218 the rank filter really plans a WindowGroupLimit and " +
      "matches a plain collect-and-sort") {
    val df = Seq((1, "a", 10.0), (1, "b", 30.0), (1, "c", 20.0),
      (2, "d", 5.0)).toDF("g", "id", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v").desc, col("id"))
    val top = df.withColumn("rk", row_number().over(w))
      .where(col("rk") <= 2)
    assert(top.queryExecution.executedPlan.toString()
      .contains("WindowGroupLimit"))
    val got = top.select(col("g"), col("id"), col("rk")).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getInt(2))).toSet
    assert(got == Set((1, "b", 1), (1, "c", 2), (2, "d", 1)))
  }

  test("q215 mask default and custom classes on a fixture") {
    val r = Seq("Ab9 #z").toDF("s")
      .select(mask(col("s")),
        mask(col("s"), lit("U"), lit("l"), lit("#"), lit("*")))
      .head()
    assert(r.getString(0) == "Xxn #x") // others preserved by default
    assert(r.getString(1) == "Ul#**l") // '#' from digit, '*' others
  }

  test("q210 md5-prefix feature hash is stable and in range") {
    val vals = Seq("hello", "world", "", "Ab9")
      .toDF("t")
      .select(pmod(conv(substring(md5(col("t")), 1, 8), 16, 10)
        .cast("long"), lit(1024L)))
      .collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0 && v < 1024))
    // pinned: md5('hello') = 5d41402a... -> 0x5d41402a % 1024
    assert(vals(0) == java.lang.Long.parseLong("5d41402a", 16) % 1024)
  }

  test("q206 theta join classifies boundary quantities half-open") {
    val bands = Seq(("lo", 0.0, 10.0), ("hi", 10.0, 50.0))
      .toDF("band", "lo", "hi")
    val rows = Seq(9.999, 10.0, 49.999).toDF("q")
      .join(broadcast(bands),
        col("q") >= col("lo") && col("q") < col("hi"))
      .select(col("q"), col("band")).collect()
      .map(r => r.getDouble(0) -> r.getString(1)).toMap
    assert(rows == Map(9.999 -> "lo", 10.0 -> "hi", 49.999 -> "hi"))
  }

  test("q204 bucketed-key aggregation plans zero shuffles") {
    val table = "q27s_bkt"
    graft.sources.Bucketed.writeTable(spark,
      Seq((1L, 2.0), (2L, 3.0), (1L, 4.0)).toDF("k", "v"),
      table, "k", 4)
    try {
      val agg = spark.table(table).groupBy(col("k"))
        .agg(sum(col("v")).as("s"))
      assert(graft.sources.Bucketed.shuffleCount(agg) == 0)
      assert(agg.collect().map(r => r.getLong(0) -> r.getDouble(1))
        .toMap == Map(1L -> 6.0, 2L -> 3.0))
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
