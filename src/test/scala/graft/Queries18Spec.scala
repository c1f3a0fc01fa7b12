package graft

import org.apache.spark.sql.functions._

/** Pins for the q189-q194 gate family: parse_url component semantics,
  * array set-algebra edge cases, and the nested-pruning contract.
  */
class Queries18Spec extends SparkSpec {
  import spark.implicits._

  test("q190 parse_url splits the synthetic URL exactly as the " +
      "normalizer assumes (host sans port, query sans fragment)") {
    val df = Seq("HTTP://Site7.Example.COM:80/p/42?utm_source=x&id=0" +
      "&utm_medium=y#frag").toDF("url")
    val r = df.select(
      parse_url(col("url"), lit("PROTOCOL")).as("proto"),
      parse_url(col("url"), lit("HOST")).as("host"),
      parse_url(col("url"), lit("PATH")).as("path"),
      parse_url(col("url"), lit("QUERY")).as("query"),
      parse_url(col("url"), lit("REF")).as("frag")).head()
    assert(r.getString(0) == "HTTP")
    assert(r.getString(1) == "Site7.Example.COM") // port excluded
    assert(r.getString(2) == "/p/42")
    assert(r.getString(3) == "utm_source=x&id=0&utm_medium=y")
    assert(r.getString(4) == "frag") // fragment is REF, not QUERY
  }

  test("q190 utm filter keeps real params and drops tracking ones") {
    val df = Seq("a=1&utm_source=x&id=9&utm_medium=y").toDF("q")
    val kept = df.select(array_join(
      filter(split(col("q"), "&"), p => !p.startsWith("utm_")), "&"))
      .head().getString(0)
    assert(kept == "a=1&id=9")
  }

  test("q193 set algebra handles an empty B side (no ANSI raise, " +
      "position 0)") {
    val df = Seq((Seq(1L, 3L), Seq.empty[Long])).toDF("a", "b")
    val r = df.select(
      size(array_union(col("a"), col("b"))).as("u"),
      size(array_intersect(col("a"), col("b"))).as("i"),
      arrays_overlap(col("a"), col("b")).as("o"),
      coalesce(array_position(col("a"), get(col("b"), lit(0))), lit(0L))
        .as("p")).head()
    assert(r.getInt(0) == 2)
    assert(r.getInt(1) == 0)
    // arrays_overlap with an empty side is false (null only when a
    // null element could match); position of a missing probe is 0
    assert(!r.isNullAt(2) && !r.getBoolean(2))
    assert(r.getLong(3) == 0L)
  }

  test("q194 leaf extraction prunes the scan where a struct-HOF " +
      "does not") {
    val path = s"/tmp/q194spec_${System.nanoTime()}"
    try {
      Seq((1L, 2.0, 3.0)).toDF("k", "qty", "price")
        .groupBy(col("k"))
        .agg(collect_list(struct(col("qty"), col("price"))).as("items"))
        .write.mode("overwrite").parquet(path)
      def scanOf(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.collectLeaves()
          .map(_.toString()).mkString("\n")
      val pruned = scanOf(spark.read.parquet(path)
        .select(col("k"), col("items.qty")))
      assert(pruned.contains("qty") && !pruned.contains("price"))
      val unpruned = scanOf(spark.read.parquet(path)
        .select(col("k"), transform(col("items"),
          x => x.getField("qty"))))
      assert(unpruned.contains("price"),
        "struct-HOF unexpectedly pruned — q194's rationale changed " +
          "(revisit the gate comment if Spark learned this)")
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete()
      }
      rm(new java.io.File(path))
    }
  }
}
