package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.frame.{TFrame, TGrouped}
import graft.frame.namespaces._

/** TFrame surface tests; fixtures and expected values from the reference
  * test suite (FIXTURES.md §1/§3, test_dataframe.py). */
class TFrameSpec extends SparkSpec {

  private lazy val abc = TFrame(spark, Seq(
    "a" -> (0L to 6L), "b" -> (6L to 0L by -1), "c" -> (0L to 6L)))

  private lazy val grouping = TFrame(spark, Seq(
    "A" -> Seq("a", "b", "a", "b"),
    "B" -> Seq(1L, 2L, 3L, 4L),
    "C" -> Seq(10L, 11L, 12L, 13L)))

  test("construction + inference (test_dataframe.py:116,228)") {
    assert(abc.columns === Seq("a", "b", "c"))
    assert(abc.length === 7L)
    assert(abc.df.schema.fields.forall(_.dataType == LongType))
  }

  test("construction with target dtype casts at the factory " +
      "(test_factory.py:15-36)") {
    import graft.types._
    val data = Seq("x" -> Seq[Any](1L, 2L, 3L))
    for ((t, want) <- Seq[(Dtype, Seq[Any])](
        TInt32() -> Seq(1, 2, 3),
        TInt16() -> Seq(1.toShort, 2.toShort, 3.toShort),
        TInt8() -> Seq(1.toByte, 2.toByte, 3.toByte),
        TFloat32() -> Seq(1.0f, 2.0f, 3.0f))) {
      val got = TFrame(spark, data, TStruct(Seq(TField("x", t))))
      assert(got.dtype === TStruct(Seq(TField("x", t))))
      assert(col0(got.df) === want, t)
    }
  }

  test("dataframe cast re-types named fields in place " +
      "(test_factory.py:39-87)") {
    import graft.types._
    val df = TFrame(spark, Seq(
      "list_null" -> Seq(Seq(1L, 2L), Seq(3L, null), Seq(4L, 5L), Seq(6L)),
      "ids" -> Seq(Seq(1L, 2L), Seq(3L), Seq(1L, 4L), Seq(5L)),
      "a" -> Seq(1L, 2L, 3L, 4L),
      "b" -> Seq(10L, 20L, 30L, 40L),
      "c" -> Seq("a", "b", "c", "d")))
    assert(df.dtype === TStruct(Seq(
      TField("list_null", TList(TInt64(nullable = true))),
      TField("ids", TList(TInt64())),
      TField("a", TInt64()),
      TField("b", TInt64()),
      TField("c", TStringT()))))
    val casted = df.cast(TStruct(Seq(
      TField("list_null", TList(TInt64(nullable = true))),
      TField("ids", TList(TInt64())),
      TField("a", TFloat64()),
      TField("b", TInt32()),
      TField("c", TStringT()))))
    val rows = casted.df.orderBy("b").collect()
    assert(rows.map(_.getDouble(2)).toSeq === Seq(1.0, 2.0, 3.0, 4.0))
    assert(rows.map(_.getInt(3)).toSeq === Seq(10, 20, 30, 40))
    assert(rows.map(_.getSeq[Any](0).toSeq).toSeq === Seq(
      Seq(1L, 2L), Seq(3L, null), Seq(4L, 5L), Seq(6L)))
    // a factory cast is a re-type, never a projection/rename
    intercept[IllegalArgumentException] {
      df.cast(TStruct(Seq(TField("zz", TInt64()))))
    }
  }

  test("select with includes/excludes/computed (idataframe.py:501-548)") {
    val got = abc.select("*", "-c")("d" -> (abc("b") + abc("c")))
    assert(got.columns === Seq("a", "b", "d"))
    assert(col0(got.df.select("d")) === Seq(6L, 6L, 6L, 6L, 6L, 6L, 6L))
  }

  test("where ANDs conditions (dataframe_cpu.py:2016-2026)") {
    val got = abc.where(abc("a") > 1, abc("b") > 1)
    assert(col0(got.df.select("a")).toSet === Set(2L, 3L, 4L))
  }

  test("groupby sum names columns col.sum (FIXTURES §3)") {
    val got = grouping.groupby("A").sum.df.orderBy("A")
    assert(got.columns.toSeq === Seq("A", "B.sum", "C.sum"))
    assert(got.collect().toSeq.map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))) === Seq(("a", 4L, 22L), ("b", 6L, 24L)))
  }

  test("groupby agg dict form (dataframe_cpu.py:2373-2435)") {
    val got = grouping.groupby("A")
      .agg(Map("B" -> Seq("min", "mean"))).df.orderBy("A")
    assert(got.columns.toSeq === Seq("A", "B.min", "B.mean"))
    assert(got.collect().toSeq.map(r => (r.getString(0), r.getLong(1),
      r.getDouble(2))) === Seq(("a", 1L, 2.0), ("b", 2L, 3.0)))
  }

  test("groupby size includes all rows (dataframe_cpu.py:2213-2225)") {
    val got = grouping.groupby("A").size.df.orderBy("A")
    assert(got.collect().toSeq.map(r => (r.getString(0), r.getLong(1))) ===
      Seq(("a", 2L), ("b", 2L)))
  }

  test("grouped select computes per-group expressions") {
    val got = grouping.groupby("A")
      .select("bsum" -> sum(grouping("B")), "cmax" -> max(grouping("C")))
      .df.orderBy("A")
    assert(got.collect().toSeq.map(r => (r.getString(0), r.getLong(1),
      r.getLong(2))) === Seq(("a", 4L, 12L), ("b", 6L, 13L)))
  }

  test("sort na_position (dataframe_cpu.py:593-620)") {
    val withNulls = TFrame(spark, Seq("x" -> Seq[Any](3L, null, 1L, 2L)))
    assert(col0(withNulls.sort(Seq("x")).df) === Seq(1L, 2L, 3L, null))
    assert(col0(withNulls.sort(Seq("x"), naLast = false).df) ===
      Seq(null, 1L, 2L, 3L))
    assert(col0(withNulls.sort(Seq("x"), ascending = false).df) ===
      Seq(3L, 2L, 1L, null))
  }

  test("dropDuplicates keep-first deterministic (icolumn.py:1066-1084)") {
    val df = TFrame(spark, Seq(
      "k" -> Seq("x", "x", "y"), "i" -> Seq(1L, 2L, 3L)))
    val got = df.dropDuplicates(Seq("k"), Seq("i")).sort(Seq("i"))
    assert(col0(got.df.select("i")) === Seq(1L, 3L))
  }

  test("fillNull / dropNull (icolumn.py:982-1064)") {
    val df = TFrame(spark, Seq("x" -> Seq[Any](1L, null, 3L)))
    assert(col0(df.fillNull(0L).df) === Seq(1L, 0L, 3L))
    assert(col0(df.dropNull().df) === Seq(1L, 3L))
  }

  test("isin per column (icolumn.py:940-978)") {
    val got = grouping.isin(Seq("a", 1L))
    assert(col0(got.df.select("A")) === Seq(true, false, true, false))
    assert(col0(got.df.select("B")) === Seq(true, false, false, false))
  }

  test("concat = union-all (icolumn.py:95-97)") {
    assert(abc.concat(abc).length === 14L)
  }

  test("describe layout (inumerical_column.py:139-198)") {
    val got = abc.describe().df
    assert(got.columns.toSeq === Seq("metric", "a", "b", "c"))
    assert(col0(got.select("metric")) ===
      Seq("count", "mean", "std", "min", "25%", "50%", "75%", "max"))
    val mean = got.filter(col("metric") === "mean").head()
    assert(mean.getDouble(1) === 3.0)
  }

  test("column reductions lift to one-row frame (dataframe_cpu.py:1642-1758)") {
    val got = abc.sum.df.head()
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) === ((21L, 21L, 21L)))
  }

  test("cumsum over explicit order (inumerical_column.py:229-312)") {
    val got = abc.cumsum(Seq("b"), order = Seq("a"))
    assert(col0(got.df.orderBy("a").select(got.df("`b.cumsum`"))) ===
      Seq(6L, 11L, 15L, 18L, 20L, 21L, 21L))
  }

  test("cumsumExact equals the windowed global cumsum on integral " +
      "data, preserves all columns, and plans no window") {
    import graft.frame.TFrame
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val rows = (0L until 400L).map(i => (i, (i * 13 % 29) + 1, s"t$i"))
    val tf = TFrame(rows.toDF("id", "v", "tag").repartition(5))
    val windowed = tf.cumsum(Seq("v"), order = Seq("id"))
      .df.select(col("id"), col("`v.cumsum`")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // order by the id alone: empty orderCols, the key-order form
    val exact = tf.cumsumExact("v", order = Seq.empty, idCol = "id",
      parts = 6)
    assert(exact.columns.sorted ===
      Seq("id", "tag", "v", "v.cumsum").sorted)
    val got = exact.df
      .select(col("id"), col("`v.cumsum`"), col("tag")).collect()
    got.foreach { r =>
      assert(r.getLong(1) === windowed(r.getLong(0)),
        s"id=${r.getLong(0)}")
      assert(r.getString(2) === s"t${r.getLong(0)}", "payload corrupted")
    }
    assert(!exact.df.queryExecution.executedPlan.toString.contains("Window"),
      "cumsumExact must never plan a window")
  }

  test("cumsumExact accepts negative values (round-18 relaxed " +
      "contract: long addition is associative for any sign)") {
    import graft.frame.TFrame
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val rows = (0L until 100L).map(i => (i, (i % 7) - 3))
    val tf = TFrame(rows.toDF("id", "v").repartition(3))
    val got = tf.cumsumExact("v", order = Seq.empty, idCol = "id",
      parts = 4).df.select(col("id"), col("`v.cumsum`")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    var acc = 0L
    rows.foreach { case (id, v) =>
      acc += v
      assert(got(id) === acc, s"id=$id")
    }
  }

  test("cumsumExactDecimal equals the sequential decimal running sum " +
      "(negatives included), emits exact DECIMAL, and plans no window") {
    import graft.frame.TFrame
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // cents-scale decimals incl. negatives (a refund column)
    val rows = (0L until 300L).map(i =>
      (i, BigDecimal(i * 37 % 101) - BigDecimal("50.25")))
    val df = rows.toDF("id", "p")
      .select(col("id"), col("p").cast(DecimalType(18, 2)).as("p"))
      .repartition(4)
    val out = TFrame(df).cumsumExactDecimal("p", order = Seq.empty,
      idCol = "id", parts = 5)
    val field = out.df.schema("p.cumsum").dataType
    assert(field === DecimalType(30, 2), s"got $field")
    val got = out.df.select(col("id"), col("`p.cumsum`")).collect()
      .map(r => r.getLong(0) -> r.getDecimal(1)).toMap
    var acc = BigDecimal(0)
    rows.foreach { case (id, p) =>
      acc += p
      assert(BigDecimal(got(id)) === acc, s"id=$id")
    }
    assert(!out.df.queryExecution.executedPlan.toString.contains("Window"),
      "cumsumExactDecimal must never plan a window")
    // non-decimal input is rejected with a pointer to the right form
    val e = intercept[IllegalArgumentException] {
      TFrame(rows.toDF("id", "p")).cumsumExactDecimal("id",
        Seq.empty, "id")
    }
    assert(e.getMessage.contains("DecimalType"))
  }

  test("rankExact/denseRankExact equal row_number()-1/dense_rank()-1 " +
      "over the same total order, keep all columns, and plan no window") {
    import graft.frame.TFrame
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val rows = (0L until 240L).map(i => (i, (i * 31) % 11, s"t$i"))
    val df = rows.toDF("id", "score", "tag").repartition(4)
    val out = TFrame(df)
      .rankExact(Seq("score"), "id", parts = 5, outCol = "rk")
      .denseRankExact(Seq("score"), "id", parts = 5, outCol = "dr")
    assert(out.columns.toSet === Set("id", "score", "tag", "rk", "dr"))
    val got = out.df.collect().map(r => r.getAs[Long]("id") ->
      ((r.getAs[Long]("rk"), r.getAs[Long]("dr"),
        r.getAs[String]("tag")))).toMap
    val sorted = rows.sortBy(t => (t._2, t._1))
    val denseOf = sorted.map(_._2).distinct.sorted.zipWithIndex.toMap
    sorted.zipWithIndex.foreach { case ((id, score, tag), rk) =>
      val (grk, gdr, gtag) = got(id)
      assert(grk === rk.toLong, s"rank id=$id")
      assert(gdr === denseOf(score).toLong, s"dense id=$id")
      assert(gtag === tag, "payload corrupted")
    }
    assert(!out.df.queryExecution.executedPlan.toString.contains("Window"),
      "rank family must never plan a window")
  }

  test("ntileExact equals Spark's own ntile(k) window (ANSI remainder " +
      "rule) including n < k, and plans no window") {
    import graft.frame.TFrame
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    for ((n, k) <- Seq((237, 7), (20, 6), (4, 9))) {
      val rows = (0L until n.toLong).map(i => (i, (i * 13) % 31))
      val df = rows.toDF("id", "score").repartition(3)
      val out = TFrame(df).ntileExact(k, Seq("score"), "id", parts = 4,
        outCol = "b")
      val want = df.withColumn("b2",
        ntile(k).over(W.orderBy(col("score"), col("id"))))
        .collect().map(r => r.getAs[Long]("id") -> r.getAs[Int]("b2"))
        .toMap
      out.df.collect().foreach { r =>
        assert(r.getAs[Long]("b") === want(r.getAs[Long]("id")).toLong,
          s"n=$n k=$k id=${r.getAs[Long]("id")}")
      }
      assert(!out.df.queryExecution.executedPlan.toString.contains("Window"),
        "ntileExact must never plan a window")
    }
  }

  test("percentRankExact/cumeDistExact equal Spark's own " +
      "percent_rank()/cume_dist() windows (ties included), keep all " +
      "columns, and plan no window") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val rows = (0L until 240L).map(i => (i, (i * 31) % 11, s"t$i"))
    val df = rows.toDF("id", "score", "tag").repartition(4)
    val out = TFrame(df)
      .percentRankExact(Seq("score"), "id", parts = 5, outCol = "pr")
      .cumeDistExact(Seq("score"), "id", parts = 5, outCol = "cd")
    assert(out.columns.toSet === Set("id", "score", "tag", "pr", "cd"))
    val want = df
      .withColumn("pr2", percent_rank().over(W.orderBy(col("score"))))
      .withColumn("cd2", cume_dist().over(W.orderBy(col("score"))))
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("pr2"), r.getAs[Double]("cd2")))).toMap
    out.df.collect().foreach { r =>
      val (wpr, wcd) = want(r.getAs[Long]("id"))
      assert(r.getAs[Double]("pr") === wpr, s"pr id=${r.getAs[Long]("id")}")
      assert(r.getAs[Double]("cd") === wcd, s"cd id=${r.getAs[Long]("id")}")
      assert(r.getAs[String]("tag") === s"t${r.getAs[Long]("id")}",
        "payload corrupted")
    }
    assert(!out.df.queryExecution.executedPlan.toString.contains("Window"),
      "peer-rank family must never plan a window")
    // single-row frame: percent_rank is 0.0 by SQL convention (the
    // division would be 0/0), cume_dist is 1.0
    val one = TFrame(Seq((7L, 3L)).toDF("id", "score"))
      .percentRankExact(Seq("score"), "id", parts = 2, outCol = "pr")
      .cumeDistExact(Seq("score"), "id", parts = 2, outCol = "cd")
      .df.head()
    assert(one.getAs[Double]("pr") === 0.0)
    assert(one.getAs[Double]("cd") === 1.0)
    // the fused one-pass form equals the chained singles bit-for-bit
    // (same arithmetic from one shared peerCountsExact pass)
    val fused = TFrame(df)
      .peerRanksExact(Seq("score"), "id", parts = 5,
        prCol = "pr", cdCol = "cd")
      .df.collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Double]("pr"), r.getAs[Double]("cd")))).toMap
    out.df.collect().foreach { r =>
      assert(fused(r.getAs[Long]("id")) ===
        ((r.getAs[Double]("pr"), r.getAs[Double]("cd"))),
        "peerRanksExact must equal the chained single-column forms")
    }
    assert(intercept[IllegalArgumentException] {
      TFrame(df).peerRanksExact(Seq("score"), "id", prCol = "x",
        cdCol = "x")
    }.getMessage.contains("prCol == cdCol"))
  }

  test("lagExact over the VALUE column itself (the sorted-diff idiom " +
      "lag(v) OVER (ORDER BY v)) equals Spark's window") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val rows = (0L until 120L).map(i => (i, (i * 17) % 23, s"t$i"))
    val df = rows.toDF("id", "v", "tag").repartition(5)
    val out = TFrame(df)
      .lagExact("v", 1, order = Seq("v"), idCol = "id", parts = 7,
        outCol = "prev")
    assert(out.columns.toSet === Set("id", "v", "tag", "prev"))
    val want = df
      .withColumn("p2", lag(col("v"), 1).over(
        W.orderBy(col("v"), col("id"))))
      .collect().map(r => r.getAs[Long]("id") ->
        Option(r.get(r.fieldIndex("p2"))).map(_.asInstanceOf[Long]))
      .toMap
    out.df.collect().foreach { r =>
      val got = Option(r.get(r.fieldIndex("prev")))
        .map(_.asInstanceOf[Long])
      assert(got === want(r.getAs[Long]("id")),
        s"id=${r.getAs[Long]("id")}")
      assert(r.getAs[String]("tag") === s"t${r.getAs[Long]("id")}",
        "payload corrupted")
    }
  }

  test("lagExact/leadExact equal Spark's lag/lead windows (edge nulls " +
      "included), thread carries across partitions, and plan no window") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    // parts far above offset so carries must cross partition boundaries
    val rows = (0L until 200L).map(i => (i, (i * 13) % 37, s"t$i"))
    val df = rows.toDF("id", "v", "tag").repartition(6)
    val out = TFrame(df)
      .lagExact("v", 3, order = Seq.empty, idCol = "id", parts = 9,
        outCol = "lag3")
      .leadExact("v", 2, order = Seq.empty, idCol = "id", parts = 9,
        outCol = "lead2")
    assert(out.columns.toSet === Set("id", "v", "tag", "lag3", "lead2"))
    val want = df
      .withColumn("l2", lag(col("v"), 3).over(W.orderBy(col("id"))))
      .withColumn("d2", lead(col("v"), 2).over(W.orderBy(col("id"))))
      .collect().map(r => r.getAs[Long]("id") ->
        ((Option(r.getAs[Any]("l2")), Option(r.getAs[Any]("d2"))))).toMap
    out.df.collect().foreach { r =>
      val (wl, wd) = want(r.getAs[Long]("id"))
      assert(Option(r.getAs[Any]("lag3")) === wl,
        s"lag id=${r.getAs[Long]("id")}")
      assert(Option(r.getAs[Any]("lead2")) === wd,
        s"lead id=${r.getAs[Long]("id")}")
      assert(r.getAs[String]("tag") === s"t${r.getAs[Long]("id")}",
        "payload corrupted")
    }
    assert(!out.df.queryExecution.executedPlan.toString.contains("Window"),
      "lag/lead family must never plan a window")
    // null VALUES shift like any value (SQL lag semantics)
    val withNulls = TFrame(Seq((0L, Some(1L)), (1L, None), (2L, Some(3L)))
      .toDF("id", "v"))
      .lagExact("v", 1, Seq.empty, "id", parts = 2, outCol = "lg")
      .df.orderBy("id").collect()
    assert(withNulls.map(r => Option(r.getAs[Any]("lg"))).toSeq ===
      Seq(None, Some(1L), None))
  }

  test("rollingSumExact equals Spark's ROWS-frame window sum " +
      "(negatives included) and plans no window") {
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val rows = (0L until 150L).map(i => (i, ((i * 17) % 23) - 11))
    val df = rows.toDF("id", "v").repartition(4)
    val out = TFrame(df).rollingSumExact("v", w = 6, order = Seq.empty,
      idCol = "id", parts = 5, outCol = "roll")
    assert(out.columns.toSet === Set("id", "v", "roll"))
    val want = df.withColumn("r2", sum(col("v")).over(
        W.orderBy(col("id")).rowsBetween(-6, 0)))
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("r2")).toMap
    out.df.collect().foreach { r =>
      assert(r.getAs[Long]("roll") === want(r.getAs[Long]("id")),
        s"id=${r.getAs[Long]("id")}")
    }
    assert(!out.df.queryExecution.executedPlan.toString.contains("Window"),
      "rollingSumExact must never plan a window")
  }

  test("head/tail/append") {
    assert(abc.head(2).length === 2L)
    assert(col0(abc.tail(2).df.select("a")) === Seq(5L, 6L))
    val appended = abc.append(Seq(Row(99L, 99L, 99L)))
    assert(appended.length === 8L)
  }

  test("mapRows / filterRows / flatmapRows (§2.13)") {
    val out = StructType(Seq(StructField("s", LongType)))
    val mapped = abc.mapRows(out, Seq("a", "b")) {
      case Seq(a: Long, b: Long) => Seq(a + b)
    }
    assert(col0(mapped.df) === Seq.fill(7)(6L))

    val filtered = abc.filterRows(Seq("a")) {
      case Seq(a: Long) => a % 2 == 0
    }
    assert(col0(filtered.df.select("a")) === Seq(0L, 2L, 4L, 6L))

    val flat = abc.flatmapRows(out, Seq("a")) {
      case Seq(a: Long) => Seq.fill(if (a < 2) 0 else 2)(Seq(a))
    }
    assert(flat.length === 10L)
  }

  test("isUnique / isMonotonic (icolumn.py:172-206)") {
    assert(abc.isUnique("a"))
    val dup = TFrame(spark, Seq("x" -> Seq(1L, 1L, 2L)))
    assert(!dup.isUnique("x"))
    assert(abc.isMonotonicIncreasing("a", order = Seq("a")))
    assert(abc.isMonotonicDecreasing("b", order = Seq("a")))
    assert(!abc.isMonotonicIncreasing("b", order = Seq("a")))
  }

  test("isMonotonic: violation sweep covers every partition boundary") {
    // the distributed check splits adjacencies into within-partition
    // pairs and cross-boundary pairs; sweeping a single adjacent swap
    // across EVERY position exercises both paths, wherever the range
    // partitioner happens to cut (4 shuffle partitions in specs)
    val n = 32
    val ks = (0 until n).map(_.toLong)
    val clean = TFrame(spark, Seq("k" -> ks, "v" -> ks))
    assert(clean.isMonotonicIncreasing("v", order = Seq("k")))
    assert(!clean.isMonotonicDecreasing("v", order = Seq("k")))
    for (pos <- 0 until n - 1) {
      val v = ks.updated(pos, ks(pos + 1)).updated(pos + 1, ks(pos))
      val f = TFrame(spark, Seq("k" -> ks, "v" -> v))
      assert(!f.isMonotonicIncreasing("v", order = Seq("k")),
        s"descending pair at adjacency $pos not detected")
    }
    // nulls are ignored, as in SQL comparison semantics
    val withNull = TFrame(spark, Seq(
      "k" -> Seq(1L, 2L, 3L), "v" -> Seq[Any](1L, null, 2L)))
    assert(withNull.isMonotonicIncreasing("v", order = Seq("k")))
  }

  test("intersect/except set ops") {
    val other = abc.where(abc("a") < 3)
    assert(abc.intersect(other).length === 3L)
    assert(abc.except(other).length === 4L)
  }

  test("reduceCol sequential fold (icolumn.py:729-770)") {
    assert(abc.reduceCol("b", order = Seq("a"))(0L)(
      (acc, v) => acc * 10 + v.asInstanceOf[Long]) === 6543210L)
  }

  test("reduceCol fails fast past maxRows instead of collecting") {
    val e = intercept[IllegalArgumentException] {
      abc.reduceCol("b", order = Seq("a"), maxRows = 3)(0L)(
        (acc, v) => acc + v.asInstanceOf[Long])
    }
    assert(e.getMessage.contains("exceeds maxRows=3"))
  }

  test("ifElse null-cond and fixed-size check (§2.8, §2.11)") {
    import graft.functions.Functional
    val df = TFrame(spark, Seq("c" -> Seq[Any](true, false, null),
      "x" -> Seq(1L, 2L, 3L), "y" -> Seq(10L, 20L, 30L)))
    assert(col0(df.df.select(Functional.ifElse(df("c"), df("x"), df("y")))) ===
      Seq(1L, 20L, null))
    val ok = spark.sql("select array(1,2) as a")
      .select(Functional.assertFixedSize(col("a"), 2))
    assert(ok.count() === 1L)
    val bad = spark.sql("select array(1,2,3) as a")
      .select(Functional.assertFixedSize(col("a"), 2))
    intercept[Exception] { bad.collect() }
  }

  test("df-level all/any bool reductions (§2.4, null-skipping)") {
    val df = TFrame(spark, Seq(
      "p" -> Seq[Any](true, true, null),
      "q" -> Seq[Any](false, null, false)))
    val all = df.allAgg.df.head()
    assert(all.getBoolean(0) === true && all.getBoolean(1) === false)
    val any = df.anyAgg.df.head()
    assert(any.getBoolean(0) === true && any.getBoolean(1) === false)
  }

  test("cummin/cummax/cumprod running aggregates (§2.4)") {
    val df = TFrame(spark, Seq("o" -> Seq(1L, 2L, 3L, 4L),
      "v" -> Seq(2.0, -1.0, 0.0, 3.0)))
    val got = df.cummin(Seq("v"), Seq("o")).cummax(Seq("v"), Seq("o"))
      .cumprod(Seq("v"), Seq("o")).sort(Seq("o")).df
    assert(got.collect().toSeq.map(r =>
      (r.getDouble(2), r.getDouble(3), r.getDouble(4))) ===
      Seq((2.0, 2.0, 2.0), (-1.0, 2.0, -2.0), (-1.0, 2.0, 0.0),
        (-1.0, 3.0, 0.0)))
  }

  test("quantile interpolation modes (inumerical_column.py:357-413)") {
    val df = TFrame(spark, Seq("x" -> Seq(1.0, 2.0, 3.0, 4.0)))
    // q=0.5 over 4 values: pos=1.5 between 2 and 3
    assert(df.quantile("x", 0.5, "linear") === 2.5)
    assert(df.quantile("x", 0.5, "lower") === 2.0)
    assert(df.quantile("x", 0.5, "higher") === 3.0)
    assert(df.quantile("x", 0.5, "midpoint") === 2.5)
    assert(df.quantile("x", 0.5, "nearest") === 2.0) // tie -> lower
    assert(df.quantile("x", 0.8, "nearest") === 3.0) // pos=2.4
    assert(df.quantile("x", 1.0, "linear") === 4.0)
    assert(df.quantile("x", 0.0, "higher") === 1.0)
  }

  test("quantile duplicate-dominant column stays exact under a tiny " +
      "bracket cap (histogram path, no full-column collect)") {
    // 10k rows, 90% a single value: the rank bracket around the median
    // contains ~9k rows — far over the shrunk cap — so orderStats must
    // take the distinct-value histogram path (≤ 3 entries) and still
    // be exact. Oracle: sorted.head semantics give median = 5.0.
    val vals = (0 until 10000).map(i =>
      if (i % 10 == 0) (i % 100).toDouble / 100.0 + 10.0 else 5.0)
    val df = TFrame(spark.range(10000).toDF("i")).withCol("x",
      when(col("i") % 10 === 0,
        (col("i") % 100).cast("double") / 100.0 + 10.0).otherwise(5.0))
    val saved = TFrame.maxBracketCollect
    try {
      TFrame.maxBracketCollect = 64
      assert(df.quantile("x", 0.5, "linear") === 5.0)
      assert(df.quantile("x", 0.25, "higher") === 5.0)
      // a quantile inside the 10% tail still resolves (row path fits
      // the cap only after margin widening or directly, but never via
      // a full-column collect)
      val q99 = df.quantile("x", 0.995, "lower")
      val expected = vals.sorted.apply((0.995 * (10000 - 1)).floor.toInt)
      assert(q99 === expected)
    } finally TFrame.maxBracketCollect = saved
  }

  test("quantile fails fast when the covering bracket exceeds the cap " +
      "in both rows and distinct values (no useless margin retries)") {
    // 10k all-distinct doubles, cap 16: the median bracket covers the
    // target ranks with ~64 rows = ~64 distinct values, both > cap.
    // Widening can only grow the bracket, so orderStats must throw the
    // fail-fast covering-bracket error, not the retry-exhausted one.
    val df = TFrame(spark.range(10000).toDF("i"))
      .withCol("x", col("i").cast("double") / 10000.0)
    val saved = TFrame.maxBracketCollect
    try {
      TFrame.maxBracketCollect = 16
      val e = intercept[IllegalStateException](df.quantile("x", 0.5))
      assert(e.getMessage.contains("rank-covering bracket"))
    } finally TFrame.maxBracketCollect = saved
  }

  test("rowSlice start:stop:step with explicit order (§2.2)") {
    val df = TFrame(spark, Seq("a" -> (0L until 10L)))
    assert(col0(df.rowSlice(2, 9, 3, Seq("a")).df) === Seq(2L, 5L, 8L))
    assert(col0(df.rowSlice(0, 4, 1, Seq("a")).df) === Seq(0L, 1L, 2L, 3L))
    assert(df.rowSlice(8, 100, 1, Seq("a")).length === 2L)
  }

  test("rolling window aggs (pandas rolling analog; ref sketch only)") {
    val df = TFrame(spark, Seq(
      "k" -> Seq("a", "a", "a", "a", "b", "b"),
      "t" -> Seq(1L, 2L, 3L, 4L, 1L, 2L),
      "v" -> Seq(1.0, 2.0, 3.0, 4.0, 10.0, 20.0)))
    val got = df.rolling(3, order = Seq("t"), by = Seq("k"), minPeriods = 2)(
        "v" -> "sum", "v" -> "min")
      .sort(Seq("k", "t")).df
    val sums = got.collect().toSeq.map(r =>
      if (r.isNullAt(3)) null else r.getDouble(3))
    assert(sums === Seq(null, 3.0, 6.0, 9.0, null, 30.0))
    val mins = got.collect().toSeq.map(r =>
      if (r.isNullAt(4)) null else r.getDouble(4))
    assert(mins === Seq(null, 1.0, 1.0, 2.0, null, 10.0))
  }

  test("rolling std with minPeriods=1 yields NaN on one observation") {
    val df = TFrame(spark, Seq(
      "t" -> Seq(1L, 2L, 3L), "v" -> Seq(1.0, 3.0, 5.0)))
    val got = df.rolling(2, order = Seq("t"), minPeriods = 1)("v" -> "std")
      .sort(Seq("t")).df.collect().toSeq.map(_.getDouble(2))
    assert(got.head.isNaN) // pandas ddof=1: single obs -> NaN, not null
    assert(math.abs(got(1) - math.sqrt(2.0)) < 1e-12)
    assert(math.abs(got(2) - math.sqrt(2.0)) < 1e-12)
  }

  test("rename/drop/reorder/withCol/pipe (§2.2)") {
    val got = abc.rename(Map("a" -> "x")).drop("c")
      .withCol("y", lit(1L)).reorder(Seq("y", "x", "b"))
      .pipe(f => f.where(f("x") < 2))
    assert(got.columns === Seq("y", "x", "b"))
    assert(got.length === 2L)
  }

  test("all/any vacuous truth on all-null bool columns") {
    val df = TFrame(spark, Seq("p" -> Seq[Any](true, null, null)))
    val allNull = df.where(df("p").isNull) // bool column, only nulls left
    assert(allNull.allAgg.df.head().getBoolean(0) === true)
    assert(allNull.anyAgg.df.head().getBoolean(0) === false)
    val nobool = TFrame(spark, Seq("x" -> Seq(1L)))
    intercept[IllegalArgumentException](nobool.allAgg)
  }

  test("isin dict form (dataframe_cpu.py:1496-1531)") {
    val got = grouping.isinDict(Map(
      "A" -> Seq("a"), "B" -> Seq(2L, 4L, 99L)))
    val rows = got.df.collect().toSeq.map(r =>
      (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(rows === Seq((true, false, false), (false, true, false),
      (true, false, false), (false, true, false)))
  }

  test("isin frame form: same-named column membership") {
    val other = TFrame(spark, Seq("A" -> Seq("b", "b"), "B" -> Seq(1L, 3L)))
    val got = grouping.isinFrame(other).df.collect().toSeq.map(r =>
      (r.getBoolean(0), r.getBoolean(1), r.getBoolean(2)))
    assert(got.toSet === Set((false, true, false), (true, false, false),
      (false, true, false), (true, false, false)))
  }

  test("deterministic grouped mode (smallest most-frequent)") {
    val df = TFrame(spark, Seq(
      "k" -> Seq("x", "x", "x", "x", "y", "y"),
      "v" -> Seq(3L, 3L, 1L, 1L, 5L, 2L))) // x: tie {1,3} -> 1
    val got = df.groupby("k").modeDet("v").df.orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1))).toSeq ===
      Seq(("x", 1L), ("y", 2L)))
  }

  test("construction coerces Scala Int to the inferred int64") {
    val df = TFrame(spark, Seq(
      "a" -> Seq(1, 2, 3),          // Int infers int64 (Python int)
      "b" -> Seq[Any](1.5f, 2.0, 3.0))) // mixed f32/f64 -> float64
    assert(df.df.schema.map(_.dataType) === Seq(LongType, DoubleType))
    assert(col0(df.df.orderBy("a")) === Seq(1L, 2L, 3L))
  }

  test("construction coerces mixed int/float columns to the promoted " +
      "float type") {
    // int ⊔ float64 → float64, int ⊔ float32 → float32 (lattice);
    // every boxed int width must widen to the promoted schema type
    val df = TFrame(spark, Seq(
      "a" -> Seq[Any](1, 2.5, null, 3L),
      "b" -> Seq[Any](1.toByte, 2.toShort, 0.5f, 4)))
    assert(df.df.schema.map(_.dataType) ===
      Seq(DoubleType, FloatType))
    assert(col0(df.df.orderBy("a")) === Seq(null, 1.0, 2.5, 3.0))
    assert(df.df.orderBy("b").collect().map(_.get(1)).toSeq ===
      Seq(0.5f, 1.0f, 2.0f, 4.0f))
  }

  test("deterministic grouped mode on a non-numeric column") {
    val df = TFrame(spark, Seq(
      "k" -> Seq("x", "x", "x", "x", "y"),
      "v" -> Seq("b", "b", "a", "a", "z"))) // x: tie {a,b} -> a
    val got = df.groupby("k").modeDet("v").df.orderBy("k").collect()
    assert(got.map(r => (r.getString(0), r.getString(1))).toSeq ===
      Seq(("x", "a"), ("y", "z")))
  }

  test("grouped iteration pairs a null-valued key with its rows") {
    val df = TFrame(spark, Seq(
      "k" -> Seq("a", null, null), "v" -> Seq(1L, 2L, 3L)))
    val groups = df.groupby("k").iterGroups()
    val byKey = groups.map { case (kr, sub) =>
      (if (kr.isNullAt(0)) null else kr.getString(0)) -> sub.df.count()
    }.toMap
    assert(byKey === Map("a" -> 1L, (null: String) -> 2L))
  }

  test("grouped iteration yields lazy per-key subframes") {
    val groups = grouping.groupby("A").iterGroups()
    assert(groups.map(_._1.getString(0)) === Seq("a", "b"))
    val (_, aFrame) = groups.head
    assert(col0(aFrame.df.select("B").orderBy("B")) === Seq(1L, 3L))
    intercept[IllegalArgumentException](
      grouping.groupby("B").iterGroups(maxGroups = 2))
  }

  test("describe include/exclude dtype selection (dataframe_cpu.py:1786-1838)") {
    val df = TFrame(spark, Seq(
      "i" -> Seq(1L, 2L), "f" -> Seq(1.5, 2.5), "s" -> Seq("a", "b")))
    assert(df.describe().columns === Seq("metric", "i", "f"))
    assert(df.describe(include = Seq("float")).columns ===
      Seq("metric", "f"))
    assert(df.describe(exclude = Seq("float")).columns ===
      Seq("metric", "i"))
    assert(df.describe(include = Seq("numeric"), exclude = Seq("int"))
      .columns === Seq("metric", "f"))
    intercept[IllegalArgumentException](df.describe(include = Seq("bool")))
  }

  test("functional.rand lands in [0,1) (velox_rt/functional.py:47-63)") {
    import graft.functions.Functional
    val df = TFrame(spark, Seq("x" -> (0L until 100L)))
      .withCol("r", Functional.randCol(42L))
    assert(df.df.where(col("r") < 0.0 || col("r") >= 1.0).isEmpty)
    // seeded: stable across two runs over the same partition layout
    assert(col0(df.df.select("r")) === col0(df.df.select("r")))
  }

  test("partitioned cumulatives (by-key running aggregates)") {
    val df = TFrame(spark, Seq(
      "k" -> Seq("a", "a", "b", "b"),
      "o" -> Seq(1L, 2L, 1L, 2L),
      "v" -> Seq(1.0, 2.0, 10.0, 20.0)))
    val got = df.cumsum(Seq("v"), order = Seq("o"), by = Seq("k"))
      .sort(Seq("k", "o")).df
    assert(got.collect().toSeq.map(_.getDouble(3)) ===
      Seq(1.0, 3.0, 10.0, 30.0))
  }

  test("collectRows / toPylist export (icolumn.py:1104-1125)") {
    val rows = abc.collectRows()
    assert(rows.length === 7)
    val maps = abc.toPylist()
    assert(maps.head.keySet === Set("a", "b", "c"))
    assert(maps.map(_("a")) === (0L to 6L))
    // null round-trips as null, not a default
    val withNull = TFrame(spark, Seq("x" -> Seq[Any](1L, null, 3L)))
    assert(withNull.toPylist().map(_("x")) === Seq(1L, null, 3L))
    // the cap fails fast instead of collecting past the bound
    val e = intercept[IllegalArgumentException](abc.collectRows(maxRows = 3))
    assert(e.getMessage.contains("maxRows"))
  }
}
