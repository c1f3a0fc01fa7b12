package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim

/** §2.1 from_arrow / to_arrow (reference interop.py:17-34,
  * interop_arrow.py, lib.cpp:177-207): round-trip a DataFrame through
  * Arrow IPC record batches — Spark's native columnar interchange
  * format — and back, preserving schema and values. */
class ArrowInteropSpec extends SparkSpec {

  test("to_arrow → from_arrow round-trip preserves schema and values") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha", 1.5, Seq(1, 2, 3)),
      (2L, null.asInstanceOf[String], -0.25, Seq.empty[Int]),
      (3L, "gamma", Double.MaxValue, Seq(7)))
      .toDF("id", "name", "score", "xs")
    val batches = Shim.toArrowBatches(df).toSeq
    assert(batches.nonEmpty && batches.forall(_.length > 0))
    val back = Shim.fromArrowBatches(spark, df.schema, batches.iterator)
    assert(back.schema === df.schema)
    assert(back.orderBy("id").collect().toSeq.map(_.toString) ===
      df.orderBy("id").collect().toSeq.map(_.toString))
  }

  test("nested list/map/struct round-trip through Arrow IPC " +
      "(reference test_arrow_interop.py type coverage)") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq(Seq(1, 2), Seq(3)), Map("a" -> 1L, "b" -> 2L),
        (1.5d, "p", Seq("u", "v"))),
      (2L, Seq(Seq.empty[Int]), Map.empty[String, Long],
        (-0.0d, null.asInstanceOf[String], Seq.empty[String])),
      (3L, null.asInstanceOf[Seq[Seq[Int]]],
        null.asInstanceOf[Map[String, Long]],
        null.asInstanceOf[(Double, String, Seq[String])]))
      .toDF("id", "xss", "m", "s")
    val back = Shim.fromArrowBatches(spark, df.schema,
      Shim.toArrowBatches(df).iterator)
    assert(back.schema === df.schema)
    val got = back.orderBy("id").collect()
    val want = df.orderBy("id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getLong(0) === w.getLong(0))
      // structural compares: Maps are order-free, Rows/Seqs ordered
      assert((if (g.isNullAt(1)) null else g.getSeq[Seq[Int]](1)) ===
        (if (w.isNullAt(1)) null else w.getSeq[Seq[Int]](1)))
      assert((if (g.isNullAt(2)) null
        else g.getMap[String, Long](2).toMap) ===
        (if (w.isNullAt(2)) null else w.getMap[String, Long](2).toMap))
      assert(Option(g.getStruct(3)).map(_.toSeq) ===
        Option(w.getStruct(3)).map(_.toSeq))
    }
  }

  test("array-of-struct and map-of-array round-trip through Arrow") {
    import spark.implicits._
    val df = Seq(
      (1L, Seq((10L, "x"), (20L, "y")), Map("k" -> Seq(1.0, 2.0))),
      (2L, Seq.empty[(Long, String)], Map("e" -> Seq.empty[Double])))
      .toDF("id", "as", "ma")
    val back = Shim.fromArrowBatches(spark, df.schema,
      Shim.toArrowBatches(df).iterator)
    assert(back.schema === df.schema)
    val got = back.orderBy("id").collect()
    assert(got(0).getSeq[org.apache.spark.sql.Row](1)
      .map(_.toSeq) === Seq(Seq(10L, "x"), Seq(20L, "y")))
    assert(got(0).getMap[String, Seq[Double]](2)("k") === Seq(1.0, 2.0))
    assert(got(1).getSeq[org.apache.spark.sql.Row](1).isEmpty)
  }

  test("decimal / timestamp / date / binary round-trip through Arrow") {
    import spark.implicits._
    val df = Seq(
      (1L, BigDecimal("12345.6789"),
        java.sql.Timestamp.valueOf("2024-03-01 12:34:56.789"),
        java.sql.Date.valueOf("2024-03-01"),
        Array[Byte](1, 2, -3)),
      (2L, BigDecimal("-0.0001"),
        java.sql.Timestamp.valueOf("1969-12-31 23:59:59.999"),
        java.sql.Date.valueOf("1969-12-31"),
        Array.empty[Byte]))
      .toDF("id", "d", "ts", "dt", "b")
    val back = Shim.fromArrowBatches(spark, df.schema,
      Shim.toArrowBatches(df).iterator)
    assert(back.schema === df.schema)
    val got = back.orderBy("id").collect()
    val want = df.orderBy("id").collect()
    got.zip(want).foreach { case (g, w) =>
      assert(g.getDecimal(1) === w.getDecimal(1))
      assert(g.getTimestamp(2) === w.getTimestamp(2))
      assert(g.getDate(3).toString === w.getDate(3).toString)
      assert(g.getAs[Array[Byte]](4).toSeq === w.getAs[Array[Byte]](4).toSeq)
    }
  }

  test("multi-batch export splits by maxRecordsPerBatch") {
    import spark.implicits._
    val df = (0L until 100L).toDF("v")
    val batches = Shim.toArrowBatches(df, maxRecordsPerBatch = 16L).toSeq
    assert(batches.length >= 6) // ceil(100/16) batches of ≤16 rows
    val back = Shim.fromArrowBatches(spark, df.schema, batches.iterator)
    assert(back.agg(sum(col("v"))).head().getLong(0) === 4950L)
    assert(back.count() === 100L)
  }
}
