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
