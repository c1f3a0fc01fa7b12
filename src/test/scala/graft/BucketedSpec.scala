package graft

import org.apache.spark.sql.functions._

import graft.sources.Bucketed

/** Bucketed sink + co-located join (sources/Bucketed.scala; gate
  * q92_bucketed_join). Proves the plan property both ways: the
  * bucketed join carries zero exchanges, and the SAME join without
  * bucketing fails requireColocated — the check is not vacuous. */
class BucketedSpec extends SparkSpec {

  private def frames = {
    import spark.implicits._
    val dim = (0L until 200L).map(k => (k, s"name$k")).toDF("k", "name")
    val fact = (0L until 2000L).map(i => (i % 200L, i * 1.5)).toDF("k", "v")
    (dim, fact)
  }

  test("bucketed join is co-located and matches the unbucketed result") {
    val (dim, fact) = frames
    Bucketed.writeTable(spark, dim, "bkt_spec_dim", "k", 4,
      baseDir = "/tmp/graft_bkt_spec")
    Bucketed.writeTable(spark, fact, "bkt_spec_fact", "k", 4,
      baseDir = "/tmp/graft_bkt_spec")
    val j = spark.table("bkt_spec_dim").hint("merge")
      .join(spark.table("bkt_spec_fact"), "k")
    Bucketed.requireColocated(j, "spec")
    assert(Bucketed.shuffleCount(j) === 0)
    val expected = dim.join(fact, "k").agg(count(lit(1)), sum("v"))
      .head.toSeq
    assert(j.agg(count(lit(1)), sum("v")).head.toSeq === expected)
  }

  test("the same join without bucketing fails requireColocated") {
    val (dim, fact) = frames
    val j = dim.hint("merge").join(fact, "k")
    assert(Bucketed.shuffleCount(j) > 0)
    val e = intercept[IllegalStateException] {
      Bucketed.requireColocated(j, "spec-negative")
    }
    assert(e.getMessage.contains("shuffles="))
  }

  test("bucketed writes produce one file per bucket") {
    val (dim, _) = frames
    Bucketed.writeTable(spark, dim, "bkt_spec_files", "k", 4,
      baseDir = "/tmp/graft_bkt_spec")
    val files = new java.io.File("/tmp/graft_bkt_spec/bkt_spec_files")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    assert(files.length === 4, files.map(_.getName).toSeq.toString)
  }
}
