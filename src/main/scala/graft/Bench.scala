package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  * Queries run in sorted name order after a JVM/session warmup; each
  * query is fully materialized through a noop write (no driver
  * collect, no count() short-circuit on limit queries).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // bench times the sketch-only plans; the exact-bound self-checks
    // stay on in the Verify/correctness path (default true)
    spark.conf.set("graft.sketch.selfcheck", "false")

    def materialize(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // warmup: session init, codegen, parquet footer reads
    spark.range(1000000L).selectExpr("sum(id)").collect()
    SparkEntry.queries.keys.toSeq.sorted.headOption.foreach(materialize)

    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> materialize(name)
    }
    val qs = results.map { case (k, (v, _)) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val failed = results.collect { case (k, (_, false)) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2._1).sum
    // ambient-load witness: rounds 13-14 shipped benches contaminated
    // by sandbox load that was invisible in the JSON — record the
    // 1-minute load average at finish (own run included) so a reading
    // far above nproc-busy-by-this-bench flags itself
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val load = os.getSystemLoadAverage
    val nproc = os.getAvailableProcessors
    // a failed query must be visible in the JSON, never silently timed
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","load_avg_1m":$load,"nproc":$nproc}""")
    spark.stop()
  }
}
