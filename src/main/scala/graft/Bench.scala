package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main: runs every SparkEntry query against
  * SPARK_GRAFT_SF_DIR, prints one JSON line with per-query seconds.
  * Queries run in sorted name order after a JVM/session warmup; each
  * query is fully materialized through a noop write (no driver
  * collect, no count() short-circuit on limit queries).
  *
  * Contamination-proofing (round 17): the whole suite runs TWICE and
  * the published per-query number is the MIN of the two samples — the
  * two-sample pair-min protocol (tools/bench_pair.py) moved inside
  * the artifact itself. Three of the four round-13..16 driver benches
  * were distorted by ambient sandbox load invisible in the JSON; a
  * transient load spike rarely hits the same query in both passes, so
  * min-of-pair self-immunizes the artifact. Both raw samples are kept
  * in the JSON (`queries_s1`/`queries_s2`) so uniform inflation — real
  * contention across the whole window — stays diagnosable, and the
  * 1-minute load average is recorded as before.
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
    // SPARK_GRAFT_ONLY: comma-separated name prefixes for a targeted
    // quiet re-read (band exoneration of a single flagged query) —
    // same contract as Verify's prefix args. Default: the full suite.
    // Subset runs are for DIAGNOSIS; bands update only from full
    // pairs, where cache/scheduler state matches the recorded set.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    only.foreach(p => require(p.nonEmpty,
      "SPARK_GRAFT_ONLY is set but empty — unset it for the full suite"))
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    // fail fast on a typo'd prefix: a silent zero-query "pair" wastes
    // a multi-minute bench invocation and prints a meaningless JSON
    only.foreach(p => require(names.nonEmpty,
      s"SPARK_GRAFT_ONLY=${p.mkString(",")} matches no query names"))
    names.headOption.foreach(materialize)

    // two full back-to-back samples; published number = per-query min
    val s1 = names.map(n => n -> materialize(n))
    val s2 = names.map(n => n -> materialize(n))
    val m2 = s2.toMap
    def fmt(xs: Seq[(String, (Double, Boolean))]): String =
      xs.map { case (k, (v, _)) => "\"" + k + "\":" + v }
        .mkString("{", ",", "}")
    // per-query min over SUCCESSFUL samples only: a pass that failed
    // fast (transient OOM, source hiccup) must not publish its short
    // time-to-exception as the band. Only when both passes failed does
    // the min of the two (still-flagged) readings stand in.
    val pairMin = s1.map { case (k, (v1, ok1)) =>
      val (v2, ok2) = m2(k)
      k -> ((ok1, ok2) match {
        case (true, false)  => v1
        case (false, true)  => v2
        case _              => math.min(v1, v2)
      })
    }
    val qs = pairMin.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // a query failing in EITHER pass must be visible, never silently
    // banded on its surviving pass
    val failed = (s1 ++ s2).collect { case (k, (_, false)) => k }
      .distinct.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val t1 = s1.map(_._2._1).sum
    val t2 = s2.map(_._2._1).sum
    val total = pairMin.map(_._2).sum
    // ambient-load witness: rounds 13-16 shipped benches contaminated
    // by sandbox load that was invisible in the JSON — record the
    // 1-minute load average at finish (own run included) so a reading
    // far above nproc-busy-by-this-bench flags itself
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val load = os.getSystemLoadAverage
    val nproc = os.getAvailableProcessors
    // Self-reporting 2x contract (round 18): load the recorded band
    // set (BASELINE_BANDS.json — per-query pair-min seconds keyed by
    // SF directory name, maintained from BASELINE.md's definitive
    // pairs) and publish per-query ratio vs band plus an explicit
    // over_2x list, so a genuine regression turns the artifact red
    // without manual cross-referencing. Queries with no recorded band
    // yet (new gates) are listed in no_band. Failed-in-both-passes
    // queries are excluded from ratios (a time-to-exception is not a
    // measurement). Absent/unreadable band file -> band_sf null.
    val bandsPath = sys.env.getOrElse("SPARK_GRAFT_BANDS", "BASELINE_BANDS.json")
    val sfName = new java.io.File(sfDir).getName
    val failedBoth = s1.collect {
      case (k, (_, false)) if !m2(k)._2 => k
    }.toSet
    val bandReport: String =
      try {
        val root = new com.fasterxml.jackson.databind.ObjectMapper()
          .readTree(new java.io.File(bandsPath))
        val node = root.get(sfName)
        if (node == null) s""","band_sf":null"""
        else {
          val bands = {
            val it = node.fields()
            val b = Seq.newBuilder[(String, Double)]
            while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
            b.result().toMap
          }
          val measured = pairMin.filterNot { case (k, _) => failedBoth(k) }
          val ratios = measured.collect {
            case (k, v) if bands.get(k).exists(_ > 0) => k -> v / bands(k)
          }
          val over = ratios.collect { case (k, r) if r > 2.0 => k }
            .sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
          val noBand = measured.collect { case (k, _) if !bands.contains(k) => k }
            .sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
          val rs = ratios.map { case (k, r) => "\"" + k + "\":" + (math.rint(r * 1000) / 1000) }
            .mkString("{", ",", "}")
          val sortedR = ratios.map(_._2).sorted
          // conventional median: mean of the middle pair on even sizes
          // (upper-middle alone would systematically overstate it)
          val med = if (sortedR.isEmpty) 0.0
            else {
              val n = sortedR.size
              val m = if (n % 2 == 1) sortedR(n / 2)
                else (sortedR(n / 2 - 1) + sortedR(n / 2)) / 2
              math.rint(m * 1000) / 1000
            }
          s""","band_sf":"$sfName","band_ratios":$rs,"band_median":$med,"over_2x":$over,"no_band":$noBand"""
        }
      } catch { case _: Throwable => s""","band_sf":null""" }
    println(s"""{"metric":"pair_min_total","value":$total,"unit":"sec","queries":$qs,"queries_s1":${fmt(s1)},"queries_s2":${fmt(s2)},"samples":[$t1,$t2],"failed":$failed,"sf":"$sfDir","load_avg_1m":$load,"nproc":$nproc$bandReport}""")
    spark.stop()
  }
}
