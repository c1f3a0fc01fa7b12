package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Sketch operators: bloom prefilter, HLL distinct, Count-Min. */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("bloomPrefilter keeps every true match and bounds false positives") {
    val fact = spark.range(0, 10000).toDF("k")
    val keys = spark.range(0, 10000, 7).toDF("pk") // 1429 keys
    val pre = Sketches.bloomPrefilter(fact, "k", keys, "pk",
      expectedItems = 1429, fpp = 0.01)
    val preKeys = pre.select("k").as[Long].collect().toSet
    // no false negatives: every multiple of 7 survives
    (0L until 10000L by 7).foreach(k => assert(preKeys.contains(k)))
    // false positives bounded: non-members passing / non-members total
    val fp = preKeys.count(_ % 7 != 0).toDouble / (10000 - 1429)
    assert(fp <= 0.03, s"fp rate $fp")
  }

  test("bloomPrefilter is deterministic and the probe is an expression, " +
      "not a UDF") {
    val fact = spark.range(0, 1000).toDF("k")
    val keys = spark.range(0, 100).toDF("pk")
    val pre = Sketches.bloomPrefilter(fact, "k", keys, "pk", 100, 0.01)
    assert(pre.count() ===
      Sketches.bloomPrefilter(fact, "k", keys, "pk", 100, 0.01).count())
    val plan = pre.queryExecution.executedPlan.toString()
    assert(plan.contains("might_contain"), plan.take(400))
    assert(!plan.toLowerCase.contains("batchevalpython"))
  }

  test("bloomSketch rejects empty key sides and bad parameters") {
    val keys = spark.range(0).toDF("pk")
    intercept[IllegalArgumentException] {
      Sketches.bloomSketch(keys, "pk", expectedItems = 10, fpp = 0.01)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomSketch(keys, "pk", expectedItems = 0, fpp = 0.01)
    }
    intercept[IllegalArgumentException] {
      Sketches.bloomSketch(keys, "pk", expectedItems = 10, fpp = 1.5)
    }
  }

  test("approxDistinct is partition-invariant and within 4 sigma") {
    val df = spark.range(0, 20000)
      .selectExpr("cast(id % 2 as string) g", "cast(id as string) v")
    val a = Sketches.approxDistinct(df, Seq("g"), "v", rsd = 0.05)
      .orderBy("g").as[(String, Long)].collect().toSeq
    val b = Sketches.approxDistinct(df.repartition(13), Seq("g"), "v",
      rsd = 0.05).orderBy("g").as[(String, Long)].collect().toSeq
    assert(a === b)
    a.foreach { case (_, nd) =>
      assert(math.abs(nd - 10000.0) / 10000.0 <= 0.20, s"nd=$nd")
    }
  }

  test("cmsCounts never undercounts and overcounts at most eps*N") {
    val words = (Seq.fill(500)("hot") ++ (0 until 2000).map("w" + _))
      .toDF("w")
    val cms = Sketches.cmsCounts(words, "w", eps = 0.01,
      confidence = 0.99, seed = 7)
    val slack = math.ceil(0.01 * cms.totalCount()).toLong
    assert(cms.estimateCount("hot") >= 500L)
    assert(cms.estimateCount("hot") <= 500L + slack)
    assert(cms.estimateCount("w42") >= 1L)
  }
}
