package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

import graft.functions.Functional

/** Native-codegen cosine expression vs the Java kernel (StaticInvoke)
  * on the same data: results must be bit-identical, including the
  * zero-norm and length-mismatch edge cases.
  */
class CosineSimFSpec extends SparkSpec {
  import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}

  private def kernelCosine(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column) =
    Shim.staticInvoke(classOf[graft.functions.Kernels], DoubleType,
      "cosineF", Seq(a, b))

  test("codegen expression matches kernel bit-exactly on random vectors") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(64) { i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 2f - 1f))
    }
    val df = rows.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .select(
        Functional.cosineSim(col("a.v"), col("b.v")).as("native"),
        kernelCosine(col("a.v"), col("b.v")).as("kernel"))
    assert(pairs.where(col("native") =!= col("kernel")).count() == 0)
    // sanity: self-similarity is 1.0 up to fp
    val selfs = df.select(Functional.cosineSim(col("v"), col("v")))
      .collect().map(_.getDouble(0))
    assert(selfs.forall(s => math.abs(s - 1.0) < 1e-6))
  }

  test("edge cases: zero vector, empty array, length mismatch, null") {
    val df = Seq(
      (Array(0f, 0f), Array(1f, 2f)),      // zero norm -> 0.0
      (Array.empty[Float], Array(1f, 2f)), // empty -> 0.0
      (Array(1f, 0f, 5f), Array(1f, 0f))   // common-prefix dot
    ).toDF("a", "b")
    val got = df.select(Functional.cosineSim(col("a"), col("b")))
      .collect().map(_.getDouble(0))
    assert(got(0) == 0.0 && got(1) == 0.0)
    val expect2 = 1.0 / (math.sqrt(26.0) * 1.0)
    assert(math.abs(got(2) - expect2) < 1e-12)
    val withNull = df.select(
      Functional.cosineSim(lit(null).cast(ArrayType(FloatType)), col("b")))
      .collect()
    assert(withNull.forall(_.isNullAt(0)))
  }

  test("expression participates in whole-stage codegen") {
    // spark.range: a real codegen'd scan (a local relation would be
    // constant-folded before reaching codegen)
    val q = spark.range(8)
      .select(col("id"), transform(sequence(lit(1), lit(4)),
        i => (i + col("id")).cast("float")).as("a"))
      .select(Functional.cosineSim(col("a"), reverse(col("a"))).as("c"))
    // "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l =>
      l.contains("cosine_sim") && l.trim.startsWith("*(")))
    val vals = q.collect().map(_.getDouble(0))
    assert(vals.length == 8 && vals.forall(v => v > 0.0 && v <= 1.0))
  }
}
