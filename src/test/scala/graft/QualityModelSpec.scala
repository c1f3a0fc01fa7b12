package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._

import graft.operators.QualityModel

/** Ridge-regression quality model: exact floor-unit Gram sums vs an
  * in-JVM model, closed-form recovery of a known affine target at
  * lambda=0, shrinkage direction under lambda, contract raises, and
  * the shuffle-free scoring-plan guarantee (q287/q288 certify the
  * same chains against DuckDB from first principles). */
class QualityModelSpec extends SparkSpec {
  import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}

  // (x1, x2, y) with y EXACTLY affine in the features:
  // y = 0.5 + 2*x1 - 0.25*x2 (all dyadic, so the floor-unit sums are
  // exact and the lambda=0 solve must recover the weights to fp noise)
  private val pts = Seq(
    (0.125, 0.5, 0.625), (0.25, 0.25, 0.9375), (0.5, 1.0, 1.25),
    (0.75, 0.125, 1.96875), (1.0, 0.75, 2.3125), (0.0625, 0.0625, 0.609375))
  private def df = pts.toDF("a", "b", "yy")

  test("gramSums matches the in-JVM floor-unit model exactly") {
    val row = QualityModel.gramSums(df, col("a"), col("b"), col("yy"))
      .collect().head
    def m(f: (Double, Double, Double) => Double): Long =
      pts.map { case (a, b, y) => math.floor(f(a, b, y) * 1.0e9).toLong }.sum
    assert(row.getAs[Long]("n_docs") === pts.length.toLong)
    assert(row.getAs[Long]("s1_units") === m((a, _, _) => a))
    assert(row.getAs[Long]("s2_units") === m((_, b, _) => b))
    assert(row.getAs[Long]("s11_units") === m((a, _, _) => a * a))
    assert(row.getAs[Long]("s12_units") === m((a, b, _) => a * b))
    assert(row.getAs[Long]("s22_units") === m((_, b, _) => b * b))
    assert(row.getAs[Long]("sy_units") === m((_, _, y) => y))
    assert(row.getAs[Long]("s1y_units") === m((a, _, y) => a * y))
    assert(row.getAs[Long]("s2y_units") === m((_, b, y) => b * y))
  }

  test("fit at lambda=0 recovers an exactly-affine target; lambda>0 " +
      "shrinks the slopes toward zero") {
    val sums = QualityModel.gramSums(df, col("a"), col("b"), col("yy"))
    val f0 = QualityModel.fit(sums, lambda = 0.0)
    assert(math.abs(f0.w0 - 0.5) < 1e-6, s"w0=${f0.w0}")
    assert(math.abs(f0.w1 - 2.0) < 1e-6, s"w1=${f0.w1}")
    assert(math.abs(f0.w2 + 0.25) < 1e-6, s"w2=${f0.w2}")
    val f1 = QualityModel.fit(sums, lambda = 1.0)
    assert(math.abs(f1.w1) < math.abs(f0.w1),
      "ridge must shrink |w1|")
    assert(math.abs(f1.w2) < math.abs(f0.w2),
      "ridge must shrink |w2|")
  }

  test("score replays the exact affine chain and plans shuffle-free") {
    val sums = QualityModel.gramSums(df, col("a"), col("b"), col("yy"))
    val fit = QualityModel.fit(sums, lambda = 0.5)
    val scored = df.select(
      QualityModel.score(fit, col("a"), col("b")).as("s"), col("a"), col("b"))
    scored.collect().foreach { r =>
      val (a, b, s) = (r.getDouble(1), r.getDouble(2), r.getDouble(0))
      assert(s === fit.w0 + fit.w1 * a + fit.w2 * b,
        "score must be the identical left-associated IEEE chain")
    }
    assert(scored.queryExecution.executedPlan.collect {
      case e: Exchange => e
    }.isEmpty, "the scoring pass is a projection — it must not shuffle")
  }

  test("contract raises: singular system, too few rows, bad lambda, " +
      "non-single sums frame") {
    // constant features at lambda=0: columns of X are linearly
    // dependent -> det 0 -> singular
    val const = Seq((1.0, 1.0, 1.0), (1.0, 1.0, 2.0), (1.0, 1.0, 3.0))
      .toDF("a", "b", "yy")
    val sums = QualityModel.gramSums(const, col("a"), col("b"), col("yy"))
    assert(intercept[IllegalArgumentException] {
      QualityModel.fit(sums, lambda = 0.0)
    }.getMessage.contains("singular"))
    val tiny = Seq((1.0, 2.0, 3.0), (2.0, 3.0, 4.0)).toDF("a", "b", "yy")
    assert(intercept[IllegalArgumentException] {
      QualityModel.fit(
        QualityModel.gramSums(tiny, col("a"), col("b"), col("yy")))
    }.getMessage.contains("at least 3"))
    assert(intercept[IllegalArgumentException] {
      QualityModel.fit(QualityModel.gramSums(df, col("a"), col("b"),
        col("yy")), lambda = -1.0)
    }.getMessage.contains("lambda"))
    assert(intercept[IllegalArgumentException] {
      QualityModel.fit(df.select(lit(1L).as("n_docs")))
    }.getMessage.contains("ONE sums row"))
  }
}
