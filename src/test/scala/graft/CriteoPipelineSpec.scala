package graft

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.frame.TFrame
import graft.frame.namespaces._
import graft.functions.Functional

/** End-to-end preprocessing pipeline mirroring the reference's Criteo
  * integration test (test/integration/test_criteo.py:30-140): random
  * rows → parquet → read → fill_null → log(x+3) on dense features →
  * sigrid_hash on sparse features → verify. Deterministic seed.
  */
class CriteoPipelineSpec extends SparkSpec {

  private val nDense = 3
  private val nSparse = 4
  private val nRows = 128

  test("criteo-style preprocess: parquet -> fill_null -> log -> sigrid_hash") {
    val rnd = new scala.util.Random(42)
    val schema = StructType(
      StructField("label", IntegerType, nullable = false) +:
        ((0 until nDense).map(i =>
          StructField(s"int_$i", IntegerType, nullable = true)) ++
          (0 until nSparse).map(i =>
            StructField(s"cat_$i", LongType, nullable = true))))
    val rows = (0 until nRows).map { _ =>
      Row.fromSeq(
        rnd.nextInt(2) +:
          ((0 until nDense).map(_ =>
            if (rnd.nextInt(10) == 0) null else Int.box(rnd.nextInt(100))) ++
            (0 until nSparse).map(_ =>
              if (rnd.nextInt(10) == 0) null
              else Long.box(rnd.nextLong() & 0xFFFFFFFFL))))
    }
    val dir = Files.createTempDirectory("criteo").toString
    spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema)
      .write.mode("overwrite").parquet(dir)

    // the preprocessing pipeline, TFrame surface end to end
    val raw = TFrame(spark.read.parquet(dir))
    val filled = raw.fillNull(0L)
    val dense = (0 until nDense).foldLeft(filled)((f, i) =>
      f.withCol(s"int_$i", (f(s"int_$i") + lit(3)).arith.logNat
        .cast(FloatType)))
    val hashed = (0 until nSparse).foldLeft(dense)((f, i) =>
      f.withCol(s"cat_$i",
        Functional.sigridHash(f(s"cat_$i"), 0L, 65536L)))

    val out = hashed.df.collect()
    assert(out.length === nRows)
    // no nulls survive fill_null
    assert(out.forall(r => (0 until r.length).forall(!r.isNullAt(_))))
    // dense features are log(x+3) >= log(3)
    val logMin = math.log(3.0).toFloat
    assert(out.forall(r =>
      (1 to nDense).forall(i => r.getFloat(i) >= logMin - 1e-6f)))
    // sparse features land in [0, 65536)
    assert(out.forall(r =>
      (nDense + 1 until nDense + 1 + nSparse).forall { i =>
        val v = r.getLong(i); v >= 0L && v < 65536L
      }))
    // deterministic: second run bit-identical
    val out2 = hashed.df.collect()
    assert(out.map(_.toString).toSeq === out2.map(_.toString).toSeq)
  }
}
