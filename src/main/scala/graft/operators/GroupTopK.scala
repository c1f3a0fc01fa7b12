package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Sampling

/** Bounded-size k-smallest buffer over exact 64-bit keys: a binary
  * MAX-heap under (key asc, id asc), so the root is always the current
  * WEAKEST (largest) kept element and a smaller candidate replaces it
  * in O(log k). The Long-key twin of Similarity's TopKBuf (which
  * orders on Double scores): keeping the full 64-bit key exact matters
  * when the key is a hash that an external oracle must replay
  * bit-for-bit — a Double mantissa would truncate it to 53 bits. */
case class MinKBuf(var size: Int, ids: Array[Long], keys: Array[Long]) {

  /** true when (k1,id1) orders strictly AFTER (k2,id2) under
    * (key asc, id asc) — i.e. is weaker for a k-smallest selection. */
  private def weaker(k1: Long, id1: Long, k2: Long, id2: Long): Boolean =
    k1 > k2 || (k1 == k2 && id1 > id2)

  private def swap(i: Int, j: Int): Unit = {
    val ti = ids(i); ids(i) = ids(j); ids(j) = ti
    val tk = keys(i); keys(i) = keys(j); keys(j) = tk
  }

  private def siftUp(start: Int): Unit = {
    var i = start
    while (i > 0 && weaker(keys(i), ids(i),
        keys((i - 1) / 2), ids((i - 1) / 2))) {
      swap(i, (i - 1) / 2); i = (i - 1) / 2
    }
  }

  private def siftDown(): Unit = {
    var i = 0
    var done = false
    while (!done) {
      val l = 2 * i + 1; val r = 2 * i + 2
      var m = i
      if (l < size && weaker(keys(l), ids(l), keys(m), ids(m))) m = l
      if (r < size && weaker(keys(r), ids(r), keys(m), ids(m))) m = r
      if (m == i) done = true else { swap(i, m); i = m }
    }
  }

  def insert(id: Long, key: Long): Unit =
    if (size < ids.length) {
      ids(size) = id; keys(size) = key
      size += 1; siftUp(size - 1)
    } else if (ids.length > 0 && weaker(keys(0), ids(0), key, id)) {
      ids(0) = id; keys(0) = key; siftDown()
    }
}

/** Partial-merging bounded k-smallest per group over (id, key) pairs —
  * the generic form of the ANN tail (Similarity.TopKAggregator): each
  * task folds its partition down to ≤k entries per group map-side, so
  * only k-bounded partials shuffle, replacing the
  * `row_number().over(Window.partitionBy(group))` plan that shuffles
  * and sorts EVERY row into |groups| partitions. Deterministic under
  * any partitioning: ties break by id asc, so the selected set and its
  * ranks are a pure function of the data. */
class MinKAggregator(k: Int)
    extends Aggregator[(Long, Long), MinKBuf, Array[(Long, Long)]] {
  require(k > 0, s"k=$k")

  def zero: MinKBuf = MinKBuf(0, new Array[Long](k), new Array[Long](k))

  def reduce(b: MinKBuf, in: (Long, Long)): MinKBuf = {
    b.insert(in._1, in._2); b
  }

  def merge(b1: MinKBuf, b2: MinKBuf): MinKBuf = {
    var i = 0
    while (i < b2.size) { b1.insert(b2.ids(i), b2.keys(i)); i += 1 }
    b1
  }

  def finish(b: MinKBuf): Array[(Long, Long)] =
    (0 until b.size).map(i => (b.ids(i), b.keys(i))).sortWith {
      case ((id1, k1), (id2, k2)) => k1 < k2 || (k1 == k2 && id1 < id2)
    }.toArray

  def bufferEncoder: Encoder[MinKBuf] = ExpressionEncoder[MinKBuf]()
  def outputEncoder: Encoder[Array[(Long, Long)]] =
    ExpressionEncoder[Array[(Long, Long)]]()
}

/** Per-group bounded selection without a window: k rows per group
  * survive a single partial-merging aggregate, where the window form
  * (`row_number().over(partitionBy(group))`) shuffles every row to
  * |groups| partitions and sorts each — maximally skewed when groups
  * are few. At 100 TB the difference is the whole job: the aggregate's
  * shuffle volume is k·|groups| rows regardless of corpus size.
  */
object GroupTopK {

  /** k smallest (key, id) rows per group: (groupCols..., id, key,
    * rank) with rank 1..k ordered by (key asc, id asc). `idCol` must
    * be integral and non-null; null keys are dropped (a null key has
    * no place in a total selection order — filter upstream if they
    * matter). */
  def minKByKey(df: DataFrame, groupCols: Seq[String], idCol: String,
      key: Column, k: Int): DataFrame = {
    val dt = df.schema(idCol).dataType
    require(dt == LongType || dt == IntegerType || dt == ShortType ||
      dt == ByteType,
      s"minKByKey: id column $idCol must be integral, got $dt")
    val mink = udaf(new MinKAggregator(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    df.select((groupCols.map(col) :+ col(idCol).cast(LongType).as("__id")
        :+ key.as("__key")): _*)
      .where(col("__id").isNotNull && col("__key").isNotNull)
      .groupBy(groupCols.map(col): _*)
      .agg(mink(col("__id"), col("__key")).as("__top"))
      .select((groupCols.map(col) :+ posexplode(col("__top"))): _*)
      .select((groupCols.map(col) :+ col("col._1").as("id")
        :+ col("col._2").as("key") :+ (col("pos") + 1).as("rank")): _*)
  }

  /** Deterministic k-per-group sample: the k rows whose splitmix64
    * hash (Sampling.shuffleKey — engine-portable, oracle-replayable)
    * is smallest within each group. The distributed form of "take a
    * reproducible uniform sample of every stratum": no window, no
    * rand(), identical output under any partitioning and on any
    * engine that can replay the hash. */
  def sampleKPerGroup(df: DataFrame, groupCols: Seq[String],
      idCol: String, k: Int, seed: Long): DataFrame =
    minKByKey(df, groupCols, idCol,
      Sampling.shuffleKey(col(idCol), seed), k)
}
