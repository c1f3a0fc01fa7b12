package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) interleaved sort keys for multi-dimensional at-rest
  * clustering — the layout that makes min/max zone-map skipping work on
  * MORE THAN ONE column at once (the Databricks `OPTIMIZE ZORDER BY` /
  * Iceberg sort-order pattern). A file sorted on one key prunes only
  * that key's predicates (graft q127); a file range-partitioned on the
  * Morton key of (a, b) keeps BOTH per-file [min,max] intervals narrow,
  * so a conjunctive box predicate `a ∈ [..] AND b ∈ [..]` skips files
  * on either dimension.
  *
  * The key is a pure column expression (unrolled shift/mask/or terms,
  * whole-stage-codegen'd — no UDF), so it can feed `repartitionByRange`
  * + `sortWithinPartitions` directly without materializing a column.
  *
  * Scale: writing the layout is one range-shuffle of the table — the
  * pay-once reorganization, same story as bucketing (sources/Bucketed).
  * Reads then prune at file granularity from footer stats alone; at
  * 100 TB the win is proportional to 1/files-touched, and unlike hive
  * partitioning it neither creates small files on high-cardinality
  * columns nor fixes one partition column forever.
  */
object ZOrder {

  /** Morton key of `dims` non-negative integral columns, `bits` low
    * bits each (values are masked to `bits` — callers whose domain can
    * exceed 2^bits lose ordering above the mask, not correctness of
    * any downstream filter, since the key is only an ORDERING hint).
    * Bit i of dimension d lands at position i·n + d; total bits·n must
    * fit a long. */
  def mortonKey(bits: Int, dims: Column*): Column = {
    val n = dims.length
    require(n >= 2, "mortonKey: need at least 2 dimensions")
    require(bits > 0, s"mortonKey: need bits >= 1, got $bits")
    require(bits * n <= 63, s"mortonKey: $bits bits x $n dims > 63")
    val terms = for {
      d <- dims.indices
      i <- 0 until bits
    } yield shiftleft(
      shiftrightunsigned(dims(d).cast("long"), i).bitwiseAND(1L),
      i * n + d)
    terms.reduce(_.bitwiseOR(_))
  }
}
