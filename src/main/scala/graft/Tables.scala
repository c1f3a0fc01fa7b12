package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loader for the driver-generated star schema
  * (TESTDATA.md). At cluster scale these reads are plain distributed
  * parquet scans — filters/projections in the queries below push down
  * into them (verify via .explain: PushedFilters / ReadSchema).
  */
object Tables {
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
}
