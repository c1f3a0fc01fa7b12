package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.Functional

/** The SCALE.md bucketed-ANN claim, demonstrated: a corpus written
  * partitioned by its hyperplane-LSH bucket is probed with partition
  * pruning — the scan touches only matching bucket directories. */
class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("LSH-bucketed corpus probes with partition pruning") {
    val dir = Files.createTempDirectory("lshbuckets").toString
    val corpus = spark.read
      .parquet("/root/testdata/sf0.001/embeddings.parquet")
      .withColumn("bucket", Functional.hyperplaneLsh(col("embedding"), 4))
    corpus.write.mode("overwrite").partitionBy("bucket").parquet(dir)

    val stored = spark.read.parquet(dir)
    val probeBucket = corpus.where(col("vec_id") === 0)
      .select("bucket").head().getLong(0)
    val probed = stored.where(col("bucket") === probeBucket)

    // physical plan: partition filter present on the scan
    val plan = probed.queryExecution.executedPlan
    val scan = plan.collectLeaves().head
    assert(scan.toString().contains("PartitionFilters"))
    assert(scan.toString().contains("bucket"))
    // runtime proof: the scan reads fewer files than exist
    assert(probed.count() > 0)
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = stored.inputFiles.length
    assert(filesRead < totalFiles,
      s"read $filesRead of $totalFiles files — no pruning")
  }
}
