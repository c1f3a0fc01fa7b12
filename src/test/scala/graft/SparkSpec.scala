package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  import org.apache.spark.sql.{DataFrame, Row}

  /** collect a single column as a Seq (null-safe, arrays normalized to
    * immutable Lists so asInstanceOf[Seq[_]] comparisons work). */
  def col0(df: DataFrame): Seq[Any] =
    df.collect().toSeq.map(r => if (r.isNullAt(0)) null else norm(r.get(0)))

  private def norm(v: Any): Any = v match {
    case s: scala.collection.Seq[_] => s.toList.map(norm)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => norm(k) -> norm(x) }.toMap
    case other => other
  }
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
