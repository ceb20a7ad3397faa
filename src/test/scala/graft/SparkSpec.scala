package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs (one JVM-wide session — getOrCreate —
  * so the suite doesn't pay per-class Spark startup). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)

  def df(rows: Seq[Row], schema: String): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      org.apache.spark.sql.types.StructType.fromDDL(schema))

  /** Smallest scale factor — fast fixture for integration-shaped tests. */
  val sfDir = "/root/testdata/sf0.001"
}
