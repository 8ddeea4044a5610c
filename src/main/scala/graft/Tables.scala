package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types.LongType

/** Loader for the driver-provided parquet testdata (TESTDATA.md).
  *
  * At 100 TB the same call shape holds: `spark.read.parquet` on a
  * partitioned directory tree; Catalyst handles partition pruning and
  * the parquet datasource handles predicate/column pushdown. Nothing
  * here collects to the driver.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.parquet carries TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; with `spark.sql.legacy.parquet.nanosAsLong=true`
    * (set by Verify/Bench sessions) it arrives as LongType nanos.
    * Convert with integer division — double division would lose
    * precision above 2^53 (~epoch 2262 in ns, but epoch-2024 ns are
    * already 1.7e18).
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else raw
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
