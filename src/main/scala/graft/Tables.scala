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
  /** Session-scoped RESOLVED-PLAN cache (optimization r13, guide §6's
    * file-listing-cache rationale): `spark.read.parquet` pays file
    * listing + footer/schema resolution on every call, and the bench
    * builds each query's frame twice (warm + timed run). Caching the
    * resolved DataFrame — an immutable logical plan, exactly what a
    * catalog table resolves once — skips the repeated METADATA work
    * only; every action still scans the parquet data in full.
    *
    * Eligibility and invalidation (tightened r14 per the round-13
    * advisor): only LOCAL paths are cached — `java.io.File
    * .lastModified()` returns 0 for any non-local URI (s3://,
    * hdfs://), which would collapse every version of a remote table
    * onto one cache key, so non-local paths resolve fresh on every
    * call. The map is keyed (session, path) with the mtime INSIDE the
    * value, so a replaced fixture EVICTS the superseded entry instead
    * of retaining every (path, mtime) generation for the JVM
    * lifetime; at most one entry per (session, path) ever lives in
    * the map. The cache assumes immutable fixture directories between
    * mtime bumps — a file rewritten INSIDE the directory without the
    * directory mtime changing (partition-subdir rewrite, sub-
    * granularity replace) is not detected, which is the documented
    * fixture contract (the driver regenerates testdata wholesale).
    */
  private val resolved =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), (Long, DataFrame)]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    val f = new java.io.File(path)
    if (!f.exists()) return spark.read.parquet(path) // non-local or missing: never cache
    val mtime = f.lastModified()
    resolved.compute((spark, path), (_, old) =>
      if (old != null && old._1 == mtime) old
      else (mtime, spark.read.parquet(path)))._2
  }

  def region(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame    = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "lineitem")
  /** events.parquet has shipped in two physical forms across testdata
    * generations, both normalized here to a session-tz TimestampType
    * `ts` so every downstream operator sees one type:
    *  - TIMESTAMP(NANOS), which Spark's parquet reader rejects; with
    *    `spark.sql.legacy.parquet.nanosAsLong=true` (set by
    *    Verify/Bench sessions) it arrives as LongType nanos. Convert
    *    with integer division — double division would lose precision
    *    above 2^53 (~epoch 2262 in ns, but epoch-2024 ns are already
    *    1.7e18).
    *  - TIMESTAMP(MICROS) without UTC adjustment, which Spark 4 infers
    *    as TIMESTAMP_NTZ. Sessions here pin timeZone=UTC, so the cast
    *    to TimestampType maps wall-clock to the same instant DuckDB
    *    computes reading the file natively.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")
}
