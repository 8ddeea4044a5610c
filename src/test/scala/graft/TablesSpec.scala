package graft

import org.apache.spark.sql.functions._

/** The r13 resolved-plan cache in [[Tables.load]]: metadata-only —
  * the same immutable DataFrame comes back for an unchanged
  * (session, path, mtime) key, a changed mtime re-resolves, and every
  * action still reads the parquet data (no result caching).
  */
class TablesSpec extends SparkSpec {

  test("load returns the same resolved frame for an unchanged file, with live data") {
    val a = Tables.load(spark, sf001, "region")
    val b = Tables.load(spark, sf001, "region")
    assert(a eq b, "unchanged (session, path, mtime) must hit the plan cache")
    // actions still compute from parquet — twice, independently
    assert(a.count() == b.count() && a.count() > 0)
    assert(a.agg(count(lit(1))).head.getLong(0) == b.count())
  }

  test("a changed mtime re-resolves instead of serving the stale plan") {
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_spec").toFile
    val path = s"${dir.getAbsolutePath}/t.parquet"
    spark.range(3).toDF("id").write.mode("overwrite").parquet(path)
    val first = Tables.load(spark, dir.getAbsolutePath, "t")
    assert(first.count() == 3)
    // rewrite with different contents and a strictly newer mtime
    spark.range(5).toDF("id").write.mode("overwrite").parquet(path)
    val f = new java.io.File(path)
    f.setLastModified(f.lastModified() + 5000)
    val second = Tables.load(spark, dir.getAbsolutePath, "t")
    assert(second ne first, "a new mtime must re-resolve")
    assert(second.count() == 5)
    // r14: the superseded entry is EVICTED, not retained — the same
    // (session, path, mtime) keeps hitting the single live entry
    val third = Tables.load(spark, dir.getAbsolutePath, "t")
    assert(third eq second, "the refreshed entry must serve repeat loads")
  }

  test("a path java.io.File cannot see bypasses the cache (no poisoned key)") {
    // java.io.File reports non-local URIs (s3://, hdfs://) and missing
    // files identically: not exists(), mtime 0. The r14 guard resolves
    // those fresh every call instead of collapsing all versions onto
    // one mtime-0 cache key. Pin it with the observable local case: a
    // failed resolve before the file exists leaves NO cache entry, so
    // the load after the file appears sees the real data.
    val dir = java.nio.file.Files.createTempDirectory("graft_tables_spec2").toFile
    intercept[Exception] { Tables.load(spark, dir.getAbsolutePath, "u").count() }
    spark.range(2).toDF("id").write.mode("overwrite")
      .parquet(s"${dir.getAbsolutePath}/u.parquet")
    assert(Tables.load(spark, dir.getAbsolutePath, "u").count() == 2)
  }
}
