package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Proof of the bucketed co-located join path — THE shuffle-elimination
  * technique for repeated large-table joins at 100 TB: both sides
  * written bucketed by the join key join with zero Exchange (each
  * bucket pair joins in place), versus the shuffle both sides pay
  * otherwise.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key tables join with no shuffle exchange") {
    val orders = Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.load(spark, sf001, "customer")
      .select("c_custkey", "c_mktsegment")

    orders.write.mode("overwrite")
      .bucketBy(8, "o_custkey").sortBy("o_custkey")
      .saveAsTable("orders_b")
    customer.write.mode("overwrite")
      .bucketBy(8, "c_custkey").sortBy("c_custkey")
      .saveAsTable("customer_b")
    // broadcast would hide the bucketing; force the shuffle-join path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("orders_b")
        .join(spark.table("customer_b"),
          col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle either side:\n$plan")
      val expected = orders.join(customer, col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS customer_b")
    }
  }

  test("ensureBucketedTable + bucketedEquiJoin: exchange-free serve, idempotent ensure") {
    import graft.operators.Joins
    val base = java.nio.file.Files.createTempDirectory("graft_bktspec").toString
    val orders = Tables.load(spark, sf001, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = Tables.load(spark, sf001, "customer")
      .select("c_custkey", "c_mktsegment")
    Joins.ensureBucketedTable(spark, orders, "bkt_o_spec", s"$base/o", "o_custkey", 8)
    Joins.ensureBucketedTable(spark, customer, "bkt_c_spec", s"$base/c", "c_custkey", 8)
    // second ensure must be a no-op (same files, frame never forced)
    val mtime = new java.io.File(s"$base/o").lastModified()
    Joins.ensureBucketedTable(spark,
      sys.error("ensure must not re-evaluate the frame"): org.apache.spark.sql.DataFrame,
      "bkt_o_spec", s"$base/o", "o_custkey", 8)
    assert(new java.io.File(s"$base/o").lastModified() == mtime)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = Joins.bucketedEquiJoin(spark, "bkt_o_spec", "bkt_c_spec",
        "o_custkey", "c_custkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed pair must join with zero exchanges:\n$plan")
      assert(joined.count() ==
        orders.join(customer, col("o_custkey") === col("c_custkey")).count())
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS bkt_o_spec")
      spark.sql("DROP TABLE IF EXISTS bkt_c_spec")
    }
  }

  test("salted join bounds the hot key's partition, naive join concentrates it") {
    import spark.implicits._
    // deliberately skewed fixture: one key owns 50% of the big side
    val n = 40000
    val big = spark.range(n).select(
      when(col("id") % 2 === 0, lit(1L)).otherwise(col("id") % 500 + 2).as("k"),
      col("id").as("row_id"))
    val small = spark.range(502).select((col("id") + 1).as("k"), concat(lit("v"), col("id")).as("tag"))
    val aqe = spark.conf.get("spark.sql.adaptive.enabled", "true")
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    // fixed shuffle layout: no AQE coalesce/skew-split, no broadcast —
    // measure what the raw hash partitioning does with the hot key
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    try {
      def maxPartitionRows(df: org.apache.spark.sql.DataFrame): Long =
        df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().max
      val naive = big.join(small, Seq("k"))
      val salted = graft.operators.Joins.saltedJoin(big, small, Seq("k"),
        numSalts = 16, saltSource = "row_id")
      assert(salted.count() == naive.count(), "salting must not change the result")
      val naiveMax = maxPartitionRows(naive)
      val saltedMax = maxPartitionRows(salted)
      // hot key = 20k rows: naive puts them all in ONE reducer; salted
      // spreads them over numSalts reducers. Demand at least a 2×
      // reduction (observed ~8× with 16 salts over 16 partitions).
      assert(naiveMax >= n / 2, s"fixture lost its skew: naive max $naiveMax")
      assert(saltedMax * 2 <= naiveMax,
        s"salting must move the skew needle: salted max $saltedMax vs naive $naiveMax")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.set("spark.sql.shuffle.partitions", sp)
    }
  }

  test("AQE splits the skewed partition at runtime (the salting alternative)") {
    import spark.implicits._
    // same skew shape as the salting test — here AQE's skew-join
    // handles it at runtime with no query rewrite, the built-in path
    // the operators doc points moderate skew at
    val n = 40000
    val big = spark.range(n).select(
      when(col("id") % 2 === 0, lit(1L)).otherwise(col("id") % 500 + 2).as("k"),
      concat(lit("payload-"), col("id")).as("payload"))
    val small = spark.range(502).select((col("id") + 1).as("k"))
    val prev = Map(
      "spark.sql.adaptive.enabled" -> spark.conf.get("spark.sql.adaptive.enabled", "true"),
      "spark.sql.shuffle.partitions" -> spark.conf.get("spark.sql.shuffle.partitions"))
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.shuffle.partitions", "16")
    // thresholds low enough that the 20k-row hot partition counts as skewed
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    try {
      val joined = big.join(small, Seq("k"))
      // collect() drives THIS dataset's own QueryExecution, so its
      // AdaptiveSparkPlanExec holds the finalized runtime plan
      // (count() would plan a separate execution and leave this one
      // unfinalized)
      assert(joined.collect().length == n)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE must mark the hot-key join as skew-handled:\n${plan.take(2000)}")
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
      Seq("spark.sql.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.autoBroadcastJoinThreshold",
          "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
          "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
          "spark.sql.adaptive.advisoryPartitionSizeInBytes")
        .foreach(spark.conf.unset)
    }
  }

  test("runtime Bloom filter prunes the big side of a selective shuffle join") {
    // the Spark-first form of Bloom-filter join pruning: Catalyst's
    // InjectRuntimeFilter plants a bloom_filter_agg on the selective
    // (filtered) side and a might_contain predicate on the big side's
    // scan — rows that cannot join are dropped BEFORE the shuffle.
    // Thresholds are lowered so the sf0.001 fixture qualifies; at real
    // scale the defaults (10 MB creation side / 10 GB application
    // side) gate it to exactly the joins where pruning pays.
    val prev = Map(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" ->
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled"),
      "spark.sql.autoBroadcastJoinThreshold" ->
        spark.conf.get("spark.sql.autoBroadcastJoinThreshold"))
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // broadcast would bypass
    try {
      val orders = Tables.load(spark, sf001, "orders")
      val customer = Tables.load(spark, sf001, "customer")
        .where(col("c_mktsegment") === "BUILDING") // selective creation side
      val joined = orders.join(customer, col("o_custkey") === col("c_custkey"))
      val plan = joined.queryExecution.optimizedPlan.toString.toLowerCase
      assert(plan.contains("might_contain") || plan.contains("bloomfilter"),
        s"runtime bloom filter must appear in the optimized plan:\n${plan.take(2000)}")
      // semantics unchanged (bloom false positives die in the join)
      val expected = Tables.load(spark, sf001, "orders")
        .join(Tables.load(spark, sf001, "customer")
          .where(col("c_mktsegment") === "BUILDING"),
          col("o_custkey") === col("c_custkey")).count()
      assert(joined.count() == expected)
    } finally {
      prev.foreach { case (k, v) => spark.conf.set(k, v) }
      Seq("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
          "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold")
        .foreach(spark.conf.unset)
    }
  }

  test("bucketed aggregation by the bucket key needs no exchange") {
    Tables.load(spark, sf001, "orders")
      .select("o_custkey", "o_totalprice")
      .write.mode("overwrite").bucketBy(8, "o_custkey").saveAsTable("orders_b2")
    try {
      val agg = spark.table("orders_b2").groupBy("o_custkey")
        .agg(count(lit(1)).as("n"))
      val plan = agg.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"aggregation on the bucket key must be exchange-free:\n$plan")
      assert(agg.count() ==
        Tables.load(spark, sf001, "orders").select("o_custkey").distinct().count())
    } finally spark.sql("DROP TABLE IF EXISTS orders_b2")
  }
}
