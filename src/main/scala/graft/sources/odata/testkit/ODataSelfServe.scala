package graft.sources.odata.testkit

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-contained connector exercise for the driver's correctness
  * gate: serve a small slice of the orders table through an
  * in-process OData stub, read it back via the `odata` DataSourceV2
  * (probe + partition-per-key + pushdown + pagination all live), so
  * the oracle can compare against the same parquet.
  *
  * The stub holds only the <200-key slice (driver-side by design —
  * it IS the server here, not the query path; the connector side
  * streams). One server per (sfDir) is kept for the JVM's lifetime
  * because the returned DataFrame is lazy.
  */
object ODataSelfServe {

  private val servers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  private def serverFor(spark: SparkSession, dir: String): ODataStubServer =
    servers.getOrElseUpdate(dir, {
      val rows = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderkey") < 200)
        .select(
          col("o_orderkey").cast("string").as("O_ORDERKEY"),
          col("o_orderstatus").as("O_STATUS"),
          col("o_orderpriority").as("O_PRIORITY"))
        .collect()
        .map(r => Map(
          "O_ORDERKEY" -> r.getString(0),
          "O_STATUS" -> r.getString(1),
          "O_PRIORITY" -> r.getString(2)))
        .toSeq
      new ODataStubServer(rows, "O_PRIORITY",
        badCandidates = Set("OBAD_STRUCT"), serverPageSize = 50).start()
    })

  /** Read the slice through the full connector path. */
  def scan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }
}
