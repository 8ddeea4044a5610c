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
          "O_PRIORITY" -> r.getString(2),
          // the ByD-shaped spill: a nested object served on EVERY row
          // regardless of $select (reference employee_data.csv:1-2
          // carries exactly this column). Deterministic per key so the
          // oracle can reproduce it.
          "__metadata" ->
            s"""{"uri": "Orders('${r.getString(0)}')", "type": "sapbyd.Orders"}"""))
        .toSeq
      new ODataStubServer(rows, "O_PRIORITY",
        badCandidates = Set("OBAD_STRUCT"), serverPageSize = 50,
        extraServedFields = Seq("__metadata"),
        rawJsonFields = Set("__metadata")).start()
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

  /** The SAME stub (which spills `__metadata` on every row — [[scan]]
    * proves the default mode drops it), read with `extraColumns=map`:
    * undeclared server fields survive into the `_extra` map column,
    * nested objects as their JSON text — the reference's
    * pandas-from_records schema-union behavior (etl.py:201,204-207),
    * option-gated.
    */
  def extrasScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("extraColumns", "map")
      .load()
  }

  /** P6 driver-gate: the SAME stub as [[scan]], but the whole GROUP BY
    * collapses server-side via `$apply=groupby(...)/aggregate(...)`
    * (pushDownAggregates=true — the v4 path; the option's default
    * false is the documented v2 fallback, proven by spec). The server
    * answers |priorities| rows instead of the row slice; at a real
    * tenant's scale that is the difference between shipping a table
    * and shipping a handful of numbers. Grouping and aggregation run
    * on RAW column names (aliases land in the post-agg projection) so
    * Catalyst's pushdown rule sees Aggregate directly over the scan.
    */
  def aggScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("pushDownAggregates", "true")
      .load()
      .groupBy(col("O_PRIORITY"))
      .agg(count(lit(1)).as("n_orders"),
           min(col("O_ORDERKEY")).as("min_key"),
           max(col("O_ORDERKEY")).as("max_key"),
           countDistinct(col("O_STATUS")).as("n_status"))
      .select(col("O_PRIORITY").as("o_orderpriority"), col("n_orders"),
        col("min_key"), col("max_key"), col("n_status"))
      .orderBy("o_orderpriority")
  }

  /** Skip-range driver-gate: a STRUCTURE-LESS read of the same slice
    * parallelized into 4 `$skip`/`$top` range tasks off one `/$count`
    * (the JDBC offset-partitioning analogue — the reference's
    * sequential single-chain extract is the fallback this replaces).
    * A tiling bug (overlapping or gapped ranges, off-by-one skip,
    * unstable order) duplicates or drops rows and fails the oracle
    * hash.
    */
  def skipRangeScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS,O_PRIORITY")
      .option("skipRangePartitions", "4")
      .option("skipRangeOrderKey", "O_ORDERKEY")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }

  /** IN-list pushdown driver-gate: `O_PRIORITY IN (…)` on the
    * STRUCTURE field plans chains for exactly the listed values — no
    * codes-entity enumeration at all — and each chain's `$filter`
    * carries its own eq (default residual mode, so Spark re-checks;
    * the reduced transfer is the point). A pruning bug (extra chains,
    * a dropped value, a full scan) changes the row set or at minimum
    * the oracle hash.
    */
  def inScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .load()
      .where(col("O_PRIORITY").isin("1-URGENT", "3-MEDIUM", "5-LOW"))
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }

  /** P6 + fullyPushFilters driver-gate: the filtered aggregate
    * collapses into ONE `$apply=filter(O_STATUS eq 'O')/groupby(...)`
    * request — with the default residual posture the Filter node
    * between Aggregate and scan blocks the aggregate push entirely,
    * so this gate proves the WHOLE composition: eq predicate consumed
    * by the scan (no Spark re-filter), filter prefix scoping the
    * aggregation server-side (pre-aggregation WHERE semantics), and
    * the |groups|-row wire shape. The oracle replays the same
    * filter+aggregate over the stub's source slice, so a composition
    * bug (filter applied post-aggregation, dropped condition, wrong
    * escape) breaks the hash.
    */
  def aggFilterScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("pushDownAggregates", "true")
      .option("fullyPushFilters", "true")
      .load()
      .where(col("O_STATUS") === "O")
      .groupBy(col("O_PRIORITY"))
      .agg(count(lit(1)).as("n_orders"),
           min(col("O_ORDERKEY")).as("min_key"),
           max(col("O_ORDERKEY")).as("max_key"))
      .select(col("O_PRIORITY").as("o_orderpriority"), col("n_orders"),
        col("min_key"), col("max_key"))
      .orderBy("o_orderpriority")
  }

  private val gzipServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  /** Gzip-transport driver-gate: the SAME slice as [[scan]] served
    * with `Content-Encoding: gzip` (only because the client offered
    * it — the stub enforces the negotiation) must decode to the
    * identical row set. A transport bug (missing offer, skipped
    * inflate, double inflate) breaks the parse or the hash; at tenant
    * scale gzip is ~10× of the JSON transfer.
    */
  def gzipScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = gzipServers.getOrElseUpdate(dir, {
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
        badCandidates = Set("OBAD_STRUCT"), serverPageSize = 50,
        gzipResponses = true).start()
    })
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

  private val oauthServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  /** OAuth2 driver-gate: the SAME slice as [[scan]] behind a
    * client-credentials token endpoint, with tokens deliberately
    * short-lived (4 requests) so the gate's probe+enumeration+chains
    * FORCE at least one mid-scan 401 → transparent re-grant. An auth
    * bug (missing bearer, no re-auth, token in the URL) fails the scan
    * or the hash.
    */
  def oauthScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = oauthServers.getOrElseUpdate(dir, {
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
        badCandidates = Set("OBAD_STRUCT"), serverPageSize = 50,
        oauthCreds = Some(("graft-extract", "graft-secret")),
        tokenValidRequests = 4).start()
    })
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("authType", "oauth")
      .option("tokenUrl", s"${srv.url}/token")
      .option("clientId", "graft-extract")
      .option("clientSecret", "graft-secret")
      .option("failFast", "true")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }

  /** Runtime-filter (DPP) driver-gate: the odata scan joins a
    * parquet-backed dim whose selective filter survives optimization,
    * so Spark inserts a dynamic-pruning subquery and the broadcast
    * build side's key set reaches
    * `ODataScan.filter` (SupportsRuntimeV2Filtering) at execution —
    * value chains plan for exactly the join's surviving priorities.
    * The oracle replays the equivalent join as a static IN, so a
    * pruning bug that drops or duplicates chains breaks the hash.
    */
  def runtimePruneScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    val dim = spark.read.parquet(s"$dir/orders.parquet")
      .select(col("o_orderpriority").as("grp")).distinct()
      .where(col("grp").isin("1-URGENT", "5-LOW"))
    val fact = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .load()
    fact.join(broadcast(dim), fact("O_PRIORITY") === dim("grp"))
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }

  // header+items+customer stub for the $expand gate: Orders carry a
  // single-valued Customer nav and a collection Items nav, served
  // ONLY when the request $expands them (v4 dialect; values
  // deterministic casts of the fixture so the oracle can replay the
  // equivalent joins)
  private val expandServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  private def expandServerFor(spark: SparkSession, dir: String): ODataStubServer =
    expandServers.getOrElseUpdate(dir, {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderkey") < 200)
        .select(
          col("o_orderkey").cast("string").as("O_ORDERKEY"),
          col("o_orderstatus").as("O_STATUS"),
          col("o_custkey").cast("string").as("O_CUSTKEY"))
        .collect()
        .map(r => Map("O_ORDERKEY" -> r.getString(0),
          "O_STATUS" -> r.getString(1), "O_CUSTKEY" -> r.getString(2)))
        .toSeq
      val customers = spark.read.parquet(s"$dir/customer.parquet")
        .select(
          col("c_custkey").cast("string").as("C_CUSTKEY"),
          col("c_name").as("C_NAME"),
          col("c_mktsegment").as("C_MKTSEGMENT"))
        .collect()
        .map(r => Map("C_CUSTKEY" -> r.getString(0),
          "C_NAME" -> r.getString(1), "C_MKTSEGMENT" -> r.getString(2)))
        .toSeq
      val items = spark.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_orderkey") < 200)
        .select(
          col("l_orderkey").cast("string").as("L_ORDERKEY"),
          col("l_linenumber").cast("string").as("L_LINENUMBER"),
          col("l_quantity").cast("long").cast("string").as("L_QUANTITY"),
          col("l_partkey").cast("string").as("L_PARTKEY"))
        .collect()
        .map(r => Map("L_ORDERKEY" -> r.getString(0),
          "L_LINENUMBER" -> r.getString(1), "L_QUANTITY" -> r.getString(2),
          "L_PARTKEY" -> r.getString(3)))
        .toSeq
      val parts = spark.read.parquet(s"$dir/part.parquet")
        .select(
          col("p_partkey").cast("string").as("P_PARTKEY"),
          col("p_name").as("P_NAME"),
          col("p_brand").as("P_BRAND"))
        .collect()
        .map(r => Map("P_PARTKEY" -> r.getString(0),
          "P_NAME" -> r.getString(1), "P_BRAND" -> r.getString(2)))
        .toSeq
      new ODataStubServer(orders, "O_STATUS", dialect = "v4",
        serverPageSize = 50,
        navProps = Map(
          "Customer" -> StubNav(collection = false, "O_CUSTKEY", "C_CUSTKEY", customers),
          "Items" -> StubNav(collection = true, "O_ORDERKEY", "L_ORDERKEY", items),
          // the GRANDCHILD level: each item's part, keyed off the
          // ITEM row — what the nested-expand gates walk two levels
          // down (Orders → Items → Part)
          "Part" -> StubNav(collection = false, "L_PARTKEY", "P_PARTKEY", parts)),
        // the same associations exposed as plain entity sets — what
        // the expand-as-join strategy scans instead of $expand-ing
        extraEntities = Map("Customers" -> customers, "Items" -> items)).start()
    })

  /** `$expand` driver-gate: ONE header+items+customer request per
    * chain replaces the two-scan client-side join — the navs arrive as
    * a nested struct (Customer) and array<struct> (Items), projected
    * server-side by the nested `$select` the connector renders. The
    * query flattens both (struct field access + explode) so the oracle
    * can replay it as plain joins over the same parquet — a rendering
    * bug (dropped nav, wrong projection, mis-keyed child rows, v2/v4
    * envelope confusion) changes the flattened rows and breaks the
    * hash.
    */
  def expandScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = expandServerFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("expand",
        "Customer(C_NAME,C_MKTSEGMENT),Items*(L_LINENUMBER,L_QUANTITY)")
      .load()
      .select(col("O_ORDERKEY").as("o_orderkey"),
        col("Customer.C_NAME").as("c_name"),
        col("Customer.C_MKTSEGMENT").as("c_mktsegment"),
        explode(col("Items")).as("item"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("item.L_LINENUMBER").as("l_linenumber"),
        col("item.L_QUANTITY").as("l_quantity"))
      .orderBy(col("o_orderkey").cast("long"), col("l_linenumber").cast("long"))
  }

  private val batchServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  /** `$batch` control-plane driver-gate: the SAME slice and truth as
    * [[scan]], but schema probing rides ONE v4.01 JSON `$batch` POST
    * (both candidates bundled, 404-segment discrimination intact) —
    * the request log must show the batch and the oracle hash must be
    * untouched (the transport is result-invisible by construction).
    */
  def batchScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = batchServers.getOrElseUpdate(dir, {
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
    val df = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("batchControlPlane", "true")
      .option("failFast", "true")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
    require(srv.requestLog.exists(_.contains("$batch")),
      "the probe must have ridden a $batch POST")
    df
  }

  /** Data-plane `$batch` driver-gate: the partitioned scan's value
    * chains start from ONE `$batch` POST carrying every chain's first
    * page (batchFirstPages — K-1 round-trips saved per task at chain
    * start), and the result rides [[scan]]'s oracle unchanged. The
    * gate requires the batch POST in the request log (the exact K-1
    * round-trip collapse is pinned by the unit spec against the
    * stub's client-request counter — the log here also carries the
    * stub's loopback dispatches, so counting is the spec's job).
    */
  def batchPagesScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    val logStart = srv.requestLog.size
    val df = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("maxPartitions", "1") // one task owns every value chain
      .option("batchFirstPages", "true")
      .option("failFast", "true")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
    df.count() // drive one execution so the chains start
    val reqs = srv.requestLog.drop(logStart)
    require(reqs.exists(_.contains("$batch")),
      "chain first pages must have ridden a $batch POST")
    df
  }

  private val metadataServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  /** `$metadata`-typed-schema driver-gate: the stub publishes an EDMX
    * document typing the orders slice (Edm.Int64 key, Edm.Int32
    * custkey, Edm.Double price, Edm.DateTimeOffset date, Edm.Boolean
    * flag) and serves the values as native JSON scalars; the scan with
    * `metadataSchema=true` must surface NATIVE Spark types whose
    * values hash-match DuckDB reading the same parquet with no cast
    * layer in between — a mapping bug (wrong Edm map, a mis-parsed
    * timestamp, string leakage) breaks the schema or the hash.
    */
  private def metadataServerFor(spark: SparkSession, dir: String): ODataStubServer =
    metadataServers.getOrElseUpdate(dir, {
      val edmx = """<?xml version="1.0" encoding="utf-8"?>
        |<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
        |  <edmx:DataServices>
        |    <Schema Namespace="graft.byd" xmlns="http://docs.oasis-open.org/odata/ns/edm">
        |      <EntityType Name="Order">
        |        <Key><PropertyRef Name="O_ORDERKEY"/></Key>
        |        <Property Name="O_ORDERKEY" Type="Edm.Int64" Nullable="false"/>
        |        <Property Name="O_CUSTKEY" Type="Edm.Int32"/>
        |        <Property Name="O_STATUS" Type="Edm.String"/>
        |        <Property Name="O_TOTALPRICE" Type="Edm.Double"/>
        |        <Property Name="O_ORDERDATE" Type="Edm.DateTimeOffset"/>
        |        <Property Name="O_URGENT" Type="Edm.Boolean"/>
        |        <Property Name="O_PRIORITY" Type="Edm.String"/>
        |        <NavigationProperty Name="Items" Type="Collection(graft.byd.Item)"/>
        |      </EntityType>
        |      <EntityType Name="Item">
        |        <Key><PropertyRef Name="L_ORDERKEY"/></Key>
        |        <Property Name="L_ORDERKEY" Type="Edm.Int64"/>
        |        <Property Name="L_LINENUMBER" Type="Edm.Int32"/>
        |        <Property Name="L_QUANTITY" Type="Edm.Int64"/>
        |      </EntityType>
        |      <EntityContainer Name="Container">
        |        <EntitySet Name="Orders" EntityType="graft.byd.Order"/>
        |      </EntityContainer>
        |    </Schema>
        |  </edmx:DataServices>
        |</edmx:Edmx>""".stripMargin
      val rows = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderkey") < 200)
        .select(
          col("o_orderkey").cast("string").as("K"),
          col("o_custkey").cast("string").as("C"),
          col("o_orderstatus").as("S"),
          col("o_totalprice").cast("string").as("T"),
          col("o_orderdate").cast("timestamp").as("D"),
          (col("o_orderpriority") === "1-URGENT").cast("string").as("U"),
          col("o_orderpriority").as("P"))
        .collect()
        .map(r => Map(
          "O_ORDERKEY" -> r.getString(0),
          "O_CUSTKEY" -> r.getString(1),
          "O_STATUS" -> r.getString(2),
          "O_TOTALPRICE" -> r.getString(3),
          "O_ORDERDATE" -> r.getTimestamp(4).toInstant.toString, // ISO, UTC
          "O_URGENT" -> r.getString(5),
          "O_PRIORITY" -> r.getString(6)))
        .toSeq
      val items = spark.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_orderkey") < 200)
        .select(
          col("l_orderkey").cast("string").as("L_ORDERKEY"),
          col("l_linenumber").cast("string").as("L_LINENUMBER"),
          col("l_quantity").cast("long").cast("string").as("L_QUANTITY"))
        .collect()
        .map(r => Map("L_ORDERKEY" -> r.getString(0),
          "L_LINENUMBER" -> r.getString(1), "L_QUANTITY" -> r.getString(2)))
        .toSeq
      new ODataStubServer(rows, "O_PRIORITY", dialect = "v4",
        serverPageSize = 50, metadataDoc = Some(edmx),
        navProps = Map("Items" ->
          StubNav(collection = true, "O_ORDERKEY", "L_ORDERKEY", items)),
        // typed values ride the wire as native JSON scalars, the
        // lawful v4 shape (the client's stringify-then-decode path
        // must handle real numbers/booleans, not just quoted strings)
        rawJsonFields = Set("O_ORDERKEY", "O_CUSTKEY", "O_TOTALPRICE", "O_URGENT")).start()
    })

  def metadataScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = metadataServerFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields",
        "O_ORDERKEY,O_CUSTKEY,O_STATUS,O_TOTALPRICE,O_ORDERDATE,O_URGENT")
      .option("structureCandidates", "O_PRIORITY")
      .option("metadataSchema", "true")
      .option("failFast", "true")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_TOTALPRICE").as("o_totalprice"),
        col("O_ORDERDATE").as("o_orderdate"),
        col("O_URGENT").as("o_urgent"))
      .orderBy(col("o_orderkey"))
  }

  /** Typed nested `$expand` driver-gate: metadataSchema resolves the
    * Items nav through the EDMX NavigationProperty to the Item entity
    * type, so the exploded nested fields arrive as NATIVE int/bigint
    * (no casts anywhere) and hash-match DuckDB's own lineitem types —
    * a nav-resolution or nested-decode bug breaks schema or hash.
    */
  def metadataExpandScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = metadataServerFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "O_PRIORITY")
      .option("expand", "Items*(L_LINENUMBER,L_QUANTITY)")
      .option("metadataSchema", "true")
      .option("failFast", "true")
      .load()
      .select(col("O_ORDERKEY").as("o_orderkey"),
        explode(col("Items")).as("item"))
      .select(col("o_orderkey"),
        col("item.L_LINENUMBER").as("l_linenumber"),
        col("item.L_QUANTITY").as("l_quantity"))
      .orderBy(col("o_orderkey"), col("l_linenumber"))
  }

  /** Typed-filter-pushdown driver-gate: the SAME typed service as
    * [[metadataScan]], filtered on the Edm.Boolean column with a
    * native `true` literal. metadataSchema types the scan, so Catalyst
    * hands the eq predicate with a BooleanType literal; the connector
    * renders the lawful v4 bare form (`O_URGENT eq true`) into
    * `$filter` — the request log must prove the typed literal reached
    * the wire (before this round every typed eq stayed residual and
    * the scan transferred rows a string-mode scan would have filtered
    * server-side). The residual-filter default keeps Spark
    * re-checking, so the oracle stays exact regardless of server
    * behavior; the log requirement is what gates the transfer saving.
    */
  def typedFilterScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = metadataServerFor(spark, dir)
    val df = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields",
        "O_ORDERKEY,O_CUSTKEY,O_STATUS,O_TOTALPRICE,O_ORDERDATE,O_URGENT")
      .option("structureCandidates", "O_PRIORITY")
      .option("metadataSchema", "true")
      .option("failFast", "true")
      .load()
      .where(col("O_URGENT") === true)
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_ORDERDATE").as("o_orderdate"))
      .orderBy(col("o_orderkey"))
    df.count() // drive one execution so the pushed filter hits the wire
    require(srv.requestLog.map(java.net.URLDecoder.decode(_, "UTF-8"))
        .exists(_.contains("O_URGENT eq true")),
      "the typed boolean eq must reach the wire as a bare v4 literal")
    df
  }

  /** Range-filter-pushdown driver-gate: comparison predicates on a
    * typed column (`O_CUSTKEY > a`, `<= b` on Edm.Int32) and a `<>` on
    * a string column all render into `$filter` as null-guarded OData
    * comparisons — with `fullyPushFilters` the predicates are CONSUMED
    * (no Spark re-filter), so a rendering bug (wrong operator, a
    * missed null guard keeping v4.01's `null ne 'v'` rows, a string
    * compared in the wrong domain) is a wrong answer, not a slowdown.
    * The request log must prove the guarded comparisons went to the
    * wire; the oracle replays the ranges on the raw parquet.
    */
  def rangeFilterScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = metadataServerFor(spark, dir)
    val df = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields",
        "O_ORDERKEY,O_CUSTKEY,O_STATUS,O_TOTALPRICE,O_ORDERDATE,O_URGENT")
      .option("structureCandidates", "O_PRIORITY")
      .option("metadataSchema", "true")
      .option("fullyPushFilters", "true")
      .option("failFast", "true")
      .load()
      .where(col("O_CUSTKEY") > 30 && col("O_CUSTKEY") <= 140 &&
        col("O_STATUS") =!= "P")
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_STATUS").as("o_orderstatus"))
      .orderBy(col("o_orderkey"))
    df.count() // drive one execution so the pushed ranges hit the wire
    val log = srv.requestLog.map(java.net.URLDecoder.decode(_, "UTF-8"))
    require(log.exists(u =>
        u.contains("(O_CUSTKEY gt 30 and O_CUSTKEY ne null)") &&
          u.contains("(O_CUSTKEY le 140 and O_CUSTKEY ne null)") &&
          u.contains("(O_STATUS ne 'P' and O_STATUS ne null)")),
      "the typed range + ne predicates must reach the wire null-guarded")
    df
  }

  /** String-function-pushdown driver-gate: `startsWith`/`contains`
    * predicates — including an OR combination — render as OData
    * string functions into every chain's `$filter` under the DEFAULT
    * residual posture (Spark re-checks; the server-side prune is the
    * point, and the wire check proves it happened). The stub speaks
    * the v2 dialect, so `contains` must render as v2's `substringof`
    * with REVERSED argument order (the stub 400s a v2-unknown
    * `contains`). The or-group's rendering must keep its grouping
    * parens: a flattening bug would conjoin the branches and silently
    * over-filter on a server that honors it.
    */
  def stringFnScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = serverFor(spark, dir)
    val df = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("filterDialect", "v2")
      .load()
      .where((col("O_PRIORITY").startsWith("1") ||
        col("O_PRIORITY").contains("MED")) && col("O_STATUS") =!= "P")
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
    df.count() // drive one execution so the pushed functions hit the wire
    val log = srv.requestLog.map(java.net.URLDecoder.decode(_, "UTF-8"))
    require(log.exists(_.contains(
        "((startswith(O_PRIORITY,'1') and O_PRIORITY ne null) " +
          "or (substringof('MED',O_PRIORITY) and O_PRIORITY ne null))")),
      "the or-group of string functions must reach the wire grouped")
    // the string `<>`'s VALUE compare must NOT have rendered: in
    // residual mode a collation disagreement on ne would wrongly
    // EXCLUDE rows nothing re-checks — it stays Spark's (only the
    // collation-free inferred `O_STATUS ne null` may ride along; see
    // translateCond's Scaladoc)
    require(!log.exists(_.contains("ne 'P'")),
      "a string ne must stay residual under the default posture")
    df
  }

  /** Typed-aggregate-pushdown driver-gate: the typed service's grouped
    * aggregate collapses into ONE `$apply=groupby((O_STATUS),
    * aggregate(O_CUSTKEY with min/max, $count))` request and the
    * answers decode NATIVELY (int min/max, timestamp min, long count)
    * — before this round every min/max/groupby on a metadata-typed
    * column declined and Spark streamed the rows. The request log must
    * prove the $apply went to the wire.
    */
  def typedAggScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = metadataServerFor(spark, dir)
    val df = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields",
        "O_ORDERKEY,O_CUSTKEY,O_STATUS,O_TOTALPRICE,O_ORDERDATE,O_URGENT")
      .option("structureCandidates", "O_PRIORITY")
      .option("metadataSchema", "true")
      .option("pushDownAggregates", "true")
      .option("failFast", "true")
      .load()
      // group on the PLAIN column (an alias inside groupBy puts a
      // Project between Aggregate and scan and Catalyst declines the
      // push); rename after the aggregate
      .groupBy(col("O_STATUS"))
      .agg(
        min(col("O_CUSTKEY")).as("min_custkey"),
        max(col("O_CUSTKEY")).as("max_custkey"),
        min(col("O_ORDERDATE")).as("min_orderdate"),
        count(lit(1)).as("n"))
      .select(col("O_STATUS").as("o_orderstatus"), col("min_custkey"),
        col("max_custkey"), col("min_orderdate"), col("n"))
      .orderBy(col("o_orderstatus"))
    // drive one FULL-projection execution (a count() would prune the
    // aggregate list to a bare groupby and the wire check below would
    // see the wrong $apply form) — |status| rows, trivially small
    df.collect()
    require(srv.requestLog.map(java.net.URLDecoder.decode(_, "UTF-8"))
        .exists(u => u.contains("$apply=groupby((O_STATUS)") &&
          u.contains("O_CUSTKEY with min")),
      "the typed grouped aggregate must collapse into one $apply request")
    df
  }

  /** Expand-as-JOIN driver-gate: the SAME service and truth as
    * [[expandScan]], but both navs plan as separate child entity scans
    * plus Spark-side key joins (the 100×-scale strategy for wide
    * to-many navs — the child table ships once instead of duplicated
    * into every parent row). The strategies must be interchangeable:
    * this gate flattens identically and rides the same oracle.
    */
  def expandJoinScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = expandServerFor(spark, dir)
    import graft.sources.odata.ODataExpandAsJoin
    import graft.sources.odata.ODataExpandAsJoin.JoinNav
    ODataExpandAsJoin.scan(spark,
      Map(
        "baseUrl" -> srv.url,
        "servicePath" -> "svc",
        "entity" -> "Orders",
        "selectFields" -> "O_ORDERKEY,O_STATUS,O_CUSTKEY",
        "failFast" -> "true"),
      Seq(
        JoinNav("Customer", collection = false,
          Seq("C_NAME", "C_MKTSEGMENT"), "Customers", "O_CUSTKEY", "C_CUSTKEY"),
        JoinNav("Items", collection = true,
          Seq("L_LINENUMBER", "L_QUANTITY"), "Items", "O_ORDERKEY", "L_ORDERKEY")))
      .select(col("O_ORDERKEY").as("o_orderkey"),
        col("Customer.C_NAME").as("c_name"),
        col("Customer.C_MKTSEGMENT").as("c_mktsegment"),
        explode(col("Items")).as("item"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("item.L_LINENUMBER").as("l_linenumber"),
        col("item.L_QUANTITY").as("l_quantity"))
      .orderBy(col("o_orderkey").cast("long"), col("l_linenumber").cast("long"))
  }

  /** NESTED `$expand` driver-gate: TWO navigation levels in one
    * request — Orders → Items → Part — rendered as the v4 nested
    * form (`$expand=Items($select=…;$expand=Part($select=…))`, the
    * request log must show it) and decoded recursively: each item
    * row carries its part as a struct INSIDE the item struct. The
    * oracle replays the three-way join over the same parquet, so a
    * dropped level, mis-keyed grandchild, or projection leak breaks
    * the hash.
    */
  def nestedExpandScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = expandServerFor(spark, dir)
    val df = spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("expand",
        "Items*(L_LINENUMBER,L_QUANTITY,Part(P_NAME,P_BRAND))")
      .load()
      .select(col("O_ORDERKEY").as("o_orderkey"),
        explode(col("Items")).as("item"))
      .select(col("o_orderkey"),
        col("item.L_LINENUMBER").as("l_linenumber"),
        col("item.L_QUANTITY").as("l_quantity"),
        col("item.Part.P_NAME").as("p_name"),
        col("item.Part.P_BRAND").as("p_brand"))
      .orderBy(col("o_orderkey").cast("long"), col("l_linenumber").cast("long"))
    // drive one FULL-projection execution (count() would prune the
    // navs away entirely and no $expand would ride the wire — the
    // round-12 wire-proof lesson)
    df.collect()
    require(srv.requestLog.map(java.net.URLDecoder.decode(_, "UTF-8"))
        .exists(_.contains("$expand=Items($select=L_LINENUMBER,L_QUANTITY;" +
          "$expand=Part($select=P_NAME,P_BRAND))")),
      "the v4 nested $expand form must ride the wire")
    df
  }

  /** Nested expand-as-JOIN driver-gate: the SAME two-level truth as
    * [[nestedExpandScan]] with the strategies COMPOSED — level 1
    * (Items) plans as a child entity scan + Spark-side join, level 2
    * (Part) rides that child scan's own inline `$expand` — and the
    * same oracle, so the composition is result-invisible by
    * construction.
    */
  def nestedExpandJoinScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = expandServerFor(spark, dir)
    import graft.sources.odata.ODataExpandAsJoin
    import graft.sources.odata.ODataExpandAsJoin.JoinNav
    ODataExpandAsJoin.scan(spark,
      Map(
        "baseUrl" -> srv.url,
        "servicePath" -> "svc",
        "entity" -> "Orders",
        "selectFields" -> "O_ORDERKEY,O_STATUS",
        "failFast" -> "true"),
      Seq(
        JoinNav("Items", collection = true,
          Seq("L_LINENUMBER", "L_QUANTITY"), "Items", "O_ORDERKEY",
          "L_ORDERKEY",
          childExpand = Some("Part(P_NAME,P_BRAND)"))))
      .select(col("O_ORDERKEY").as("o_orderkey"),
        explode(col("Items")).as("item"))
      .select(col("o_orderkey"),
        col("item.L_LINENUMBER").as("l_linenumber"),
        col("item.L_QUANTITY").as("l_quantity"),
        col("item.Part.P_NAME").as("p_name"),
        col("item.Part.P_BRAND").as("p_brand"))
      .orderBy(col("o_orderkey").cast("long"), col("l_linenumber").cast("long"))
  }

  // the SAME header+items+customer fixture, but the server PAGES every
  // expanded Items collection past 3 entries (TPC-H orders carry up to
  // 7 lines, so most orders force a Nav@odata.nextLink continuation)
  private val pagedExpandServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  /** Server-paged `$expand` driver-gate: identical query and oracle to
    * [[expandScan]], but every Items collection larger than 3 arrives
    * as an inline prefix plus a v4 `Items@odata.nextLink` continuation
    * the reader must FOLLOW (OData v4 protocol §11.2.4.2) — a client
    * ignoring the annotation reads "successfully" with the tail of
    * every large collection silently gone, which is exactly the hash
    * mismatch this gate exists to catch.
    */
  def pagedExpandScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = pagedExpandServers.getOrElseUpdate(dir, {
      val orders = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderkey") < 200)
        .select(
          col("o_orderkey").cast("string").as("O_ORDERKEY"),
          col("o_orderstatus").as("O_STATUS"),
          col("o_custkey").cast("string").as("O_CUSTKEY"))
        .collect()
        .map(r => Map("O_ORDERKEY" -> r.getString(0),
          "O_STATUS" -> r.getString(1), "O_CUSTKEY" -> r.getString(2)))
        .toSeq
      val customers = spark.read.parquet(s"$dir/customer.parquet")
        .select(
          col("c_custkey").cast("string").as("C_CUSTKEY"),
          col("c_name").as("C_NAME"),
          col("c_mktsegment").as("C_MKTSEGMENT"))
        .collect()
        .map(r => Map("C_CUSTKEY" -> r.getString(0),
          "C_NAME" -> r.getString(1), "C_MKTSEGMENT" -> r.getString(2)))
        .toSeq
      val items = spark.read.parquet(s"$dir/lineitem.parquet")
        .where(col("l_orderkey") < 200)
        .select(
          col("l_orderkey").cast("string").as("L_ORDERKEY"),
          col("l_linenumber").cast("string").as("L_LINENUMBER"),
          col("l_quantity").cast("long").cast("string").as("L_QUANTITY"))
        .collect()
        .map(r => Map("L_ORDERKEY" -> r.getString(0),
          "L_LINENUMBER" -> r.getString(1), "L_QUANTITY" -> r.getString(2)))
        .toSeq
      new ODataStubServer(orders, "O_STATUS", dialect = "v4",
        serverPageSize = 50, navPageSize = 3,
        navProps = Map(
          "Customer" -> StubNav(collection = false, "O_CUSTKEY", "C_CUSTKEY", customers),
          "Items" -> StubNav(collection = true, "O_ORDERKEY", "L_ORDERKEY", items))).start()
    })
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("expand",
        "Customer(C_NAME,C_MKTSEGMENT),Items*(L_LINENUMBER,L_QUANTITY)")
      .option("failFast", "true")
      .load()
      .select(col("O_ORDERKEY").as("o_orderkey"),
        col("Customer.C_NAME").as("c_name"),
        col("Customer.C_MKTSEGMENT").as("c_mktsegment"),
        explode(col("Items")).as("item"))
      .select(col("o_orderkey"), col("c_name"), col("c_mktsegment"),
        col("item.L_LINENUMBER").as("l_linenumber"),
        col("item.L_QUANTITY").as("l_quantity"))
      .orderBy(col("o_orderkey").cast("long"), col("l_linenumber").cast("long"))
  }

  // v4 change-tracking stub: initial snapshot misses keys ≥ 150,
  // carries a STALE priority for keys in [50,100), and still holds
  // keys < 50; the one delta batch upserts the true [50,100) rows,
  // adds [150,200), and removes every key < 50 — so the synced table
  // converges to exactly the fixture's [50,200) slice
  private val deltaServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  private def deltaServerFor(spark: SparkSession, dir: String): ODataStubServer =
    deltaServers.getOrElseUpdate(dir, {
      val all = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderkey") < 200)
        .select(
          col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("O_STATUS"),
          col("o_orderpriority").as("O_PRIORITY"))
        .collect()
        .map(r => (r.getLong(0), Map(
          "O_ORDERKEY" -> r.getLong(0).toString,
          "O_STATUS" -> r.getString(1),
          "O_PRIORITY" -> r.getString(2))))
        .sortBy(_._1)
      val initial = all.filter(_._1 < 150).map { case (k, r) =>
        if (k >= 50 && k < 100) r.updated("O_PRIORITY", "0-STALE") else r }
      val upserts = all.filter { case (k, _) => (k >= 50 && k < 100) || k >= 150 }
        .map(_._2)
      val removedKeys = all.filter(_._1 < 50).map(_._2("O_ORDERKEY"))
      new ODataStubServer(initial.toSeq, "O_PRIORITY", dialect = "v4",
        serverPageSize = 50,
        deltaBatches = Seq((upserts.toSeq, removedKeys.toSeq)),
        deltaKeyField = "O_ORDERKEY").start()
    })

  /** V4 change-tracking driver-gate: one INITIAL tracked
    * materialization plus one DELTA application (upserts of stale and
    * new keys, removals of retired ones) must converge the local
    * parquet table to the fixture's [50,200) slice exactly — a
    * protocol bug (missed @removed, unapplied upsert, wrong key, a
    * stale link) leaves stale/extra rows and breaks the hash. State
    * is rebuilt from scratch each invocation so the gate is
    * deterministic.
    */
  def deltaSync(spark: SparkSession, dir: String): DataFrame = {
    val srv = deltaServerFor(spark, dir)
    val tablePath = s"${System.getProperty("java.io.tmpdir")}/graft_odata_delta_${dir.hashCode & Int.MaxValue}"
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val opts = graft.sources.odata.ODataOptions(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of(
          "baseUrl", srv.url, "servicePath", "svc", "entity", "Orders",
          "selectFields", "O_ORDERKEY,O_STATUS,O_PRIORITY")))
    val r1 = graft.sources.odata.ODataDelta.syncToParquet(
      spark, opts, "O_ORDERKEY", tablePath)
    require(r1.initial, "first sync must be the initial materialization")
    val r2 = graft.sources.odata.ODataDelta.syncToParquet(
      spark, opts, "O_ORDERKEY", tablePath)
    require(!r2.initial && r2.removals > 0,
      s"second sync must apply the delta batch: $r2")
    spark.read.parquet(s"$tablePath/data")
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }

  // the same change-tracking shape as deltaServerFor, but the stub
  // publishes an EDMX typing the slice (Int64 key, Int32 custkey) —
  // the typed-sync gate's fixture: stale [50,100) custkeys are 0 in
  // the initial snapshot, corrected by the delta batch
  private val typedDeltaServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  private def typedDeltaServerFor(spark: SparkSession, dir: String): ODataStubServer =
    typedDeltaServers.getOrElseUpdate(dir, {
      val edmx = """<?xml version="1.0" encoding="utf-8"?>
        |<edmx:Edmx Version="4.0" xmlns:edmx="http://docs.oasis-open.org/odata/ns/edmx">
        |  <edmx:DataServices>
        |    <Schema Namespace="graft.byd" xmlns="http://docs.oasis-open.org/odata/ns/edm">
        |      <EntityType Name="Order">
        |        <Key><PropertyRef Name="O_ORDERKEY"/></Key>
        |        <Property Name="O_ORDERKEY" Type="Edm.Int64" Nullable="false"/>
        |        <Property Name="O_CUSTKEY" Type="Edm.Int32"/>
        |        <Property Name="O_STATUS" Type="Edm.String"/>
        |        <Property Name="O_PRIORITY" Type="Edm.String"/>
        |      </EntityType>
        |      <EntityContainer Name="Container">
        |        <EntitySet Name="Orders" EntityType="graft.byd.Order"/>
        |      </EntityContainer>
        |    </Schema>
        |  </edmx:DataServices>
        |</edmx:Edmx>""".stripMargin
      val all = spark.read.parquet(s"$dir/orders.parquet")
        .where(col("o_orderkey") < 200)
        .select(
          col("o_orderkey").cast("long").as("k"),
          col("o_custkey").cast("string").as("C"),
          col("o_orderstatus").as("S"))
        .collect()
        .map(r => (r.getLong(0), Map(
          "O_ORDERKEY" -> r.getLong(0).toString,
          "O_CUSTKEY" -> r.getString(1),
          "O_STATUS" -> r.getString(2))))
        .sortBy(_._1)
      val initial = all.filter(_._1 < 150).map { case (k, r) =>
        if (k >= 50 && k < 100) r.updated("O_CUSTKEY", "0") else r }
      val upserts = all.filter { case (k, _) => (k >= 50 && k < 100) || k >= 150 }
        .map(_._2)
      val removedKeys = all.filter(_._1 < 50).map(_._2("O_ORDERKEY"))
      new ODataStubServer(initial.toSeq, "O_PRIORITY", dialect = "v4",
        serverPageSize = 50, metadataDoc = Some(edmx),
        rawJsonFields = Set("O_ORDERKEY", "O_CUSTKEY"),
        deltaBatches = Seq((upserts.toSeq, removedKeys.toSeq)),
        deltaKeyField = "O_ORDERKEY").start()
    })

  /** TYPED change-tracking driver-gate: the [[deltaSync]] protocol
    * under `metadataSchema=true` — the tracked parquet table carries
    * NATIVE types end to end (bigint key, int custkey), the delta
    * round's typed upserts/removals converge it to the [50,200) slice,
    * and the oracle compares with NO cast layer on the Spark side.
    */
  def deltaSyncTyped(spark: SparkSession, dir: String): DataFrame = {
    val srv = typedDeltaServerFor(spark, dir)
    val tablePath = s"${System.getProperty("java.io.tmpdir")}/graft_odata_delta_typed_${dir.hashCode & Int.MaxValue}"
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val opts = graft.sources.odata.ODataOptions(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of(
          "baseUrl", srv.url, "servicePath", "svc", "entity", "Orders",
          "selectFields", "O_ORDERKEY,O_CUSTKEY,O_STATUS",
          "metadataSchema", "true")))
    val r1 = graft.sources.odata.ODataDelta.syncToParquet(
      spark, opts, "O_ORDERKEY", tablePath)
    require(r1.initial, "first sync must be the initial materialization")
    val r2 = graft.sources.odata.ODataDelta.syncToParquet(
      spark, opts, "O_ORDERKEY", tablePath)
    require(!r2.initial && r2.removals > 0,
      s"second sync must apply the delta batch: $r2")
    val out = spark.read.parquet(s"$tablePath/data")
    require(out.schema("O_ORDERKEY").dataType.simpleString == "bigint" &&
      out.schema("O_CUSTKEY").dataType.simpleString == "int",
      s"the tracked table must be natively typed: ${out.schema.treeString}")
    out.select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_CUSTKEY").as("o_custkey"),
        col("O_STATUS").as("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** Seed-then-track driver-gate: the SAME change-tracking fixture as
    * [[deltaSync]], but the initial table comes from the PARALLEL
    * skip-range connector scan after a key-only tracked walk captured
    * the delta link (link-first ordering — see
    * `ODataDelta.seedWithParallelScan`); the first delta round then
    * converges the seeded table to the same [50,200) truth. An
    * ordering bug (link after scan), a seed/track schema mismatch, or
    * a non-idempotent re-application breaks the hash against the same
    * oracle as the sequential path.
    */
  def deltaSeededSync(spark: SparkSession, dir: String): DataFrame = {
    val srv = deltaServerFor(spark, dir)
    val tablePath = s"${System.getProperty("java.io.tmpdir")}/graft_odata_seed_${dir.hashCode & Int.MaxValue}"
    val p = new org.apache.hadoop.fs.Path(tablePath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(p, true)
    val options = Map(
      "baseUrl" -> srv.url, "servicePath" -> "svc", "entity" -> "Orders",
      "selectFields" -> "O_ORDERKEY,O_STATUS,O_PRIORITY",
      "skipRangePartitions" -> "4", "skipRangeOrderKey" -> "O_ORDERKEY")
    val r1 = graft.sources.odata.ODataDelta.seedWithParallelScan(
      spark, options, "O_ORDERKEY", tablePath)
    require(r1.initial && r1.tableRows > 0, s"seed must materialize: $r1")
    val opts = graft.sources.odata.ODataOptions(
      new org.apache.spark.sql.util.CaseInsensitiveStringMap(
        java.util.Map.of(
          "baseUrl", srv.url, "servicePath", "svc", "entity", "Orders",
          "selectFields", "O_ORDERKEY,O_STATUS,O_PRIORITY")))
    val r2 = graft.sources.odata.ODataDelta.syncToParquet(
      spark, opts, "O_ORDERKEY", tablePath)
    require(!r2.initial && r2.removals > 0,
      s"first sync after the seed must apply the delta batch: $r2")
    spark.read.parquet(s"$tablePath/data")
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }

  private val streamRuns = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Streaming CDC driver-gate: the `odata-delta` Structured
    * Streaming source rides the SAME change-tracking fixture as
    * [[deltaSync]] — batch 0 is the tracked initial read (stale
    * [50,100) rows included), batch 1 the delta round's upserts and
    * `@removed` deletes. The memory sink accumulates the raw CDC rows
    * and the oracle replays all three slices as a UNION ALL, so an
    * offset bug (skipped round, re-run initial read, duplicated
    * batch), a mis-flagged `_change`, or a dropped removal changes the
    * row multiset and breaks the hash. Fresh checkpoint per
    * invocation = deterministic.
    */
  def deltaStreamScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = deltaServerFor(spark, dir)
    val name = s"graft_odata_cdc_${streamRuns.incrementAndGet()}"
    val ckpt = s"${System.getProperty("java.io.tmpdir")}/$name/ckpt"
    val p = new org.apache.hadoop.fs.Path(ckpt)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val q = spark.readStream.format("odata-delta")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS,O_PRIORITY")
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.table(name)
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"),
        col("_change"))
      .orderBy(col("o_orderkey").cast("long"), col("_change"),
        col("o_orderpriority"))
  }

  /** Seed→stream handoff driver-gate: the table bootstraps via the
    * PARALLEL seed (link captured FIRST, then the skip-range scan),
    * hands its persisted link to the `odata-delta` stream as
    * `startLink`, and the stream's batch 0 is the first DELTA round —
    * NO initial enumeration at all (the request log proves it: every
    * post-seed request carries `$deltatoken`). The gate folds the CDC
    * rows onto the seeded table with the same last-write-wins merge a
    * consumer would run, so the result must converge to the same
    * [50,200) truth as the batch sync paths — a handoff bug (link
    * re-walked from scratch, a skipped or duplicated round, an
    * unapplied delete) changes the folded table and breaks the hash.
    */
  def deltaStreamSeededScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = deltaServerFor(spark, dir)
    val tablePath = s"${System.getProperty("java.io.tmpdir")}/graft_odata_seedstream_${dir.hashCode & Int.MaxValue}"
    val p = new org.apache.hadoop.fs.Path(tablePath)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
    val options = Map(
      "baseUrl" -> srv.url, "servicePath" -> "svc", "entity" -> "Orders",
      "selectFields" -> "O_ORDERKEY,O_STATUS,O_PRIORITY",
      "skipRangePartitions" -> "4", "skipRangeOrderKey" -> "O_ORDERKEY")
    val r1 = graft.sources.odata.ODataDelta.seedWithParallelScan(
      spark, options, "O_ORDERKEY", tablePath)
    require(r1.initial && r1.tableRows > 0, s"seed must materialize: $r1")
    val link = graft.sources.odata.ODataDelta.persistedLink(spark, tablePath)
      .getOrElse(throw new IllegalStateException("seed persisted no link"))
    val reqsBeforeStream = srv.requestLog.size
    val name = s"graft_odata_seedcdc_${streamRuns.incrementAndGet()}"
    val ckpt = s"$tablePath/ckpt"
    val q = spark.readStream.format("odata-delta")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS,O_PRIORITY")
      .option("startLink", link)
      .load()
      .writeStream.format("memory").queryName(name)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
    val streamReqs = srv.requestLog.drop(reqsBeforeStream)
      .filterNot(_.contains("/token"))
    require(streamReqs.nonEmpty && streamReqs.forall(_.contains("deltatoken")),
      s"a startLink stream must issue ONLY delta-round requests, got: $streamReqs")
    // fold the CDC rows onto the seeded table — the consumer's
    // last-write-wins merge (one round here, so each key appears once)
    val cdc = spark.table(name)
    val touched = cdc.select(col("O_ORDERKEY")).distinct()
    val upserts = cdc.where(col("_change") === "upsert")
      .select(col("O_ORDERKEY"), col("O_STATUS"), col("O_PRIORITY"))
    spark.read.parquet(s"$tablePath/data")
      .join(broadcast(touched), Seq("O_ORDERKEY"), "left_anti")
      .unionByName(upserts)
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
      .orderBy(col("o_orderkey").cast("long"))
  }

  // second stub, same slice, but the 3-MEDIUM value chain is poisoned
  // (every filtered request for it returns 500)
  private val partialServers = scala.collection.concurrent.TrieMap.empty[String, ODataStubServer]

  private def partialServerFor(spark: SparkSession, dir: String): ODataStubServer =
    partialServers.getOrElseUpdate(dir, {
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
        badCandidates = Set("OBAD_STRUCT"), serverPageSize = 50,
        failValues = Set("3-MEDIUM")).start()
    })

  /** R4/R5 driver-gate (reference etl.py:191-194, :38): the 3-MEDIUM
    * partition-value chain fails every request; `failFast=false` logs
    * and skips EXACTLY that chain, so the result is the deterministic
    * partial row-set (every priority except 3-MEDIUM). `maxRetries=0`
    * keeps the poisoned chain from backoff-spinning;
    * `requestPauseMs=1` exercises the politeness pause (R5) on the
    * surviving chains.
    */
  def partialScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = partialServerFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "OBAD_STRUCT,O_PRIORITY")
      .option("failFast", "false")
      .option("maxRetries", "0")
      .option("requestPauseMs", "1")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        col("O_PRIORITY").as("o_orderpriority"))
  }

  /** R10 driver-gate (reference etl.py:197-199): the structure
    * candidate probes fine but NO row carries a value, so partition
    * planning finds zero keys and must yield an EMPTY scan (plus a
    * warning), never an unfiltered full scan. Unioned with
    * [[partialScan]] in the gate query, a regression to full-scan
    * doubles the row count and fails the oracle hash loudly.
    */
  def emptyScan(spark: SparkSession, dir: String): DataFrame = {
    val srv = partialServerFor(spark, dir)
    spark.read.format("odata")
      .option("baseUrl", srv.url)
      .option("servicePath", "svc")
      .option("entity", "Orders")
      .option("selectFields", "O_ORDERKEY,O_STATUS")
      .option("structureCandidates", "O_MISSING")
      .load()
      .select(
        col("O_ORDERKEY").as("o_orderkey"),
        col("O_STATUS").as("o_orderstatus"),
        lit(null).cast("string").as("o_orderpriority"))
  }
}
