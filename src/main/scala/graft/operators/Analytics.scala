package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic query surface over the star schema: the aggregation /
  * join / window / top-k shapes the engine must serve at 100 TB.
  *
  * Determinism for the DuckDB oracle: money sums go through
  * [[moneySum]] (scaled-long arithmetic → exact, association-order-
  * independent); every query ends in an explicit unique ORDER BY.
  *
  * Scale notes are on each operator; the common themes: partial
  * aggregation shrinks shuffles to |groups|; dimension tables
  * broadcast; windows partition by a key so no global sort ever runs.
  */
object Analytics {

  /** Deterministic sum of 2-decimal money doubles: round each term to
    * scaled long (exact), sum longs (associative, overflow-safe to
    * ~9e16 cents), divide once. Spark and DuckDB produce bit-equal
    * results regardless of partial-agg order — double-sum would not.
    */
  def moneySum(c: Column, scale: Int = 2): Column = {
    val f = math.pow(10, scale)
    sum(round(c * f, 0).cast("long")) / f
  }

  /** SQL twin of [[moneySum]] for oracle strings. */
  def moneySumSql(expr: String, scale: Int = 2): String = {
    val f = math.pow(10, scale).toLong
    s"sum(CAST(round(($expr)*$f, 0) AS BIGINT))/$f.0"
  }

  /** TPC-H Q1-shaped pricing summary: one wide hash aggregate.
    * Map-side partial agg reduces 100 TB of lineitem to
    * |flag×status| rows per task before the (tiny) shuffle.
    */
  def pricingSummary(lineitem: DataFrame): DataFrame =
    lineitem
      .where(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        moneySum(col("l_quantity")).as("sum_qty"),
        moneySum(col("l_extendedprice")).as("sum_base_price"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** TPC-H Q3-shaped shipping-priority revenue: selective dimension
    * (customer segment) BROADCAST into orders, result joined to
    * lineitem on the shuffle key both sides already share. Top-k via
    * sort-limit (Spark plans TakeOrderedAndProject — no global sort
    * materialization).
    */
  def revenueTopOrders(customer: DataFrame, orders: DataFrame,
                       lineitem: DataFrame, segment: String, k: Int): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(customer.where(col("c_mktsegment") === segment)),
            col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("l_orderkey"))
      .limit(k)

  /** Multi-way star join with grouped rollup: region ⨝ nation ⨝
    * customer ⨝ orders, ROLLUP(region, nation). All dims broadcast;
    * orders is the only scanned fact; rollup is one aggregate with
    * grouping sets (no re-scan per level).
    */
  def ordersByGeoRollup(region: DataFrame, nation: DataFrame,
                        customer: DataFrame, orders: DataFrame): DataFrame =
    orders
      .join(broadcast(customer), col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), moneySum(col("o_totalprice")).as("total_price"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** Windowed running totals per supplier: partitioned window — the
    * sort is per-key within shuffle partitions, never global. Unique
    * tie-break (orderkey, linenumber) keeps the running sum
    * deterministic. l_quantity is integral, so double running sums are
    * exact.
    */
  def runningSupplierQty(lineitem: DataFrame): DataFrame = {
    val w = Window.partitionBy("l_suppkey")
      .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
    lineitem
      .withColumn("running_qty", sum(col("l_quantity")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .where(col("rn") <= 5) // first 5 shipments per supplier
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"), col("l_linenumber"),
              col("running_qty"))
      .orderBy("l_suppkey", "rn")
  }

  /** Top-k customers by exact spend — groupBy + TakeOrderedAndProject. */
  /** Trailing-`days`-day revenue per customer: a RANGE window frame
    * over the order-date day number — the time-interval cousin of
    * [[runningSupplierQty]]'s ROWS frame. RANGE includes ALL rows
    * whose day falls inside the interval regardless of how many share
    * a date, so the frame (and with scaled-long sums, the value) is
    * deterministic even on date ties — a ROWS frame would not be.
    *
    * Scale shape: one window shuffle partitioned by the
    * high-cardinality customer key; within a partition Spark slides
    * the frame incrementally (no per-row rescan), so cost is
    * O(rows per customer), not O(rows × frame width).
    */
  def trailingRevenue(orders: DataFrame, days: Int = 30): DataFrame = {
    val w = Window.partitionBy("o_custkey").orderBy(col("day_num"))
      .rangeBetween(-(days - 1), 0)
    orders
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .withColumn("day_num", datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"))
      .withColumn("trail_rev",
        sum(round(col("o_totalprice") * 100, 0).cast("long")).over(w).cast("double") / 100.0)
      .withColumn("n_trail", count(lit(1)).over(w).cast("long"))
      .select("o_custkey", "o_orderkey", "o_orderdate", "trail_rev", "n_trail")
  }

  /** Two-phase salted aggregate: phase 1 aggregates on (key, salt) —
    * a hot key's rows spread over `salts` reducers — phase 2 merges
    * the ≤ |keys|·salts partials. The manual form of skew-safe
    * aggregation for when one key floods a reducer; because the
    * partials are scaled longs, the two-phase result is bit-equal to
    * the direct group-by (the oracle IS the direct form — associativity
    * is the checked property, not an assumption).
    *
    * Note Spark's partial/final hash aggregation already does this
    * per-PARTITION; the explicit salt matters when upstream
    * partitioning is already keyed (no map-side combine possible) or
    * for sum-of-distinct-heavy plans. The second aggregate's input is
    * tiny, so the extra shuffle costs |keys|·salts rows.
    */
  def skewSafeRevenue(lineitem: DataFrame, salts: Int = 16): DataFrame =
    lineitem
      .withColumn("salt", pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(salts)))
      .groupBy(col("l_returnflag"), col("salt"))
      .agg(
        sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
          .cast("long")).as("partial_cents"),
        count(lit(1)).as("partial_n"))
      .groupBy("l_returnflag")
      .agg(
        (sum(col("partial_cents")).cast("double") / 10000.0).as("revenue"),
        sum(col("partial_n")).cast("long").as("n_rows"))
      .orderBy("l_returnflag")

  /** TPC-H Q13 shape: the distribution of orders-per-customer,
    * INCLUDING zero-order customers — the left join is the point
    * (an inner join silently drops the empty-cart cohort). Two-level
    * aggregate: the first shrinks to |customers| rows, the second to
    * |distinct counts|; the join is the only corpus-sized shuffle,
    * keyed on the high-cardinality custkey.
    */
  def orderCountDistribution(customer: DataFrame, orders: DataFrame): DataFrame =
    customer
      .join(orders, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("n_custs"))
      .orderBy(desc("n_custs"), desc("c_count"))

  def topCustomers(orders: DataFrame, k: Int): DataFrame =
    orders.groupBy(col("o_custkey"))
      .agg(moneySum(col("o_totalprice")).as("total_spent"), count(lit(1)).as("n_orders"))
      .orderBy(desc("total_spent"), asc("o_custkey"))
      .limit(k)

  /** TPC-H Q5-shaped local-supplier revenue: the 6-way join where the
    * supplier must sit in the customer's nation. Facts (orders,
    * lineitem) join on their keys. Only the ALWAYS-tiny dims (nation,
    * the pre-filtered region) get an explicit broadcast hint —
    * customer and supplier scale with the dataset (150M+ rows at real
    * TPC-H SF100), so Catalyst/AQE picks their strategy from runtime
    * sizes: broadcast locally, shuffled hash join at 100×. The year
    * filter prunes orders at the scan.
    */
  def localSupplierRevenue(region: DataFrame, nation: DataFrame,
                           customer: DataFrame, supplier: DataFrame,
                           orders: DataFrame, lineitem: DataFrame,
                           regionName: String, orderYear: Int): DataFrame =
    lineitem
      .join(orders.where(year(col("o_orderdate")) === orderYear),
            col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier,
            col("l_suppkey") === col("s_suppkey") &&
              col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region.where(col("r_name") === regionName)),
            col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(desc("revenue"), asc("n_name"))

  /** TPC-H Q4-shaped priority check: orders with at least one
    * late-shipped line item, counted per priority. The EXISTS becomes
    * a LEFT SEMI join with a mixed equi + range condition — the fact
    * table never widens, and the semi join short-circuits per order.
    */
  def latePriorityCount(orders: DataFrame, lineitem: DataFrame): DataFrame =
    orders
      .join(lineitem,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  /** TPC-H Q18-shaped large-volume customers: orders whose total
    * quantity clears a threshold, with their customer. The HAVING
    * filter runs on an EXACT scaled-long quantity sum (float sums at
    * the threshold boundary would make membership engine-dependent);
    * the big-order set is tiny, so the subsequent joins broadcast it.
    */
  def largeVolumeOrders(customer: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, minQty: Double): DataFrame = {
    val big = lineitem.groupBy(col("l_orderkey"))
      .agg(sum(round(col("l_quantity") * 100, 0).cast("long")).as("q100"))
      .where(col("q100") > (minQty * 100).toLong)
    orders
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
              col("o_orderdate"), col("o_totalprice"),
              (col("q100") / 100.0).as("total_qty"))
      .orderBy(desc("total_qty"), asc("o_orderkey"))
      .limit(50)
  }

  /** TPC-H Q10-shaped returned-item report: customers ranked by the
    * revenue they returned in one order year. The returnflag filter
    * prunes lineitem AT THE SCAN (predicate pushdown carries it into
    * the parquet reader), the year filter prunes orders likewise; the
    * customer join keys the aggregate, nation broadcasts. Top-k is
    * TakeOrderedAndProject over the aggregate — never a global sort.
    */
  def returnedItemRevenue(customer: DataFrame, orders: DataFrame,
                          lineitem: DataFrame, nation: DataFrame,
                          orderYear: Int, k: Int): DataFrame =
    lineitem.where(col("l_returnflag") === "R")
      .join(orders.where(year(col("o_orderdate")) === orderYear),
            col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"))
      .orderBy(desc("revenue"), asc("c_custkey"))
      .limit(k)

  /** TPC-H Q6-shaped revenue forecast: the pure filter-aggregate —
    * every predicate (discount band, quantity cap) pushes to the
    * parquet scan, then one exact scaled-long sum per ship year.
    * The simplest shape there is, and the one where a lost pushdown
    * is most visible: the scan should read 3 columns and skip rows
    * before any operator runs.
    */
  def revenueForecast(lineitem: DataFrame, minDiscount: Double,
                      maxDiscount: Double, maxQty: Double): DataFrame =
    lineitem
      .where(col("l_discount").between(minDiscount, maxDiscount) &&
             col("l_quantity") < maxQty)
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(moneySum(col("l_extendedprice") * col("l_discount"), 4).as("forecast_revenue"),
           count(lit(1)).as("n_items"))
      .orderBy("ship_year")

  /** TPC-H Q14-shaped promo revenue share per ship year: the
    * conditional-aggregate-over-join shape. Numerator and denominator
    * are both scaled-long sums over identical rows, so the percentage
    * is one double division on identical inputs in any engine. Part
    * scales with the dataset — no broadcast hint (see Q5 note).
    */
  def promoRevenueShare(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy(year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(
        moneySum(when(col("p_type") === "PROMO",
                      col("l_extendedprice") * (lit(1) - col("l_discount")))
                   .otherwise(lit(0.0)), 4).as("promo_revenue"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("total_revenue"))
      .select(col("ship_year"),
              round(lit(100.0) * col("promo_revenue") / col("total_revenue"), 6)
                .as("promo_share"),
              col("promo_revenue"), col("total_revenue"))
      .orderBy("ship_year")

  /** TPC-H Q15-shaped top supplier: the supplier(s) with the maximum
    * revenue in one ship year. Revenue is an exact scaled-long sum, so
    * "maximum" is well-defined cross-engine (a float-sum max could
    * disagree at the boundary); the 1-row max table broadcasts back
    * onto the per-supplier aggregate, and ties all surface (Q15's
    * VIEW + max semantics).
    */
  def topSupplierRevenue(supplier: DataFrame, lineitem: DataFrame,
                         shipYear: Int): DataFrame = {
    val rev = lineitem.where(year(col("l_shipdate")) === shipYear)
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 10000, 0)
        .cast("long")).as("r4"))
    rev
      .join(broadcast(rev.agg(max(col("r4")).as("maxr"))), col("r4") === col("maxr"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), (col("r4") / 10000.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q7-shaped trade volume: revenue shipped between two named
    * nations (either direction, never within one nation), per ship
    * year. The nation dimension is pre-filtered to the two names
    * BEFORE the broadcast joins, so the inner joins themselves prune
    * lineitem to the two trading cohorts — the selective predicate
    * rides the join instead of running as a post-join residual; only
    * the cheap cross-direction exclusion stays residual. Orders and
    * lineitem meet on the orderkey they already share.
    */
  def nationTradeVolume(nation: DataFrame, customer: DataFrame,
                        supplier: DataFrame, orders: DataFrame,
                        lineitem: DataFrame, nationA: String,
                        nationB: String): DataFrame = {
    val pair = nation.where(col("n_name").isin(nationA, nationB))
    // prune the DIMENSIONS first (Spark keeps the written left-deep
    // join order — a post-facts nation join would run every fact join
    // at full cardinality before discarding ~(1 − (2/|nations|)²) of
    // the rows); the pre-filtered customer/supplier then shrink each
    // fact join as it happens
    val tradingCust = customer
      .join(broadcast(pair.select(col("n_nationkey").as("cn_key"),
                                  col("n_name").as("cust_nation"))),
            col("c_nationkey") === col("cn_key"))
    val tradingSupp = supplier
      .join(broadcast(pair.select(col("n_nationkey").as("sn_key"),
                                  col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(tradingCust, col("o_custkey") === col("c_custkey"))
      .join(tradingSupp, col("l_suppkey") === col("s_suppkey"))
      .where(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
               year(col("l_shipdate")).cast("long").as("ship_year"))
      .agg(moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("volume"),
           count(lit(1)).as("n_items"))
      .orderBy("supp_nation", "cust_nation", "ship_year")
  }

  /** TPC-H Q17-shaped small-quantity revenue: for one brand, the
    * revenue sitting in line items that order less than `frac` of
    * their part's average quantity. The per-part average is an exact
    * scaled-long sum over an exact count, so the threshold — and with
    * it row membership at the boundary — is the same two IEEE
    * divisions in every engine. The brand filter prunes part at the
    * scan and the pruned key set broadcasts into BOTH lineitem
    * passes, so neither corpus scan widens beyond the brand's
    * line items; the per-part aggregate shuffles on the partkey the
    * join already produced.
    */
  def smallQuantityRevenue(part: DataFrame, lineitem: DataFrame,
                           brand: String, frac: Double = 0.2): DataFrame = {
    val brandParts = part.where(col("p_brand") === brand).select(col("p_partkey"))
    val li = lineitem
      .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"))
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val avgQ = li.groupBy(col("l_partkey"))
      .agg((sum(round(col("l_quantity") * 100, 0).cast("long")).cast("double") / 100.0
              / count(lit(1))).as("avg_qty"))
    li.join(avgQ, "l_partkey")
      .where(col("l_quantity") < lit(frac) * col("avg_qty"))
      .agg(count(lit(1)).as("n_small"),
           moneySum(col("l_extendedprice")).as("total_revenue"))
      .select(col("n_small"), col("total_revenue"),
              round(col("total_revenue") / 7.0, 6).as("avg_yearly"))
  }

  /** TPC-H Q22-shaped dormant high-balance customers: customers whose
    * balance beats the average positive balance but who placed no
    * order on or after `dormantSince`, counted per nation. (The
    * reference shape cohorts on phone prefixes; the fixtures carry no
    * phone column, so nation plays that role.) The 1-row threshold
    * broadcasts over customer; dormancy is a LEFT ANTI join keyed on
    * the high-cardinality custkey whose date predicate prunes the
    * orders scan BEFORE the shuffle — at 100 TB that's one shuffle of
    * recent (custkey) pairs, never a NOT IN materialization. The
    * threshold itself is exact scaled-long arithmetic, so boundary
    * membership is engine-independent.
    */
  def dormantHighBalance(customer: DataFrame, orders: DataFrame,
                         nation: DataFrame,
                         dormantSince: String): DataFrame = {
    val threshold = customer.where(col("c_acctbal") > 0)
      .agg((sum(round(col("c_acctbal") * 100, 0).cast("long")).cast("double") / 100.0
              / count(lit(1))).as("bal_cut"))
    val recent = orders.where(col("o_orderdate") >= lit(dormantSince).cast("date"))
    customer
      .join(broadcast(threshold))
      .where(col("c_acctbal") > col("bal_cut"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_custs"),
           moneySum(col("c_acctbal")).as("total_bal"))
      .orderBy("n_name")
  }

  /** TPC-H Q8-shaped market share: of all revenue that `regionName`
    * customers generated, the fraction supplied by `supplierNation`,
    * per order year. Numerator and denominator are BOTH scaled-long
    * money sums (exact, associative), so the final division is one
    * double op on identical inputs in any engine — the rounded share
    * hash-matches without float-sum order luck.
    */
  def marketShare(region: DataFrame, nation: DataFrame, customer: DataFrame,
                  supplier: DataFrame, orders: DataFrame, lineitem: DataFrame,
                  part: DataFrame, regionName: String,
                  supplierNation: String): DataFrame =
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      // customer/part/supplier scale with the dataset — no broadcast
      // hint; Catalyst/AQE picks from runtime sizes (see Q5 note)
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(part, col("l_partkey") === col("p_partkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("cn_key"),
                                    col("n_regionkey").as("cn_region"))),
            col("c_nationkey") === col("cn_key"))
      .join(broadcast(region.where(col("r_name") === regionName)),
            col("cn_region") === col("r_regionkey"))
      .join(broadcast(nation.select(col("n_nationkey").as("sn_key"),
                                    col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("sn_key"))
      .withColumn("o_year", year(col("o_orderdate")).cast("long"))
      .groupBy(col("o_year"))
      .agg(
        moneySum(when(col("supp_nation") === supplierNation,
                      col("l_extendedprice") * (lit(1) - col("l_discount")))
                   .otherwise(lit(0.0)), 4).as("nation_volume"),
        moneySum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("total_volume"))
      .select(col("o_year"),
              round(col("nation_volume") / col("total_volume"), 6).as("mkt_share"),
              col("nation_volume"), col("total_volume"))
      .orderBy("o_year")

  /** Warehouse sketch-rollup: distinct-count sketches built at a FINE
    * grain (e.g. per type × day, the daily-cron output), merged upward
    * to a coarser grain without touching the raw rows again — the
    * pre-aggregated-sketch pattern that makes month/quarter distinct
    * counts O(|groups|) instead of a re-scan of 100 TB of raw events.
    * Built on the Apache DataSketches HLL aggregates
    * (`hll_sketch_agg` / `hll_union_agg`): unlike exact distinct
    * counts, sketches MERGE associatively, which is the whole reason
    * a sketch (not a count) is what the fine table must store.
    * Returns one row per coarse group with the merged estimate;
    * callers bound it against the exact count (the boolean-bound gate
    * contract — sketches are gated honestly, never pretended exact).
    */
  def distinctSketchRollup(df: DataFrame, fineKeys: Seq[String],
                           coarseKeys: Seq[String], valueCol: String,
                           lgK: Int = 14): DataFrame = {
    val fine = df.groupBy(fineKeys.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sketch"))
    fine.groupBy(coarseKeys.map(col): _*)
      .agg(expr("hll_sketch_estimate(hll_union_agg(sketch))").as("n_approx"))
  }

  /** Mergeable bottom-k (KMV) DISTINCT SAMPLE — the member of the
    * sketch algebra that carries the KEYS themselves (HLL carries
    * counts, KLL quantiles, CMS frequencies, theta membership,
    * approx_top_k heavy hitters): per fine group, the `k` distinct
    * keys with the smallest engine-neutral 60-bit md5 hashes. The
    * min-k of a union is the min-k of the per-part min-k's, so the
    * fine sketches in [[bottomKRollup]] merge to EXACTLY the sketch a
    * direct global pass builds — and because the hash is md5 (no RNG,
    * no engine-private seed), the whole object is deterministic and
    * oracle-exact, not boolean-bound. The k-th normalized hash also
    * yields the classic KMV cardinality estimate n̂ = (k−1)/U_k.
    *
    * Scale: one distinct + per-group rank-cut at the fine grain (hash
    * aggregate, map-side combined; the rank window partitions per
    * fine group); everything downstream runs on |groups|·k rows.
    */
  def bottomKSketch(df: DataFrame, fineKeys: Seq[String], valueCol: String,
                    k: Int): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2: $k")
    val h = graft.functions.TextFunctions.md5Prefix64(col("key").cast("string"))
    val w = Window.partitionBy(fineKeys.map(col): _*).orderBy("h", "key")
    df.select(fineKeys.map(col) :+ col(valueCol).as("key"): _*).distinct()
      .withColumn("h", h)
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
  }

  /** Time-decayed heavy hitters — the "trending now" rank: each
    * fact's weight halves every `halfLifeDays` relative to the
    * newest date, so recent activity dominates without a hard
    * window cliff. DETERMINISTIC decay: weights are the exact dyadic
    * integers 2^(cap − age div halfLife), summed as longs — order-
    * independent, no pow() in the hot path; facts older than `cap`
    * half-lives weigh 0 (a 2⁻⁴⁰ tail is invisible at round 6
    * anyway, and the cutoff is what keeps the integer sum exact).
    * The sum accumulates as decimal(38,0) — a plain long wraps past
    * ~2³⁸·2⁴⁰ ≈ 8.4M newest-date facts per key, well inside 100 TB
    * territory; decimal holds ~10²⁶ of them. One map-side-combined
    * aggregate + TakeOrdered.
    */
  def decayedTopK(facts: DataFrame, keyCol: String, dateCol: String,
                  halfLifeDays: Int, k: Int, cap: Int = 40): DataFrame = {
    require(halfLifeDays >= 1 && k >= 1 && cap >= 1 && cap <= 60,
      s"bad decay params: $halfLifeDays/$k/$cap")
    val mx = facts.agg(max(col(dateCol)).as("mx")) // 1-row scalar
    facts.select(col(keyCol).as("key"), col(dateCol).as("d"))
      .crossJoin(broadcast(mx))
      .withColumn("hl", expr(s"datediff(mx, d) div $halfLifeDays"))
      .withColumn("ws", expr(
        s"CASE WHEN hl <= $cap THEN shiftleft(CAST(1 AS BIGINT), $cap - hl) " +
          "ELSE CAST(0 AS BIGINT) END"))
      .groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum(col("ws").cast("decimal(38,0)")).as("ssum"))
      .select(col("key"), col("n"),
        round(col("ssum").cast("double") / math.pow(2.0, cap), 6).as("decayed"))
      .orderBy(desc("decayed"), asc("key")).limit(k)
  }

  /** The single-frame build/merge primitive of the KMV lifecycle:
    * distinct keys, hashed, k smallest (TakeOrdered — never a global
    * sort). [[bottomKSketch]] is its per-fine-group batch form;
    * [[graft.streaming.StreamingIndex.kmvIngestToCompletion]] folds
    * micro-batches through it.
    */
  def bottomKOf(df: DataFrame, keyCol: String, k: Int): DataFrame =
    df.select(col(keyCol).as("key")).distinct()
      .withColumn("h",
        graft.functions.TextFunctions.md5Prefix64(col("key").cast("string")))
      .orderBy("h", "key").limit(k)

  /** Merge [[bottomKSketch]] fine sketches to the global bottom-k +
    * the KMV estimate: distinct-union of the kept keys, re-cut to the
    * k smallest, estimate (k−1)·2⁶⁰/h_k from the k-th hash — exact
    * count when the union holds fewer than k keys (the sketch IS the
    * population there). The final rank runs on a ≤|groups|·k-row
    * bounded table (annotated control-plane single-partition window).
    */
  def bottomKRollup(sketches: DataFrame, k: Int): DataFrame = {
    val u = sketches.select("key", "h").distinct()
    val cut = u.orderBy("h", "key").limit(k) // TakeOrdered, k bounded
      .withColumn("rnk",
        row_number().over(Window.orderBy("h", "key")).cast("long"))
    val stats = cut.agg(max(col("h")).as("hk"),
      count(lit(1)).cast("long").as("n_kept"))
    cut.crossJoin(broadcast(stats)) // 1-row scalar
      .withColumn("est_distinct",
        when(col("n_kept") < k, col("n_kept").cast("double"))
          .otherwise(round(lit((k - 1).toDouble) * lit(1152921504606846976.0)
                           / col("hk").cast("double"), 6)))
      .select(col("rnk"), col("key"), col("h"), col("est_distinct"))
  }

  /** Frequent-items rollup via mergeable approx_top_k sketches — the
    * COUNTS companion of [[distinctSketchRollup]]: per-fine-group
    * DataSketches frequent-items sketches (`approx_top_k_accumulate`)
    * combine associatively (`approx_top_k_combine`) into the coarse
    * top-`k` WITHOUT re-touching raw rows — the daily-cron fine table
    * stores sketches precisely so the global heavy-hitter report is a
    * |fine-groups|-row merge at any corpus scale. Below
    * `maxItemsTracked` distinct values per sketch the structure
    * retains exact counts (no eviction ever fires), so the estimate
    * is EXACT — the gate cardinality sits in that regime, which is
    * what lets a boolean-bound oracle hold deterministically (the
    * [[distinctSketchRollup]] / theta contract).
    *
    * Output: the estimated top-k as (item, n_est) rows. Determinism
    * note: the SKETCH's own output order breaks count ties by
    * retention order, so gate consumers re-rank with an explicit
    * (count, item) order and compare per-item counts, never sketch
    * positions.
    */
  def topKSketchRollup(df: DataFrame, fineKeys: Seq[String],
                       valueCol: String, k: Int,
                       maxItemsTracked: Int = 16): DataFrame = {
    val fine = df.groupBy(fineKeys.map(col): _*)
      .agg(expr(s"approx_top_k_accumulate($valueCol, $maxItemsTracked)").as("sk"))
    fine
      .agg(expr(s"approx_top_k_combine(sk, $maxItemsTracked)").as("sk"))
      .select(explode(expr(s"approx_top_k_estimate(sk, $k)")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("n_est"))
  }

  /** Mergeable QUANTILES rollup via KLL sketches — the distribution
    * member of the sketch family (HLL distincts, theta sets, CMS /
    * approx_top_k counts): per-fine-group `kll_sketch_agg_bigint`
    * sketches merge associatively (`kll_merge_agg_bigint`) into
    * global quantile estimates without re-touching raw rows — the
    * fine table a daily cron stores so "this quarter's p90" is a
    * |fine-groups|-row merge at any history length.
    *
    * Determinism regime (the [[audienceOverlap]] contract's quantile
    * analogue): KLL compaction is RANDOMIZED (DataSketches draws a
    * coin per level compaction), so estimates are only bit-stable
    * while no compaction fires — i.e. while total n ≤ k, where the
    * sketch simply retains every value and quantiles are EXACT. `k`
    * defaults to the format maximum (65535) to make that regime as
    * wide as possible; the gate cardinality sits inside it, and gate
    * consumers bound the estimate by its exact RANK (±tolerance),
    * which also absorbs the inclusive-rank convention. The LOSSY
    * regime (small k, compaction firing) is exercised too — the
    * agg_kll_rollup_lossy gate runs k = 200 over the full corpus and
    * bounds the estimate by the published normalized rank error
    * ε(k) ≈ 2.296/k^0.9433 (99% confidence) with 2.1× headroom, the
    * contract randomized estimates CAN honor where bit-equality
    * cannot.
    */
  def kllQuantileRollup(df: DataFrame, fineKeys: Seq[String],
                        valueCol: String, pcts: Seq[Int],
                        k: Int = 65535): DataFrame = {
    val fine = df.groupBy(fineKeys.map(col): _*)
      .agg(expr(s"kll_sketch_agg_bigint($valueCol, $k)").as("sk"))
    fine
      .agg(expr(s"kll_merge_agg_bigint(sk, $k)").as("sk"))
      // the rank argument must be FOLDABLE — one literal probe per pct
      // on the single merged row, then unpivot
      .select(pcts.map(p =>
        expr(s"kll_sketch_get_quantile_bigint(sk, ${p / 100.0})").as(s"q$p")): _*)
      .select(explode(array(pcts.map(p =>
        struct(lit(p.toLong).as("pct"), col(s"q$p").as("q_est"))): _*)).as("e"))
      .select(col("e.pct").as("pct"), col("e.q_est").as("q_est"))
  }

  /** Pairwise audience SUBTRACTION via theta sketches — the set
    * DIFFERENCE [[audienceOverlap]]'s intersections complete the
    * algebra with: for every ordered group pair (a, b), the estimated
    * distinct values in a but NOT in b ("viewed but never purchased"),
    * computed from the |groups|-row sketch table alone — never from
    * re-scanning raw rows. Theta sketches are DETERMINISTIC functions
    * of the input set (θ comes from the hash order, no RNG), so the
    * estimate is bit-stable at any scale; below ~2^lgK distinct
    * values per group the sketch retains every hash and the
    * difference is EXACT — the gate scale sits in that regime (the
    * [[audienceOverlap]] contract).
    */
  def audienceDifference(df: DataFrame, groupCol: String, valueCol: String,
                         lgK: Int = 14): DataFrame = {
    val sk = df.groupBy(col(groupCol).as("g"))
      .agg(expr(s"theta_sketch_agg($valueCol, $lgK)").as("sk"))
    val a = sk.select(col("g").as("type_a"), col("sk").as("sk_a"))
    val b = sk.select(col("g").as("type_b"), col("sk").as("sk_b"))
    a.join(b, col("type_a") =!= col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("theta_sketch_estimate(theta_difference(sk_a, sk_b))")
          .as("n_only_a_est"))
  }

  /** Pairwise distinct-value overlap between groups via theta sketches
    * — the estimate HLL structurally cannot give (HLL unions only;
    * theta supports set INTERSECTION). One scan builds a sketch per
    * group; every pair's overlap then comes from the |groups|-row
    * sketch table alone, never from re-scanning raw rows — at 100 TB
    * that's an audience-overlap / benchmark-contamination-rate matrix
    * for the cost of one pass plus a tiny pairwise self-join (the
    * joined table has one constant-size row per GROUP, so the
    * |groups|² pairing is control-plane work at any corpus scale).
    * Below ~2^lgK distinct values per group the theta sketch retains
    * every hash and the intersection estimate is EXACT — the gate
    * scale sits in that regime, which is what lets a boolean-bound
    * oracle hold tightly.
    */
  def audienceOverlap(df: DataFrame, groupCol: String, valueCol: String,
                      lgK: Int = 14): DataFrame = {
    val sk = df.groupBy(col(groupCol).as("g"))
      .agg(expr(s"theta_sketch_agg($valueCol, $lgK)").as("sk"))
    val a = sk.select(col("g").as("type_a"), col("sk").as("sk_a"))
    val b = sk.select(col("g").as("type_b"), col("sk").as("sk_b"))
    a.join(b, col("type_a") < col("type_b"))
      .select(col("type_a"), col("type_b"),
        expr("theta_sketch_estimate(theta_intersection(sk_a, sk_b))")
          .as("n_overlap_approx"))
  }

  /** Count-min sketch frequency estimates: `depth` hash rows ×
    * `width` counter slots, estimate(q) = min over rows of the
    * counter q hashes into — one-sided error (estimate ≥ true count,
    * overestimate ≤ εN w.h.p.), and the counter matrix MERGES by
    * cell-wise addition, which is why a 100 TB stream can keep a
    * depth×width grid per partition, partial-agg them together, and
    * answer any frequency query from d·w longs instead of a
    * |keys|-sized exact table. Hashes are md5-derived (row index
    * salted into the digest input), so the whole sketch — build and
    * probe — replays exactly in the SQL oracle.
    *
    * Returns one row per probed key: the estimate, the exact count,
    * and the (always ≥ 0) overestimate, so callers see the sketch's
    * honesty bound as data.
    */
  def cmsEstimates(df: DataFrame, keyCol: String,
                   depth: Int = 4, width: Int = 256): DataFrame = {
    val keyed = df.select(col(keyCol).cast("string").as("k"))
    def slot(r: Int, c: Column): Column =
      pmod(conv(substring(md5(concat(lit(r.toString), lit("|"), c)), 1, 8), 16, 10)
        .cast("long"), lit(width.toLong))
    // one pass builds all depth rows: explode each input row into its
    // depth (row, slot) cells; map-side combine shrinks every task to
    // ≤ depth·width rows before the shuffle
    val cells = keyed.select(explode(array(
        (0 until depth).map(r => struct(lit(r).as("r"), slot(r, col("k")).as("slot"))): _*))
        .as("cell"))
      .groupBy(col("cell.r").as("r"), col("cell.slot").as("slot"))
      .agg(count(lit(1)).as("cnt"))
    val probes = keyed.groupBy(col("k")).agg(count(lit(1)).as("exact"))
    val probeCells = probes.select(col("k"), col("exact"), explode(array(
        (0 until depth).map(r => struct(lit(r).as("r"), slot(r, col("k")).as("slot"))): _*))
        .as("cell"))
      .select(col("k"), col("exact"), col("cell.r").as("r"), col("cell.slot").as("slot"))
    probeCells.join(broadcast(cells), Seq("r", "slot"))
      .groupBy(col("k").as("key"), col("exact"))
      .agg(min(col("cnt")).as("estimate"))
      .select(col("key"), col("estimate"), col("exact"),
        (col("estimate") - col("exact")).as("overestimate"))
  }

  /** RFM customer segmentation: recency (days since the customer's
    * last order, measured from the corpus max date), frequency (order
    * count), monetary (exact scaled-long cents), each scored 1-5
    * against corpus-wide quintile breakpoints; segment =
    * r·100 + f·10 + m.
    *
    * Scale shape: one per-customer aggregate, then the breakpoints
    * are a ONE-ROW aggregate broadcast back (the sample_quality_cut
    * pattern) — never a global `ntile` window, which would funnel
    * every customer through a single partition. Scoring is map-only:
    * score = 1 + #breakpoints strictly below the value, so ties sit
    * on the LOW side of each boundary deterministically. The scored
    * table is repartitioned once so the breakpoint aggregate and the
    * scoring side consume the same exchange (ReuseExchange).
    *
    * Determinism (DuckDB oracle parity): recency/frequency are ints,
    * monetary is exact cents; breakpoints are `percentile` ↔
    * `quantile_cont` (the agg_percentiles-proven pairing) rounded to
    * 6 so boundary comparisons are engine-stable. Higher score =
    * better customer on every axis (recency inverts: recent = 5).
    */
  def rfmSegments(orders: DataFrame): DataFrame = {
    val maxD = orders.agg(max(to_date(col("o_orderdate"))).as("max_d"))
    val per = orders
      .groupBy(col("o_custkey"))
      .agg(max(to_date(col("o_orderdate"))).as("last_d"),
           count(lit(1)).as("frequency"),
           sum(round(col("o_totalprice") * 100, 0).cast("long")).as("cents"))
      .crossJoin(broadcast(maxD)) // 1-row scalar, not a cartesian
      .select(col("o_custkey"),
              datediff(col("max_d"), col("last_d")).cast("long").as("recency_days"),
              col("frequency"), col("cents"))
      .repartition(col("o_custkey"))
    def cutsOf(c: String) = Seq(0.2, 0.4, 0.6, 0.8).zipWithIndex.map {
      case (q, i) => round(expr(s"percentile($c, $q)"), 6).as(s"${c}_c$i")
    }
    val cuts = per.agg(cutsOf("recency_days").head,
      (cutsOf("recency_days").tail ++ cutsOf("frequency") ++ cutsOf("cents")): _*)
    def score(c: String): Column =
      (0 until 4).map(i => (col(c) > col(s"${c}_c$i")).cast("int"))
        .reduce(_ + _) + lit(1)
    per.crossJoin(broadcast(cuts))
      .select(col("o_custkey"),
              col("recency_days"), col("frequency"),
              round(col("cents") / 100.0, 2).as("monetary"),
              (lit(6) - score("recency_days")).cast("long").as("r_score"),
              score("frequency").cast("long").as("f_score"),
              score("cents").cast("long").as("m_score"))
      .withColumn("segment",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("long"))
  }

  /** HILL TAIL-INDEX estimator (Hill 1975) over the top-k order
    * statistics: α̂ = (k−1) / Σ_{i<k} ln(x_(i)/x_(k)) — HOW heavy the
    * upper tail is, the number the Gini/Lorenz and Zipf views imply
    * but don't estimate: α ≤ 2 means infinite variance (means of
    * per-key revenue stop converging — sampling and CI machinery
    * needs the robust path), α ≤ 1 means even the mean is infinite.
    * The standard diagnostic before trusting any average over a
    * revenue-like column.
    *
    * Determinism: the top-k is TakeOrdered by cents alone — ties at
    * the cut are value-equivalent (whichever tied row survives the
    * limit contributes the same ln(x/x_k), and ties AT the threshold
    * contribute ln(1) = 0), so no key tie-break is needed for a
    * deterministic output; each ln(x_i/x_k) rounds to 6 and scales to
    * an exact long before the sum (the zipfFit discipline); α̂ is one
    * division off those integers, rounded 6. Everything after the
    * TakeOrdered touches ≤ k rows.
    */
  def hillTailIndex(df: DataFrame, valueCol: String,
                    k: Int = 100): DataFrame = {
    require(k >= 3, s"need k >= 3 order statistics: $k")
    def d(c: Column) = c.cast("double")
    val top = df.select(round(col(valueCol) * 100, 0).cast("long").as("c"))
      .where(col("c") > 0)
      .orderBy(desc("c")).limit(k)
    val thr = top.agg(min(col("c")).as("xk"), count(lit(1)).as("n")) // ≤ k rows
    top.crossJoin(broadcast(thr))
      // threshold ties contribute ln(1) = 0 — exactly Hill's k−1 terms
      .select(col("n"), col("xk"),
        round(log(d(col("c")) / d(col("xk"))) * 1e6, 0).cast("long").as("l6"))
      .groupBy("n", "xk")
      .agg(sum(col("l6")).as("s6"))
      .select(col("n").as("k_used"),
        round(d(col("xk")) / 100.0, 2).as("threshold"),
        when(col("s6") > 0,
          round(d(col("n") - 1) / (d(col("s6")) / 1e6), 6)).as("alpha"),
        when(col("s6") > 0,
          round(d(col("s6")) / 1e6 / d(col("n") - 1), 6)).as("mean_excess_log"))
  }

  /** RFM SEGMENT MIGRATION — the CRM follow-up to [[rfmSegments]]:
    * score every customer in the FIRST and SECOND half of the order
    * history independently (quintile cuts recomputed per half — the
    * standard convention, segments are always relative to their
    * period) and count the (before, after) transitions, with
    * customers absent from a half reported as 'absent' (acquisitions
    * and churn are the matrix's most actionable cells, not noise to
    * drop). The per-period [[rfmSegments]] says who is valuable NOW;
    * the migration matrix says which way they are MOVING.
    *
    * Determinism: the period split is the [[graft.operators.Events
    * .diffInDiff]] integer midpoint; each half reuses
    * [[rfmSegments]]' exact counts/cents and round-6 percentile
    * cuts; the output is a bounded (≤ 126²) transition count table.
    */
  def rfmMigration(orders: DataFrame): DataFrame = {
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val base = orders.withColumn("ep",
      datediff(to_date(col("o_orderdate")), epoch0).cast("long"))
    val mm = base.agg(min(col("ep")).as("mn"), max(col("ep")).as("mx"))
    def half(pre: Boolean): DataFrame = {
      val cond =
        if (pre) col("ep") * 2 <= col("mn") + col("mx")
        else col("ep") * 2 > col("mn") + col("mx")
      rfmSegments(base.crossJoin(broadcast(mm)) // 1-row bounds
        .where(cond).drop("ep", "mn", "mx"))
    }
    val a = half(pre = true)
      .select(col("o_custkey"), col("segment").as("sa"))
    val b = half(pre = false)
      .select(col("o_custkey"), col("segment").as("sb"))
    a.join(b, Seq("o_custkey"), "full_outer")
      .groupBy(
        coalesce(col("sa").cast("string"), lit("absent")).as("seg_before"),
        coalesce(col("sb").cast("string"), lit("absent")).as("seg_after"))
      .agg(count(lit(1)).as("n_customers"))
  }

  /** EXACT heavy hitters with bounded per-task state: every key whose
    * frequency strictly exceeds N/(capacity+1), with its exact count.
    *
    * The scale problem this solves: a plain `groupBy(key).count()
    * .filter(...)` shuffles one row per DISTINCT key — at 100 TB with
    * a high-cardinality key that shuffle is the job. Here each input
    * partition runs a Misra-Gries summary with `capacity` counters
    * (constant memory, no shuffle), and only the surviving CANDIDATE
    * keys — at most capacity × partitions rows — are exactly
    * recounted in a second pass restricted by a broadcast semi-join,
    * so the only per-key shuffle is over candidates.
    *
    * Exactness (why the prefilter is result-invisible): Misra-Gries
    * with k counters retains every key whose local frequency exceeds
    * n_p/(k+1); a key with global count > N/(k+1) must, by
    * pigeonhole over Σn_p = N, exceed n_p/(k+1) in at least one
    * partition — so the candidate union is a SUPERSET of the true
    * heavy hitters and the exact recount + threshold filter recovers
    * precisely the groupBy answer (the oracle is the plain groupBy).
    * Counts are exact integers; no float anywhere.
    */
  def heavyHitters(df: DataFrame, keyCol: String, capacity: Int): DataFrame = {
    require(capacity >= 1, "capacity must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val keys = df.select(col(keyCol).cast("string").as("key"))
      .where(col("key").isNotNull)
    val cands = keys.as[String].mapPartitions { it =>
      val m = scala.collection.mutable.HashMap.empty[String, Long]
      it.foreach { x =>
        if (m.contains(x)) m(x) += 1L
        else if (m.size < capacity) m(x) = 1L
        else {
          // decrement-all step: drop every counter by 1, evict zeros
          val dead = scala.collection.mutable.ArrayBuffer.empty[String]
          m.foreach { case (k, v) => if (v == 1L) dead += k else m(k) = v - 1L }
          dead.foreach(m.remove)
        }
      }
      m.keysIterator
    }.toDF("key").distinct()
    val nTotal = keys.agg(count(lit(1)).as("n_total"))
    keys.join(broadcast(cands), Seq("key"), "left_semi")
      .groupBy("key").agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(nTotal)) // 1-row scalar, not a cartesian
      .where(col("cnt") * (capacity + 1) > col("n_total"))
      .select(col("key"), col("cnt"))
      .orderBy(desc("cnt"), asc("key"))
  }

  /** EXACT Gini coefficient of a positive integer metric (revenue
    * concentration, token-mass inequality): G = 2·Σᵢ i·x₍ᵢ₎/(n·Σx) −
    * (n+1)/n over the ascending-sorted values — the one-number
    * concentration audit behind "do 1% of customers carry 80% of
    * revenue" (pair it with [[Profiling.keySkew]], which shows the
    * top keys; this scores the whole curve).
    *
    * Distributed EXACT ranking with NO global window: values bucket
    * by range (integer-monotone mapping, so bucket order = value
    * order), ranks = bounded bucket-prefix offsets (global window
    * over the ≤`numBuckets`-row bucket table only) + a per-bucket
    * row_number — the [[Profiling.sequenceGaps]] two-phase
    * discipline. Σ rank·x accumulates in DECIMAL(38,0) (rank ≤ n
    * and cents overflow a long product at ~10⁹ rows; decimal sums
    * stay exact and order-independent in both engines). Ties rank
    * arbitrarily among equal values — Σ i·x is tie-invariant — but
    * the (x, id) order is pinned anyway so every engine walks the
    * same permutation.
    *
    * Scale shape: one scan → bucketed sort windows (parallel,
    * bucket-sized) → one 3-sum aggregate. The only global order is
    * over the bounded bucket table.
    */
  def giniCoefficient(df: DataFrame, idCol: String, valueCol: String,
                      numBuckets: Int = 1024): DataFrame = {
    def d(c: Column) = c.cast("double")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val ranked = rankByValue(df, idCol, valueCol, numBuckets)
    val g = ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("t"),
      sum(col("rk").cast(dec) * col("x").cast(dec)).as("s"))
    g.select(col("n"), col("t").as("total"),
      when(col("n") > 0 && col("t") > 0,
        round(lit(2.0) * d(col("s")) / (d(col("n")) * d(col("t")))
              - (d(col("n")) + 1.0) / d(col("n")), 6)).as("gini"))
  }

  /** Herfindahl–Hirschman concentration index per market:
    * HHI = Σᵢ shareᵢ² over each market's participants (1/n for
    * perfect competition, 1.0 for monopoly), with the effective-
    * competitor count 1/HHI — the per-market companion to the
    * global [[giniCoefficient]] curve (antitrust thresholds, vendor
    * concentration, and traffic-source dependence all read this
    * number).
    *
    * Determinism: participant masses are exact longs; each share²
    * computes factor-first in doubles and ×1e9-scales to a long
    * before the per-market sum (Σ share² ≤ 1, so the scaled sum
    * can't overflow) — aggregation-order-independent, the chi-square
    * discipline at higher precision because squares of small shares
    * live near 1e-6.
    *
    * Scale shape: two hash aggregates (participant, then market) and
    * a market-keyed broadcast of the bounded totals table. No
    * window.
    */
  def hhiByMarket(df: DataFrame, marketCol: String, participantCol: String,
                  valueCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val p = df.select(col(marketCol).as("m"), col(participantCol).as("p"),
        col(valueCol).cast("long").as("x"))
      .groupBy("m", "p").agg(sum(col("x")).as("c"))
    val tot = p.groupBy("m").agg(sum(col("c")).as("t"),
      count(lit(1)).as("n_participants"))
    val sq = round(d(col("c")) / d(col("t")) * (d(col("c")) / d(col("t"))) * 1e9, 0)
      .cast("long")
    p.join(broadcast(tot), Seq("m"))
      .select(col("m"), col("t"), col("n_participants"), sq.as("sq"))
      .groupBy("m", "t", "n_participants")
      .agg(round(sum(col("sq")) / 1e9, 6).as("hhi"))
      .select(col("m").as("market"), col("n_participants"),
        col("t").as("total"), col("hhi"),
        when(col("hhi") > 0, round(lit(1.0) / col("hhi"), 6))
          .as("effective_competitors"))
  }

  /** The shared distributed-exact-ranking core of [[giniCoefficient]]
    * and [[lorenzDeciles]]: ascending dense ranks over (value, id)
    * with NO global window — range buckets (monotone in value) + a
    * bounded bucket-prefix offset table + per-bucket row_numbers.
    * Returns (id, x, rk).
    */
  private def rankByValue(df: DataFrame, idCol: String, valueCol: String,
                          numBuckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val v = df.select(col(idCol).as("id"), col(valueCol).cast("long").as("x"))
      .where(col("x").isNotNull && col("x") >= 0)
    val mx = v.agg(max(col("x")).as("mx"))
    val b = v.crossJoin(broadcast(mx)) // 1-row scalar
      .withColumn("bucket",
        floor(d(col("x")) * numBuckets / (d(col("mx")) + 1.0)))
    val perBucket = b.groupBy("bucket").agg(count(lit(1)).as("cnt"))
    val wb = Window.orderBy("bucket") // bounded bucket table
    val offsets = perBucket.withColumn("off",
      coalesce(sum(col("cnt")).over(wb) - col("cnt"), lit(0L)))
    val wr = Window.partitionBy("bucket").orderBy("x", "id")
    b.join(broadcast(offsets.select("bucket", "off")), Seq("bucket"))
      .withColumn("rk", col("off") + row_number().over(wr))
      .select(col("id"), col("x"), col("rk"))
  }

  /** Lorenz curve at decile grain — [[giniCoefficient]]'s companion
    * that shows WHERE the concentration sits: keys sort ascending by
    * value, each decile reports its key count, its mass, and the
    * cumulative mass share ("the bottom 80% of customers carry 31%
    * of revenue"). Decile = ⌊(rank−1)·10/n⌋+1 — exact integer
    * arithmetic on the [[rankByValue]] ranks, so decile edges are
    * engine-identical.
    *
    * Scale shape: the ranking core (bucketed, no global window) +
    * one 10-row aggregate; the cumulative sum windows over the
    * bounded decile table only.
    */
  def lorenzDeciles(df: DataFrame, idCol: String, valueCol: String,
                    numBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val ranked = rankByValue(df, idCol, valueCol, numBuckets)
    val n1 = ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("t"))
    val dec = ranked.crossJoin(broadcast(n1)) // 1-row scalar
      .withColumn("decile",
        (floor(d((col("rk") - 1) * 10) / d(col("n"))) + 1).cast("long"))
      .groupBy("decile")
      .agg(count(lit(1)).as("n_keys"), sum(col("x")).as("mass"),
           max(col("t")).as("t"))
    val wd = Window.orderBy("decile") // ≤10-row table
    dec.withColumn("cum_mass", sum(col("mass")).over(wd))
      .select(col("decile"), col("n_keys"), col("mass"), col("cum_mass"),
        round(d(col("cum_mass")) / d(col("t")), 6).as("cum_share"))
  }

  /** 2-D skyline (Pareto frontier): the rows no other row strictly
    * dominates, minimizing `minCol` while maximizing `maxCol` — the
    * price/quality efficient frontier ("no part is both cheaper and
    * larger"). A row p is dominated iff some q has q.min ≤ p.min ∧
    * q.max ≥ p.max with at least one strict; ties on BOTH axes keep
    * both rows (neither strictly dominates).
    *
    * Distributed with NO global window and NO pair join — the
    * classic sort-filter skyline re-expressed in the [[rankByValue]]
    * bucket-prefix discipline. Factored per distinct `minCol` value
    * v: a row survives iff (a) its max equals bestAt(v) = max(maxCol
    * at v) and (b) bestAt(v) > Mlt(v) = max(maxCol over values < v).
    * Mlt comes from range buckets (monotone in v, so bucket order =
    * value order): a running max inside each bucket (parallel,
    * bucket-sized windows over the DISTINCT-value table) plus a
    * prefix-max over the bounded per-bucket-max table — exactness
    * doesn't depend on bucket boundaries, any monotone binning gives
    * the same Mlt. The frontier is then one equi-join back against
    * the full table; its size is data-bounded (≤ one value per
    * distinct minCol, anti-chain in practice), so AQE broadcasts it.
    *
    * Scale shape: one hash agg (distinct minCol), bucket-local
    * windows, a ≤numBuckets-row prefix broadcast, one join. The
    * oracle is the O(n²) NOT EXISTS dominance definition — exact and
    * engine-independent, viable at oracle scale only.
    */
  def skyline2D(df: DataFrame, idCol: String, minCol: String, maxCol: String,
                numBuckets: Int = 1024): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val v = df.select(col(idCol).as("id"), d(col(minCol)).as("v"),
        col(maxCol).cast("long").as("x"))
      .where(col("v").isNotNull && col("x").isNotNull)
    val pm = v.groupBy("v").agg(max(col("x")).as("best"))
    val bounds = pm.agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
    val b = pm.crossJoin(broadcast(bounds)) // 1-row scalar
      .withColumn("bucket", least(lit(numBuckets - 1), floor(
        (col("v") - col("mn")) * numBuckets / (col("mx") - col("mn") + lit(1e-9)))))
    val perBucket = b.groupBy("bucket").agg(max(col("best")).as("bmax"))
    val wb = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1) // bounded bucket table
    val offsets = perBucket.withColumn("pfx", max(col("bmax")).over(wb))
    val wr = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = b.join(broadcast(offsets.select("bucket", "pfx")), Seq("bucket"))
      .withColumn("mlt", greatest(coalesce(max(col("best")).over(wr), lit(Long.MinValue)),
        coalesce(col("pfx"), lit(Long.MinValue))))
      .where(col("best") > col("mlt"))
      .select(col("v").as("fv"), col("best").as("fbest"))
    v.join(frontier, col("v") === col("fv") && col("x") === col("fbest"))
      .select(col("id"), col("v").as("min_value"), col("x").as("max_value"))
      .orderBy("min_value", "id")
  }

  /** ABC / PARETO CLASSIFICATION — the inventory-management classic:
    * rank keys by revenue and class them A (the keys carrying the
    * first 80% of cumulative revenue), B (to 95%), C (the long
    * tail); effort follows the class (count A daily, C yearly). The
    * assortment-level summary [[graft.operators.Profiling]]'s Gini/
    * Lorenz curves describe but don't operationalize.
    *
    * Exactness: revenue masses are exact cents longs; the cumulative
    * share test is INTEGER (100·cum ≤ 80·total — no float share per
    * row), classed at the key whose interval CONTAINS the boundary
    * (the first key crossing 80% is still A — the standard
    * convention). The rank window runs over the key table (catalog-
    * bounded — |parts|, not |lineitem|), after the one corpus
    * aggregate.
    */
  def abcAnalysis(lineitem: DataFrame, keyCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val rev = lineitem.groupBy(col(keyCol).as("key"))
      .agg(moneySum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .withColumn("cents", round(col("revenue") * 100, 0).cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(desc("cents"), asc("key")) // catalog-bounded key table
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val tot = rev.agg(sum(col("cents")).as("t")) // 1-row scalar
    rev.withColumn("cum", sum(col("cents")).over(w))
      .withColumn("rnk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(desc("cents"), asc("key"))).cast("long"))
      .crossJoin(broadcast(tot))
      .select(col("rnk"), col("key"), col("revenue"),
        round(d(col("cum")) / d(col("t")), 6).as("cum_share"),
        when((col("cum") - col("cents")) * 100 < col("t") * 80, "A")
          .when((col("cum") - col("cents")) * 100 < col("t") * 95, "B")
          .otherwise("C").as("abc_class"))
  }

  /** EMPIRICAL-BAYES rate shrinkage (beta-binomial, method-of-moments
    * prior — the Efron & Morris "Stein's paradox in statistics"
    * workhorse): per-key success rates x/n are wildly overdispersed
    * at small n (an item returned 1-of-1 times is not a 100%-return
    * item); fit Beta(α, β) to the observed rate spread and report
    * the shrunk posterior mean (x + α)/(n + α + β), which pulls
    * small-n keys toward the pooled prior and leaves large-n keys
    * nearly alone. The standard leaderboard/rate-ranking fix before
    * sorting keys by a ratio.
    *
    * MoM prior off the unweighted per-key rate moments: m = mean(r),
    * v = population var(r), α+β = m(1−m)/v − 1, α = m(α+β). When the
    * spread carries no signal (v = 0, or v ≥ m(1−m) which would give
    * a negative concentration) the prior is undefined — keys then
    * report their raw rate and a null prior (documented, spec-pinned).
    *
    * Determinism: per-key x/n are exact longs; each rate rounds to 6
    * and scales to a long, so the moment sums are exact integers;
    * m, v, α, β, and every shrunk rate are fixed IEEE chains off
    * those integers, rounded 6. One key aggregate + one 1-row moment
    * fold broadcast back — two shuffles total, no windows.
    */
  def ebShrunkRates(df: DataFrame, keyCol: String, successCol: Column):
      DataFrame = {
    def d(c: Column) = c.cast("double")
    val per = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("n"),
        coalesce(sum(when(successCol, lit(1L)).otherwise(lit(0L))), lit(0L))
          .as("x"))
      .withColumn("r6", round(d(col("x")) / d(col("n")) * 1e6, 0).cast("long"))
    // s2 terms reach 1e12 each — a long sum wraps past ~9.2M keys, so
    // the squared moment accumulates as decimal(38,0) (the
    // clusteringCoefficient/isotropy discipline); s1 is safe to ~9e12
    // keys but rides along for symmetry.
    val mom = per.agg(count(lit(1)).as("k"),
      sum(col("r6").cast("decimal(38,0)")).as("s1"),
      sum((col("r6") * col("r6")).cast("decimal(38,0)")).as("s2"))
    val m = d(col("s1")) / d(col("k")) / 1e6
    val v = (d(col("k")) * d(col("s2")) - d(col("s1")) * d(col("s1"))) /
      (d(col("k")) * d(col("k"))) / 1e12
    val ab = m * (lit(1.0) - m) / v - 1.0
    val prior = mom.select(
      when(v > 0 && ab > 0, round(m * ab, 6)).as("alpha"),
      when(v > 0 && ab > 0, round((lit(1.0) - m) * ab, 6)).as("beta"))
    per.crossJoin(broadcast(prior)) // 1-row prior
      .select(col("key"), col("n"), col("x"),
        round(d(col("x")) / d(col("n")), 6).as("raw_rate"),
        when(col("alpha").isNotNull,
          round((d(col("x")) + col("alpha"))
            / (d(col("n")) + col("alpha") + col("beta")), 6))
          .otherwise(round(d(col("x")) / d(col("n")), 6)).as("shrunk_rate"),
        col("alpha"), col("beta"))
  }
}
