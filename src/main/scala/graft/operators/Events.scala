package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event-stream operators, written so the SAME transformation runs in
  * batch (DuckDB-oracleable) and under Structured Streaming (see
  * graft.streaming.StreamingEvents for the readStream twins +
  * watermarking). `window(ts, …)` and `dropDuplicates` are both
  * streaming-compatible; the batch forms here are what the driver's
  * correctness gate checks.
  */
object Events {

  /** Exact SHAPLEY-VALUE attribution (Zhao et al. 2018's coalition
    * formulation) — the game-theoretic companion to last-touch
    * ([[lastTouchAttribution]]) and Markov removal effects: the
    * coalition value v(S) counts conversions among users whose
    * channel-exposure set is contained in S, and each channel's
    * credit is its exact Shapley value φ_i = Σ_{S∌i}
    * |S|!(k−1−|S|)!/k! · (v(S∪{i}) − v(S)). Efficiency axiom
    * Σφ = v(all) − v(∅) comes out as the `share` denominator.
    *
    * Exactness: v is an integer count table; the factorial weights
    * multiply through by k! so every partial sum is exact integer
    * arithmetic — the single division by k! happens once at the end
    * (round 6). No sampling, no permutation Monte Carlo: with a
    * bounded channel set the 2^k lattice is enumerated outright.
    *
    * Scale shape: ONE pass over events (per-user conditional
    * aggregate, map-side combined) → a ≤2^k-row exposure-mask
    * histogram; the subset lattice, the v(S) subset-sum, and the
    * marginal-gain join are all ≤2^k·k-row broadcast control-plane
    * frames. 100 TB of events reduce to 2^k integers before any
    * lattice work happens.
    */
  def shapleyAttribution(events: DataFrame, channels: Seq[String],
                         conversionType: String): DataFrame = {
    require(channels.nonEmpty && channels.size <= 12,
      s"the exact 2^k lattice needs a bounded channel set: $channels")
    val k = channels.size
    def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)
    val flags = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("event_type") === c, 1L).otherwise(0L)) * (1L << i) }
    val users = events.groupBy("user_id")
      .agg(flags.reduce(_ + _).as("mask"),
        max(when(col("event_type") === conversionType, 1L).otherwise(0L))
          .as("conv"))
    val cells = users.groupBy("mask").agg(sum("conv").as("n_conv")) // ≤2^k rows
    val sp = events.sparkSession
    val subsets = sp.range(1L << k).select(col("id").as("s"))
    // v(S) = Σ converters with mask ⊆ S — a bounded lattice join
    val v = subsets.join(broadcast(cells),
        col("mask").bitwiseAND(col("s")) === col("mask"), "left")
      .groupBy("s").agg(coalesce(sum("n_conv"), lit(0L)).as("v"))
    import sp.implicits._
    val chan = channels.zipWithIndex
      .map { case (c, i) => (c, 1L << i) }.toDF("channel", "bit")
    val weight = (0 until k).foldLeft(lit(0L)) { case (acc, j) =>
      when(bit_count(col("s")) === j, lit(fact(j) * fact(k - 1 - j)))
        .otherwise(acc) }
    val gains = chan.crossJoin(v) // k·2^k bounded control plane
      .where(col("s").bitwiseAND(col("bit")) === 0)
      .join(v.select(col("s").as("s2"), col("v").as("v2")),
        col("s2") === col("s") + col("bit"))
      .groupBy("channel").agg(sum(weight * (col("v2") - col("v"))).as("num"))
    val total = v.where(col("s") === (1L << k) - 1)
      .select(col("v").as("v_all")) // 1-row scalar
      .crossJoin(v.where(col("s") === 0).select(col("v").as("v_none")))
    gains.crossJoin(broadcast(total))
      .select(col("channel"),
        round(col("num").cast("double") / fact(k).toDouble, 6).as("phi"),
        col("v_all"), col("v_none"),
        // efficiency: Σφ = v(all) − v(∅) — the share denominator
        when(col("v_all") - col("v_none") > 0,
          round(col("num").cast("double") / fact(k).toDouble
            / (col("v_all") - col("v_none")).cast("double"), 6)).as("share"))
  }

  /** Tumbling-window aggregate: count + exact money sum per
    * (window, event_type). In streaming this runs with a watermark and
    * incremental state; in batch it's a plain hash aggregate on the
    * truncated timestamp.
    */
  def tumblingAgg(events: DataFrame, windowExpr: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), windowExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Analytics.moneySum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** Hopping (sliding) window aggregate: `windowExpr`-wide windows
    * every `slideExpr`. Spark's `window()` expands each event into
    * window÷slide rows (an Expand node, not a self-join), then one
    * hash aggregate — the same plan Structured Streaming runs
    * incrementally with a watermark.
    */
  def hoppingAgg(events: DataFrame, windowExpr: String = "1 hour",
                 slideExpr: String = "30 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), windowExpr, slideExpr).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           Analytics.moneySum(col("value")).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
              col("n_events"), col("total_value"))
      .orderBy("window_start", "event_type")

  /** First-occurrence dedup per (user, event_type): streaming
    * `dropDuplicates` semantics expressed as a batch window (the
    * oracle-checkable form). Keeps the earliest event by (ts,
    * event_id).
    */
  def firstOccurrence(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    events
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"), col("ts"))
      .orderBy("user_id", "event_type")
  }

  /** Sessionization: a new session starts after `gapMinutes` of
    * inactivity per user. Classic lag + cumulative-sum session ids —
    * per-user windows, no global sort; the streaming twin is
    * `session_window(ts, gap)`.
    */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
           min(col("ts")).as("session_start"),
           max(col("ts")).as("session_end"))
      .orderBy("user_id", "session_id")
  }

  /** Per-EVENT session features — the sequence-model training prep
    * [[sessionize]]'s per-session aggregate cannot serve: each event
    * annotated with its session id, 1-based index within the session,
    * integer-ms offsets from session start and from the previous
    * event (null for session openers). Two user-keyed window passes
    * over the same sort order (Catalyst collapses them into one
    * sort); all arithmetic is exact integer milliseconds, so the
    * feature table hash-matches the SQL window replay.
    */
  def sessionFeatures(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val withSession = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySession = Window.partitionBy("user_id", "session_id")
      .orderBy("ts", "event_id")
    withSession
      .withColumn("idx_in_session", row_number().over(bySession).cast("long"))
      .withColumn("ms_since_start",
        unix_millis(col("ts")) -
          unix_millis(min(col("ts")).over(
            bySession.rowsBetween(Window.unboundedPreceding, Window.currentRow))))
      .withColumn("ms_since_prev",
        unix_millis(col("ts")) - unix_millis(lag(col("ts"), 1).over(bySession)))
      .select(col("event_id"), col("user_id"), col("session_id"),
              col("idx_in_session"), col("ms_since_start"), col("ms_since_prev"))
  }

  /** JSON prop extraction: schema-on-read over the string `props`
    * column (get_json_object → codegen'd path extraction, no UDF).
    */
  def extractProps(events: DataFrame): DataFrame =
    events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("prop_k"))
      .orderBy("event_id")

  /** Ordered funnel: per user, how many of `steps` completed in
    * SEQUENCE — step i+1 counts only when it occurs strictly after the
    * user's FIRST completion of step i (min-ts semantics, the standard
    * product-analytics funnel).
    *
    * Scale shape: one filtered aggregate per step, each an equi-join
    * on the high-cardinality user key against the (shrinking) set of
    * users who reached the previous step — steps are few and fixed,
    * users are many, so every stage distributes; no window over the
    * full event stream, no per-user event collection.
    */
  def funnel(events: DataFrame, steps: Seq[String],
             userCol: String = "user_id", typeCol: String = "event_type",
             tsCol: String = "ts"): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var reached = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t"))
      .withColumn("reached_step", lit(1L))
    // r14 depth guard: `reached` is consumed TWICE per step (eligible
    // + the left join), so the lazy plan references its input
    // 2^(steps−1) times. At the gates' ≤4 steps that laziness is
    // load-bearing — count-pruning eliminates the unique left joins —
    // but past it the doubling is a scale hazard (a 10-step funnel
    // would build a 512-reference plan). Deep funnels truncate the
    // lineage with a bounded per-user checkpoint each round (the
    // sessionFunnel discipline); this makes funnel() EAGER for
    // steps.size > 4, documented here as the contract.
    val checkpointRounds = steps.size > 4
    for ((st, i) <- steps.tail.zipWithIndex) {
      // only users who completed ALL previous steps can advance — a
      // user stuck at step k must not match later steps out of order
      val eligible = reached.where(col("reached_step") === (i + 1))
        .select(col(userCol), col("t"))
      val nxt = events.where(col(typeCol) === st)
        .select(col(userCol), col(tsCol).as("nts"))
        .join(eligible, Seq(userCol))
        .where(col("nts") > col("t"))
        .groupBy(col(userCol)).agg(min(col("nts")).as("_t2"))
      val prev = reached
      reached = reached.join(nxt, Seq(userCol), "left")
        .select(col(userCol),
          coalesce(col("_t2"), col("t")).as("t"),
          (col("reached_step") + when(col("_t2").isNotNull, 1L).otherwise(0L))
            .as("reached_step"))
      if (checkpointRounds) {
        reached = reached.localCheckpoint()
        if (i > 0) graft.operators.Graph.unpersistBacking(prev)
      }
    }
    if (checkpointRounds) {
      // deep-funnel exit: materialize the bounded per-user output and
      // release the last round's backing (the pageRank exit shape)
      val out = reached.select(col(userCol), col("reached_step"))
        .localCheckpoint()
      graft.operators.Graph.unpersistBacking(reached)
      out
    } else reached.select(col(userCol), col("reached_step"))
  }


  /** Strict funnel WITHIN sessions: the [[funnel]] step semantics
    * (each step strictly after the previous, no out-of-order credit)
    * evaluated per (user, session) instead of per user lifetime —
    * "did one visit carry view → click → purchase", the
    * conversion-UX readout a lifetime funnel overstates (a purchase
    * three weeks after the view is retention, not funnel flow).
    * Output: one row per step with the session count reaching ≥ it
    * and the share of step-1 sessions.
    *
    * Composition: session ids come from the [[sessionize]] gap rule;
    * the session key (user:session) then IS [[funnel]]'s user key —
    * the step machinery is reused verbatim, not re-implemented.
    * Scale shape: one user-partitioned window pass for session ids,
    * then funnel's per-step aggregates keyed by session; the
    * step-count fold runs on a ≤|steps|² bounded grid.
    */
  def sessionFunnel(events: DataFrame, steps: Seq[String],
                    gapMinutes: Int = 30): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val sess = events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_millis(col("ts")) - unix_millis(col("prev_ts")) > gapMinutes * 60000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("sk",
        concat_ws(":", col("user_id").cast("string"),
          col("session_id").cast("string")))
      // [[funnel]]'s reached table is consumed twice per step, so its
      // lazy plan references the input 2^(steps−1) times — for the
      // LIFETIME funnel gate that is free (count-pruning eliminates
      // the unique left joins), but THIS caller aggregates
      // reached_step values, so every copy re-ran the session window
      // pass (measured: 28 events scans / 86 Exchanges in the gate
      // plan — optimization r13). Materialize the sessionized table
      // once; funnel() itself stays lazy so the lifetime gate keeps
      // its pruning.
      .localCheckpoint()
    val reached = funnel(sess, steps, userCol = "sk")
    // ≤|steps| rows, consumed by every grid arm below — checkpoint so
    // the funnel fold runs once
    val counts = reached.groupBy("reached_step").agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val stepDf = events.sparkSession.range(1, steps.size + 1).toDF("step")
    val grid = stepDf.crossJoin(broadcast(counts)) // bounded × bounded
      .groupBy("step")
      .agg(coalesce(sum(when(col("reached_step") >= col("step"), col("n"))),
        lit(0L)).as("n_sessions"))
    val first = grid.where(col("step") === 1)
      .select(col("n_sessions").as("n1"))
    val out = grid.crossJoin(broadcast(first)) // 1-row scalar
      .select(col("step"), col("n_sessions"),
        when(col("n1") > 0, round(d(col("n_sessions")) / d(col("n1")), 6))
          .as("share_of_first"))
      .localCheckpoint() // bounded; lets sess/counts release below
    graft.operators.Graph.unpersistBacking(sess)
    graft.operators.Graph.unpersistBacking(counts)
    out
  }

  /** Cohort retention: users grouped by their first-seen date
    * (cohort), counted as retained on day k if active k days after
    * the cohort date. Two aggregates (first-seen, distinct active
    * days) and one user-keyed join — the classic retention matrix as
    * plain distributed relational ops, no per-user collection.
    */
  def retention(events: DataFrame, userCol: String = "user_id",
                tsCol: String = "ts", maxDays: Int = 30): DataFrame = {
    val firstSeen = events.groupBy(col(userCol))
      .agg(min(to_date(col(tsCol))).as("cohort_date"))
    val active = events
      .select(col(userCol), to_date(col(tsCol)).as("active_date")).distinct()
    active.join(firstSeen, Seq(userCol))
      .withColumn("day_offset", datediff(col("active_date"), col("cohort_date")).cast("long"))
      .where(col("day_offset") <= maxDays)
      .groupBy(col("cohort_date"), col("day_offset"))
      .agg(countDistinct(col(userCol)).as("n_users"))
  }

  /** Value-anomaly detection: events whose value sits more than
    * `zThreshold` standard deviations from their (event_type,
    * hour-of-day) cohort mean — the statistical outlier filter a
    * training-data pipeline runs before trusting numeric fields.
    *
    * The moments are EXACT scaled-long sums (value×100 as long, and
    * its square): associative integer arithmetic, so mean/variance
    * derive from identical numbers in any engine and the rounded
    * z-scores hash-match — no float-sum ordering luck. Shape: one
    * hash aggregate for the (type, hour) stats (tiny), one broadcast
    * join back onto the stream, map-only filter.
    */
  def valueAnomalies(events: DataFrame, zThreshold: Double = 3.0): DataFrame = {
    val scaled = events.select(
      col("event_id"), col("event_type"), hour(col("ts")).cast("long").as("hr"),
      col("value"), round(col("value") * 100, 0).cast("long").as("v100"))
    val stats = scaled.groupBy(col("event_type"), col("hr"))
      .agg(count(lit(1)).as("n"), sum(col("v100")).as("s1"),
           sum(col("v100") * col("v100")).as("s2"))
      .where(col("n") >= 2)
      .withColumn("mean", col("s1").cast("double") / (col("n") * 100.0))
      .withColumn("variance",
        (col("s2") / 10000.0 - (col("s1") / 100.0) * (col("s1") / 100.0) / col("n"))
          / (col("n") - 1))
      .where(col("variance") > 0)
    scaled
      .join(broadcast(stats.select(col("event_type"), col("hr"), col("mean"), col("variance"))),
            Seq("event_type", "hr"))
      .withColumn("z", round((col("value") - col("mean")) / sqrt(col("variance")), 6))
      .where(abs(col("z")) > zThreshold)
      .select(col("event_id"), col("event_type"), col("hr"), col("value"), col("z"))
  }

  /** Write the event table as a DATE-PARTITIONED lake layout
    * (`.../event_date=YYYY-MM-DD/part-*.parquet`) — the storage shape
    * a 100 TB event corpus actually lives in: every time-bounded query
    * afterwards partition-prunes to its date range at planning time
    * instead of scanning the history. Pair with a `ts`-range filter
    * that Catalyst rewrites onto `event_date`.
    */
  /** Per-user funnel step durations: for users who complete EVERY
    * step (the [[funnel]] sequencing — each step's first occurrence
    * strictly after the previous step's), the exact millisecond time
    * spent between consecutive steps plus the total. The
    * "where do users stall" follow-up to the funnel count.
    *
    * Scale shape: one min-aggregate + user-keyed join per step; each
    * stage's row count shrinks to the surviving cohort.
    */
  def funnelDurations(events: DataFrame, steps: Seq[String],
                      userCol: String = "user_id", typeCol: String = "event_type",
                      tsCol: String = "ts"): DataFrame = {
    require(steps.size >= 2, "funnelDurations needs at least two steps")
    var cur = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for (i <- 2 to steps.size) {
      val prevCols = (1 until i).map(j => col(s"t$j"))
      cur = events.where(col(typeCol) === steps(i - 1))
        .select(col(userCol), col(tsCol).as("_nts"))
        .join(cur, Seq(userCol))
        .where(col("_nts") > col(s"t${i - 1}"))
        .groupBy((col(userCol) +: prevCols): _*)
        .agg(min(col("_nts")).as(s"t$i"))
    }
    val gaps = (1 until steps.size).map(j =>
      (unix_millis(col(s"t${j + 1}")) - unix_millis(col(s"t$j")))
        .as(s"ms_${steps(j - 1)}_${steps(j)}"))
    val total = (unix_millis(col(s"t${steps.size}")) - unix_millis(col("t1")))
      .as("ms_total")
    cur.select((col(userCol) +: gaps) :+ total: _*)
  }

  /** First-order Markov transition matrix over event types: counts of
    * consecutive (from → to) pairs per user (lead window, event_id
    * tie-break) normalized into row-stochastic probabilities. The
    * "what do users do next" model behind path analysis; counts are
    * exact longs, so the divided probabilities hash-match.
    *
    * Scale shape: one user-keyed window shuffle, one hash aggregate
    * to |types|² rows, and a broadcast-size row-total join.
    */
  def transitionMatrix(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val pairs = events
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .where(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n_trans"))
    val totals = pairs.groupBy("from_type").agg(sum(col("n_trans")).as("n_from"))
    pairs.join(totals, "from_type")
      .select(col("from_type"), col("to_type"), col("n_trans"),
              round(col("n_trans") / col("n_from"), 6).as("prob"))
  }

  /** STATIONARY DISTRIBUTION of the event-type Markov chain — π with
    * πP = π, by synchronous power iteration over the
    * [[transitionMatrix]] probabilities: where the chain SETTLES,
    * independent of where users start (the long-run share of
    * attention each state claims), next to [[transitionMatrix]]'s
    * one-step view and the absorption family's hitting analysis. The
    * fixture chain is irreducible (every observed type reaches every
    * other), so the limit exists and the truncated iterate is gated
    * exactly — the oracle replays the same `rounds`.
    *
    * Determinism: the [[graft.operators.Graph.pageRank]] contract —
    * [[transitionMatrix]]'s round-6 probs, per-round mass terms
    * round-9-scaled to exact longs before the sum, uniform start
    * 1/|states| round-9.
    * The state space is the bounded type set (control-plane sized);
    * every round is one join + one hash aggregate on it.
    */
  def markovSteadyState(events: DataFrame, rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1: $rounds")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val tm = transitionMatrix(events)
      .select(col("from_type"), col("to_type"), col("prob"))
      .localCheckpoint()
    val states = tm.select(col("from_type").as("state")).distinct()
      .union(tm.select(col("to_type").as("state")).distinct())
      .distinct()
    val n1 = states.agg(count(lit(1)).as("n")) // 1-row scalar
    var pi = states.crossJoin(broadcast(n1))
      .select(col("state"), round(lit(1.0) / d(col("n")), 9).as("pi"))
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val prev = pi
      pi = tm.join(prev.select(col("state").as("from_type"), col("pi")),
          "from_type")
        .select(col("to_type").as("state"),
          round(round(col("pi") * col("prob"), 9) * 1e9, 0).cast("long")
            .as("m9"))
        .groupBy("state").agg(round(sum(col("m9")) / 1e9, 9).as("pi"))
        .localCheckpoint()
      graft.operators.Graph.unpersistBacking(prev)
    }
    val out = pi.select(col("state"), round(col("pi"), 6).as("stationary_prob"))
      .localCheckpoint()
    graft.operators.Graph.unpersistBacking(pi)
    graft.operators.Graph.unpersistBacking(tm)
    out
  }

  /** ENTROPY RATE of the event-type Markov chain — H = −Σ_s π_s Σ_t
    * p_st log₂ p_st, the information-theoretic summary of how
    * PREDICTABLE user behavior is (0 bits = deterministic next
    * action; log₂|states| = uniform chaos). The per-state conditional
    * entropies H_s say WHERE the unpredictability lives; the
    * π-weighted rate is the one number (Shannon 1948's source rate,
    * with the stationary mix from [[markovSteadyState]]).
    *
    * Determinism: [[transitionMatrix]]'s round-6 probs; each
    * −p·ln p/ln 2 term rounds to 9 and ×1e9-scales to an exact long
    * before its sum (the zipfFit discipline — a 1-ulp cross-engine ln
    * difference dies at round-9); ln 2 is a pinned literal, never
    * each engine's log2; π enters at its published round-6; the rate
    * folds round-9 products through a long sum. States with no
    * out-transitions carry H_s = 0. All bounded-table work after the
    * one corpus window pass both inputs already share.
    */
  def markovEntropyRate(events: DataFrame, rounds: Int): DataFrame = {
    val ln2 = 0.6931471805599453
    val tm = transitionMatrix(events)
      .select(col("from_type"), col("prob"))
      .localCheckpoint() // shared with the steady-state pass upstream
    val hs = tm
      .withColumn("t9", round(round(-col("prob") * log(col("prob")) / ln2, 9)
        * 1e9, 0).cast("long"))
      .groupBy(col("from_type").as("state"))
      .agg(round(sum(col("t9")) / 1e9, 6).as("h_state_bits"))
    val contrib = markovSteadyState(events, rounds)
      .join(hs, Seq("state"), "left")
      .select(col("state"), col("stationary_prob"),
        coalesce(col("h_state_bits"), lit(0.0)).as("h_state_bits"))
      .withColumn("c9", round(round(col("stationary_prob")
        * col("h_state_bits"), 9) * 1e9, 0).cast("long"))
    val tot = contrib.agg(round(sum(col("c9")) / 1e9, 6).as("entropy_rate_bits"))
    contrib.crossJoin(broadcast(tot)) // 1-row scalar
      .select(col("state"), col("stationary_prob"), col("h_state_bits"),
        col("entropy_rate_bits"))
  }

  /** GROWTH ACCOUNTING — the daily active-user decomposition every
    * growth review runs (new + retained + resurrected = today's DAU;
    * churned = yesterday's actives who didn't return): per day,
    * new = first-ever-seen today, retained = also active yesterday,
    * resurrected = back after a gap, churned = active yesterday but
    * not today (attributed to TODAY, the day the loss shows). DAU
    * alone hides whether growth is acquisition or resurrection
    * masking churn — this is the decomposition that shows it.
    *
    * Scale shape: distinct (user, day) once; "active yesterday" is a
    * user-keyed self-join on (user, day−1) — co-partitioned, fan-out
    * 1; first-day is one user aggregate; everything rolls up to
    * |days| rows. Exact integer counts, identity n_active = n_new +
    * n_retained + n_resurrected by construction.
    */
  def growthAccounting(events: DataFrame): DataFrame = {
    val ud = events.select(col("user_id"), to_date(col("ts")).as("day"))
      .distinct()
      .localCheckpoint() // three consumers: first-day, today, yesterday
    val firstDay = ud.groupBy("user_id").agg(min(col("day")).as("first_day"))
    val withPrev = ud
      .join(firstDay, "user_id")
      .join(ud.select(col("user_id"), date_add(col("day"), 1).as("day"),
          lit(1).as("was_active")),
        Seq("user_id", "day"), "left")
    val act = withPrev.groupBy("day").agg(
      count(lit(1)).as("n_active"),
      sum(when(col("day") === col("first_day"), 1L).otherwise(0L)).as("n_new"),
      sum(when(col("was_active").isNotNull, 1L).otherwise(0L)).as("n_retained"),
      sum(when(col("day") =!= col("first_day") && col("was_active").isNull,
        1L).otherwise(0L)).as("n_resurrected"))
    // churned(d) = active(d−1) − retained(d): yesterday's actives who
    // didn't come back — computed on the bounded day table. FULL outer
    // join so a day where EVERYONE went inactive (no events at all)
    // still reports its churn as a zero-active row — a left join would
    // silently drop churn across activity gaps.
    val churn = act.select(date_add(col("day"), 1).as("day"),
      col("n_active").as("n_active_prev"))
    act.join(churn, Seq("day"), "full_outer")
      .select(col("day"),
        coalesce(col("n_active"), lit(0L)).as("n_active"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"),
        coalesce(col("n_resurrected"), lit(0L)).as("n_resurrected"),
        (coalesce(col("n_active_prev"), lit(0L))
          - coalesce(col("n_retained"), lit(0L))).as("n_churned"))
  }

  /** USER-ACQUISITION GROWTH CURVE — cumulative distinct users by
    * day: each user counts once, on their FIRST-seen day, and the
    * running total is the "total users" chart every growth dashboard
    * leads with. Computed scalably: the corpus collapses to one
    * first-day row per user (a user-keyed aggregate), shrinks to
    * per-day acquisition counts, and only the BOUNDED day table rides
    * the cumulative window — a global window over days is
    * calendar-sized, never data-sized. Exact integer counts.
    */
  def cumulativeUsers(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy(col("user_id"))
      .agg(min(to_date(col("ts"))).as("day"))
    val perDay = firstDay.groupBy("day").agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy("day") // ≤|days| rows — control-plane window
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perDay.withColumn("n_cumulative", sum(col("n_new")).over(w))
      .select(col("day"), col("n_new"), col("n_cumulative"))
  }

  /** BTYD (buy-till-you-die) SUMMARY TABLE — the canonical
    * BG/NBD / Pareto-NBD model input (Fader, Hardie & Lee 2005),
    * one row per customer: x = repeat-purchase count (first purchase
    * is the birth, not a repeat), t_x = recency in days (birth →
    * last purchase), T = age in days (birth → end of observation =
    * the corpus max purchase date), plus monetary_value = mean
    * repeat-purchase value (the Gamma-Gamma companion input, null
    * for zero-repeat customers by convention). Every CLV stack
    * aggregates the raw event log down to exactly this frame before
    * any likelihood is fit — the reduction IS the distributed work;
    * the fit runs on |customers| rows.
    *
    * Determinism: exact integer day diffs off event dates; money
    * through exact cents (mean = exact-sum-then-divide, round 6).
    * One user-keyed aggregate + one 1-row horizon broadcast.
    */
  def btydSummary(events: DataFrame,
                  conversionType: String = "purchase"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val p = events.where(col("event_type") === conversionType)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val horizon = p.agg(max(col("day")).as("obs_end")) // 1-row scalar
    val per = p.groupBy("user_id")
      .agg(count(lit(1)).as("n_purchases"),
        min(col("day")).as("birth"), max(col("day")).as("last"),
        sum(col("cents")).as("sum_cents"),
        // repeat money: total minus the FIRST purchase's cents (min
        // (day, cents) struct — deterministic first-day tie-break to
        // the cheapest purchase, documented)
        min(struct(col("day"), col("cents"))).getField("cents").as("first_cents"))
    per.crossJoin(broadcast(horizon))
      .select(col("user_id"),
        (col("n_purchases") - 1).as("x"),
        datediff(col("last"), col("birth")).cast("long").as("t_x"),
        datediff(col("obs_end"), col("birth")).cast("long").as("t_age"),
        when(col("n_purchases") > 1,
          round((d(col("sum_cents")) - d(col("first_cents"))) / 100.0
            / d(col("n_purchases") - 1), 6)).as("monetary_value"))
  }

  /** CO-ENGAGEMENT overlap matrix between event types — which
    * behaviors share an audience: for every type pair, the exact
    * count of users doing BOTH, the Jaccard overlap of the two
    * audiences, and the lift against independence
    * (n_both·N / (n_a·n_b) — > 1 means the behaviors attract the
    * same users). The audience-planning view next to
    * [[transitionMatrix]]'s sequential view: transitions need the
    * events to be ADJACENT, overlap only needs them to share a user.
    *
    * Scale shape: the corpus shrinks ONCE to distinct (user, type);
    * the pair join is user-keyed (co-partitioned self-join, fan-out
    * bounded by types-per-user ≤ |types|); everything after
    * aggregates to ≤|types|² rows. Exact counts; ratios are single
    * round-6 divisions.
    */
  def typeOverlapMatrix(events: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val ut = events.select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint() // feeds totals AND the pair join
    val tot = ut.groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("n"))
    val nAll = ut.agg(countDistinct(col("user_id")).as("n_users")) // 1-row
    ut.select(col("user_id"), col("event_type").as("type_a"))
      .join(ut.select(col("user_id"), col("event_type").as("type_b")), "user_id")
      .where(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
      .join(broadcast(tot.select(col("event_type").as("type_a"), col("n").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(tot.select(col("event_type").as("type_b"), col("n").as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(nAll)) // 1-row scalar
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        round(d(col("n_both")) / (d(col("n_a")) + d(col("n_b")) - d(col("n_both"))), 6)
          .as("jaccard"),
        round(d(col("n_both")) * d(col("n_users"))
          / (d(col("n_a")) * d(col("n_b"))), 6).as("lift"))
  }

  /** Per-user inter-arrival cadence: millisecond gaps between
    * consecutive events (event_id tie-break on equal timestamps so
    * the lag — and therefore every gap — is deterministic), reduced
    * to count / mean / min / max per user. Gaps are exact integer
    * milliseconds, and avg over longs is exact-sum-then-divide in
    * both engines, so the rounded mean hash-matches.
    *
    * Scale shape: one window shuffle on the high-cardinality user
    * key, then a hash aggregate that shrinks to |users| rows —
    * engagement cadence over 100 TB of events costs one shuffle.
    */
  def interArrival(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .select(col("user_id"), col("event_id"), col("ts"),
              unix_millis(col("ts")).as("ms"))
      .withColumn("gap_ms", col("ms") - lag(col("ms"), 1).over(w))
      .where(col("gap_ms").isNotNull)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
           round(avg(col("gap_ms")), 6).as("mean_gap_ms"),
           min(col("gap_ms")).as("min_gap_ms"),
           max(col("gap_ms")).as("max_gap_ms"))
  }

  def writeDatePartitioned(events: DataFrame, path: String,
                           tsCol: String = "ts"): Unit =
    events.withColumn("event_date", to_date(col(tsCol)))
      .write.mode("overwrite").partitionBy("event_date").parquet(path)

  /** [[writeDatePartitioned]] only when the layout isn't already on
    * disk — repeated callers (bench warm runs) measure the pruned
    * READ, the steady state the layout exists for.
    */
  def ensureDatePartitioned(events: DataFrame, path: String,
                            tsCol: String = "ts"): Unit = {
    if (!Markers.exists(s"$path/_SUCCESS"))
      writeDatePartitioned(events, path, tsCol)
  }

  /** Small-file compaction over a partitioned lake — the OPTIMIZE
    * pass every streaming/daily ingest needs: each micro-batch or
    * cron append drops another file into the day's partition until
    * scans drown in open/seek overhead (the classic 100 TB
    * small-file problem). Every partition whose directory holds at
    * least `minFiles` files AND totals at most `targetBytes` is
    * rewritten as ONE file; larger partitions are left alone (they
    * are not the problem this pass solves).
    *
    * Shape: the survey is pure FILE METADATA (one control-plane
    * listing — no data job decides what to compact); the rewrite is
    * one job reading ONLY the affected partitions (partition-pruned)
    * and hash-repartitioning by the partition column, so each
    * affected day lands in one task → one file, written via dynamic
    * partition overwrite. Untouched partitions stay byte-identical
    * (spec-proven). Same `_SUCCESS` marker dance as [[eraseUsers]]:
    * removed before the first mutation, restored as the commit
    * point. Content is bit-preserved — compaction must be
    * result-invisible, which is exactly what the oracle checks.
    *
    * Returns the compacted partition values (control-plane, for the
    * caller's audit log).
    */
  def compactSmallPartitions(spark: org.apache.spark.sql.SparkSession,
                             path: String, partCol: String = "event_date",
                             targetBytes: Long = 128L * 1024 * 1024,
                             minFiles: Int = 2): Seq[String] = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(root).filter(st =>
      st.isDirectory && st.getPath.getName.startsWith(s"$partCol="))
    val affected = parts.flatMap { st =>
      val files = fs.listStatus(st.getPath)
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      if (files.length >= minFiles && files.map(_.getLen).sum <= targetBytes)
        Some(st.getPath.getName.stripPrefix(s"$partCol="))
      else None
    }.sorted.toSeq
    if (affected.isEmpty) return affected
    val dates = affected.map(java.sql.Date.valueOf)
    val rows = spark.read.parquet(path)
      .where(col(partCol).isin(dates: _*)) // partition-pruned
      .localCheckpoint() // materialize BEFORE mutating what we read
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"), false)
    rows
      .repartition(col(partCol)) // one task per day → one file per day
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(partCol).parquet(path)
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"), true).close()
    graft.operators.Graph.unpersistBacking(rows)
    affected
  }

  /** Right-to-be-forgotten over the date-partitioned event lake:
    * delete every row of the given users by REWRITING ONLY the
    * event_date partitions that contain them. The GDPR/CCPA erasure
    * path a 100 TB lake actually runs — a naive `filter + overwrite
    * the lake` rewrites every byte; this rewrites the affected days
    * and leaves every other partition's files physically untouched
    * (spec-proven byte-identical).
    *
    * Shape: one full-lake predicate scan finds the affected days
    * (the lake is partitioned by date, not user — unavoidable
    * without a user→day index, and it's a column-pruned scan of two
    * columns); the surviving rows of ONLY those days (partition-
    * pruned read) rewrite via dynamic partition overwrite; days the
    * erasure EMPTIES are deleted explicitly — dynamic overwrite
    * skips partitions absent from the written data (the
    * appendBm25Delta lesson). Crash safety: the lake's `_SUCCESS`
    * is removed before the first mutation; the overwrite job's
    * committer restores it on success, so a half-erased lake is
    * detectably marker-less rather than silently servable.
    */
  def eraseUsers(spark: org.apache.spark.sql.SparkSession, path: String,
                 userIds: Seq[Long], userCol: String = "user_id"): Unit = {
    if (userIds.isEmpty) return
    val affected = spark.read.parquet(path)
      .where(col(userCol).isin(userIds: _*))
      .select("event_date").distinct()
      .collect().map(_.getDate(0)) // control-plane: ≤ |days in lake|
    if (affected.isEmpty) return
    val remaining = spark.read.parquet(path)
      .where(col("event_date").isin(affected.toSeq: _*)) // partition-pruned
      // NULL-user rows are NOT erasure targets — a bare NOT IN would
      // null out and silently delete them
      .where(col(userCol).isNull || !col(userCol).isin(userIds: _*))
      .localCheckpoint() // materialize BEFORE mutating what we read
    val written = remaining.select("event_date").distinct()
      .collect().map(_.getDate(0)).toSet
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"), false)
    affected.filterNot(written).foreach { d =>
      val dir = new org.apache.hadoop.fs.Path(s"$path/event_date=$d")
      if (fs.exists(dir)) fs.delete(dir, true)
    }
    remaining
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(path)
    // the dynamic-overwrite committer does not rewrite the root
    // marker — restore it explicitly as the commit point
    fs.create(new org.apache.hadoop.fs.Path(s"$path/_SUCCESS"), true).close()
    graft.operators.Graph.unpersistBacking(remaining)
  }

  /** Funnel CONVERSION summary — the per-step aggregate every product
    * dashboard draws over [[funnel]]'s per-user table: users reaching
    * each step, step-over-step conversion, and overall conversion
    * from step 1. The heavy work is the funnel itself; this adds one
    * explode + one ≤|steps|-row aggregate, and the rank window runs
    * on that constant-size table (single partition by construction,
    * like RRF fusion — never corpus-sized).
    */
  def funnelRates(events: DataFrame, steps: Seq[String],
                  userCol: String = "user_id", typeCol: String = "event_type",
                  tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val reached = funnel(events, steps, userCol, typeCol, tsCol)
    val perStep = reached
      .select(explode(sequence(lit(1L), col("reached_step"))).as("step"))
      .groupBy("step").agg(count(lit(1)).as("n_users"))
    val w = Window.orderBy("step")
    perStep
      .withColumn("step_name",
        element_at(array(steps.map(lit): _*), col("step").cast("int")))
      .withColumn("conv_from_prev", round(
        col("n_users") / coalesce(lag(col("n_users"), 1).over(w), col("n_users")), 6))
      .withColumn("overall", round(
        col("n_users") / first(col("n_users")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)), 6))
      .select("step", "step_name", "n_users", "conv_from_prev", "overall")
  }

  /** Last-touch attribution: every `conversionType` event credits its
    * value to the LATEST preceding `touchTypes` event by the same user
    * within `lookbackMs` — conversions with no in-window touch go to
    * the 'direct' channel. One window pass per user carries the last
    * touch (type, ms) forward (the as-of-join shape: `last(_,
    * ignoreNulls)` over a running frame ordered by (ts, event_id)),
    * then conversions aggregate per channel — ONE shuffle on user_id
    * plus the channel-cardinality aggregate, linear at any scale;
    * never a per-conversion lookback self-join (quadratic in events
    * per user).
    */
  def lastTouchAttribution(events: DataFrame, touchTypes: Seq[String],
                           conversionType: String,
                           lookbackMs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isTouch = col("event_type").isin(touchTypes: _*)
    events
      .withColumn("touch_type",
        last(when(isTouch, col("event_type")), ignoreNulls = true).over(w))
      .withColumn("touch_ms",
        last(when(isTouch, unix_millis(col("ts"))), ignoreNulls = true).over(w))
      .where(col("event_type") === conversionType)
      .select(
        when(col("touch_ms").isNotNull &&
             unix_millis(col("ts")) - col("touch_ms") <= lookbackMs,
             col("touch_type")).otherwise(lit("direct")).as("channel"),
        col("value"))
      .groupBy("channel")
      .agg(count(lit(1)).as("n_conversions"),
           Analytics.moneySum(col("value")).as("revenue"))
  }

  /** Complex-event-pattern match — "A then B within `windowMs`, with
    * NO `absentType` event in between": for each `thenType` event,
    * the most recent `firstType` strictly before it (in the
    * (ts, event_id) total order) matches iff it falls inside the
    * window AND no blocking event occurred after that `firstType`.
    * The NEGATION is what distinguishes CEP from [[funnel]] /
    * [[lastTouchAttribution]] — "purchase after click unless an
    * error intervened" cannot be written as a step sequence.
    *
    * One user-keyed window pass computes all three "most recent
    * before me" columns under a single sort (the attribution
    * discipline) — never a self-join of the corpus against itself.
    * Blocking compares timestamps only (an absent-type event at the
    * exact ts of the match start does not block), so the semantics
    * are frame-order-independent and the oracle replays them
    * bit-for-bit with exact integer ms.
    */
  def cepPattern(events: DataFrame, firstType: String, thenType: String,
                 absentType: String, windowMs: Long): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("a_id", last(
        when(col("event_type") === firstType, col("event_id")),
        ignoreNulls = true).over(w))
      .withColumn("a_ms", last(
        when(col("event_type") === firstType, unix_millis(col("ts"))),
        ignoreNulls = true).over(w))
      .withColumn("x_ms", last(
        when(col("event_type") === absentType, unix_millis(col("ts"))),
        ignoreNulls = true).over(w))
      .where(col("event_type") === thenType &&
             col("a_ms").isNotNull &&
             unix_millis(col("ts")) - col("a_ms") <= windowMs &&
             (col("x_ms").isNull || col("x_ms") <= col("a_ms")))
      .select(col("user_id"), col("a_id").as("first_id"),
              col("event_id").as("then_id"),
              (unix_millis(col("ts")) - col("a_ms")).as("gap_ms"))
  }

  /** A/B test on a continuous metric: variant = user_id mod 2 (in
    * production, the hash-bucket assignment), the metric is the
    * `value` of each `metricType` event, and the output is ONE row of
    * per-variant counts, means, and the Welch z-statistic
    * (mean_a − mean_b) / √(var_a/n_a + var_b/n_b) with its
    * |z| > 1.96 verdict.
    *
    * Determinism contract ([[Profiling.profileNumeric]]'s): moments
    * accumulate as EXACT decimal(38,0) sums of values scaled by
    * `scale`, so no float-summation-order drift; means/variances are
    * then ONE fixed IEEE double expression each, mirrored term-for-
    * term in the SQL twin and rounded to 6 — the z-statistic itself
    * is oracle-checked, not boolean-bounded. A two-PROPORTION test
    * would degenerate here (every fixture user converts); a mean
    * test cannot saturate.
    *
    * Scale shape: one filter + 1-row conditional aggregate over the
    * metric events (map-side partial sums) — no window, no join, one
    * shuffle carrying a single row of moments.
    */
  def abTest(events: DataFrame, metricType: String,
             scale: Int = 100): DataFrame = {
    val sc = scale.toDouble
    val m = events.where(col("event_type") === metricType)
      .select(pmod(col("user_id"), lit(2L)).as("variant"),
              round(col("value") * scale, 0).cast("decimal(38,0)").as("v"))
    val stats = m.agg(
      sum(when(col("variant") === 0, lit(1L)).otherwise(lit(0L)))
        .cast("long").as("n_a"),
      sum(when(col("variant") === 0, col("v"))).as("_s1a"),
      sum(when(col("variant") === 0, col("v") * col("v"))).as("_s2a"),
      sum(when(col("variant") === 1, lit(1L)).otherwise(lit(0L)))
        .cast("long").as("n_b"),
      sum(when(col("variant") === 1, col("v"))).as("_s1b"),
      sum(when(col("variant") === 1, col("v") * col("v"))).as("_s2b"))
    def mean(s1: Column, n: Column) = s1.cast("double") / (n * sc)
    def variance(s1: Column, s2: Column, n: Column) =
      (s2.cast("double") / (sc * sc) -
        (s1.cast("double") / sc) * (s1.cast("double") / sc) / n) / (n - 1)
    val vA = variance(col("_s1a"), col("_s2a"), col("n_a"))
    val vB = variance(col("_s1b"), col("_s2b"), col("n_b"))
    val z = (mean(col("_s1a"), col("n_a")) - mean(col("_s1b"), col("n_b"))) /
      sqrt(vA / col("n_a") + vB / col("n_b"))
    stats.select(
      col("n_a"), col("n_b"),
      round(mean(col("_s1a"), col("n_a")), 6).as("mean_a"),
      round(mean(col("_s1b"), col("n_b")), 6).as("mean_b"),
      round(z, 6).as("z_score"),
      (abs(z) > lit(1.96)).as("significant"))
  }

  /** GROUP-SEQUENTIAL A/B monitoring (Pocock 1977) — the "peeking
    * problem" fix: an experimenter who tests at α = 0.05 after every
    * day of data will false-positive far above 5% over the campaign;
    * group-sequential designs spend the error budget across K
    * interim looks by testing each against a HIGHER constant
    * boundary `zCrit`. One look per day: cumulative two-proportion
    * z of the `convType` conversion rate between the user-parity
    * arms ([[abTest]]'s assignment), the boundary verdict, and the
    * running has-stopped flag (first boundary crossing ends the
    * experiment; later rows report what a still-running monitor
    * would show). zCrit is policy — Pocock's constant for K daily
    * looks at α = 0.05 (≈2.8 at K ≈ 60); callers pass their design's
    * value.
    *
    * Exactness: per-day arm counts are exact longs from one
    * conditional aggregate; cumulative counts are integer window
    * sums; each look's z is one fixed IEEE chain off those integers,
    * rounded 6. The cumulative windows run on the |days|-row look
    * table (bounded, control-plane sized) — never on the corpus.
    */
  def sequentialMonitor(events: DataFrame, convType: String,
                        zCrit: Double): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val daily = events.select(to_date(col("ts")).as("day"),
        pmod(col("user_id"), lit(2L)).as("variant"),
        (col("event_type") === convType).cast("long").as("x"))
      .groupBy("day").agg(
        sum(when(col("variant") === 0, lit(1L)).otherwise(lit(0L))).as("dn_a"),
        coalesce(sum(when(col("variant") === 0, col("x"))), lit(0L)).as("dx_a"),
        sum(when(col("variant") === 1, lit(1L)).otherwise(lit(0L))).as("dn_b"),
        coalesce(sum(when(col("variant") === 1, col("x"))), lit(0L)).as("dx_b"))
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = daily.select(col("day"), // |days|-row table: bounded window
      sum(col("dn_a")).over(w).as("n_a"), sum(col("dx_a")).over(w).as("x_a"),
      sum(col("dn_b")).over(w).as("n_b"), sum(col("dx_b")).over(w).as("x_b"))
    val pA = d(col("x_a")) / d(col("n_a"))
    val pB = d(col("x_b")) / d(col("n_b"))
    val pp = (d(col("x_a")) + d(col("x_b"))) / (d(col("n_a")) + d(col("n_b")))
    val se = sqrt(pp * (lit(1.0) - pp)
      * (lit(1.0) / d(col("n_a")) + lit(1.0) / d(col("n_b"))))
    val looks = cum
      .withColumn("z", when(col("n_a") > 0 && col("n_b") > 0 && se > 0,
        round((pA - pB) / se, 6)))
      .withColumn("significant",
        coalesce(abs(col("z")) >= zCrit, lit(false)))
    looks.withColumn("stopped",
      max(col("significant").cast("int")).over(w) === 1)
  }

  /** Event-study curve for the [[diffInDiff]] design: the per-day
    * treated-vs-control gap relative to its PRE-period baseline,
    *   effect_d = (ȳ_T,d − ȳ_C,d) − (ȳ_T,pre − ȳ_C,pre),
    * one row per day — the diagnostic that makes a DiD credible
    * (pre-period effects should hover near zero = parallel trends;
    * post-period effects show the dynamic response, not just the
    * pooled average). Same integer split (2·day > min+max), same
    * treated = even user_id.
    *
    * Exactness: per-(day, arm) masses are exact longs from ONE
    * conditional aggregate keyed by day; the baseline is a 1-row
    * broadcast of the pre-period sums; every mean is a single IEEE
    * division in pinned order, rounded 6.
    */
  def eventStudy(events: DataFrame,
                 eventType: String = "purchase"): DataFrame = {
    def d(c: Column) = c.cast("double")
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val base = events.where(col("event_type") === eventType)
      .select(col("user_id"), to_date(col("ts")).as("day"),
        datediff(to_date(col("ts")), epoch0).cast("long").as("ep"),
        round(col("value") * 100, 0).cast("long").as("c"))
    val mm = base.agg(min(col("ep")).as("mn"), max(col("ep")).as("mx"))
    val cells = base.crossJoin(broadcast(mm))
      .select(col("day"), (col("user_id") % 2 === 0).as("treated"),
        (col("ep") * 2 > col("mn") + col("mx")).as("post"), col("c"))
    val daily = cells.groupBy("day", "post").agg(
      sum(when(col("treated"), 1L).otherwise(0L)).as("n_t"),
      sum(when(col("treated"), col("c")).otherwise(0L)).as("s_t"),
      sum(when(!col("treated"), 1L).otherwise(0L)).as("n_c"),
      sum(when(!col("treated"), col("c")).otherwise(0L)).as("s_c"))
    val pre = daily.where(!col("post"))
      .agg(sum(col("n_t")).as("pn_t"), sum(col("s_t")).as("ps_t"),
           sum(col("n_c")).as("pn_c"), sum(col("s_c")).as("ps_c"))
    val baseGap = d(col("ps_t")) / (d(col("pn_t")) * 100.0) -
      d(col("ps_c")) / (d(col("pn_c")) * 100.0)
    val dayGap = d(col("s_t")) / (d(col("n_t")) * 100.0) -
      d(col("s_c")) / (d(col("n_c")) * 100.0)
    daily.crossJoin(broadcast(pre)) // 1-row pre-period baseline
      .where(col("n_t") > 0 && col("n_c") > 0)
      .select(col("day"), col("post"), col("n_t"), col("n_c"),
        round(dayGap, 6).as("day_gap"),
        round(dayGap - baseGap, 6).as("effect"))
  }

  /** Metric-tree (driver-tree) decomposition of revenue change by
    * SEQUENTIAL SUBSTITUTION: revenue factors as
    * R = views · (purchases/views) · (revenue/purchase), and the
    * period-over-period ΔR attributes to each factor by swapping
    * factors old→new one at a time in a FIXED order:
    *   Δviews = (V_b − V_a)·c_a·a_a
    *   Δconv  = V_b·(c_b − c_a)·a_a
    *   Δaov   = V_b·c_b·(a_b − a_a)
    * which telescopes to exactly ΔR — the "which lever moved the
    * metric" readout dashboards decompose into. Periods split on the
    * [[diffInDiff]] integer rule (2·day > min+max).
    *
    * Determinism: period masses are exact longs off ONE conditional
    * aggregate; each ratio is a round-9 single division; every
    * contribution is one pinned left-assoc product chain, rounded 6.
    */
  def metricTree(events: DataFrame): DataFrame = {
    def d(c: Column) = c.cast("double")
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val base = events
      .where(col("event_type") === "view" || col("event_type") === "purchase")
      .select(col("event_type"),
        datediff(to_date(col("ts")), epoch0).cast("long").as("ep"),
        round(col("value") * 100, 0).cast("long").as("c"))
    val mm = base.agg(min(col("ep")).as("mn"), max(col("ep")).as("mx"))
    val cells = base.crossJoin(broadcast(mm)) // 1-row scalar
      .select(col("event_type"), (col("ep") * 2 > col("mn") + col("mx")).as("post"),
        col("c"))
    def per(p: Boolean, sfx: String) = Seq(
      sum(when(col("post") === p && col("event_type") === "view", 1L)
        .otherwise(0L)).as(s"v_$sfx"),
      sum(when(col("post") === p && col("event_type") === "purchase", 1L)
        .otherwise(0L)).as(s"p_$sfx"),
      sum(when(col("post") === p && col("event_type") === "purchase", col("c"))
        .otherwise(0L)).as(s"r_$sfx"))
    val aggs = per(false, "a") ++ per(true, "b")
    val g = cells.agg(aggs.head, aggs.tail: _*)
    def conv(s: String) = round(d(col(s"p_$s")) / d(col(s"v_$s")), 9)
    def aov(s: String) = round(d(col(s"r_$s")) / d(col(s"p_$s")) / 100.0, 9)
    def rev(s: String) = round(d(col(s"r_$s")) / 100.0, 6)
    val row = g.select(
      d(col("v_a")).as("va"), d(col("v_b")).as("vb"),
      conv("a").as("ca"), conv("b").as("cb"),
      aov("a").as("aa"), aov("b").as("ab"),
      rev("a").as("ra"), rev("b").as("rb"))
    row.select(explode(array(
      struct(lit("views").as("factor"), col("va").as("value_a"),
        col("vb").as("value_b"),
        round((col("vb") - col("va")) * col("ca") * col("aa"), 6)
          .as("contribution")),
      struct(lit("conversion").as("factor"), col("ca").as("value_a"),
        col("cb").as("value_b"),
        round(col("vb") * (col("cb") - col("ca")) * col("aa"), 6)
          .as("contribution")),
      struct(lit("aov").as("factor"), col("aa").as("value_a"),
        col("ab").as("value_b"),
        round(col("vb") * col("cb") * (col("ab") - col("aa")), 6)
          .as("contribution")),
      struct(lit("total_revenue").as("factor"), col("ra").as("value_a"),
        col("rb").as("value_b"),
        round(col("rb") - col("ra"), 6).as("contribution")))).as("r"))
      .select(col("r.factor").as("factor"), col("r.value_a").as("value_a"),
        col("r.value_b").as("value_b"),
        col("r.contribution").as("contribution"))
  }

  /** Exact Mann–Whitney U (Wilcoxon rank-sum) for the [[abTest]]
    * split — the rank-based companion that doesn't care about the
    * metric's distribution (revenue is heavy-tailed; a mean test
    * leans on moments the tail destabilizes, the rank test doesn't).
    * Ties take AVERAGE ranks; the normal approximation carries the
    * standard tie correction Σ(t³−t)/(N(N−1)).
    *
    * Exactness: ranks never materialize per row — per-VALUE counts
    * (one hash aggregate) carry an exclusive prefix via the
    * [[graft.operators.Analytics]] range-bucket discipline (bounded
    * bucket-offset table, per-bucket windows — no global item
    * window), and the average rank is the 2×-scaled INTEGER
    * 2·prefix + t + 1, so the rank sum, U, and the tie term are all
    * exact longs; only the final z divides, in a pinned IEEE order.
    */
  def mannWhitney(events: DataFrame, metricType: String,
                  numBuckets: Int = 1024): DataFrame = {
    def d(c: Column) = c.cast("double")
    val m = events.where(col("event_type") === metricType)
      .select(pmod(col("user_id"), lit(2L)).as("variant"),
              round(col("value") * 100, 0).cast("long").as("v"))
    val byVal = m.groupBy("v").agg(count(lit(1)).as("t"),
      sum(when(col("variant") === 0, 1L).otherwise(0L)).as("ta"))
    val mx = byVal.agg(max(col("v")).as("mxv"))
    val b = byVal.crossJoin(broadcast(mx)) // 1-row scalar
      .withColumn("bucket",
        floor(d(col("v")) * numBuckets / (d(col("mxv")) + 1.0)))
    val perB = b.groupBy("bucket").agg(sum(col("t")).as("bt"))
    val wb = Window.orderBy("bucket") // bounded bucket table
    val offs = perB.withColumn("off",
      coalesce(sum(col("bt")).over(wb) - col("bt"), lit(0L)))
    val wr = Window.partitionBy("bucket").orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = b.join(broadcast(offs.select("bucket", "off")), Seq("bucket"))
      .withColumn("prefix", col("off") + coalesce(sum(col("t")).over(wr), lit(0L)))
    val agg = pre.agg(
      sum(col("ta")).as("n_a"),
      sum(col("t") - col("ta")).as("n_b"),
      sum(col("ta") * (col("prefix") * 2 + col("t") + 1)).as("r2a"),
      sum(col("t") * col("t") * col("t") - col("t")).as("tsum"))
    val nA = col("n_a"); val nB = col("n_b"); val n = nA + nB
    val uA = (col("r2a") - nA * (nA + 1)) / lit(2.0)
    val mu = nA * nB / lit(2.0)
    val sig2 = d(nA) * d(nB) / 12.0 *
      ((d(n) + 1.0) - d(col("tsum")) / (d(n) * (d(n) - 1.0)))
    val z = (uA - mu) / sqrt(sig2)
    agg.select(nA, nB,
      round(uA, 6).as("u_stat"),
      round(z, 6).as("z_score"),
      (abs(z) > lit(1.96)).as("significant"))
  }

  /** Permutation test for the [[abTest]] mean difference — the
    * assumption-free companion: is the observed variant gap larger
    * than chance relabelings produce? Each replicate reassigns ARMS
    * AT USER GRAIN (the unit of randomization — relabeling rows
    * would break within-user correlation and overstate
    * significance) via md5(user_b), recomputes the mean difference,
    * and the p-value is the add-one-smoothed share of replicates at
    * least as extreme as the observed |diff|.
    *
    * Determinism: the relabeling is the md5 draw ([[Sampling]]
    * contract), per-arm masses are exact decimal sums of per-user
    * long pre-aggregates, each replicate's statistic rounds to 6
    * before the ≥ comparison — fully oracle-replayable.
    *
    * Scale shape: the ×reps fan-out explodes the per-USER pre-agg
    * (not the event rows), all replicates share one |reps|-group
    * hash aggregate, and the comparison table is reps-bounded.
    */
  def permutationTest(events: DataFrame, metricType: String,
                      reps: Int = 100): DataFrame = {
    def d(c: Column) = c.cast("double")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val perUser = events.where(col("event_type") === metricType)
      .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("c"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n"), sum(col("c")).as("s"))
    def meanDiff(n0: Column, s0: Column, n1: Column, s1: Column) =
      round(d(s0) / (d(n0) * lit(100.0)) - d(s1) / (d(n1) * lit(100.0)), 6)
    val obs = perUser
      .select(pmod(col("user_id"), lit(2L)).as("arm"), col("n"), col("s"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("arm") === 0, col("n"))).as("n0"),
        sum(when(col("arm") === 0, col("s")).cast(dec)).as("s0"),
        sum(when(col("arm") === 1, col("n"))).as("n1"),
        sum(when(col("arm") === 1, col("s")).cast(dec)).as("s1"))
      .select(col("n_users"),
        meanDiff(col("n0"), col("s0"), col("n1"), col("s1")).as("obs_diff"))
    // same pre-explode spread as poissonBootstrapMean: a selective
    // metric filter can collapse the user table onto one split
    val drawn = perUser.repartition(col("user_id"))
      .withColumn("b", explode(sequence(lit(1), lit(reps))))
      .withColumn("arm",
        conv(substring(md5(concat(col("user_id").cast("string"), lit("_"),
          col("b").cast("string"))), 1, 8), 16, 10).cast("long") % 2)
    val repStats = drawn.groupBy("b")
      .agg(sum(when(col("arm") === 0, col("n"))).as("n0"),
        sum(when(col("arm") === 0, col("s")).cast(dec)).as("s0"),
        sum(when(col("arm") === 1, col("n"))).as("n1"),
        sum(when(col("arm") === 1, col("s")).cast(dec)).as("s1"))
      .select(col("b"),
        when(col("n0") > 0 && col("n1") > 0,
          meanDiff(col("n0"), col("s0"), col("n1"), col("s1"))).as("stat"))
    repStats.crossJoin(broadcast(obs)) // 1-row scalar
      .agg(max(col("n_users")).as("n_users"),
        max(col("obs_diff")).as("obs_diff"),
        count(lit(1)).cast("long").as("n_reps"),
        sum(when(abs(col("stat")) >= abs(col("obs_diff")), lit(1L))
          .otherwise(lit(0L))).as("n_extreme"))
      .select(col("n_users"), col("obs_diff"), col("n_reps"), col("n_extreme"),
        round((d(col("n_extreme")) + 1.0) / (d(col("n_reps")) + 1.0), 6)
          .as("p_value"))
  }

  /** Per-day peak concurrent sessions — the capacity-planning number:
    * the classic +1/−1 boundary sweep over [[sessionize]]'s intervals.
    * Sessions split at midnight (a day-spanner contributes a clamped
    * segment to every day it touches); within each day the sweep is a
    * running sum over boundaries ordered (t, +1-before-−1) — closed
    * intervals, so a session starting the instant another ends counts
    * as overlap. Only the per-day MAX and the active-session count are
    * emitted, both of which are invariant to the arbitrary order
    * among identical boundaries (ties share a sign, so the extremum
    * sits at a tie-group edge).
    *
    * Scale shape: the sweep window is PARTITIONED BY day — per-day
    * streams, never a global sort; the day-split explode is bounded
    * by session length in days (gap-bounded sessions are short).
    */
  def peakConcurrency(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val s = sessionize(events, gapMinutes)
      .select("user_id", "session_id", "session_start", "session_end")
    val starts = s
      .withColumn("day",
        explode(sequence(to_date(col("session_start")), to_date(col("session_end")))))
      .select(col("day"),
        greatest(col("session_start"), col("day").cast("timestamp")).as("t"),
        lit(1L).as("delta"))
    val ends = s.select(to_date(col("session_end")).as("day"),
      col("session_end").as("t"), lit(-1L).as("delta"))
    val w = Window.partitionBy("day").orderBy(col("t").asc, col("delta").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    starts.unionByName(ends)
      .withColumn("conc", sum(col("delta")).over(w))
      .groupBy("day")
      .agg(max(col("conc")).as("peak_concurrency"),
           sum(when(col("delta") === 1, 1L).otherwise(0L)).as("n_active_sessions"))
  }

  /** Cohort LTV matrix — the MONEY companion to the retention count
    * matrix: users cohort by their first-activity date; every
    * `conversionType` event's value lands in (cohort, day-offset), and
    * a per-cohort running total gives cumulative revenue per cohort
    * age (the LTV curve payback analyses read off). Revenue
    * accumulates as exact cents (scaled longs) including through the
    * cumulative window, so the money column hash-matches at any
    * aggregation order.
    *
    * Scale shape: one per-user min (map-side partial), one shuffle
    * join of conversions against the |users| cohort table, a
    * (cohort × offset) aggregate, and a window PARTITIONED by cohort
    * — per-cohort streams, never a global sort.
    */
  def cohortLtv(events: DataFrame, conversionType: String): DataFrame = {
    val cohorts = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_date"))
    val purchases = events.where(col("event_type") === conversionType)
      .select(col("user_id"), to_date(col("ts")).as("pday"),
              round(col("value") * 100, 0).cast("long").as("cents"))
    val cells = purchases.join(cohorts, "user_id")
      .groupBy(col("cohort_date"),
               datediff(col("pday"), col("cohort_date")).cast("long").as("day_offset"))
      .agg(countDistinct(col("user_id")).as("n_buyers"),
           sum(col("cents")).as("_cents"))
    val w = Window.partitionBy("cohort_date").orderBy("day_offset")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.withColumn("_cum", sum(col("_cents")).over(w))
      .select(col("cohort_date"), col("day_offset"), col("n_buyers"),
              (col("_cents").cast("double") / 100).as("revenue"),
              (col("_cum").cast("double") / 100).as("cum_revenue"))
  }

  /** Kaplan–Meier survival curve for time-to-first-`conversionType`:
    * each user enters at their FIRST event of any type; users who
    * never convert are right-censored at the corpus's last observed
    * timestamp (the standard end-of-observation censor). For each
    * day t with d_t conversions among n_t users still at risk,
    * S(t) = Π_{i ≤ t} (1 − d_i / n_i) — the estimator retention
    * curves, time-to-churn, and label-delay analyses all reduce to.
    *
    * Determinism: d/c/n are exact integer counts; the product
    * accumulates as exp(Σ ln(1 − d/n)) over the day-ordered window,
    * so both engines execute the SAME sequence of IEEE adds (the
    * cumulative frame fixes the order); the curve rounds to 6.
    *
    * Scale shape: one hash aggregate per user (min/conditional-min —
    * map-side partial), then everything runs on the DAY-grain table
    * (|distinct durations| rows — control-plane size, like the skew
    * report's top-k): its global-ordered window is over hundreds of
    * rows, not the corpus. The censor time is a 1-row broadcast.
    */
  def kaplanMeier(events: DataFrame, conversionType: String): DataFrame = {
    val perUser = events.groupBy("user_id").agg(
      min(unix_millis(col("ts"))).as("t0"),
      min(when(col("event_type") === conversionType, unix_millis(col("ts"))))
        .as("tc"))
    val tmax = events.agg(max(unix_millis(col("ts"))).as("tmax"))
    val durations = perUser.crossJoin(broadcast(tmax))
      .select(
        when(col("tc").isNotNull,
             floor((col("tc") - col("t0")) / 86400000.0))
          .otherwise(floor((col("tmax") - col("t0")) / 86400000.0)).as("day"),
        col("tc").isNotNull.as("converted"))
    val days = durations.groupBy("day").agg(
      sum(when(col("converted"), 1L).otherwise(0L)).as("d"),
      sum(when(col("converted"), 0L).otherwise(1L)).as("c"))
    val total = durations.agg(count(lit(1)).as("n_total"))
    val prior = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, -1)
    val cum = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    days.crossJoin(broadcast(total))
      .withColumn("n_risk",
        col("n_total") - coalesce(sum(col("d") + col("c")).over(prior), lit(0L)))
      // a day where EVERY remaining subject converts drives the curve
      // to exactly 0; guarded explicitly because Spark's log(0) is
      // NULL while SQL engines give -inf — the flag keeps both
      // engines on the same arithmetic
      .withColumn("_zero",
        max(when(col("d") >= col("n_risk"), 1L).otherwise(0L)).over(cum))
      .withColumn("survival",
        when(col("_zero") === 1, lit(0.0)).otherwise(
          round(exp(sum(
            when(col("d") < col("n_risk"),
                 log(lit(1.0) - col("d") / col("n_risk"))).otherwise(lit(0.0))
          ).over(cum)), 6)))
      .select(col("day"), col("n_risk"), col("d").as("n_events"),
              col("c").as("n_censored"), col("survival"))
  }

  /** WEIBULL FIT of the [[kaplanMeier]] curve by the linearized
    * probability-plot regression: S(t) = exp(−(t/λ)^k) ⟺
    * ln(−ln S(t)) = k·ln t − k·ln λ, so an OLS of y = ln(−ln S) on
    * x = ln t over the curve's interior points (0 < S < 1, t > 0)
    * reads off the SHAPE k and SCALE λ — the two numbers a
    * time-to-event curve is usually summarized by: k < 1 means the
    * hazard DECELERATES (users who survive the first days are
    * progressively safer — the churn classic), k > 1 accelerates
    * (wear-out), k = 1 is exponential/memoryless. r² reports how
    * Weibull the curve actually is before anyone trusts k.
    *
    * Determinism: the day-grain survival values are [[kaplanMeier]]'s
    * round-6 outputs; x and y round-6-scale to exact longs before
    * the OLS sums (the zipfFit/trend discipline); k, λ, r² are fixed
    * IEEE chains off those exact integers, rounded 6 (λ uses the
    * ROUNDED slope and intercept — the oracle replays the same
    * composition).
    */
  def weibullFit(events: DataFrame, conversionType: String): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val pts = kaplanMeier(events, conversionType)
      .where(col("day") > 0 && col("survival") > 0 && col("survival") < 1)
      .select(
        round(log(d(col("day"))) * 1e6, 0).cast("long").as("x"),
        round(log(-log(col("survival"))) * 1e6, 0).cast("long").as("y"))
    val g = pts.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    val slope = round(d(num) / d(dx), 6)
    val icept = round((d(col("sy")) * d(dx) - d(num) * d(col("sx")))
      / (d(col("n")) * d(dx)) / 1e6, 6)
    g.select(col("n").as("n_points"),
      when(dx =!= 0, slope).as("shape_k"),
      when(dx =!= 0 && slope =!= 0,
        round(exp(-icept / slope), 6)).as("scale_lambda"),
      when(dx =!= 0 && dy =!= 0,
        round(d(num) * d(num) / (d(dx) * d(dy)), 6)).as("r2"),
      when(dx =!= 0, slope < 1.0).as("decelerating_hazard"))
  }

  /** Sliding-window distinct users from MERGED hourly sketches — the
    * classic reason sliding distinct counts need sketches: distinct
    * is not additive, so a naive per-window recount touches every raw
    * event `windowHours` times, while HLL sketches union associatively
    * — one hourly sketch table (the raw scan happens ONCE), then each
    * sliding window is a union of `windowHours` constant-size sketch
    * rows. Window w covers hours [w, w + windowHours); a window exists
    * for every start that any event hour can contribute to, so edge
    * windows are partial by construction (both engines derive the
    * same set).
    *
    * Scale shape: the raw corpus feeds one hash aggregate keyed by
    * hour (map-side partial sketch merge); the hourly table is
    * |hours| rows of ~2^lgK bytes, and the explode-to-windows +
    * union-per-window stage runs entirely on that small table.
    */
  def slidingDistinctSketch(events: DataFrame, windowHours: Int,
                            lgK: Int = 14): DataFrame = {
    val hourly = events
      .select((floor(unix_millis(col("ts")) / 3600000L)).as("hour"), col("user_id"))
      .groupBy("hour")
      .agg(expr(s"hll_sketch_agg(user_id, $lgK)").as("sk"))
    hourly
      .select(col("sk"),
        explode(sequence(col("hour") - (windowHours - 1), col("hour"), lit(1L)))
          .as("window_start"))
      .groupBy("window_start")
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("n_approx"))
  }

  /** Daily-cron ingest into a [[writeDatePartitioned]] lake: the
    * delta's days land via DYNAMIC partition overwrite, touching ONLY
    * the `event_date` partitions the delta carries — yesterday's 100
    * TB of history is never rewritten for today's ingest. Partition
    * REPLACEMENT semantics: a re-run of day D replaces day D wholesale
    * (the idempotent reprocess a snapshot cron needs), so the delta
    * must carry COMPLETE days, not intra-day increments.
    */
  def appendDatePartitioned(delta: DataFrame, path: String,
                            tsCol: String = "ts"): Unit =
    delta.withColumn("event_date", to_date(col(tsCol)))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("event_date").parquet(path)

  /** Resample each user's event values onto a fixed time grid with
    * last-observation-carried-forward — the alignment step that turns
    * irregular event streams into the rectangular (user × time)
    * feature matrix a sequence model trains on. Grid = hourly points
    * spanning the corpus (corpus bounds ride a 1-row broadcast);
    * LOCF is ONE user-keyed window over the union of events and grid
    * points (events sort before a same-timestamp grid point, so a
    * value landing exactly on the grid is carried), never an
    * inequality join. Grid points before a user's first event stay null — the
    * honest "no observation yet".
    */
  def resampleLocf(events: DataFrame, stepMinutes: Int = 60): DataFrame = {
    val bounds = events.agg(
      date_trunc("hour", min(col("ts"))).as("t0"), max(col("ts")).as("t1"))
    val grid = events.select("user_id").distinct()
      .crossJoin(broadcast(bounds))
      .select(col("user_id"), explode(expr(
        s"sequence(t0, t1, interval $stepMinutes minutes)")).as("ts"))
      .select(col("user_id"), col("ts"), lit(null).cast("double").as("value"),
        lit(1).as("is_grid"), lit(null).cast("long").as("event_id"))
    val obs = events.select(col("user_id"), col("ts"), col("value"),
      lit(0).as("is_grid"), col("event_id"))
    val w = Window.partitionBy("user_id").orderBy("ts", "is_grid", "event_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(grid)
      .withColumn("locf_value", last(col("value"), ignoreNulls = true).over(w))
      .where(col("is_grid") === 1)
      .select(col("user_id"), col("ts").as("grid_ts"), col("locf_value"))
  }

  /** Linear-interpolation resampling of a sparse daily series — the
    * companion to [[resampleLocf]] for metrics where carrying the
    * last value forward biases a trend (LOCF holds a stale level
    * through a gap; interpolation splits the gap's change evenly —
    * the standard prep before trend/seasonality fits on irregular
    * data). One row per (event_type, calendar day) over the global
    * day span: observed days carry their exact daily value, interior
    * gaps lerp between the bracketing observations, and leading/
    * trailing gaps stay NULL (extrapolation is a modeling choice,
    * not a resample).
    *
    * Exactness: daily masses are exact cents longs; the lerp
    * p + (n − p)·pos/len is ONE fixed IEEE chain off those longs and
    * integer day offsets, rounded 6 (the [[dowSeasonality]]
    * contract). The fill windows run per type over the bounded
    * |days| spine — never over the event corpus.
    */
  def resampleLerp(events: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val daily = events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val bounds = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val spine = daily.select("event_type").distinct()
      .crossJoin(broadcast(bounds)) // 1-row bounds
      .select(col("event_type"),
        explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val wb = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wf = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val marked = spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("pc", last(col("cents"), ignoreNulls = true).over(wb))
      .withColumn("pd", last(when(col("cents").isNotNull, col("day")),
        ignoreNulls = true).over(wb))
      .withColumn("nc", first(col("cents"), ignoreNulls = true).over(wf))
      .withColumn("nd", first(when(col("cents").isNotNull, col("day")),
        ignoreNulls = true).over(wf))
    val lerp = (d(col("pc")) + (d(col("nc")) - d(col("pc")))
      * d(datediff(col("day"), col("pd")))
      / d(datediff(col("nd"), col("pd")))) / 100.0
    marked.select(col("event_type"), col("day"),
      col("cents").isNotNull.as("observed"),
      when(col("cents").isNotNull, round(d(col("cents")) / 100.0, 6))
        .when(col("pc").isNotNull && col("nc").isNotNull, round(lerp, 6))
        .as("value"))
  }

  /** Bot-like user screen by interarrival REGULARITY: humans arrive
    * bursty (high coefficient of variation of gaps), schedulers and
    * scripted traffic arrive metronomically (low CV) — the standard
    * first-pass spam/bot filter a training-data pipeline runs before
    * trusting engagement events. Flags users with ≥ `minEvents`
    * events whose gap CV < `maxCv`; emits the full per-user report
    * (n, mean gap, CV, verdict) rather than just the flagged slice,
    * so a clean corpus still yields an auditable answer.
    *
    * Exactness: integer-ms gaps from one user-keyed window, then
    * exact long Σg and Σg² (overflow bound: n·maxGap² must stay
    * under 2^63 — holds to ~10⁵ events/user at day-scale gaps; the
    * profileNumeric scaling note applies); mean and CV derive from
    * the two exact sums with identical double arithmetic in both
    * engines, rounded to 6.
    */
  def botUsers(events: DataFrame, minEvents: Int = 20,
               maxCv: Double = 0.5): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val gaps = events
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .where(col("prev").isNotNull)
      .select(col("user_id"),
        (unix_millis(col("ts")) - unix_millis(col("prev"))).as("g"))
    gaps.groupBy("user_id")
      .agg(count(lit(1)).as("n_gaps"),
           sum(col("g")).as("sg"),
           sum(col("g") * col("g")).as("sg2"))
      .where(col("n_gaps") >= minEvents - 1 && col("sg") > 0)
      .withColumn("mean_gap_ms",
        round(col("sg").cast("double") / col("n_gaps"), 6))
      .withColumn("cv", round(
        sqrt(col("n_gaps").cast("double") * col("sg2").cast("double") /
             (col("sg").cast("double") * col("sg").cast("double")) - 1.0), 6))
      .select(col("user_id"), (col("n_gaps") + 1).as("n_events"),
              col("mean_gap_ms"), col("cv"),
              (col("cv") < maxCv).as("is_bot"))
  }

  /** Exponentially-weighted moving average of daily value totals per
    * event type — the smoothing/forecast-baseline companion to
    * [[valueAnomalies]] (an EWMA is the standard drift-tolerant
    * baseline an alerting threshold compares against). The recursion
    * s_t = α·x_t + (1−α)·s_{t−1}, s_0 = x_0 is computed in CLOSED
    * FORM: s_t = Σ_{i>0} α(1−α)^{t−i}·x_i + (1−α)^t·x_0, each term
    * rounded to 9 decimals and scaled to an exact long, so the sum is
    * aggregation-order-independent and a SQL oracle replays it
    * exactly — a recursive window would pin the whole history to one
    * partition AND accumulate engine-specific float error.
    *
    * Scale shape: daily totals first (the 100 TB of raw rows reduce
    * to |types|·|days| cells in one hash aggregate); the closed-form
    * pair join is |days|² per type over that TINY table — bound the
    * lookback window if |days| ever grows past a few thousand.
    */
  def ewmaDaily(events: DataFrame, alpha: Double = 0.3): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg((sum(round(col("value") * 100, 0).cast("long")) / 100.0).as("x"))
    val w = Window.partitionBy("event_type")
    val d = daily.withColumn("d0", min(col("day")).over(w))
    val src = d.select(col("event_type"), col("day").as("iday"),
                       col("x").as("ix"), col("d0"))
    val pairs = d.select(col("event_type"), col("day"), col("x"))
      .join(src, Seq("event_type"))
      .where(col("iday") <= col("day"))
      .withColumn("coef",
        when(col("iday") === col("d0"),
             pow(lit(1.0 - alpha), datediff(col("day"), col("iday"))))
          .otherwise(lit(alpha) * pow(lit(1.0 - alpha),
                                      datediff(col("day"), col("iday")))))
      .withColumn("cl", round(round(col("coef") * col("ix"), 9) * 1e9, 0).cast("long"))
    pairs.groupBy(col("event_type"), col("day"), col("x"))
      .agg(round(sum(col("cl")) / 1e9, 6).as("ewma"))
      .select(col("event_type"), col("day"), col("x").as("value"), col("ewma"))
  }

  /** Coarsened Exact Matching (Iacus, King & Porro 2012) — the
    * deterministic causal-matching design: coarsen pre-treatment
    * covariates into discrete cells, keep only cells containing BOTH
    * treated and control users, and reweight controls so each matched
    * cell's control mass mirrors its treated mass:
    *   w_c(cell) = (m_t/m_c) · (M_c/M_t)  over matched totals.
    * Unlike propensity or nearest-neighbor matching there is no
    * model and no sequential greedy pass — the match is a pure
    * GROUP BY, which is exactly why it distributes.
    *
    * Here: treated = users whose `treatType` share of events exceeds
    * 1/`shareMul` (an integer-exact `n_t·shareMul > n` compare — a
    * mere "has one such event" is degenerate when every user has
    * one); covariate cells = (`covA` count div `binWidth`, `covB`
    * count div `binWidth`) — behavioral-intensity bins; outcome =
    * the user's total `outcomeType` value in exact cents. Output per
    * matched cell: sizes, the control weight, and both arms' mean
    * outcomes — the table an ATT readout sums.
    *
    * Exactness: bins and the treatment split are integer arithmetic
    * on exact counts; weights and means are single IEEE divisions of
    * exact longs in a pinned order, rounded 6. Scale: two hash
    * aggregates (user, then cell) and a 1-row matched-totals
    * broadcast.
    */
  def cemMatch(events: DataFrame, treatType: String, outcomeType: String,
               covA: String, covB: String, binWidth: Int = 5,
               shareMul: Int = 5): DataFrame = {
    val byUser = events.groupBy("user_id").agg(
      count(lit(1)).as("n_events"),
      sum(when(col("event_type") === treatType, 1L).otherwise(0L)).as("n_treat"),
      sum(when(col("event_type") === covA, 1L).otherwise(0L)).as("n_a"),
      sum(when(col("event_type") === covB, 1L).otherwise(0L)).as("n_b"),
      coalesce(sum(when(col("event_type") === outcomeType,
        round(col("value") * 100, 0).cast("long"))), lit(0L)).as("outcome_cents"))
    val cells = byUser.select(
      expr(s"n_a div $binWidth").cast("long").as("cov1_bin"),
      expr(s"n_b div $binWidth").cast("long").as("cov2_bin"),
      when(col("n_treat") * shareMul > col("n_events"), 1L).otherwise(0L)
        .as("treated"),
      col("outcome_cents"))
    val agg = cells.groupBy("cov1_bin", "cov2_bin")
      .agg(sum(when(col("treated") === 1L, 1L).otherwise(0L)).as("m_t"),
           sum(when(col("treated") === 0L, 1L).otherwise(0L)).as("m_c"),
           sum(when(col("treated") === 1L, col("outcome_cents")).otherwise(0L)).as("y_t"),
           sum(when(col("treated") === 0L, col("outcome_cents")).otherwise(0L)).as("y_c"))
      .where(col("m_t") > 0 && col("m_c") > 0)
    val tot = agg.agg(sum(col("m_t")).as("mt_tot"), sum(col("m_c")).as("mc_tot"))
    agg.crossJoin(broadcast(tot)) // 1-row matched totals
      .select(col("cov1_bin"), col("cov2_bin"), col("m_t"), col("m_c"),
        round(col("m_t") / col("m_c") * (col("mc_tot") / col("mt_tot")), 6)
          .as("control_weight"),
        round(col("y_t") / col("m_t") / 100.0, 6).as("y_t_mean"),
        round(col("y_c") / col("m_c") / 100.0, 6).as("y_c_mean"))
  }

  /** Holt linear-trend (double exponential) smoothing of the daily
    * value series per event type — [[ewmaDaily]]'s companion for
    * series with drift: the EWMA lags a trending metric by design,
    * Holt tracks the slope too. Recurrence (α = β = ½):
    *   l_t = ½·y_t + ½·(l_{t−1} + b_{t−1}),   l_0 = y_0
    *   b_t = ½·(l_t − l_{t−1}) + ½·b_{t−1},   b_0 = 0
    * with the one-step-ahead forecast l_t + b_t per day.
    *
    * Exactness: the state lives in integer MILLI-CENTS and every ÷2
    * is an arithmetic right shift (= floor division, sign-safe), so
    * the recurrence is bit-exact and the oracle replays it with a
    * recursive CTE using (x − posmod(x,2)) // 2 — the same floorDiv.
    * Unlike [[ewmaDaily]] there is no closed form that avoids the
    * recursion once the trend term enters, so the fold runs over the
    * COLLECTED per-type daily array — bounded control-plane data
    * (|days| per type), the same justification as the per-type
    * windows here; the 100 TB of raw rows still reduce in the one
    * hash aggregate. Days with no rows are skipped (the series is
    * the observed days in order), matching the oracle's row_number.
    */
  def holtDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val series = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("cents")))).as("ys"))
    def fd2(c: Column) = shiftright(c, 1) // floorDiv(x, 2) on longs
    val init = struct(
      array(struct(col("ys")(0)("day").as("day"), col("ys")(0)("cents").as("cents"),
        (col("ys")(0)("cents") * 1000).as("l"), lit(0L).as("b"))).as("rows"),
      (col("ys")(0)("cents") * 1000).as("l"), lit(0L).as("b"))
    val folded = series.withColumn("st",
      aggregate(
        slice(col("ys"), lit(2), greatest(size(col("ys")) - 1, lit(0))),
        init,
        (acc, y) => {
          val lNew = fd2(y("cents") * 1000 + acc("l") + acc("b"))
          val bNew = fd2(lNew - acc("l") + acc("b"))
          struct(
            concat(acc("rows"), array(struct(
              y("day").as("day"), y("cents").as("cents"),
              lNew.as("l"), bNew.as("b")))).as("rows"),
            lNew.as("l"), bNew.as("b"))
        }))
    folded.select(col("event_type"), explode(col("st")("rows")).as("r"))
      .select(col("event_type"), col("r")("day").as("day"),
        round(col("r")("cents") / 100.0, 2).as("value"),
        round(col("r")("l") / 100000.0, 6).as("level"),
        round(col("r")("b") / 100000.0, 6).as("trend"),
        round((col("r")("l") + col("r")("b")) / 100000.0, 6).as("forecast_next"))
  }

  /** Holt–Winters ADDITIVE seasonal smoothing (α = β = γ = ½, weekly
    * period) — [[holtDaily]] plus a 7-slot seasonal state, the model
    * that tracks both drift AND the weekday shape [[ewmaDaily]] and
    * Holt smear away. Recurrences, slot = epoch-day mod 7:
    *   l_t = ½(y_t − s[slot]) + ½(l_{t−1} + b_{t−1})
    *   b_t = ½(l_t − l_{t−1}) + ½ b_{t−1}
    *   s'[slot] = ½(y_t − l_t) + ½ s[slot]
    * fitted_t = l_t + s'[slot]. Init: l = y_0, b = 0, s = 0⁷ (the
    * first cycle learns the shape). Same exactness contract as
    * [[holtDaily]]: milli-cent integer state, halving = arithmetic
    * shift (= floorDiv), the seasonal array rebuilt as an explicit
    * 7-term CASE vector (no index-lambda dependency in either
    * engine), oracle = recursive CTE with a BIGINT[] state column.
    */
  def holtWintersDaily(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .withColumn("slot", expr("datediff(day, date'1970-01-01') % 7").cast("long"))
    val series = daily.groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("slot"), col("cents")))).as("ys"))
    def fd2(c: Column) = shiftright(c, 1)
    val init = struct(
      array(struct(col("ys")(0)("day").as("day"), col("ys")(0)("cents").as("cents"),
        (col("ys")(0)("cents") * 1000).as("l"), lit(0L).as("b"),
        lit(0L).as("sv"))).as("rows"),
      (col("ys")(0)("cents") * 1000).as("l"), lit(0L).as("b"),
      array((0 until 7).map(_ => lit(0L)): _*).as("s"))
    val folded = series.withColumn("st",
      aggregate(
        slice(col("ys"), lit(2), greatest(size(col("ys")) - 1, lit(0))),
        init,
        (acc, y) => {
          val slot = y("slot")
          val sOld = element_at(acc("s"), (slot + 1).cast("int"))
          val ycs = y("cents") * 1000
          val lNew = fd2(ycs - sOld + acc("l") + acc("b"))
          val bNew = fd2(lNew - acc("l") + acc("b"))
          val sNew = fd2(ycs - lNew + sOld)
          val sArr = array((0 until 7).map(j =>
            when(lit(j.toLong) === slot, sNew)
              .otherwise(element_at(acc("s"), j + 1))): _*)
          struct(
            concat(acc("rows"), array(struct(
              y("day").as("day"), y("cents").as("cents"),
              lNew.as("l"), bNew.as("b"), sNew.as("sv")))).as("rows"),
            lNew.as("l"), bNew.as("b"), sArr.as("s"))
        }))
    folded.select(col("event_type"), explode(col("st")("rows")).as("r"))
      .select(col("event_type"), col("r")("day").as("day"),
        round(col("r")("cents") / 100.0, 2).as("value"),
        round(col("r")("l") / 100000.0, 6).as("level"),
        round(col("r")("b") / 100000.0, 6).as("trend"),
        round(col("r")("sv") / 100000.0, 6).as("seasonal"),
        round((col("r")("l") + col("r")("sv")) / 100000.0, 6).as("fitted"))
  }

  /** CUSUM mean-shift changepoint scan over the daily value series
    * per event type: the cumulative sum of deviations from the series
    * mean, S_t = Σ_{i≤t}(x_i − x̄), peaks (in absolute value) at the
    * most likely single shift point — the standard "did the metric's
    * level change, and when" monitor over a pipeline's daily totals.
    *
    * Exactness (DuckDB oracle parity): daily totals are scaled-long
    * cents; the deviation is computed mean-free as n·x_i − total
    * (both exact longs — no division enters the recursion), so the
    * running sum is integer-exact and the argmax comparison is an
    * exact equality in any engine. Only the DISPLAYED cusum divides
    * (by n·100, rounded 6).
    *
    * Scale shape: raw events reduce to |types|·|days| cells in one
    * hash aggregate; the running-sum window partitions by event_type
    * over that bounded daily table (the [[ewmaDaily]] justification —
    * never a window over raw rows). Ties on max |S| flag every tied
    * day, deterministically in both engines.
    */
  def cusumChangepoints(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val stats = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("total"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cs = daily.join(stats, Seq("event_type"))
      .withColumn("s", sum(col("cents") * col("n") - col("total")).over(w))
    val mx = cs.groupBy("event_type").agg(max(abs(col("s"))).as("mx"))
    cs.join(mx, Seq("event_type"))
      .select(col("event_type"), col("day"),
              round(col("cents") / 100.0, 2).as("value"),
              round(col("s") / (col("n") * 100.0), 6).as("cusum"),
              (abs(col("s")) === col("mx")).as("is_changepoint"))
  }

  /** Closed-form OLS trend over the daily value series per event
    * type: slope/intercept/R² of cents against the epoch-day index,
    * plus the one-day-ahead forecast — the linear companion to
    * [[ewmaDaily]] (level baseline) and [[cusumChangepoints]] (shift
    * detector): "is the metric drifting, how fast, and where does it
    * land tomorrow".
    *
    * Exactness: x = epoch day (long), y = exact cents (long); all
    * five OLS moments (Σx, Σy, Σx², Σxy, Σy²) are exact long sums,
    * so the normal-equation numerators/denominators are exact
    * integers; doubles enter only at the final divisions, each factor
    * cast to double FIRST on both sides so the IEEE rounding sequence
    * is identical. Long-overflow bound: |y| ≲ 3·10⁹ cents/day at
    * ~10⁵ days (Σy² < 2⁶³); a 100 TB corpus passes a coarser money
    * scale.
    *
    * Scale shape: raw events reduce to |types|·|days| cells in one
    * hash aggregate, then ONE |types|-row moment aggregate — no
    * window at all (the closed form needs no per-row ordering).
    * Degenerate series guard: a single day (or constant x) nulls
    * slope/intercept/R²; constant y nulls R² only.
    */
  /** Difference-in-differences estimate over purchase values: treated
    * = even user_id (the deterministic stand-in for an experiment
    * flag), post = second half of the observed date range, effect =
    * (Δ treated) − (Δ control) with a four-cell pooled standard
    * error — the quasi-experimental companion to the Welch A/B test
    * (which compares groups at one time; DiD nets out the shared
    * time trend).
    *
    * Determinism: cents are exact longs; the post split compares
    * 2·day > min+max in exact epoch-day ints (no division); all four
    * cells aggregate in ONE conditional pass (12 exact sums), and
    * doubles enter only in the final mean/variance arithmetic with
    * factor-first casts. Degenerate cells (n < 2) null the estimate.
    *
    * Scale shape: one filtered scan + a 1-row min/max broadcast + a
    * single hash aggregate to ONE row. Nothing shuffles but the
    * 12-sum partial aggregate.
    */
  /** UPLIFT / QINI CURVE (Radcliffe 2007) — the targeting-depth view
    * of a treatment effect: rank users by a pre-period activity
    * score (who a campaign WOULD target first), then at every score
    * cutoff compare the cumulative post-period conversion rate of
    * the treated arm against control. The pooled [[abTest]] answers
    * "does it work on average"; this answers "on WHOM does it work"
    * — flat uplift across depths reads as a homogeneous effect,
    * front-loaded uplift as a targetable one. Reported per distinct
    * score: cumulative arm counts/conversions, uplift (rate gap),
    * and the Qini increment cum_xT − cum_xC·cum_nT/cum_nC.
    *
    * Determinism: the pre/post split is the [[diffInDiff]] integer
    * midpoint (2·day > min+max — no float midpoint); scores and
    * conversions are exact integers; the cumulative window runs over
    * the BOUNDED distinct-score table (scores are small pre-period
    * counts), never over users; uplift/qini are fixed IEEE chains
    * rounded 6.
    */
  def upliftCurve(events: DataFrame,
                  convType: String = "purchase"): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val base = events.select(col("user_id"),
      datediff(to_date(col("ts")), epoch0).cast("long").as("ep"),
      col("event_type"))
    val mm = base.agg(min(col("ep")).as("mn"), max(col("ep")).as("mx"))
    val perUser = base.crossJoin(broadcast(mm)) // 1-row scalar
      .withColumn("post", col("ep") * 2 > col("mn") + col("mx"))
      .groupBy(col("user_id"))
      .agg(sum(when(!col("post"), 1L).otherwise(0L)).as("score"),
        max(when(col("post") && col("event_type") === convType, 1L)
          .otherwise(0L)).as("conv"))
      .select((col("user_id") % 2 === 0).as("treated"),
        col("score"), col("conv"))
    val perScore = perUser.groupBy("score").agg(
      sum(when(col("treated"), 1L).otherwise(0L)).as("dn_t"),
      sum(when(col("treated"), col("conv")).otherwise(0L)).as("dx_t"),
      sum(when(!col("treated"), 1L).otherwise(0L)).as("dn_c"),
      sum(when(!col("treated"), col("conv")).otherwise(0L)).as("dx_c"))
    val w = Window.orderBy(desc("score"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = perScore.select(col("score"), // bounded distinct scores
      sum(col("dn_t")).over(w).as("n_t"), sum(col("dx_t")).over(w).as("x_t"),
      sum(col("dn_c")).over(w).as("n_c"), sum(col("dx_c")).over(w).as("x_c"))
    cum.select(col("score"), col("n_t"), col("x_t"), col("n_c"), col("x_c"),
      when(col("n_t") > 0 && col("n_c") > 0,
        round(d(col("x_t")) / d(col("n_t")) - d(col("x_c")) / d(col("n_c")), 6))
        .as("uplift"),
      when(col("n_c") > 0,
        round(d(col("x_t")) - d(col("x_c")) * d(col("n_t")) / d(col("n_c")), 6))
        .as("qini"))
  }

  def diffInDiff(events: DataFrame,
                 eventType: String = "purchase"): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val base = events.where(col("event_type") === eventType)
      .select(col("user_id"),
              datediff(to_date(col("ts")), epoch0).cast("long").as("ep"),
              round(col("value") * 100, 0).cast("long").as("c"))
    val mm = base.agg(min(col("ep")).as("mn"), max(col("ep")).as("mx"))
    val cells = base.crossJoin(broadcast(mm)) // 1-row scalar
      .select(
        (col("user_id") % 2 === 0).as("treated"),
        (col("ep") * 2 > col("mn") + col("mx")).as("post"),
        col("c"))
    def cell(t: Boolean, p: Boolean, sfx: String) = {
      val in = col("treated") === t && col("post") === p
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$sfx"),
          sum(when(in, col("c")).otherwise(0L)).as(s"s_$sfx"),
          sum(when(in, col("c") * col("c")).otherwise(0L)).as(s"q_$sfx"))
    }
    val aggs = cell(false, false, "c_pre") ++ cell(false, true, "c_post") ++
      cell(true, false, "t_pre") ++ cell(true, true, "t_post")
    val g = cells.agg(aggs.head, aggs.tail: _*)
    def mean(sfx: String) = d(col(s"s_$sfx")) / (d(col(s"n_$sfx")) * 100.0)
    def varOverN(sfx: String) =
      (d(col(s"n_$sfx")) * d(col(s"q_$sfx")) - d(col(s"s_$sfx")) * d(col(s"s_$sfx"))) /
        (d(col(s"n_$sfx")) * (d(col(s"n_$sfx")) - 1.0)) / 10000.0 / d(col(s"n_$sfx"))
    val minN = least(col("n_c_pre"), col("n_c_post"), col("n_t_pre"), col("n_t_post"))
    val did = (mean("t_post") - mean("t_pre")) - (mean("c_post") - mean("c_pre"))
    val se = sqrt(varOverN("c_pre") + varOverN("c_post") +
                  varOverN("t_pre") + varOverN("t_post"))
    g.select(
      col("n_c_pre"), col("n_c_post"), col("n_t_pre"), col("n_t_post"),
      when(minN >= 2, round(mean("c_pre"), 6)).as("mean_c_pre"),
      when(minN >= 2, round(mean("c_post"), 6)).as("mean_c_post"),
      when(minN >= 2, round(mean("t_pre"), 6)).as("mean_t_pre"),
      when(minN >= 2, round(mean("t_post"), 6)).as("mean_t_post"),
      when(minN >= 2, round(did, 6)).as("did_estimate"),
      when(minN >= 2, round(se, 6)).as("std_err"),
      when(minN >= 2, round(did / se, 6)).as("t_stat"))
  }

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM'13
    * — Controlled-experiment Using Pre-Experiment Data): per-user
    * pre-period spend is the covariate, post-period spend the
    * outcome; θ = cov(X,Y)/var(X) pooled over both arms, and each
    * user's adjusted outcome Y − θ·(X − X̄) removes the variance the
    * pre-period already explains. Reports the raw and the CUPED
    * effect with both standard errors and the realized variance
    * reduction — the difference between an A/B test that needs two
    * more weeks and one that ships.
    *
    * Population and split reuse [[diffInDiff]]'s deterministic
    * contract: treated = even user_id, post = exact-integer
    * 2·day > min+max, cents as exact longs. Every per-arm and pooled
    * moment (n, Σx, Σy, Σx², Σxy, Σy² × {treated, control}) comes
    * from ONE conditional aggregate over the per-user table; doubles
    * enter only in the final θ/mean/variance arithmetic with
    * factor-first casts. Users with no pre-period rows carry X = 0
    * (the standard CUPED convention — new users simply don't get
    * adjusted). Degenerate guards: any arm with n < 2, or zero
    * pre-period variance, nulls the CUPED columns; the raw effect
    * still reports.
    *
    * Scale shape: one filtered scan + 1-row min/max broadcast + one
    * per-user hash aggregate (map-side partials) + one 18-sum
    * aggregate to a single row. Long-overflow bound: per-user cents
    * ≲ 3·10⁶ keeps Σx²y² under 2⁶³ at 10⁹ users — coarser money
    * scale at larger spend.
    */
  def cupedEffect(events: DataFrame,
                  eventType: String = "purchase"): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val base = events.where(col("event_type") === eventType)
      .select(col("user_id"),
              datediff(to_date(col("ts")), epoch0).cast("long").as("ep"),
              round(col("value") * 100, 0).cast("long").as("c"))
    val mm = base.agg(min(col("ep")).as("mn"), max(col("ep")).as("mx"))
    val perUser = base.crossJoin(broadcast(mm)) // 1-row scalar
      .withColumn("post", col("ep") * 2 > col("mn") + col("mx"))
      .groupBy("user_id")
      .agg(coalesce(sum(when(!col("post"), col("c"))), lit(0L)).as("x"),
           coalesce(sum(when(col("post"), col("c"))), lit(0L)).as("y"))
      .withColumn("t", col("user_id") % 2 === 0)
    def arm(t: Boolean, sfx: String) = {
      val in = col("t") === t
      Seq(sum(when(in, 1L).otherwise(0L)).as(s"n_$sfx"),
          sum(when(in, col("x")).otherwise(0L)).as(s"sx_$sfx"),
          sum(when(in, col("y")).otherwise(0L)).as(s"sy_$sfx"),
          sum(when(in, col("x") * col("x")).otherwise(0L)).as(s"sxx_$sfx"),
          sum(when(in, col("x") * col("y")).otherwise(0L)).as(s"sxy_$sfx"),
          sum(when(in, col("y") * col("y")).otherwise(0L)).as(s"syy_$sfx"))
    }
    val aggs = arm(true, "t") ++ arm(false, "c")
    val g = perUser.agg(aggs.head, aggs.tail: _*)
      .withColumn("n", col("n_t") + col("n_c"))
      .withColumn("sx", col("sx_t") + col("sx_c"))
      .withColumn("sy", col("sy_t") + col("sy_c"))
      .withColumn("sxx", col("sxx_t") + col("sxx_c"))
      .withColumn("sxy", col("sxy_t") + col("sxy_c"))
      .withColumn("syy", col("syy_t") + col("syy_c"))
    // pooled: cents² units; factor-first double casts
    val covNum = d(col("n")) * d(col("sxy")) - d(col("sx")) * d(col("sy"))
    val varXNum = d(col("n")) * d(col("sxx")) - d(col("sx")) * d(col("sx"))
    val varYNum = d(col("n")) * d(col("syy")) - d(col("sy")) * d(col("sy"))
    val theta = covNum / varXNum
    val meanXAll = d(col("sx")) / d(col("n"))
    def meanY(s: String) = d(col(s"sy_$s")) / d(col(s"n_$s"))
    def meanX(s: String) = d(col(s"sx_$s")) / d(col(s"n_$s"))
    def adjMean(s: String) = meanY(s) - theta * (meanX(s) - meanXAll)
    // per-arm sample variances (cents²)
    def v(s: String, q: String, a: String, b: String) =
      (d(col(s"n_$s")) * d(col(s"${q}_$s")) - d(col(s"${a}_$s")) * d(col(s"${b}_$s"))) /
        (d(col(s"n_$s")) * (d(col(s"n_$s")) - 1.0))
    def varAdj(s: String) =
      v(s, "syy", "sy", "sy") + theta * theta * v(s, "sxx", "sx", "sx") -
        lit(2.0) * theta * v(s, "sxy", "sx", "sy")
    val seRaw = sqrt(v("t", "syy", "sy", "sy") / d(col("n_t")) +
                     v("c", "syy", "sy", "sy") / d(col("n_c")))
    val seAdj = sqrt(varAdj("t") / d(col("n_t")) + varAdj("c") / d(col("n_c")))
    val effRaw = meanY("t") - meanY("c")
    val effAdj = adjMean("t") - adjMean("c")
    val ok = col("n_t") >= 2 && col("n_c") >= 2 && varXNum =!= 0
    val okRaw = col("n_t") >= 2 && col("n_c") >= 2
    g.select(
      col("n_t").as("n_treated"), col("n_c").as("n_control"),
      when(okRaw, round(effRaw / 100.0, 6)).as("effect_raw"),
      when(okRaw, round(seRaw / 100.0, 6)).as("se_raw"),
      when(ok, round(theta, 6)).as("theta"),
      when(ok, round(effAdj / 100.0, 6)).as("effect_cuped"),
      when(ok, round(seAdj / 100.0, 6)).as("se_cuped"),
      when(ok && varYNum =!= 0,
        round(covNum * covNum / (varXNum * varYNum), 6)).as("var_reduction"))
  }

  /** Daily-activity streaks per user: longest consecutive-day run,
    * streak count, and active-day total — the engagement/gamification
    * readout ([[activeUsers]] says how many came back; this says how
    * CONSISTENTLY each one did). Gaps-and-islands: island id =
    * epoch-day − per-user day rank (constant exactly while days are
    * consecutive), all exact integers.
    *
    * Scale shape: corpus → distinct (user, day) once; the rank
    * window partitions BY USER (parallel, user-sized — never a
    * global order); two bounded hash aggregates finish.
    */
  def activityStreaks(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val ud = events
      .select(col("user_id"),
              datediff(to_date(col("ts")), epoch0).cast("long").as("ep"))
      .distinct()
    val wu = Window.partitionBy("user_id").orderBy("ep")
    val runs = ud
      .withColumn("island", col("ep") - row_number().over(wu))
      .groupBy("user_id", "island")
      .agg(count(lit(1)).as("len"))
    runs.groupBy("user_id")
      .agg(sum(col("len")).as("n_active_days"),
           max(col("len")).as("longest_streak"),
           count(lit(1)).as("n_streaks"))
  }

  /** Exponential-decay fit of the overall retention curve: r(k) =
    * share of all users active k days after their own first day;
    * fit ln r = a − λk by OLS over k ≥ 1 (day 0 is 1.0 by
    * construction and would anchor the fit) and report the decay
    * rate, the model's k=0 anchor e^a (≈1 when the curve is cleanly
    * exponential), the half-life ln2/λ,
    * and R² — the one-line summary a growth team reads off the
    * [[retention]] triangle ("we lose half the cohort every N
    * days").
    *
    * Determinism: r(k) is an exact ratio rounded to 6 BEFORE the ln
    * (libm ulp differences between engines can't survive a round-6
    * input), ln values ×1e6-scale to longs (the zipfFit contract),
    * and the normal equations divide exact integers factor-first.
    * ln 2 is a pinned literal, never each engine's log(2).
    *
    * Scale shape: first-day table + distinct (user, offset) —
    * two user-keyed aggregates — then everything is
    * ≤`maxOffset`-row bounded.
    */
  def retentionFit(events: DataFrame, maxOffset: Int = 30): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val fs = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("d0"))
    val nUsers = fs.agg(count(lit(1)).as("n_users"))
    val act = events.select(col("user_id"), to_date(col("ts")).as("d"))
      .distinct()
      .join(fs, Seq("user_id"))
      .select(col("user_id"), datediff(col("d"), col("d0")).cast("long").as("k"))
      .where(col("k") >= 1 && col("k") <= maxOffset)
      .distinct()
    val pts = act.groupBy("k").agg(count(lit(1)).as("n_k"))
      .crossJoin(broadcast(nUsers)) // 1-row scalar
      .select(col("k"),
        round(d(col("n_k")) / d(col("n_users")), 6).as("r"))
      .where(col("r") > 0)
      .select(col("k").as("x"),
        round(log(col("r")) * 1e6, 0).cast("long").as("y"))
    val g = pts.agg(count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("y")).as("sxy"),
      sum(col("y") * col("y")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    val lambda = -(d(num) / d(dx)) / 1e6
    val intercept = (d(col("sy")) * d(dx) - d(num) * d(col("sx"))) /
      (d(col("n")) * d(dx)) / 1e6
    val ln2 = lit(0.693147180559945)
    g.select(col("n").as("n_points"),
      when(dx =!= 0, round(lambda, 6)).as("decay_rate"),
      when(dx =!= 0, round(exp(intercept), 6)).as("r0_fit"),
      when(dx =!= 0 && lambda > 0, round(ln2 / lambda, 6)).as("half_life_days"),
      when(dx =!= 0 && dy =!= 0,
        round(d(num) * d(num) / (d(dx) * d(dy)), 6)).as("r2"))
  }

  /** Event-type affinity matrix: for every canonical type pair
    * (a < b), how many users did both, the pair's user-level support,
    * lift = P(A∩B)/(P(A)·P(B)) and Jaccard — the "users who do A
    * also do B" readout behind cross-sell and feature-bundling calls
    * (the user-level twin of [[graft.operators.Graph
    * .associationRules]], which works on transaction baskets).
    *
    * Determinism: everything is exact distinct counts; lift's
    * products cast to double factor-first (counts² overflow nothing
    * at double precision ≤ 2^53), round 6.
    *
    * Scale shape: the corpus reduces ONCE to the distinct
    * (user, type) table; the pair explode is a user-keyed self-join
    * whose fan-out is bounded by |types|² per user; all remaining
    * aggregates are type-pair-bounded. The |types|-row support table
    * broadcasts onto the pair table.
    */
  def typeAffinity(events: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val ut = events.select(col("user_id").as("u"), col("event_type").as("t"))
      .distinct()
    val nUsers = ut.select(col("u")).distinct().agg(count(lit(1)).as("n_users"))
    val perType = ut.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    val pairs = ut.as("a").join(ut.as("b"),
        col("a.u") === col("b.u") && col("a.t") < col("b.t"))
      .groupBy(col("a.t").as("type_a"), col("b.t").as("type_b"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("t").as("type_a"), col("n_t").as("n_a"))),
        Seq("type_a"))
      .join(broadcast(perType.select(col("t").as("type_b"), col("n_t").as("n_b"))),
        Seq("type_b"))
      .crossJoin(broadcast(nUsers)) // 1-row scalar
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"), col("n_both"),
        round(d(col("n_both")) / d(col("n_users")), 6).as("support"),
        round(d(col("n_both")) * d(col("n_users"))
              / (d(col("n_a")) * d(col("n_b"))), 6).as("lift"),
        round(d(col("n_both"))
              / d(col("n_a") + col("n_b") - col("n_both")), 6).as("jaccard"))
  }

  /** Unordered (set-completion) funnel: users who performed ALL the
    * `steps` in ANY order, with the exact span from their first step
    * event to the moment the set completed (= the latest of the
    * per-step FIRST occurrences) — the basket/checklist twin of the
    * strictly-sequenced [[funnel]] (activation checklists and
    * feature-adoption sets don't care about order; a strict funnel
    * undercounts them).
    *
    * Determinism: one conditional min-per-step aggregate per user on
    * exact epoch-millis; completion requires every min non-null.
    * Scale shape: ONE user-keyed hash aggregate over the filtered
    * scan (map-side partials), no window, no join.
    */
  def funnelUnordered(events: DataFrame, steps: Seq[String]): DataFrame = {
    val ms = unix_millis(col("ts"))
    val mins = steps.zipWithIndex.map { case (s, i) =>
      min(when(col("event_type") === s, ms)).as(s"t$i")
    }
    val cols = steps.indices.map(i => col(s"t$i"))
    events.where(col("event_type").isin(steps: _*))
      .groupBy("user_id")
      .agg(mins.head, mins.tail: _*)
      .where(cols.map(_.isNotNull).reduce(_ && _))
      .select(col("user_id"),
        (greatest(cols: _*) - least(cols: _*)).as("ms_to_complete"))
  }

  /** DAU / WAU / MAU active-user rollup with stickiness ratios — the
    * product-analytics headline metrics. Trailing windows (day d
    * counts users active in (d−6..d] / (d−29..d]) computed EXACTLY:
    * a sliding count-distinct can't be expressed as a window
    * aggregate (distinct doesn't decompose), so the corpus first
    * reduces to the bounded (user, day) table, each user-day then
    * replicates onto the ≤30 trailing days it keeps that user active
    * for, and one day-keyed distinct count per horizon finishes the
    * job. Early days carry partial windows (standard dashboard
    * semantics).
    *
    * Scale shape: the ONLY corpus-sized work is the first
    * distinct-user-day aggregate; the ×7/×30 replication happens on
    * the bounded user-day table (|users|·|days| rows), not raw
    * events. Exact longs; stickiness divides exact counts cast
    * double factor-first, round 6.
    */
  def activeUsers(events: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val epoch0 = lit(java.sql.Date.valueOf("1970-01-01"))
    val userDays = events
      .select(col("user_id"),
              datediff(to_date(col("ts")), epoch0).cast("long").as("ep"))
      .distinct()
    def horizon(len: Int, name: String) = userDays
      .withColumn("day_ep", explode(sequence(col("ep"), col("ep") + (len - 1))))
      .groupBy("day_ep")
      .agg(countDistinct(col("user_id")).as(name))
    val dau = userDays.groupBy(col("ep").as("day_ep"))
      .agg(countDistinct(col("user_id")).as("dau"))
    // MAU's day set ⊇ WAU's ⊇ DAU's (wider trailing window); base on
    // MAU so an idle day still reports its rolling actives, and trim
    // the windows spilling past the observed range
    val lastDay = userDays.agg(max(col("ep")).as("mx"))
    horizon(30, "mau")
      .join(horizon(7, "wau"), Seq("day_ep"), "left")
      .join(dau, Seq("day_ep"), "left")
      .crossJoin(broadcast(lastDay)) // 1-row scalar
      .where(col("day_ep") <= col("mx"))
      .select(date_add(epoch0, col("day_ep").cast("int")).as("day"),
        coalesce(col("dau"), lit(0L)).as("dau"),
        coalesce(col("wau"), lit(0L)).as("wau"), col("mau"),
        when(coalesce(col("wau"), lit(0L)) > 0,
          round(d(coalesce(col("dau"), lit(0L))) / d(col("wau")), 6))
          .as("stickiness_dw"),
        round(d(coalesce(col("dau"), lit(0L))) / d(col("mau")), 6)
          .as("stickiness_dm"))
  }

  /** Experiment power analysis — the PLANNING twin of [[cupedEffect]]
    * (CUPED shrinks the variance you have; this says what sample the
    * next test needs): from the observed per-user spend distribution,
    * the per-arm n required to detect each candidate minimum
    * detectable effect at α = 0.05 two-sided, power 0.8 —
    * n = 2·(z_{α/2}+z_β)²·σ²/δ², the two-sample z-test formula with
    * z_{0.025}+z_{0.8} = 1.959964 + 0.841621 pinned as literals (both
    * engines must square the SAME constant, not call their own
    * quantile functions). One row per MDE with a feasibility flag
    * against the observed population.
    *
    * Determinism: per-user cents and their moments are exact longs;
    * σ², μ, δ and the ceil enter doubles in one pinned sequence
    * (factor-first casts); n_per_arm = ceil cast long. Degenerate
    * guards: n < 2 or zero variance nulls the estimate.
    *
    * Scale shape: one filtered scan → per-user hash aggregate →
    * 3-sum 1-row aggregate; the MDE grid explodes from a literal
    * array on that single row. Nothing data-sized survives the first
    * aggregate.
    */
  def powerAnalysis(events: DataFrame, eventType: String = "purchase",
                    mdes: Seq[Double] = Seq(0.01, 0.02, 0.05, 0.10)): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val perUser = events.where(col("event_type") === eventType)
      .select(col("user_id"), round(col("value") * 100, 0).cast("long").as("c"))
      .groupBy("user_id").agg(sum(col("c")).as("y"))
    val g = perUser.agg(count(lit(1)).as("n"),
      sum(col("y")).as("s1"), sum(col("y") * col("y")).as("s2"))
    val zsum = lit(1.959964) + lit(0.841621)
    val mu = d(col("s1")) / d(col("n"))
    val variance = (d(col("n")) * d(col("s2")) - d(col("s1")) * d(col("s1"))) /
      (d(col("n")) * (d(col("n")) - 1.0))
    val delta = col("mde") * mu
    val nPerArm = ceil(lit(2.0) * zsum * zsum * variance / (delta * delta))
      .cast("long")
    val ok = col("n") >= 2 && variance > 0 && delta > 0
    g.select(col("n"), col("s1"), col("s2"),
        explode(array(mdes.map(lit): _*)).as("mde"))
      .select(col("mde"),
        round(mu / 100.0, 6).as("baseline_mean"),
        when(ok, round(sqrt(variance) / 100.0, 6)).as("stddev"),
        when(ok, round(delta / 100.0, 6)).as("target_delta"),
        when(ok, nPerArm).as("n_per_arm"),
        col("n").as("n_users_observed"),
        when(ok, nPerArm * 2 <= col("n")).as("feasible_now"))
  }

  /** Day-of-week seasonality profile per event type: for each ISO
    * weekday (1=Monday), the mean daily value and the seasonal index
    * (weekday mean ÷ overall daily mean — >1 means that weekday runs
    * hot). The de-seasonalization companion to [[dailyTrendOls]]:
    * trend says where the level goes, this says which weekdays to
    * normalize before alerting on it.
    *
    * Exactness: daily cents are exact longs; the index is the exact
    * ratio (s_dow·n_all)/(n_dow·s_all) with every factor cast to
    * double FIRST (one IEEE multiply each side, one divide) — no
    * mean-of-means double chain. Scale shape: raw events reduce to
    * |types|·|days| once; both aggregates and the join run on that
    * bounded table.
    */
  def dowSeasonality(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val dw = daily
      .withColumn("dow_iso", (weekday(col("day")) + 1).cast("long"))
      .groupBy("event_type", "dow_iso")
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("s"))
    val tot = daily.groupBy("event_type")
      .agg(count(lit(1)).as("n_all"), sum(col("cents")).as("s_all"))
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    dw.join(tot, Seq("event_type"))
      .select(col("event_type"), col("dow_iso"), col("n_days"),
              round(d(col("s")) / d(col("n_days")) / 100.0, 6).as("mean_value"),
              round(d(col("s")) * d(col("n_all"))
                    / (d(col("n_days")) * d(col("s_all"))), 6).as("seasonal_index"))
  }

  /** Seasonally-adjusted daily anomaly screen: divide each day's
    * value by its [[dowSeasonality]] index, then z-score the ADJUSTED
    * series per event type — a quiet Sunday no longer trips the alarm
    * and a merely-average Sunday spike does (the composition
    * [[valueAnomalies]] can't see: its per-hour stats normalize time
    * of day, this normalizes day of week at daily grain).
    *
    * Determinism: the index and the adjusted value round to 6; the
    * adjusted series scales by 1e3 to exact longs for the moment sums
    * (bound: |adj| ≲ 3·10⁶ per day at ~10³ days keeps Σx² < 2⁶³ —
    * the daily table is bounded, so this holds at any corpus scale;
    * coarser scale if values ever grow 100×). The z divides doubles
    * in the engine's exact sequence. Full report (flag, not filter) —
    * thresholds are policy, the table is the artifact.
    */
  def deseasonalizedAnomalies(events: DataFrame,
                              zThreshold: Double = 2.0): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
    val idx = dowSeasonality(events)
      .select(col("event_type"), col("dow_iso"), col("seasonal_index"))
    val adj = daily
      .withColumn("dow_iso", (weekday(col("day")) + 1).cast("long"))
      .join(idx, Seq("event_type", "dow_iso"))
      .withColumn("adj",
        round(col("cents").cast("double") / 100.0 / col("seasonal_index"), 6))
      .withColumn("a3", round(col("adj") * 1e3, 0).cast("long"))
    val stats = adj.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("a3")).as("s1"),
           sum(col("a3") * col("a3")).as("s2"))
      .where(col("n") >= 2)
      .withColumn("mean", col("s1").cast("double") / (col("n") * 1e3))
      .withColumn("variance",
        (col("s2") / 1e6 - (col("s1") / 1e3) * (col("s1") / 1e3) / col("n"))
          / (col("n") - 1))
      .where(col("variance") > 0)
    adj.join(broadcast(stats.select("event_type", "mean", "variance")),
             Seq("event_type"))
      .withColumn("z", round((col("adj") - col("mean")) / sqrt(col("variance")), 6))
      .select(col("event_type"), col("day"),
              round(col("cents") / 100.0, 2).as("value"),
              col("seasonal_index"), col("adj").as("adj_value"), col("z"),
              (abs(col("z")) > zThreshold).as("is_anomaly"))
  }

  def dailyTrendOls(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .withColumn("x",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long"))
    val g = daily.groupBy("event_type").agg(
      count(lit(1)).as("n"), max(col("x")).as("xm"),
      sum(col("x")).as("sx"), sum(col("cents")).as("sy"),
      sum(col("x") * col("x")).as("sxx"),
      sum(col("x") * col("cents")).as("sxy"),
      sum(col("cents") * col("cents")).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dx = col("n") * col("sxx") - col("sx") * col("sx")
    val dy = col("n") * col("syy") - col("sy") * col("sy")
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val slopeCents = d(num) / d(dx)
    val interceptCents =
      (d(col("sy")) * d(dx) - d(num) * d(col("sx"))) / (d(col("n")) * d(dx))
    g.select(col("event_type"), col("n").as("n_days"),
      when(col("n") > 1 && dx =!= 0, round(slopeCents / 100.0, 6)).as("slope"),
      when(col("n") > 1 && dx =!= 0, round(interceptCents / 100.0, 6)).as("intercept"),
      when(col("n") > 1 && dx =!= 0 && dy =!= 0,
        round(d(num) * d(num) / (d(dx) * d(dy)), 6)).as("r2"),
      when(col("n") > 1 && dx =!= 0,
        round((interceptCents + slopeCents * d(col("xm") + 1)) / 100.0, 6))
        .as("forecast_next"))
  }

  /** Rolling-origin backtest of [[dailyTrendOls]] — the honesty
    * check a single in-sample R² can't give: for each of the last
    * `lastDays` days per event type, fit the OLS trend on STRICTLY
    * EARLIER days only and report predicted vs actual. Each day's
    * training moments (n, Σx, Σy, Σx², Σxy) come from ONE
    * cumulative-window pass over the bounded per-type day table —
    * every origin's fit is closed-form from its prefix row, so J
    * backtests cost one window, not J scans.
    *
    * Determinism: the prefix moments are exact long sums (cents ×
    * epoch-day), the per-day solve is the [[dailyTrendOls]] fixed
    * double expression, predictions/errors round to 6 — term-for-
    * term in the SQL twin. Guards: days with fewer than 2 training
    * points (or a degenerate x-spread) emit null prediction.
    *
    * Scale shape: one day-grain hash agg, then windows over the
    * bounded (type × day) table — the [[anomalies]] family's grain,
    * never a per-event window.
    */
  def forecastBacktest(events: DataFrame, lastDays: Int = 7): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .withColumn("x",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long"))
    val w = Window.partitionBy("event_type").orderBy("x")
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("cents")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .withColumn("sxy", sum(col("x") * col("cents")).over(w))
      .withColumn("rn", row_number().over(
        Window.partitionBy("event_type").orderBy(desc("x"))))
      .where(col("rn") <= lastDays)
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dxs = col("n") * col("sxx") - col("sx") * col("sx")
    val predRaw = ((d(col("sy")) * d(dxs) - d(num) * d(col("sx")))
        / (d(col("n")) * d(dxs))
      + d(num) / d(dxs) * d(col("x"))) / 100.0
    val ok = col("n") > 1 && dxs =!= 0
    pre.select(col("event_type"), col("day"), col("n").as("n_train"),
      round(col("cents") / 100.0, 2).as("actual"),
      when(ok, round(predRaw, 6)).as("predicted"),
      when(ok, round(predRaw - d(col("cents")) / 100.0, 6)).as("error"))
  }

  /** Ratio-metric readout with DELTA-METHOD uncertainty (Deng,
    * Knoblich & Lu, KDD'18 practice): revenue-per-view style metrics
    * are ratios of per-user sums, and the naive t-test on per-user
    * ratios is wrong (users with huge denominators count the same as
    * one-view users; per-user ratios may not even exist). The
    * estimator is R = Σx/Σy over users; its variance comes from the
    * first-order Taylor expansion var(x̄/ȳ) ≈ (varx + R²·vary −
    * 2R·cov)/(n·ȳ²), all moments per-USER (the randomization unit).
    *
    * Determinism: per-user x (cents) and y (counts) are exact longs;
    * the six corpus moments accumulate as decimal(38,0); ratio, SE
    * and the ±1.96 CI are one fixed double expression each, rounded
    * to 6 and mirrored in the SQL twin. Scale: one filter + user
    * aggregate + 1-row moment aggregate, no window.
    */
  def ratioMetric(events: DataFrame, numType: String = "purchase",
                  denType: String = "view"): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val perUser = events
      .where(col("event_type") === numType || col("event_type") === denType)
      .select(col("user_id"),
        when(col("event_type") === numType,
          round(col("value") * 100, 0).cast("long")).otherwise(lit(0L)).as("x"),
        when(col("event_type") === denType, lit(1L)).otherwise(lit(0L)).as("y"))
      .groupBy("user_id")
      .agg(sum(col("x")).as("x"), sum(col("y")).as("y"))
    val g = perUser.agg(count(lit(1)).as("n"),
      sum(col("x")).cast(dec).as("sx"), sum(col("y")).cast(dec).as("sy"),
      sum(col("x").cast(dec) * col("x").cast(dec)).as("sxx"),
      sum(col("y").cast(dec) * col("y").cast(dec)).as("syy"),
      sum(col("x").cast(dec) * col("y").cast(dec)).as("sxy"))
    val ybar = d(col("sy")) / d(col("n"))
    val r = d(col("sx")) / d(col("sy"))
    val varx = (d(col("sxx")) - d(col("sx")) * d(col("sx")) / d(col("n"))) /
      (d(col("n")) - 1.0)
    val vary = (d(col("syy")) - d(col("sy")) * d(col("sy")) / d(col("n"))) /
      (d(col("n")) - 1.0)
    val cov = (d(col("sxy")) - d(col("sx")) * d(col("sy")) / d(col("n"))) /
      (d(col("n")) - 1.0)
    val se = sqrt((varx + r * r * vary - lit(2.0) * r * cov) / d(col("n"))) / ybar
    val ok = col("sy") > 0 && col("n") > 1
    g.select(col("n").cast("long").as("n_users"),
      when(col("sy") > 0, round(r / 100.0, 6)).as("ratio"),
      when(ok, round(se / 100.0, 6)).as("se"),
      when(ok, round((r - lit(1.96) * se) / 100.0, 6)).as("ci_lo"),
      when(ok, round((r + lit(1.96) * se) / 100.0, 6)).as("ci_hi"))
  }

  /** Sample-ratio-mismatch gate — the first A/B health check: do the
    * realized arm sizes match the designed 50/50 split? A χ² with
    * df=1 on distinct-USER counts per arm; chi2 > 3.841 (α=0.05)
    * flags a broken randomizer/logging path, which invalidates any
    * downstream readout regardless of its p-value. Exact integer
    * counts, one fixed double expression, no window.
    */
  def srmCheck(events: DataFrame): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val arms = events.select(col("user_id")).distinct()
      .select(pmod(col("user_id"), lit(2L)).as("arm"))
      .agg(sum(when(col("arm") === 0, lit(1L)).otherwise(lit(0L))).as("n_a"),
           sum(when(col("arm") === 1, lit(1L)).otherwise(lit(0L))).as("n_b"))
    val e = (d(col("n_a")) + d(col("n_b"))) / 2.0
    val chi2 = (d(col("n_a")) - e) * (d(col("n_a")) - e) / e +
      (d(col("n_b")) - e) * (d(col("n_b")) - e) / e
    arms.select(col("n_a").cast("long").as("n_a"),
      col("n_b").cast("long").as("n_b"),
      round(chi2, 6).as("chi2"),
      (chi2 > lit(3.841)).as("srm_detected"))
  }

  /** Split-conformal prediction interval for the next-day forecast —
    * the distribution-free error bar [[dailyTrendOls]]'s point
    * forecast lacks: days split deterministically by epoch-day
    * parity into a training half (OLS fit) and a calibration half
    * (absolute residuals); q̂ is the ⌈(n_cal+1)(1−α)⌉-th smallest
    * calibration residual and the interval is forecast ± q̂, with
    * finite-sample ≥1−α coverage under exchangeability (Vovk et al.;
    * Lei et al., JASA 2018). A type whose calibration half is too
    * small for the quantile index (or whose fit is degenerate)
    * reports null interval — "cannot certify at this α", never a
    * silently-extrapolated bound.
    *
    * Determinism: exact long training moments, the fixed
    * [[forecastBacktest]] double solve, residuals rounded to 6 and
    * ranked (resid, day); scale shape: two day-grain aggregates, a
    * broadcast of the per-type moment row, and a per-type window
    * over the bounded calibration table.
    */
  def conformalForecast(events: DataFrame, alpha: Double = 0.1): DataFrame = {
    def d(c: org.apache.spark.sql.Column) = c.cast("double")
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("cents"))
      .withColumn("x",
        datediff(col("day"), lit(java.sql.Date.valueOf("1970-01-01"))).cast("long"))
    val xmax = daily.groupBy("event_type")
      .agg(max(col("x")).as("xm"), count(lit(1)).as("n_days"))
    val g = daily.where(pmod(col("x"), lit(2L)) === 0)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("cents")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("cents")).as("sxy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val dxs = col("n") * col("sxx") - col("sx") * col("sx")
    def predRaw(xc: org.apache.spark.sql.Column) =
      ((d(col("sy")) * d(dxs) - d(num) * d(col("sx")))
          / (d(col("n")) * d(dxs))
        + d(num) / d(dxs) * d(xc)) / 100.0
    val ok = col("n") > 1 && dxs =!= 0
    val cal = daily.where(pmod(col("x"), lit(2L)) === 1)
      .join(broadcast(g), "event_type")
      .where(ok)
      .withColumn("resid",
        round(abs(predRaw(col("x")) - d(col("cents")) / 100.0), 6))
    val nc = cal.groupBy("event_type").agg(count(lit(1)).as("n_cal"))
    val wr = Window.partitionBy("event_type").orderBy("resid", "day")
    val q = cal.withColumn("rk", row_number().over(wr))
      .join(broadcast(nc), "event_type")
      .where(col("rk") ===
        ceil((d(col("n_cal")) + 1.0) * lit(1 - alpha)).cast("long"))
      .select(col("event_type"), col("n_cal"), col("resid").as("q_hat"))
    val f6 = round(predRaw(col("xm") + 1), 6)
    xmax.join(g, "event_type")
      .join(q, Seq("event_type"), "left")
      .select(col("event_type"), col("n").as("n_train"), col("n_cal"),
        when(ok, f6).as("forecast_next"), col("q_hat"),
        when(ok && col("q_hat").isNotNull, round(f6 - col("q_hat"), 6)).as("lo"),
        when(ok && col("q_hat").isNotNull, round(f6 + col("q_hat"), 6)).as("hi"))
  }

  /** POSITION-BASED (U-shaped 40/20/40) attribution — the rule-based
    * midpoint between last-touch (all credit to the final touch) and
    * Shapley/Markov (model-based): each conversion's value splits
    * 40% to its FIRST touch, 40% to its LAST, and the remaining 20%
    * evenly across the middles; one touch takes 100%, two take 50/50.
    * Touch = a `touchTypes` event by the same user within
    * `lookbackMs` before the conversion; conversions with no touch
    * credit 'direct'.
    *
    * Scale shape: conversions range-join touches per user inside the
    * bounded lookback (the [[cepPattern]] regime — per-user×window
    * fan-out, never a corpus self-join); per-conversion position
    * ranks run window-partitioned BY CONVERSION over its bounded
    * touch list. Credit shares round to 6 and scale to exact longs
    * before the channel sum (order-independent), so revenue splits
    * hash-match; per-channel credited revenue sums those longs.
    */
  def positionAttribution(events: DataFrame, touchTypes: Seq[String],
                          conversionType: String,
                          lookbackMs: Long): DataFrame = {
    def d(c: Column) = c.cast("double")
    val conv = events.where(col("event_type") === conversionType)
      .select(col("event_id").as("conv_id"), col("user_id"),
        unix_millis(col("ts")).as("cms"),
        round(col("value") * 100, 0).cast("long").as("cents"))
    val touch = events.where(col("event_type").isin(touchTypes: _*))
      .select(col("event_id").as("touch_id"), col("user_id"),
        col("event_type").as("channel"), unix_millis(col("ts")).as("tms"))
    val joined = conv.join(touch, Seq("user_id"))
      .where(col("tms") <= col("cms") && col("tms") > col("cms") - lookbackMs)
    val wAsc = Window.partitionBy("conv_id").orderBy(col("tms"), col("touch_id"))
    val ranked = joined
      .withColumn("rk", row_number().over(wAsc))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("conv_id")))
    val share =
      when(col("n") === 1, lit(1.0))
        .when(col("n") === 2, lit(0.5))
        .when(col("rk") === 1 || col("rk") === col("n"), lit(0.4))
        .otherwise(round(lit(0.2) / d(col("n") - 2), 6))
    val credited = ranked.select(col("conv_id"), col("channel"),
      round(d(col("cents")) / 100.0 * share, 6).as("credit"))
    val direct = conv
      .join(joined.select(col("conv_id")).distinct(), Seq("conv_id"), "left_anti")
      .select(col("conv_id"), lit("direct").as("channel"),
        round(d(col("cents")) / 100.0, 6).as("credit"))
    credited.unionByName(direct)
      .groupBy("channel")
      .agg(count(lit(1)).as("n_credits"),
        (sum(round(col("credit") * 1e6, 0).cast("long")) / lit(1e6))
          .as("credited_revenue"))
  }
}
