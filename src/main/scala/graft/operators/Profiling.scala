package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data profiling and constraint validation — the deequ/Glue-style
  * quality layer a pipeline runs before trusting an ingest batch.
  *
  * Scale shape: each report is ONE aggregate pass over the table
  * (multiple distinct-aggregates plan as a single Expand + aggregate;
  * map-side partials shrink the shuffle to one row), then a constant-
  * size explode into the long-format report — profiling a 100 TB
  * table costs one scan, never one scan per column.
  */
object Profiling {

  /** Wide one-row aggregate → long-format report: explode one struct
    * per reported item and star-expand. The shared tail of every
    * profiling operator.
    */
  private def longReport(row: DataFrame, items: Seq[Column]): DataFrame =
    row.select(explode(array(items: _*)).as("_r")).select(col("_r.*"))

  /** EXACT two-sample Kolmogorov–Smirnov statistic between the
    * `valueCol` distributions of two tables — the distribution-drift
    * test [[profileDrift]]'s summary stats can't give (equal means
    * and counts can hide a reshaped distribution).
    *
    * KS = max over pooled values v of |F_A(v) − F_B(v)|, ECDFs
    * evaluated at each distinct value with that value included. Every
    * cumulative count is an exact integer, each ECDF value one double
    * division, the max allocation-free — so the statistic itself is
    * oracle-checkable (round 6), no sketch, no sampling.
    *
    * Scale shape — the point of this implementation: an ECDF needs a
    * GLOBAL prefix sum, and the naive window (ORDER BY v with no
    * partition key) collapses 100 TB onto one reducer. Instead, the
    * classical distributed prefix sum: per-value counts (one hash
    * aggregate, |distinct| rows) range-repartition and sort by value;
    * each partition's subtotal collects to the driver (≤ numPartitions
    * rows — control-plane), exclusive offsets broadcast back, and one
    * mapPartitions pass adds offset + running sum. Every stage is
    * parallel; the only driver data is one row per partition. The
    * result is provably independent of the (sampled) range-partitioner
    * boundaries: offsets are computed FROM the actual partitions.
    */
  def ksDrift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
              numPartitions: Int = 32): DataFrame = {
    val spark = dfA.sparkSession
    import spark.implicits._
    val counts = dfA.select(col(valueCol).cast("double").as("v"), lit(1L).as("ca"), lit(0L).as("cb"))
      .unionAll(dfB.select(col(valueCol).cast("double").as("v"), lit(0L).as("ca"), lit(1L).as("cb")))
      .where(col("v").isNotNull)
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
      .repartitionByRange(numPartitions, col("v"))
      .sortWithinPartitions("v")
      .persist()
    val subtotals = counts.select(spark_partition_id().as("pid"), col("ca"), col("cb"))
      .groupBy("pid").agg(sum("ca").as("ta"), sum("cb").as("tb"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    val nA = subtotals.map(_._2._1).sum
    val nB = subtotals.map(_._2._2).sum
    // exclusive prefix offsets per partition id (control-plane array)
    val offsets: Map[Int, (Long, Long)] = {
      var (accA, accB) = (0L, 0L)
      subtotals.map { case (pid, (ta, tb)) =>
        val o = pid -> (accA, accB); accA += ta; accB += tb; o
      }.toMap
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    val diffs = counts.select("v", "ca", "cb").as[(Double, Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var (ca, cb) = bOff.value.getOrElse(pid, (0L, 0L))
        it.map { case (_, a, b) =>
          ca += a; cb += b
          math.abs(ca.toDouble / nA - cb.toDouble / nB)
        }
      }
    val out = diffs.toDF("d")
      .agg(round(max(col("d")), 6).as("ks_stat"))
      .select(col("ks_stat"), lit(nA).as("n_a"), lit(nB).as("n_b"))
      .localCheckpoint()
    counts.unpersist(blocking = false)
    out
  }

  /** AUTO-GENERATED EXPECTATION SUITE — the profile-then-validate
    * loop (the Great Expectations workflow as two aggregates): learn
    * numeric bounds and a null budget from a REFERENCE snapshot, then
    * check the CURRENT snapshot against them. Per column: the learned
    * [min, max], the observed range, the two range verdicts, and the
    * null-rate verdict (current null share may not exceed the
    * reference's rounded share). The hand-written [[quality_checks]]
    * encode what a human knows; this encodes what the last good
    * snapshot knew — the check a pipeline can bootstrap on day one.
    *
    * Exactness: native min/max (no string renderings), exact counts;
    * null shares round to 6 before the comparison so the verdict is
    * engine-stable. Two 1-row aggregates crossed into a |cols|-row
    * report — bounded everything.
    */
  def autoExpectations(ref: DataFrame, cur: DataFrame,
                       cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    def d(c: Column) = c.cast("double")
    def prof(df: DataFrame, tag: String) =
      df.agg(count(lit(1)).as(s"n_$tag"),
        cols.flatMap(c => Seq(
          min(col(c)).as(s"min_${tag}_$c"), max(col(c)).as(s"max_${tag}_$c"),
          count(col(c)).as(s"nn_${tag}_$c"))): _*)
    val both = prof(ref, "r").crossJoin(broadcast(prof(cur, "c"))) // 1-row × 1-row
    cols.map { c =>
      val nullR = round((d(col("n_r")) - d(col(s"nn_r_$c"))) / d(col("n_r")), 6)
      val nullC = round((d(col("n_c")) - d(col(s"nn_c_$c"))) / d(col("n_c")), 6)
      both.select(lit(c).as("col_name"),
        col(s"min_r_$c").cast("double").as("exp_min"),
        col(s"max_r_$c").cast("double").as("exp_max"),
        col(s"min_c_$c").cast("double").as("obs_min"),
        col(s"max_c_$c").cast("double").as("obs_max"),
        (col(s"min_c_$c") >= col(s"min_r_$c")).as("min_ok"),
        (col(s"max_c_$c") <= col(s"max_r_$c")).as("max_ok"),
        nullR.as("exp_null_share"), nullC.as("obs_null_share"),
        (nullC <= nullR).as("null_ok"))
    }.reduce(_ unionByName _)
  }

  /** CANDIDATE-KEY discovery — which columns could serve as a unique
    * key: per column, exact non-null and distinct counts, the
    * distinct ratio, and the key verdict (distinct == rows ==
    * non-null). The schema-inference companion to [[fdCheck]]'s
    * pairwise dependencies: a profiler runs this before choosing
    * join/dedup keys on an undocumented feed.
    *
    * Exactness: NATIVE-type distinct counts (never a string
    * rendering — engines disagree on float/date formatting, they
    * cannot disagree on value equality). One pass: Spark plans the
    * multi-column count(DISTINCT) set via a single Expand (|cols|×
    * row fan-out, one shuffle), and everything after the 1-row
    * aggregate is bounded column math.
    */
  def keyCandidates(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    def d(c: Column) = c.cast("double")
    val aggs = cols.flatMap(c => Seq(
      countDistinct(col(c)).as(s"nd_$c"),
      count(col(c)).as(s"nn_$c")))
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    cols.map { c =>
      one.select(lit(c).as("col_name"), col("n_rows"),
        col(s"nn_$c").as("n_nonnull"), col(s"nd_$c").as("n_distinct"),
        round(d(col(s"nd_$c")) / d(col("n_rows")), 6).as("distinct_ratio"),
        (col(s"nd_$c") === col("n_rows") && col(s"nn_$c") === col("n_rows"))
          .as("is_key"))
    }.reduce(_ unionByName _)
  }

  /** EXACT 1-Wasserstein (earth-mover) drift between two tables'
    * value distributions — ∫|F_A − F_B| dx over the merged support:
    * the INTEGRAL companion to [[ksDrift]]'s max (KS sees the single
    * worst vertical gap; W₁ sees how much probability mass moved how
    * FAR — a small shift of everything and a large shift of a sliver
    * can share a KS yet differ 100× in W₁, and W₁ is the metric with
    * units of the column). Per merged distinct value v with
    * successor v′: term = |F_A(v) − F_B(v)|·(v′ − v), summed.
    *
    * Scale shape: the [[ksDrift]] distributed-ECDF discipline — one
    * hash aggregate to per-value counts, range repartition,
    * ≤numPartitions-row subtotal collect (control-plane), exclusive
    * offsets broadcast, one mapPartitions running-sum pass. The
    * cross-partition successor comes from the per-partition FIRST
    * values (a second ≤numPartitions-row control-plane collect).
    *
    * Determinism: ECDF ratios are fixed IEEE divisions of exact
    * longs; each term rounds to 9 and ×1e9-scales to an exact long
    * IN CATALYST (not JVM math — Spark's round half-ups exactly like
    * the oracle's) before the order-independent sum.
    */
  def w1Drift(dfA: DataFrame, dfB: DataFrame, valueCol: String,
              numPartitions: Int = 32): DataFrame = {
    val spark = dfA.sparkSession
    import spark.implicits._
    val counts = dfA.select(col(valueCol).cast("double").as("v"), lit(1L).as("ca"), lit(0L).as("cb"))
      .unionAll(dfB.select(col(valueCol).cast("double").as("v"), lit(0L).as("ca"), lit(1L).as("cb")))
      .where(col("v").isNotNull)
      .groupBy("v").agg(sum("ca").as("ca"), sum("cb").as("cb"))
      .repartitionByRange(numPartitions, col("v"))
      .sortWithinPartitions("v")
      .persist()
    val subtotals = counts.select(spark_partition_id().as("pid"), col("ca"), col("cb"))
      .groupBy("pid").agg(sum("ca").as("ta"), sum("cb").as("tb"))
      .collect().map(r => (r.getInt(0), (r.getLong(1), r.getLong(2))))
      .sortBy(_._1)
    val nA = subtotals.map(_._2._1).sum
    val nB = subtotals.map(_._2._2).sum
    val offsets: Map[Int, (Long, Long)] = {
      var (accA, accB) = (0L, 0L)
      subtotals.map { case (pid, (ta, tb)) =>
        val o = pid -> (accA, accB); accA += ta; accB += tb; o
      }.toMap
    }
    // first value of each non-empty partition (≤numPartitions rows,
    // control-plane): partition p's LAST value takes its successor
    // from the next non-empty partition's first
    val firsts = counts.select(spark_partition_id().as("pid"), col("v"))
      .groupBy("pid").agg(min(col("v")).as("fv"))
      .collect().map(r => (r.getInt(0), r.getDouble(1))).sortBy(_._1)
    val nextFirst: Map[Int, Double] = subtotals.map(_._1).map { pid =>
      pid -> firsts.collectFirst { case (p, fv) if p > pid => fv }
    }.collect { case (pid, Some(fv)) => pid -> fv }.toMap
    val bOff = spark.sparkContext.broadcast(offsets)
    val bNext = spark.sparkContext.broadcast(nextFirst)
    val terms = counts.select("v", "ca", "cb").as[(Double, Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var (ca, cb) = bOff.value.getOrElse(pid, (0L, 0L))
        var prev = Option.empty[(Double, Double)] // (v, |Fa-Fb| after v)
        val out = scala.collection.mutable.ArrayBuffer.empty[Double]
        it.foreach { case (v, a, b) =>
          prev.foreach { case (pv, gap) => out += gap * (v - pv) }
          ca += a; cb += b
          prev = Some((v, math.abs(ca.toDouble / nA - cb.toDouble / nB)))
        }
        prev.foreach { case (pv, gap) =>
          bNext.value.get(pid).foreach(nv => out += gap * (nv - pv))
        }
        out.iterator
      }
    val out = terms.toDF("t")
      .select(round(round(col("t"), 9) * 1e9, 0).cast("long").as("t9"))
      .agg(round(sum(col("t9")) / 1e9, 6).as("w1"))
      .select(col("w1"), lit(nA).as("n_a"), lit(nB).as("n_b"))
      .localCheckpoint()
    counts.unpersist(blocking = false)
    out
  }

  /** EXACT order-statistic quantiles of an integer column at scale —
    * for each percentile p, the value at 1-based rank ⌈p·N/100⌉ —
    * via the same distributed prefix-sum discipline as [[ksDrift]]:
    * `approx_percentile` is a sketch (wrong answer by contract) and
    * the naive `percentile`/window form single-partitions the global
    * sort. Per-value counts (one hash aggregate) range-repartition
    * by value; per-partition subtotals collect to the driver (≤
    * numPartitions rows — control-plane), exclusive offsets broadcast
    * back; one mapPartitions pass walks the running cumulative count
    * and emits the value whose cumulative range covers each target
    * rank — exactly one (partition, value) matches per rank, so the
    * output is |pcts| rows with no further aggregation. All
    * arithmetic is exact integers (ranks via ceiling division), so
    * the DuckDB oracle hash-matches bit-for-bit.
    */
  def exactQuantiles(df: DataFrame, valueCol: String, pcts: Seq[Int],
                     numPartitions: Int = 32): DataFrame = {
    require(pcts.nonEmpty && pcts.forall(p => p >= 1 && p <= 100),
      "pcts must be within 1..100")
    val spark = df.sparkSession
    import spark.implicits._
    val counts = df.select(col(valueCol).cast("long").as("v"))
      .where(col("v").isNotNull)
      .groupBy("v").agg(count(lit(1)).as("cnt"))
      .repartitionByRange(numPartitions, col("v"))
      .sortWithinPartitions("v")
      .persist()
    val subtotals = counts.select(spark_partition_id().as("pid"), col("cnt"))
      .groupBy("pid").agg(sum("cnt").as("t"))
      .collect().map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    val n = subtotals.map(_._2).sum
    val offsets: Map[Int, Long] = {
      var acc = 0L
      subtotals.map { case (pid, t) => val o = pid -> acc; acc += t; o }.toMap
    }
    val ranks = pcts.sorted.map(p => (p.toLong, (n * p + 99L) / 100L))
    val bOff = spark.sparkContext.broadcast(offsets)
    val bRanks = spark.sparkContext.broadcast(ranks)
    val out = counts.select("v", "cnt").as[(Long, Long)].mapPartitions { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      var cum = bOff.value.getOrElse(pid, 0L)
      it.flatMap { case (v, c) =>
        val before = cum; cum += c
        bRanks.value.collect { case (p, r) if before < r && r <= cum => (p, r, v) }
      }
    }.toDF("pct", "rk", "value")
      .orderBy("pct")
      .localCheckpoint()
    counts.unpersist(blocking = false)
    out
  }

  /** Long-format column profile: per column, row count, null count,
    * exact distinct count, and min/max rendered as strings (one
    * report schema across column types). Callers pick columns whose
    * string rendering is engine-stable (integers, strings, dates);
    * floating-point columns belong in a numeric profile, not a
    * string-rendered one.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"_nn_$c"),
          countDistinct(col(c)).as(s"_nd_$c"),
          min(col(c)).cast("string").as(s"_mn_$c"),
          max(col(c)).cast("string").as(s"_mx_$c"))
    }
    longReport(df.agg(count(lit(1)).as("_n"), aggs: _*),
      cols.map(c =>
        struct(lit(c).as("col_name"),
               col("_n").as("n_rows"),
               (col("_n") - col(s"_nn_$c")).as("n_nulls"),
               col(s"_nd_$c").as("n_distinct"),
               col(s"_mn_$c").as("min_s"),
               col(s"_mx_$c").as("max_s"))))
  }

  /** Snapshot-over-snapshot DRIFT report — the monitoring step a daily
    * refresh runs before trusting new data: per column, old/new row
    * counts, null ratios, exact distinct counts, and whether min/max
    * moved. Min/max compare WITHIN each profile (null-safe string
    * equality of one engine's own renderings), so the emitted booleans
    * are rendering-stable even for floating-point columns where the
    * strings themselves are not cross-engine comparable.
    *
    * Scale shape: two [[profileColumns]] single-pass aggregates (one
    * per snapshot) joined on the |cols|-row report — corpus-sized work
    * is exactly two scans, the join is constant-size.
    */
  def profileDrift(oldDf: DataFrame, newDf: DataFrame,
                   cols: Seq[String]): DataFrame = {
    def side(df: DataFrame, sfx: String) =
      profileColumns(df, cols).select(
        col("col_name"),
        col("n_rows").as(s"n_rows_$sfx"),
        col("n_nulls").as(s"_nn_$sfx"),
        col("n_distinct").as(s"n_distinct_$sfx"),
        col("min_s").as(s"_mn_$sfx"),
        col("max_s").as(s"_mx_$sfx"))
    side(oldDf, "old").join(side(newDf, "new"), "col_name")
      .select(
        col("col_name"),
        col("n_rows_old"), col("n_rows_new"),
        round(col("_nn_old") / col("n_rows_old"), 6).as("null_ratio_old"),
        round(col("_nn_new") / col("n_rows_new"), 6).as("null_ratio_new"),
        col("n_distinct_old"), col("n_distinct_new"),
        (!(col("_mn_old") <=> col("_mn_new"))).as("min_changed"),
        (!(col("_mx_old") <=> col("_mx_new"))).as("max_changed"))
  }

  /** Long-format NUMERIC profile: per column, row/null counts, mean,
    * sample standard deviation, min, max. Moments come from EXACT
    * integer sums of values scaled by `scale` (rounded to the nearest
    * integer, accumulated as decimal(38,0) so no overflow and no
    * float-summation-order drift) — the same numbers derive in any
    * engine, so the rounded mean/std hash-match an oracle. Values
    * must carry at most log10(scale) meaningful decimals; |v|*scale
    * must fit a long (~9e18). `std` is null below two non-null
    * values (oracles must guard the same way).
    *
    * One aggregate pass regardless of column count, like
    * [[profileColumns]].
    */
  /** Distribution-SHAPE profile per group: mean, stddev, skewness,
    * and excess kurtosis from the first four EXACT raw moments —
    * the tail/asymmetry audit [[profileNumeric]]'s two moments can't
    * answer ("is this metric's tail why the mean moved"). Raw sums
    * Σx..Σx⁴ accumulate as decimal(38,0) of `scale`-scaled integers
    * (x⁴ of a scaled cent value overflows a LONG once the value
    * passes ~55 108 — 99999⁴ ≈ 1e20 > 2⁶³ — which is why every
    * term, per-element power products included, runs in
    * decimal(38,0); no long bound applies), so every engine sees the
    * same exact integers; the central-moment algebra then runs as a
    * PINNED sequence of IEEE ops (aᵢ = Σxⁱ/(n·scaleⁱ), then the
    * standard m₂/m₃/m₄ expansions, skew = m₃/(m₂·√m₂),
    * kurt = m₄/m₂² − 3), mirrored term-for-term in the oracle.
    * One hash aggregate; no window.
    */
  def momentsByGroup(df: DataFrame, groupCol: String, valueCol: String,
                     scale: Int = 100): DataFrame = {
    def d(c: Column) = c.cast("double")
    val sc = scale.toDouble
    val x = round(col(valueCol) * scale, 0).cast("decimal(38,0)")
    val g = df.select(col(groupCol).as("grp"), x.as("x"))
      .groupBy("grp")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
        sum(col("x") * col("x")).as("s2"),
        sum(col("x") * col("x") * col("x")).as("s3"),
        sum(col("x") * col("x") * col("x") * col("x")).as("s4"))
    val n = d(col("n"))
    val a1 = d(col("s1")) / (n * sc)
    val a2 = d(col("s2")) / (n * sc * sc)
    val a3 = d(col("s3")) / (n * sc * sc * sc)
    val a4 = d(col("s4")) / (n * sc * sc * sc * sc)
    val m2 = a2 - a1 * a1
    val m3 = a3 - lit(3.0) * a1 * a2 + lit(2.0) * a1 * a1 * a1
    val m4 = a4 - lit(4.0) * a1 * a3 + lit(6.0) * a1 * a1 * a2 -
      lit(3.0) * a1 * a1 * a1 * a1
    g.select(col("grp").as(groupCol), col("n"),
      round(a1, 6).as("mean"),
      round(sqrt(m2), 6).as("stddev"),
      round(m3 / (m2 * sqrt(m2)), 6).as("skewness"),
      round(m4 / (m2 * m2) - lit(3.0), 6).as("kurtosis_excess"))
  }

  /** TRIMMED and WINSORIZED means per group (Tukey's robust-location
    * classics): drop — or clamp to the fence values — exactly
    * ⌊trimPct·n⌋ observations from each tail before averaging, so a
    * handful of fat-finger rows cannot move the reported level the
    * way they move [[momentsByGroup]]' raw mean. Reported side by
    * side with the plain mean: a large gap IS the outlier alarm.
    *
    * Exactness — all integer until the final divisions: values scale
    * to cents longs; the per-(group, value) COUNT table (bounded by
    * distinct values, not rows) carries cumulative ranks, each value
    * row contributes c · |[start, end] ∩ [lo, hi]| to the trimmed
    * sum, and the winsorized sum adds t·(v_lo + v_hi) with the fence
    * values found by conditional min over the same cumulative table.
    * No corpus-level window — the rank window runs on the bounded
    * value-count table.
    */
  def trimmedMeans(df: DataFrame, groupCol: String, valueCol: String,
                   trimPct: Double = 0.05, scale: Int = 100): DataFrame = {
    require(trimPct >= 0 && trimPct < 0.5, s"trimPct in [0, 0.5): $trimPct")
    def d(c: Column) = c.cast("double")
    val sc = scale.toDouble
    val vc = df.select(col(groupCol).as("grp"),
        round(col(valueCol) * scale, 0).cast("long").as("c"))
      .groupBy("grp", "c").agg(count(lit(1)).as("k"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("grp").orderBy("c")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val cum = vc.withColumn("cum", sum(col("k")).over(w)) // bounded values
    val tot = vc.groupBy("grp")
      .agg(sum(col("k")).as("n"), sum(col("c") * col("k")).as("s"))
      .withColumn("t", floor(d(col("n")) * trimPct).cast("long"))
    val j = cum.join(tot, "grp")
      .withColumn("lo", col("t") + 1)
      .withColumn("hi", col("n") - col("t"))
      .withColumn("start", col("cum") - col("k") + 1)
      .withColumn("ov", greatest(lit(0L),
        least(col("cum"), col("hi")) - greatest(col("start"), col("lo")) + 1))
    j.groupBy("grp").agg(
        first(col("n")).as("n"), first(col("s")).as("s"),
        first(col("t")).as("t"),
        sum(col("c") * col("ov")).as("ts"),
        min(when(col("cum") >= col("lo"), col("c"))).as("v_lo"),
        min(when(col("cum") >= col("hi"), col("c"))).as("v_hi"))
      .select(col("grp").as(groupCol), col("n"),
        col("t").as("n_trimmed_each_side"),
        round(d(col("s")) / d(col("n")) / sc, 6).as("mean"),
        round(d(col("ts")) / d(col("n") - col("t") * 2) / sc, 6)
          .as("trimmed_mean"),
        round((d(col("ts")) + d(col("t")) * (d(col("v_lo")) + d(col("v_hi"))))
          / d(col("n")) / sc, 6).as("winsorized_mean"))
  }

  /** JARQUE–BERA normality test (Jarque & Bera 1980) per group —
    * JB = n/6 · (S² + K²/4) over the sample skewness S and excess
    * kurtosis K: the moment-based gate a pipeline runs before
    * trusting z-scores, CUSUM thresholds, or ±kσ outlier fences that
    * all assume normal tails. Asymptotically χ²(2) under normality;
    * `normal_at_5pct` compares against the 5.991 critical value
    * (policy constant, reported not hidden).
    *
    * Exactness: S and K come from [[momentsByGroup]]' exact
    * decimal(38,0) power sums and are already round-6; JB is one
    * fixed IEEE chain off those ROUNDED values, rounded 6 — the
    * oracle replays the same composition.
    */
  def jarqueBera(df: DataFrame, groupCol: String, valueCol: String,
                 scale: Int = 100): DataFrame = {
    def d(c: Column) = c.cast("double")
    momentsByGroup(df, groupCol, valueCol, scale)
      .withColumn("jb", round(d(col("n")) / 6.0
        * (col("skewness") * col("skewness")
          + col("kurtosis_excess") * col("kurtosis_excess") / 4.0), 6))
      .select(col(groupCol), col("n"), col("skewness"),
        col("kurtosis_excess"), col("jb"),
        (col("jb") <= 5.991).as("normal_at_5pct"))
  }

  def profileNumeric(df: DataFrame, cols: Seq[String], scale: Int = 100): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    require(scale > 0, "scale must be positive")
    val aggs: Seq[Column] = cols.flatMap { c =>
      val v = round(col(c) * scale, 0).cast("decimal(38,0)")
      Seq(count(col(c)).as(s"_nn_$c"),
          sum(v).as(s"_s1_$c"),
          sum(v * v).as(s"_s2_$c"),
          min(col(c)).cast("double").as(s"_mn_$c"),
          max(col(c)).cast("double").as(s"_mx_$c"))
    }
    val sc = scale.toDouble
    longReport(df.agg(count(lit(1)).as("_n"), aggs: _*),
      cols.map { c =>
        val nn = col(s"_nn_$c")
        val s1 = col(s"_s1_$c").cast("double")
        val s2 = col(s"_s2_$c").cast("double")
        val mean = s1 / (nn * sc)
        val variance = (s2 / (sc * sc) - (s1 / sc) * (s1 / sc) / nn) / (nn - 1)
        struct(lit(c).as("col_name"),
               col("_n").as("n_rows"),
               (col("_n") - nn).as("n_nulls"),
               round(mean, 6).as("mean"),
               when(nn >= 2, round(sqrt(greatest(variance, lit(0.0))), 6)).as("std"),
               col(s"_mn_$c").as("min_v"),
               col(s"_mx_$c").as("max_v"))
      })
  }

  /** Population Stability Index between a REFERENCE and a CURRENT
    * distribution over `numBins` equal-width bins of the reference
    * range — the model-monitoring standard ([[ksDrift]] gives the
    * sharpest statistic; PSI is what monitoring dashboards alarm on,
    * with the conventional 0.1/0.25 thresholds). Laplace smoothing
    * (+0.5 per bin) keeps empty bins finite — deterministic, unlike
    * the ad-hoc epsilon clamps. Out-of-range current values clamp to
    * the edge bins (the standard treatment: drift OUT of the
    * reference range must register, not vanish).
    *
    * Scale shape: the reference range is a 1-row min/max broadcast;
    * binning is a map stage into a numBins-row aggregate per side;
    * PSI folds on the bin table. All counts exact; shares and the
    * ln-ratio terms are fixed IEEE expressions rounded at the end.
    */
  def psiDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
               numBins: Int = 10): DataFrame = {
    val range = ref.agg(min(col(valueCol).cast("double")).as("lo"),
                        max(col(valueCol).cast("double")).as("hi"))
    def binned(df: DataFrame, cnt: String) = df
      .select(col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
      .crossJoin(broadcast(range))
      .select(greatest(lit(0L), least(lit(numBins.toLong - 1),
        floor((col("v") - col("lo")) / ((col("hi") - col("lo")) / numBins))))
        .as("bin"))
      .groupBy("bin").agg(count(lit(1)).as(cnt))
    val spark = ref.sparkSession
    import spark.implicits._
    val bins = (0L until numBins.toLong).toDF("bin")
    val joined = bins
      .join(binned(ref, "n_ref"), Seq("bin"), "left")
      .join(binned(cur, "n_cur"), Seq("bin"), "left")
      .select(col("bin"),
              coalesce(col("n_ref"), lit(0L)).as("n_ref"),
              coalesce(col("n_cur"), lit(0L)).as("n_cur"))
    val totals = joined.agg(sum("n_ref").as("t_ref"), sum("n_cur").as("t_cur"))
    val per = joined.crossJoin(broadcast(totals))
      .withColumn("p_ref",
        (col("n_ref") + 0.5) / (col("t_ref") + 0.5 * numBins))
      .withColumn("p_cur",
        (col("n_cur") + 0.5) / (col("t_cur") + 0.5 * numBins))
      .withColumn("term", (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
    val psi = per.agg(round(sum(col("term")), 6).as("psi_total"))
    per.crossJoin(broadcast(psi))
      .select(col("bin"), col("n_ref"), col("n_cur"),
              round(col("p_ref"), 6).as("p_ref"),
              round(col("p_cur"), 6).as("p_cur"),
              col("psi_total"))
  }

  /** Benford's-law first-digit conformance — the classic
    * fabricated-data / corrupted-feed screen: natural multi-scale
    * magnitudes put digit d first with probability log10(1 + 1/d);
    * heavy deviation flags synthetic or truncated values. Emits one
    * row per digit with observed share, the Benford expectation, and
    * the replicated χ² total.
    *
    * Engine-exactness: the first digit comes from the DECIMAL STRING
    * of the value scaled to an exact integer (round(v·10^scale) →
    * BIGINT → first character) — integer-to-string is exact in every
    * engine, where floor(v/10^floor(log10 v)) would hang digit
    * boundaries on each libm's log10 rounding. The Benford
    * expectations are Scala-computed double literals interpolated
    * into both engines (shortest-repr round-trip), shares/χ² are one
    * fixed IEEE expression each, rounded to 6.
    *
    * Scale shape: one map stage (scale + stringify + substring) into
    * a 9-row aggregate; the χ² fold is a 1-row broadcast back onto
    * the digit rows.
    */
  def benford(df: DataFrame, valueCol: String, scale: Int = 2): DataFrame = {
    val digits = df
      .select(round(col(valueCol).cast("double") * math.pow(10, scale).toLong, 0)
        .cast("long").as("s"))
      .where(col("s") >= 1) // non-positive and rounds-to-zero values have no first digit
      .select(substring(col("s").cast("string"), 1, 1).cast("long").as("digit"))
      .groupBy("digit").agg(count(lit(1)).as("n"))
    val total = digits.agg(sum(col("n")).as("n_total"))
    val expected = (1 to 9).map(d => (d.toLong, math.log10(1.0 + 1.0 / d)))
    val spark = df.sparkSession
    import spark.implicits._
    val exp = expected.toDF("digit", "p_benford")
    val per = exp.join(digits, Seq("digit"), "left")
      .crossJoin(broadcast(total))
      .select(col("digit"), coalesce(col("n"), lit(0L)).as("n"),
              col("n_total"), col("p_benford"))
      .withColumn("chi2_term",
        (col("n") - col("n_total") * col("p_benford")) *
        (col("n") - col("n_total") * col("p_benford")) /
        (col("n_total") * col("p_benford")))
    val chi2 = per.agg(round(sum(col("chi2_term")), 6).as("chi2_total"))
    per.crossJoin(broadcast(chi2))
      .select(col("digit"), col("n"),
              round(col("n") / col("n_total"), 6).as("p_obs"),
              round(col("p_benford"), 6).as("p_benford"),
              col("chi2_total"))
  }

  /** Pearson correlation for named column pairs via EXACT scaled
    * moments: both columns of a pair scale to decimal(38,0) integers
    * and all five sums (Σx, Σy, Σx², Σy², Σxy) accumulate as exact
    * integer arithmetic — corr then derives from identical numbers in
    * any engine (`corr()` built-ins sum doubles in partial-agg order
    * and cannot hash-match). Null handling is pairwise deletion: a
    * row missing either side drops from that pair's moments only.
    * corr is null when n < 2 or either variance term is zero.
    *
    * The sums cast to double before the final formula — exact for
    * magnitudes < 2⁵³ and identically rounded in both engines above
    * it. One aggregate pass for ALL pairs (the [[profileColumns]]
    * shape), so correlating p pairs over 100 TB costs one scan.
    */
  def pairwiseCorr(df: DataFrame, pairs: Seq[(String, String)],
                   scale: Int = 100): DataFrame = {
    require(pairs.nonEmpty, "pairwiseCorr needs at least one pair")
    require(scale > 0, "scale must be positive")
    val aggs: Seq[Column] = pairs.zipWithIndex.flatMap { case ((x, y), i) =>
      val bothNn = col(x).isNotNull && col(y).isNotNull
      val vx = when(bothNn, round(col(x) * scale, 0).cast("decimal(38,0)"))
      val vy = when(bothNn, round(col(y) * scale, 0).cast("decimal(38,0)"))
      Seq(count(when(bothNn, lit(1))).as(s"_n_$i"),
          sum(vx).as(s"_sx_$i"), sum(vy).as(s"_sy_$i"),
          sum(vx * vx).as(s"_sxx_$i"), sum(vy * vy).as(s"_syy_$i"),
          sum(vx * vy).as(s"_sxy_$i"))
    }
    longReport(df.agg(aggs.head, aggs.tail: _*),
      pairs.zipWithIndex.map { case ((x, y), i) =>
        val n = col(s"_n_$i").cast("double")
        val sx = col(s"_sx_$i").cast("double")
        val sy = col(s"_sy_$i").cast("double")
        val sxx = col(s"_sxx_$i").cast("double")
        val syy = col(s"_syy_$i").cast("double")
        val sxy = col(s"_sxy_$i").cast("double")
        val varX = n * sxx - sx * sx
        val varY = n * syy - sy * sy
        struct(lit(x).as("col_x"), lit(y).as("col_y"),
               col(s"_n_$i").as("n_pairs"),
               when(col(s"_n_$i") >= 2 && varX > 0 && varY > 0,
                 round((n * sxy - sx * sy) / sqrt(varX * varY), 6)).as("corr"))
      })
  }

  /** Shannon entropy of categorical columns: −Σ p·ln p over the
    * value distribution (string-rendered, nulls excluded), plus the
    * normalized form (entropy / ln n_distinct) — the "is this column
    * informative or near-constant" diagnostic for feature/label
    * audits. Counts are exact; the p·ln p doubles sum per column over
    * |distinct| terms, whose association-order noise (~1e-16) sits
    * far below the round-6 boundary (the agg_geomean precedent).
    *
    * Scale shape: one scan exploding to |cols| rows per input row,
    * one (col, value) hash aggregate, then aggregates over the tiny
    * distinct-value table.
    */
  def valueEntropy(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "valueEntropy needs at least one column")
    val pairs = df
      .select(explode(array(cols.map(c =>
        struct(lit(c).as("col_name"), col(c).cast("string").as("v"))): _*)).as("p"))
      .select(col("p.col_name").as("col_name"), col("p.v").as("v"))
      .where(col("v").isNotNull)
    val counts = pairs.groupBy("col_name", "v").agg(count(lit(1)).as("c"))
    val totals = counts.groupBy("col_name")
      .agg(sum(col("c")).as("n"), count(lit(1)).as("nd"))
    counts.join(totals, "col_name")
      .groupBy("col_name")
      .agg(first(col("n")).as("n_nonnull"),
           first(col("nd")).as("n_distinct"),
           round(-sum((col("c") / col("n")) * log(col("c") / col("n"))), 6).as("entropy"))
      .withColumn("norm_entropy",
        when(col("n_distinct") > 1,
          round(col("entropy") / log(col("n_distinct").cast("double")), 6)))
  }

  /** Key-skew report: the k heaviest values of a key column with
    * their counts and corpus share — the pre-join diagnostic that
    * tells you whether a shuffle on this key needs salting. Two hash
    * aggregates (per-key counts, then a one-row total broadcast back
    * off the REUSED counts exchange — the corpus scans once) and a
    * bounded top-k (TakeOrdered) — never a global sort. Ties at the
    * boundary break on the key value, nulls last (a null key group —
    * classic skew — reports as a null `key_value`, after equal-count
    * non-null keys; matches SQL's default null ordering).
    */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    require(k > 0, "keySkew needs k > 0")
    val counts = df.groupBy(col(keyCol).cast("string").as("key_value"))
      .agg(count(lit(1)).as("n"))
    val total = counts.agg(sum(col("n")).as("_total"))
    counts.crossJoin(broadcast(total))
      .select(col("key_value"), col("n"),
              round(col("n") / col("_total"), 6).as("share"))
      .orderBy(desc("n"), asc_nulls_last("key_value"))
      .limit(k)
  }

  /** Constraint validation: each constraint is a named BOOLEAN
    * AGGREGATE expression over the table (completeness, uniqueness,
    * bounds, domain membership); output is one (check_name, passed)
    * row per constraint. All constraints evaluate in the same single
    * aggregate pass.
    */
  def checkConstraints(df: DataFrame,
                       constraints: Seq[(String, Column)]): DataFrame = {
    require(constraints.nonEmpty, "checkConstraints needs at least one constraint")
    val aggs = constraints.zipWithIndex.map { case ((_, c), i) => c.as(s"_c$i") }
    longReport(df.agg(aggs.head, aggs.tail: _*),
      constraints.zipWithIndex.map { case ((name, _), i) =>
        struct(lit(name).as("check_name"), col(s"_c$i").as("passed"))
      })
  }

  /** Robust outliers by median/MAD — the breakdown-resistant twin of
    * the mean/σ z-score ([[Events.valueAnomalies]]): a few extreme
    * rows shift the mean and INFLATE σ enough to hide each other,
    * while the median and the median absolute deviation ignore them
    * (50% breakdown point). robust_z = (v − median)/(1.4826·MAD),
    * flagged where |robust_z| > cutoff.
    *
    * Three passes (median, MAD, filter) of exact `percentile` —
    * exact medians don't stream, so at 100 TB the first two passes
    * move to `approx_percentile` with a documented accuracy knob
    * (the sample_quality_cut precedent); the per-row z is pure map
    * arithmetic either way. Scalars ride 1-row broadcasts, never a
    * driver round-trip.
    */
  def madOutliers(df: DataFrame, idCol: String, valueCol: String,
                  cutoff: Double = 3.5): DataFrame = {
    val v = df.select(col(idCol).as("id"), col(valueCol).cast("double").as("v"))
      .where(col("v").isNotNull)
    val med = v.agg(expr("percentile(v, 0.5)").as("med"))
    val mad = v.crossJoin(broadcast(med))
      .agg(expr("percentile(abs(v - med), 0.5)").as("mad"))
    v.crossJoin(broadcast(med)).crossJoin(broadcast(mad))
      .withColumn("robust_z", round((col("v") - col("med")) / (lit(1.4826) * col("mad")), 6))
      .where(abs(col("robust_z")) > cutoff)
      .select(col("id"), col("v").as("value"), col("robust_z"))
  }

  /** k-anonymity audit over a release's quasi-identifier columns:
    * one row per QI combination with its equivalence-class size and
    * an at-risk flag (class smaller than `k` — those rows re-identify
    * under linkage attack and need further generalization or
    * suppression before the release ships). The compliance gate a
    * training-data pipeline runs AFTER [[Etl.pseudonymize]]:
    * tokens protect direct identifiers, this audits the indirect
    * ones.
    *
    * Scale shape: one hash aggregate on the QI tuple (map-side
    * partial agg shrinks every task to |classes| rows); integer
    * counts — exact in any engine. NULL QI values group as their own
    * class (Spark and DuckDB GROUP BY agree on null grouping).
    */
  def kAnonymityAudit(df: DataFrame, qiCols: Seq[String], k: Int): DataFrame =
    df.groupBy(qiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
      .withColumn("at_risk", col("class_size") < k)

  /** Functional-dependency audit: for each candidate lhs → rhs, how
    * many lhs equivalence classes exist, how many are VIOLATING
    * (more than one distinct rhs value), and the violation share —
    * the schema-inference / data-contract check ("is this column
    * really determined by that key?") a warehouse runs before keying
    * a dimension or trusting a denormalized feed.
    *
    * Scale shape: one exact distinct-pair aggregate per candidate
    * ((lhs, rhs) distinct → per-lhs count — two shuffles keyed by
    * lhs, map-side partial agg on both), then a 1-row summary per
    * candidate, unioned. Candidates are a handful, rows are the
    * corpus — the per-candidate passes run over the scan in
    * parallel, none of them global-sorts. NULL rhs counts as a value
    * (count distinct + a null-presence flag folded in via a
    * sentinel-free max(is null)).
    */
  def fdAudit(df: DataFrame, candidates: Seq[(String, String)]): DataFrame =
    candidates.map { case (lhs, rhs) =>
      val perClass = df
        .select(col(lhs).as("l"), col(rhs).as("r"))
        .groupBy("l")
        .agg((countDistinct(col("r")) +
              max(col("r").isNull.cast("int"))).as("n_rhs"))
      perClass.agg(
        lit(lhs).as("lhs"), lit(rhs).as("rhs"),
        count(lit(1)).as("n_classes"),
        sum((col("n_rhs") > 1).cast("long")).as("n_violating"),
        round(sum((col("n_rhs") > 1).cast("long")) /
              count(lit(1)).cast("double"), 6).as("violation_share"),
        (sum((col("n_rhs") > 1).cast("long")) === 0).as("holds"))
    }.reduce(_ unionByName _)

  /** Missingness-pattern audit: one row per observed NULL-combination
    * across the audited columns (pattern string like "1,0,1" in
    * column order, 1 = null), with count and share — the structural
    * view [[profileColumns]]'s per-column null counts can't give:
    * whether nulls co-occur (one broken upstream join) or scatter
    * independently (organic sparsity) decides the repair strategy.
    *
    * Scale shape: ONE hash aggregate on the pattern tuple (map-side
    * partials shrink every task to ≤ 2^|cols| rows), a 1-row total
    * broadcast, exact counts; share divides exact longs factor-first.
    */
  def nullPatterns(df: DataFrame, cols: Seq[String]): DataFrame = {
    def d(c: Column) = c.cast("double")
    val pat = concat_ws(",",
      cols.map(c => col(c).isNull.cast("int").cast("string")): _*)
    val g = df.select(pat.as("pattern"))
      .groupBy("pattern").agg(count(lit(1)).as("n_rows"))
    val tot = g.agg(sum(col("n_rows")).as("n_total"))
    g.crossJoin(broadcast(tot)) // 1-row scalar
      .select(lit(cols.mkString(",")).as("columns"), col("pattern"),
        col("n_rows"),
        round(d(col("n_rows")) / d(col("n_total")), 6).as("share"),
        (col("pattern") === cols.map(_ => "0").mkString(",")).as("is_complete"))
  }

  /** Chi-square test of independence between two categorical columns
    * — the dependence audit [[pairwiseCorr]] can't run (correlation
    * needs numerics; "is order priority independent of order status?"
    * needs a contingency table). One summary row: chi², degrees of
    * freedom, and Cramér's V (the [0,1] effect size that survives
    * table size, unlike raw chi²).
    *
    * Determinism: cell counts and marginals are exact longs; each
    * cell's contribution (o·n − r·c)²/(n·r·c) is computed with every
    * factor cast to double FIRST (products ≤ n² ≈ 2^53-safe for
    * n ≲ 9·10⁷ distinct cells·rows; the contingency table itself is
    * category-bounded), then scaled to an exact long (×1e6) before
    * the sum — the scaled-long discipline that makes the total
    * aggregation-order-independent, so the hash survives any
    * partition order.
    * Zero-observed cells (grid cell with no rows) contribute their
    * full expected mass — the grid is completed from the marginals,
    * not just the observed pairs.
    *
    * Scale shape: one hash aggregate to |A|·|B| cells, two bounded
    * marginal aggregates, a bounded marginal-grid join (category
    * tables, broadcast), then a 1-row summary. The corpus is scanned
    * once; everything after is category-sized.
    */
  def chiSquareIndependence(df: DataFrame, colA: String, colB: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val obs = df.select(col(colA).as("a"), col(colB).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy("a").agg(sum(col("o")).as("ra"))
    val colT = obs.groupBy("b").agg(sum(col("o")).as("cb"))
    // bounded category grid (|A|·|B| rows), NOT a data cartesian
    val grid = rowT.crossJoin(broadcast(colT))
      .join(obs, Seq("a", "b"), "left")
      .withColumn("o", coalesce(col("o"), lit(0L)))
    val n1 = obs.agg(sum(col("o")).as("n"),
                     countDistinct(col("a")).as("r_levels"),
                     countDistinct(col("b")).as("c_levels"))
    val dev = d(col("o")) * d(col("n")) - d(col("ra")) * d(col("cb"))
    val contrib = round(
      dev * dev / (d(col("n")) * d(col("ra")) * d(col("cb"))) * 1e6, 0)
      .cast("long")
    val cells = grid.crossJoin(broadcast(n1)) // 1-row scalar
      .select(col("n"), col("r_levels"), col("c_levels"), contrib.as("x"))
    cells.groupBy("n", "r_levels", "c_levels")
      .agg(round(sum(col("x")) / 1e6, 6).as("chi2"))
      .select(
        lit(colA).as("col_a"), lit(colB).as("col_b"),
        col("n").as("n_rows"), col("r_levels"), col("c_levels"),
        ((col("r_levels") - 1) * (col("c_levels") - 1)).as("dof"),
        col("chi2"),
        when(col("r_levels") > 1 && col("c_levels") > 1,
          round(sqrt(col("chi2") /
            (d(col("n")) * d(least(col("r_levels"), col("c_levels")) - 1))), 6))
          .as("cramers_v"))
  }

  /** MUTUAL INFORMATION between two categorical columns (nats) plus
    * the normalized variant — the feature-relevance / redundancy
    * screen (Cover & Thomas ch. 2; the mRMR selection criterion's
    * core quantity) that [[chiSquareIndependence]]'s χ² approximates
    * only in the small-deviation limit: MI is exact at any effect
    * size and comparable across tables after normalization.
    * I(A;B) = Σ_xy p_xy ln(p_xy / (p_x p_y)); NMI = I / √(H_A·H_B)
    * (Strehl & Ghosh 2002), 1 at a bijection, 0 at independence.
    *
    * Determinism: cell/marginal counts are exact longs; each cell's
    * log-ratio ln(o·N / (ra·cb)) rounds to 6 and scales to an exact
    * long BEFORE the o-weighted sum (the [[graft.operators
    * .TextAnalysis.entropyStats]] discipline — order-independent
    * integer accumulation), as do the marginal-entropy numerators
    * N·⌊ln N⌋₆ − Σ m·⌊ln m⌋₆; the final MI/H/NMI values are a fixed
    * IEEE chain over those exact integers, each rounded 6 with NMI
    * computed off the ALREADY-ROUNDED mi/h_a/h_b (the oracle replays
    * the same chain).
    *
    * Scale shape: one hash aggregate to |A|·|B| observed cells
    * (map-side combined), two category-sized marginal aggregates,
    * category-sized joins, 1-row output. Zero-observed cells
    * contribute 0 to MI by the p·ln p convention, so the grid never
    * needs completing — one corpus scan total.
    */
  def mutualInformation(df: DataFrame, colA: String, colB: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    def lnS(c: Column) = round(log(c) * 1e6, 0).cast("long")
    val obs = df.select(col(colA).as("a"), col(colB).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("o"))
    val rowT = obs.groupBy("a").agg(sum(col("o")).as("ra"))
    val colT = obs.groupBy("b").agg(sum(col("o")).as("cb"))
    val n1 = obs.agg(sum(col("o")).as("n"),
      countDistinct(col("a")).as("a_levels"),
      countDistinct(col("b")).as("b_levels")) // 1-row scalar
    val sMi = obs.join(rowT, "a").join(colT, "b")
      .crossJoin(broadcast(n1.select(col("n").as("nn"))))
      .select((col("o") *
        lnS(d(col("o")) * d(col("nn")) / (d(col("ra")) * d(col("cb")))))
        .as("t"))
      .agg(coalesce(sum(col("t")), lit(0L)).as("s_mi"))
    val sa = rowT.agg(coalesce(sum(col("ra") * lnS(d(col("ra")))), lit(0L))
      .as("sa"))
    val sb = colT.agg(coalesce(sum(col("cb") * lnS(d(col("cb")))), lit(0L))
      .as("sb"))
    val mi = round(d(col("s_mi")) / d(col("n")) / 1e6, 6)
    val hA = round(d(col("n") * lnS(d(col("n"))) - col("sa"))
      / d(col("n")) / 1e6, 6)
    val hB = round(d(col("n") * lnS(d(col("n"))) - col("sb"))
      / d(col("n")) / 1e6, 6)
    n1.crossJoin(broadcast(sMi)).crossJoin(broadcast(sa))
      .crossJoin(broadcast(sb)) // all 1-row scalars
      .select(lit(colA).as("col_a"), lit(colB).as("col_b"),
        col("n").as("n_rows"), col("a_levels"), col("b_levels"),
        mi.as("mi"), hA.as("h_a"), hB.as("h_b"))
      .withColumn("nmi",
        when(col("h_a") > 0 && col("h_b") > 0,
          round(col("mi") / sqrt(col("h_a") * col("h_b")), 6)))
  }

  /** Monotonic-key continuity audit: gaps and islands over an integer
    * key column (invoice numbers, event ids, file sequence numbers) —
    * the completeness check a warehouse runs on an ingest feed whose
    * key SHOULD be dense ("did we drop a day of invoices?"). One
    * summary row: distinct/duplicate counts, key range, total missing
    * keys, number of gaps, and the widest gap.
    *
    * Scale shape — NO global window over the corpus: keys bucket by
    * `key div bucketSize`, consecutive-key deltas come from a window
    * partitioned BY BUCKET (parallel, each partition bucket-sized),
    * and the cross-bucket boundary deltas come from a lead over the
    * per-bucket min/max table — which has one row per bucket and is
    * the only place a global order ever materializes. The invariant
    * Σ gap = n_missing ties the two paths together (and the oracle
    * recomputes both sides independently).
    */
  def sequenceGaps(df: DataFrame, keyCol: String,
                   bucketSize: Long = 100000L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rows = df.select(col(keyCol).cast("long").as("k"))
      .where(col("k").isNotNull)
    val totals = rows.agg(count(lit(1)).as("n_rows"))
    val keys = rows.distinct()
      .withColumn("bucket", floor(col("k") / bucketSize))
    val wLocal = Window.partitionBy("bucket").orderBy("k")
    val local = keys
      .withColumn("gap", lead(col("k"), 1).over(wLocal) - col("k") - 1)
      .where(col("gap") > 0).select(col("gap"))
    val bounds = keys.groupBy("bucket")
      .agg(min(col("k")).as("mn"), max(col("k")).as("mx"),
           count(lit(1)).as("cnt"))
    // bounded table (one row per occupied bucket): global order is fine
    val wGlobal = Window.orderBy("bucket")
    val boundary = bounds
      .withColumn("gap", lead(col("mn"), 1).over(wGlobal) - col("mx") - 1)
      .where(col("gap") > 0).select(col("gap"))
    val gapStats = local.unionByName(boundary)
      .agg(count(lit(1)).as("n_gaps"),
           coalesce(sum(col("gap")), lit(0L)).as("missing_via_gaps"),
           max(col("gap")).as("max_gap"))
    val keyStats = bounds.agg(
      sum(col("cnt")).as("n_keys"), min(col("mn")).as("min_key"),
      max(col("mx")).as("max_key"))
    keyStats.crossJoin(broadcast(totals)).crossJoin(broadcast(gapStats))
      .select(
        col("n_rows"), col("n_keys"),
        (col("n_rows") - col("n_keys")).as("n_dup_rows"),
        col("min_key"), col("max_key"),
        (col("max_key") - col("min_key") + 1 - col("n_keys")).as("n_missing"),
        col("n_gaps"), col("missing_via_gaps"), col("max_gap"))
  }

  /** Data-freshness audit per source/partition key — the "is this
    * feed still alive" report an ingestion pipeline pages on: per
    * group, its last event time, its lag behind the corpus
    * watermark (the global max — at a daily cron cadence a feed
    * lagging > `staleHours` is a stalled extractor, reference-world
    * semantics), and how much of its volume arrived in the trailing
    * 7 days of the watermark.
    *
    * Determinism: all time arithmetic on exact epoch-millis longs;
    * lag and shares are one double division rounded to 6. Scale
    * shape: one 1-row global-max broadcast + one group aggregate —
    * no window, no second scan of the wide rows.
    */
  def freshness(df: DataFrame, groupCol: String, tsCol: String,
                staleHours: Int = 168): DataFrame = {
    def d(c: Column) = c.cast("double")
    val base = df.select(col(groupCol).as("grp"),
      unix_millis(col(tsCol)).as("ms"))
    val gmax = base.agg(max(col("ms")).as("gms"))
    base.crossJoin(broadcast(gmax)) // 1-row scalar
      .groupBy("grp")
      .agg(count(lit(1)).as("n_total"),
        sum(when(col("ms") >= col("gms") - lit(604800000L), lit(1L))
          .otherwise(lit(0L))).as("n_last_7d"),
        max(col("ms")).as("last_ms"),
        max(col("gms")).as("gms"))
      .select(col("grp").as(groupCol), col("n_total"), col("n_last_7d"),
        round(d(col("n_last_7d")) / d(col("n_total")), 6).as("share_7d"),
        timestamp_millis(col("last_ms")).as("last_ts"),
        round(d(col("gms") - col("last_ms")) / lit(3600000.0), 6).as("lag_hours"),
        (d(col("gms") - col("last_ms")) / lit(3600000.0) >
          lit(staleHours.toDouble)).as("is_stale"))
  }

  /** SLICE FINDER — the metric-debugging sweep (the SliceFinder /
    * "which segment moved the metric" idea): every (dimension, value)
    * slice from a declared dimension set is scored by the z-statistic
    * of its metric mean against the global mean, z = (x̄_s − x̄) /
    * √(σ²/n_s), and the top |z| slices come back ranked — where an
    * on-call engineer looks first when the aggregate drifts.
    *
    * Exactness: the [[momentsByGroup]] cents-scaled decimal-sum
    * discipline — slice and global moments are exact integer sums in
    * any order; each reported number is a short fixed-order IEEE
    * chain off those exact sums, rounded 6; ranking runs on the
    * ROUNDED |z| with a (dim, value) tie-break.
    *
    * Scale shape: one Expand pass (|dims| rows per input row) into a
    * map-side-combined aggregate at slice cardinality, one 1-row
    * global aggregate broadcast, TakeOrdered top-k; the final rank
    * window touches ≤ topK rows.
    */
  /** HBOS — Histogram-Based Outlier Score (Goldstein & Dengel 2012):
    * per-feature equal-width histograms, score = Σ_f −ln p_f(bin(x))
    * — the linear-time multivariate outlier screen that scales where
    * distance/density methods (LOF, isolation forest) cannot: it
    * assumes feature independence and pays two scans total,
    * regardless of dimensionality. Complements [[madOutliers]]
    * (univariate, median-based): HBOS flags rows whose COMBINATION
    * of bins is rare even when each marginal looks ordinary.
    *
    * Determinism: bin edges come from the exact min/max scalar row
    * (broadcast control-plane); bin(x) = min(⌊(x−mn)/(mx−mn)·B⌋,
    * B−1) is one fixed IEEE chain; −ln p = ⌊ln n⌋₆ − ⌊ln c⌋₆ with
    * both logs round-6-scaled to exact longs before the per-row sum
    * (the [[mutualInformation]] discipline), so scores are
    * aggregation-order-independent. Constant features (mx = mn) fall
    * into one bin with p = 1, contributing exactly 0.
    *
    * Scale shape — three corpus passes, nothing wider than a row
    * ever shuffles: one min/max aggregate (1 row, broadcast), one
    * WIDE conditional aggregate computing all bins·features
    * histogram cells as one codegen'd pass to a 1-row result (an
    * exploded (feature, bin) stack pays a |rows|·|features|
    * string-keyed aggregate — measured 2.3 s at sf0.1 vs ~0.3 s for
    * this), then the scoring pass joins each feature's ≤ bins-row
    * count table by broadcast, sums the per-feature terms in the
    * projection, pools per id (skinny scaled-long exchange), and
    * TakeOrders the top-k; the rank window touches ≤ k rows.
    */
  def hbosOutliers(df: DataFrame, idCol: String, features: Seq[String],
                   bins: Int = 16, topK: Int = 25): DataFrame = {
    require(features.nonEmpty && bins >= 2 && topK >= 1,
      s"need features, bins >= 2, topK >= 1: $features $bins $topK")
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    def lnS(c: Column) = round(log(c) * 1e6, 0).cast("long")
    val base = df.select(col(idCol).cast("long").as("id") +:
      features.map(f => col(f).cast("double").as(f)): _*)
    val mmRow = base.agg(
        count(lit(1)).as("n"),
        features.flatMap(f => Seq(min(col(f)).as(s"mn_$f"),
          max(col(f)).as(s"mx_$f"))): _*)
      .head() // 1-row control-plane scalar: bin edges become literals,
              // so every later pass is a pure map over one scan
    val n = mmRow.getAs[Long]("n")
    def binOf(f: String): Column = {
      val mn = mmRow.getAs[Double](s"mn_$f")
      val mx = mmRow.getAs[Double](s"mx_$f")
      if (mx == mn) lit(0L)
      else least(floor((col(f) - lit(mn)) / lit(mx - mn) * bins),
        lit(bins - 1L)).cast("long")
    }
    val binned = base.select(col("id") +: lit(n).as("n") +:
      features.map(f => binOf(f).as(s"b_$f")): _*)
    // all bins·features histogram cells in ONE wide conditional
    // aggregate (the profileColumns single-pass discipline) — an
    // exploded (f, b) stack pays 2.4M string-keyed agg rows at sf0.1
    // (measured 2.3 s); this is one codegen'd pass to a 1-row result
    val cells = for { f <- features; k <- 0 until bins } yield
      sum(when(col(s"b_$f") === k, 1L).otherwise(0L)).as(s"c_${f}_$k")
    val cntRow = binned.agg(cells.head, cells.tail: _*)
      .head() // 1-row control-plane (bins·features counters)
    val spark = df.sparkSession
    import spark.implicits._
    val cnt = features.flatMap(f => (0 until bins).map(k =>
        (f, k.toLong, cntRow.getAs[Long](s"c_${f}_$k"))))
      .toDF("f", "b", "c").where(col("c") > 0)
    val joined = features.foldLeft(binned) { (acc, f) =>
      acc.join(broadcast(cnt.where(col("f") === f)
        .select(col("b").as(s"b_$f"), col("c").as(s"c_$f"))), Seq(s"b_$f"))
    }
    val score = features.map(f => lnS(d(col("n"))) - lnS(d(col(s"c_$f"))))
      .reduce(_ + _)
    // rows sharing an id pool their scores (the id need not be
    // unique); the exchange carries one skinny scaled-long per row
    val scored = joined
      .select(col("id"), score.as("s6"))
      .groupBy("id").agg(sum(col("s6")).as("s6"))
      .select(col("id"), round(d(col("s6")) / 1e6, 6).as("hbos"))
      .orderBy(desc("hbos"), asc("id")).limit(topK)
    scored.withColumn("rnk", row_number() // ≤ topK rows
        .over(Window.orderBy(desc("hbos"), asc("id"))).cast("long"))
      .select("rnk", "id", "hbos")
  }

  def sliceFinder(df: DataFrame, dims: Seq[(String, Column)],
                  valueCol: String, topK: Int, scale: Int = 100): DataFrame = {
    require(dims.nonEmpty && topK >= 1, s"need dims and topK: $dims $topK")
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val sc = scale.toDouble
    val x = round(col(valueCol) * scale, 0).cast("decimal(38,0)")
    val base = df.select(
      dims.map { case (n, c) => c.cast("string").as(s"d_$n") } :+ x.as("x"): _*)
    val stacked = base.select(explode(array(dims.map { case (n, _) =>
        struct(lit(n).as("dim"), col(s"d_$n").as("value")) }: _*)).as("s"),
        col("x"))
      .select(col("s.dim").as("dim"), col("s.value").as("value"), col("x"))
    val g = stacked.groupBy("dim", "value")
      .agg(count(lit(1)).as("n"), sum("x").as("s1"))
    val glob = df.select(x.as("x"))
      .agg(count(lit(1)).as("gn"), sum("x").as("gs1"),
        sum(col("x") * col("x")).as("gs2")) // 1-row scalar
    val meanS = d(col("s1")) / (d(col("n")) * sc)
    val meanG = d(col("gs1")) / (d(col("gn")) * sc)
    val varG = d(col("gs2")) / (d(col("gn")) * sc * sc) - meanG * meanG
    val z = (meanS - meanG) / sqrt(varG / d(col("n")))
    val scored = g.crossJoin(broadcast(glob))
      .select(col("dim"), col("value"), col("n"),
        round(meanS, 6).as("mean_slice"), round(z, 6).as("z"))
      .orderBy(abs(col("z")).desc, col("dim"), col("value")).limit(topK)
    scored.withColumn("rnk", row_number() // ≤ topK rows
        .over(Window.orderBy(abs(col("z")).desc, col("dim"), col("value")))
        .cast("long"))
      .select("rnk", "dim", "value", "n", "mean_slice", "z")
  }

  /** Shared binning for the classifier-evaluation family
    * ([[rocCurve]] / [[rocAuc]] / [[calibrationReport]]): scores in
    * [0, 1] quantize to q = round(score·bins) ∈ {0..bins}, and the
    * corpus collapses to one (q, n_pos, n_neg) row per OCCUPIED bin —
    * ≤ bins+1 rows however large the input. This quantization is the
    * operator's SEMANTICS (the standard histogram-ROC at scale — an
    * exact per-distinct-score curve is data-sized at 100 TB and the
    * curve beyond ~3 decimals is invisible anyway); oracles replay
    * the same quantization, so every gate stays exact.
    */
  private[graft] def scoreBins(df: DataFrame, scoreCol: String, labelCol: String,
                               bins: Int): DataFrame =
    df.select(
        round(col(scoreCol).cast("double") * bins, 0).cast("long").as("q"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .groupBy("q")
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))

  /** ROC CURVE of a scored binary classifier — one (threshold, TPR,
    * FPR) row per occupied score bin, threshold descending: the
    * operating-point sweep every model eval publishes. TPR/FPR at
    * threshold t count predictions with score ≥ t — exact integer
    * cumulative counts over the ≤ bins+1 bin table (the cumsum
    * window rides the BOUNDED bin table, never the corpus — the
    * [[graft.operators.Events.cumulativeUsers]] discipline).
    */
  def rocCurve(df: DataFrame, scoreCol: String, labelCol: String,
               bins: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val b = scoreBins(df, scoreCol, labelCol, bins)
    val tot = b.agg(sum("pos").as("p"), sum("neg").as("n")) // 1-row scalar
    val w = Window.orderBy(col("q").desc) // ≤ bins+1 rows — control-plane
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("cum_pos", sum("pos").over(w))
      .withColumn("cum_neg", sum("neg").over(w))
      .crossJoin(broadcast(tot))
      .select(
        round(d(col("q")) / bins, 6).as("threshold"),
        col("cum_pos").as("n_tp"), col("cum_neg").as("n_fp"),
        round(d(col("cum_pos")) / d(col("p")), 6).as("tpr"),
        round(d(col("cum_neg")) / d(col("n")), 6).as("fpr"))
  }

  /** Exact AUC (Mann–Whitney rank-sum form) + Gini + Brier of a
    * scored binary classifier over the quantized scores:
    * AUC = P(score⁺ > score⁻) + ½·P(score⁺ = score⁻), accumulated as
    * the exact INTEGER 2U = Σ_b pos_b·(2·cumNegBelow_b + neg_b) so no
    * float ever sums; Gini = 2·AUC − 1; Brier = Σ(q − y·bins)² /
    * (n·bins²) — an exact integer numerator because y ∈ {0,1} and q
    * is already integral. One aggregate + one bounded-bin-table
    * window; the 100 TB cost is the single corpus scan in
    * [[scoreBins]].
    */
  def rocAuc(df: DataFrame, scoreCol: String, labelCol: String,
             bins: Int = 1000, onDegenerate: String = "null"): DataFrame =
    rocAucFromBins(scoreBins(df, scoreCol, labelCol, bins), bins, onDegenerate)

  /** [[rocAuc]]'s arithmetic over an ALREADY-MATERIALIZED (q, pos,
    * neg) bin table — shared with the streaming twin (a complete-mode
    * streaming aggregate converges to the exact same bin table because
    * the bin counts are arrival-order-independent; this post-pass then
    * rides ≤ bins+1 rows, control-plane).
    *
    * `onDegenerate` is the single-class posture (the connector's
    * `failFast` pattern): a corpus with zero positives or zero
    * negatives has no ROC — `"null"` (default) reports auc/gini as
    * explicit SQL nulls with the class counts still exact; `"fail"`
    * raises with both counts in the message, for pipelines where a
    * degenerate eval means an upstream labeling bug, not a report.
    */
  private[graft] def rocAucFromBins(binTable: DataFrame, bins: Int,
                                    onDegenerate: String = "null"): DataFrame = {
    require(onDegenerate == "null" || onDegenerate == "fail",
      s"onDegenerate must be 'null' or 'fail', got '$onDegenerate'")
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val w = Window.orderBy("q") // ≤ bins+1 rows — control-plane
      .rowsBetween(Window.unboundedPreceding, -1)
    val binsD = lit(bins.toLong)
    val degenerate = col("n_pos") === 0 || col("n_neg") === 0
    val guard: Column => Column =
      if (onDegenerate == "fail")
        c => when(degenerate, raise_error(concat(
               lit("rocAuc: degenerate input (n_pos="),
               col("n_pos").cast("string"), lit(", n_neg="),
               col("n_neg").cast("string"),
               lit(") — a single-class corpus has no ROC"))))
             .otherwise(c)
      else
        c => when(!degenerate, c)
    binTable
      .withColumn("cum_neg_below", coalesce(sum("neg").over(w), lit(0L)))
      .agg(
        sum("pos").as("n_pos"), sum("neg").as("n_neg"),
        sum(col("pos") * (col("cum_neg_below") * 2 + col("neg"))).as("two_u"),
        sum(col("pos") * (col("q") - binsD) * (col("q") - binsD)
          + col("neg") * col("q") * col("q")).as("sq_err"))
      .select(col("n_pos"), col("n_neg"),
        guard(round(d(col("two_u")) / (d(col("n_pos")) * d(col("n_neg")) * 2), 6))
          .as("auc"),
        guard(round(d(col("two_u")) / (d(col("n_pos")) * d(col("n_neg"))) - 1, 6))
          .as("gini"),
        round(d(col("sq_err"))
          / ((d(col("n_pos")) + d(col("n_neg"))) * bins.toDouble * bins), 6)
          .as("brier"))
  }

  /** PRECISION–RECALL CURVE — [[rocCurve]]'s twin for imbalanced
    * tasks (ROC flatters a classifier when negatives dominate;
    * precision reads the cost of acting on predictions directly):
    * one (threshold, precision, recall) row per occupied bin,
    * threshold descending, exact integer cumulative counts over the
    * bounded bin table.
    */
  def prCurve(df: DataFrame, scoreCol: String, labelCol: String,
              bins: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val b = scoreBins(df, scoreCol, labelCol, bins)
    val tot = b.agg(sum("pos").as("p")) // 1-row scalar
    val w = Window.orderBy(col("q").desc) // ≤ bins+1 rows — control-plane
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("cum_pos", sum("pos").over(w))
      .withColumn("cum_neg", sum("neg").over(w))
      .crossJoin(broadcast(tot))
      .select(
        round(d(col("q")) / bins, 6).as("threshold"),
        col("cum_pos").as("n_tp"),
        round(d(col("cum_pos")) / (d(col("cum_pos")) + d(col("cum_neg"))), 6)
          .as("precision"),
        round(d(col("cum_pos")) / d(col("p")), 6).as("recall"))
  }

  /** AVERAGE PRECISION (the PR curve's area, step-interpolated —
    * what "AP" means in every detection/retrieval benchmark):
    * AP = Σ_b ΔRecall_b · Precision_b over descending thresholds
    *    = Σ_b (pos_b / P) · (cumPos_b / (cumPos_b + cumNeg_b)).
    * Each term ×1e9-rounds to an exact long BEFORE the sum (the
    * [[w1Drift]] discipline — float += in an arbitrary reduce order
    * is not associative; integer sums are), so the result is
    * order-free and oracle-exact.
    */
  def avgPrecision(df: DataFrame, scoreCol: String, labelCol: String,
                   bins: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val b = scoreBins(df, scoreCol, labelCol, bins)
    val tot = b.agg(sum("pos").as("p"), sum("neg").as("n")) // 1-row scalar
    val w = Window.orderBy(col("q").desc) // ≤ bins+1 rows — control-plane
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("cum_pos", sum("pos").over(w))
      .withColumn("cum_neg", sum("neg").over(w))
      .crossJoin(broadcast(tot))
      .withColumn("t9", round(round(
          d(col("pos")) * d(col("cum_pos"))
            / (d(col("p")) * (d(col("cum_pos")) + d(col("cum_neg")))), 9)
          * 1e9, 0).cast("long"))
      .agg(max(col("p")).as("n_pos"), max(col("n")).as("n_neg"),
        round(sum(col("t9")) / 1e9, 6).as("avg_precision"))
  }

  /** WEIGHT OF EVIDENCE / INFORMATION VALUE of a categorical feature
    * against a binary label — the credit-scoring feature screen
    * (IV < 0.02 useless, > 0.5 suspicious): per category,
    * WoE = ln((pos_c/P)/(neg_c/N)) and the IV term
    * (pos_c/P − neg_c/N)·WoE; total IV rides every row. Categories
    * with a zero side are excluded (their WoE is ±∞ — the standard
    * convention; a production screen bins them away first), and the
    * exclusion is part of the operator's semantics (oracles
    * replicate the pos > 0 AND neg > 0 cut). IV terms ×1e6-round to
    * exact longs before the total sum ([[mutualInformation]]'s
    * discipline). One category-sized aggregate after one corpus scan.
    */
  def woeIv(df: DataFrame, catCol: String, labelCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val b = df.select(col(catCol).cast("string").as("category"),
        when(col(labelCol), 1L).otherwise(0L).as("y"))
      .groupBy("category")
      .agg(sum(col("y")).as("pos"), (count(lit(1)) - sum(col("y"))).as("neg"))
      .where(col("pos") > 0 && col("neg") > 0)
    val tot = b.agg(sum("pos").as("p"), sum("neg").as("n")) // 1-row scalar
    val woeRaw = log((d(col("pos")) * d(col("n")))
      / (d(col("neg")) * d(col("p"))))
    val ivTerm = (d(col("pos")) / d(col("p"))
      - d(col("neg")) / d(col("n"))) * woeRaw
    val perCat = b.crossJoin(broadcast(tot))
      .withColumn("iv6", round(round(ivTerm, 6) * 1e6, 0).cast("long"))
      .withColumn("woe", round(woeRaw, 6))
    val ivTot = perCat.agg(round(sum(col("iv6")) / 1e6, 6).as("iv_total"))
    perCat.crossJoin(broadcast(ivTot)) // 1-row scalar
      .select(col("category"), col("pos").as("n_pos"), col("neg").as("n_neg"),
        col("woe"), round(d(col("iv6")) / 1e6, 6).as("iv_term"),
        col("iv_total"))
  }

  /** REGRESSION EVALUATION — MAE, RMSE, bias and R² of a predicted
    * numeric column against the actual, the scorecard every
    * regression eval publishes. Values quantize to `scale` units
    * (money-style 2dp by default) so every accumulator is an EXACT
    * integer: Σ|Δ|, ΣΔ, ΣΔ² and the R² pieces (ΣA, ΣA²) sum as
    * decimal(38,0) — squares of cent-scaled values overflow a long at
    * corpus scale, the [[graft.operators.Analytics]] lesson. The
    * final MAE/RMSE/R² are single double expressions over the exact
    * sums, round 6. One corpus scan, one 1-row aggregate.
    */
  def regressionEval(df: DataFrame, predCol: String, actualCol: String,
                     scale: Int = 100): DataFrame = {
    def d(c: Column) = c.cast("double")
    val sc = scale.toDouble
    val p = round(col(predCol).cast("double") * scale, 0).cast("decimal(38,0)")
    val a = round(col(actualCol).cast("double") * scale, 0).cast("decimal(38,0)")
    df.select(p.as("p"), a.as("a"))
      .agg(count(lit(1)).as("n"),
        sum(abs(col("p") - col("a"))).as("sae"),
        sum(col("p") - col("a")).as("se"),
        sum((col("p") - col("a")) * (col("p") - col("a"))).as("sse"),
        sum(col("a")).as("sa"),
        sum(col("a") * col("a")).as("saa"))
      .select(col("n"),
        round(d(col("sae")) / (d(col("n")) * sc), 6).as("mae"),
        round(d(col("se")) / (d(col("n")) * sc), 6).as("bias"),
        round(sqrt(d(col("sse")) / d(col("n"))) / sc, 6).as("rmse"),
        // R² = 1 − SSE/SST with SST = ΣA² − (ΣA)²/n — exact pieces
        round(lit(1.0) - d(col("sse"))
          / (d(col("saa")) - d(col("sa")) * d(col("sa")) / d(col("n"))), 6)
          .as("r2"))
  }

  /** CONFUSION MATRIX of a multiclass prediction — one (actual,
    * predicted, n) row per occupied cell; ≤ |classes|² rows however
    * large the corpus. The raw material of every per-class eval.
    */
  def confusionMatrix(df: DataFrame, actualCol: String,
                      predCol: String): DataFrame =
    df.groupBy(col(actualCol).cast("long").as("actual"),
        col(predCol).cast("long").as("predicted"))
      .agg(count(lit(1)).as("n"))

  /** PER-CLASS CLASSIFICATION REPORT — precision, recall, F1 and
    * support per actual class, computed from exact integer TP/FP/FN
    * counts (F1 as the single ratio 2·TP/(2·TP+FP+FN) — no
    * intermediate float P and R feed it). A class never predicted
    * reports precision 0 (the standard zero-division convention,
    * replicated by the oracle). Two class-sized aggregates off the
    * ≤|classes|² confusion cells.
    */
  def classReport(df: DataFrame, actualCol: String,
                  predCol: String): DataFrame = {
    def d(c: Column) = c.cast("double")
    val cm = confusionMatrix(df, actualCol, predCol)
      .localCheckpoint() // ≤|classes|² rows; three consumers
    val byActual = cm.groupBy(col("actual").as("class"))
      .agg(sum("n").as("support"),
        sum(when(col("predicted") === col("actual"), col("n"))
          .otherwise(0L)).as("tp"))
    val byPred = cm.groupBy(col("predicted").as("class"))
      .agg(sum("n").as("n_predicted"))
    val np = coalesce(col("n_predicted"), lit(0L)) // left-join null = 0
    byActual.join(byPred, Seq("class"), "left")
      .select(col("class"), col("support"), col("tp"),
        np.as("n_predicted"),
        when(np === 0, lit(0.0))
          .otherwise(round(d(col("tp")) / d(np), 6)).as("precision"),
        round(d(col("tp")) / d(col("support")), 6).as("recall"),
        round(d(col("tp")) * 2 / (d(col("tp")) * 2
          + (d(np) - d(col("tp")))
          + (d(col("support")) - d(col("tp")))), 6).as("f1"))
  }

  /** LIFT / GAINS CHART — the campaign-targeting readout: rank by
    * score descending, split into `tiles` near-equal-population
    * bands, and per band report the positive rate, its LIFT over the
    * base rate, and the cumulative capture share. Band assignment is
    * tie-respecting and integer-exact off the quantized bin table:
    * bin b (all its rows) lands in tile ⌊tiles·(2·cumAbove_b + n_b) /
    * (2·total)⌋ — the tile of the bin's MIDPOINT rank, so equal
    * scores never split across tiles and no data-sized window ever
    * runs (a true per-row ntile is a global sort at 100 TB; the
    * midpoint-of-bin convention is this operator's documented
    * semantics, replayed by the oracle).
    */
  def liftChart(df: DataFrame, scoreCol: String, labelCol: String,
                tiles: Int = 10, bins: Int = 1000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def d(c: Column) = c.cast("double")
    val b = scoreBins(df, scoreCol, labelCol, bins)
    val tot = b.agg(sum(col("pos") + col("neg")).as("total"),
      sum("pos").as("p")) // 1-row scalar
    val w = Window.orderBy(col("q").desc) // ≤ bins+1 rows — control-plane
      .rowsBetween(Window.unboundedPreceding, -1)
    val tiled = b
      .withColumn("cum_above", coalesce(sum(col("pos") + col("neg")).over(w),
        lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("tile", // midpoint-rank tile, integer-exact
        least(floor((col("cum_above") * 2 + col("pos") + col("neg"))
          * tiles / (col("total") * 2)), lit((tiles - 1).toLong))
          .cast("long"))
    val perTile = tiled.groupBy("tile")
      .agg(sum(col("pos") + col("neg")).as("n"), sum("pos").as("n_pos"),
        max("total").as("total"), max("p").as("p"))
    val w2 = Window.orderBy("tile") // ≤ tiles rows
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perTile.withColumn("cum_pos", sum("n_pos").over(w2))
      .select(col("tile"), col("n"), col("n_pos"),
        round(d(col("n_pos")) / d(col("n")), 6).as("pos_rate"),
        round((d(col("n_pos")) / d(col("n")))
          / (d(col("p")) / d(col("total"))), 6).as("lift"),
        round(d(col("cum_pos")) / d(col("p")), 6).as("cum_capture"))
  }

  /** CALIBRATION (reliability) table — does a score of 0.7 mean 70%?
    * Scores bucket into `buckets` equal-width bands (assignment off
    * the integer quantized q, so the bucket edge is exact: bucket =
    * min(⌊q·buckets/bins⌋, buckets−1)); each band reports its mean
    * predicted score, observed positive rate, and the gap — the
    * reliability-diagram rows, miscalibration read directly off
    * `gap`. One corpus scan + a buckets-sized aggregate.
    */
  def calibrationReport(df: DataFrame, scoreCol: String, labelCol: String,
                        buckets: Int = 10, bins: Int = 1000): DataFrame = {
    def d(c: Column) = c.cast("double")
    scoreBins(df, scoreCol, labelCol, bins)
      .withColumn("bucket", // q·buckets ≤ 10⁴ — exact in doubles, floor exact
        least(floor(col("q") * buckets / lit(bins)), lit((buckets - 1).toLong))
          .cast("long"))
      .groupBy("bucket")
      .agg(sum(col("pos") + col("neg")).as("n"), sum("pos").as("n_pos"),
        sum((col("pos") + col("neg")) * col("q")).as("sum_q"))
      .select(col("bucket"), col("n"), col("n_pos"),
        round(d(col("sum_q")) / (d(col("n")) * bins), 6).as("mean_pred"),
        round(d(col("n_pos")) / d(col("n")), 6).as("pos_rate"),
        round(d(col("n_pos")) / d(col("n"))
          - d(col("sum_q")) / (d(col("n")) * bins), 6).as("gap"))
  }
}
