package graft

import org.apache.spark.sql.functions._
import graft.operators.Profiling

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some("a"), Some(10)),
    (2L, Some("b"), None),
    (3L, None, Some(30)),
    (4L, Some("b"), Some(10))
  ).toDF("id", "s", "v")

  test("profileColumns: rows/nulls/ndv/min/max per column, long format") {
    val p = Profiling.profileColumns(fixture, Seq("id", "s", "v"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, String, String)]
      .collect()
    assert(p.toSeq == Seq(
      ("id", 4L, 0L, 4L, "1", "4"),
      ("s", 4L, 1L, 2L, "a", "b"),
      ("v", 4L, 1L, 2L, "10", "30")))
  }

  test("profileColumns is one aggregate pass: a single scan in the plan") {
    val plan = Profiling.profileColumns(fixture, Seq("id", "s", "v"))
      .queryExecution.executedPlan.toString
    val scans = "LocalTableScan".r.findAllIn(plan).size
    assert(scans == 1, s"expected one scan, plan had $scans:\n$plan")
  }

  test("checkConstraints: named boolean verdicts in one pass") {
    val checks = Profiling.checkConstraints(fixture, Seq(
      "id_not_null" -> (count(when(col("id").isNull, 1)) === 0),
      "id_unique"   -> (countDistinct(col("id")) === count(lit(1))),
      "s_complete"  -> (count(when(col("s").isNull, 1)) === 0),
      "v_min_bound" -> (min(col("v")) >= 0)))
      .as[(String, Boolean)].collect().toMap
    assert(checks == Map(
      "id_not_null" -> true,
      "id_unique"   -> true,
      "s_complete"  -> false,
      "v_min_bound" -> true))
    val plan = Profiling.checkConstraints(fixture,
      Seq("a" -> (min(col("v")) >= 0), "b" -> (max(col("v")) < 100)))
      .queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1)
  }

  test("profileNumeric: exact moments from scaled-integer sums") {
    val df = Seq(Some(1.25), Some(2.75), Some(4.0), None).toDF("x")
    val p = Profiling.profileNumeric(df, Seq("x"))
      .as[(String, Long, Long, Double, Double, Double, Double)].head()
    // v100 = (125, 275, 400): s1 = 800, s2 = 251250
    assert(p._1 == "x" && p._2 == 4L && p._3 == 1L)
    assert(p._4 == 2.666667) // 800 / 300, rounded 6
    assert(p._5 == 1.376893) // sqrt((25.125 - 64/3) / 2), rounded 6
    assert(p._6 == 1.25 && p._7 == 4.0)
  }

  test("profileNumeric: std is null below two non-null values; one scan") {
    val df = Seq(Some(3.0), None).toDF("x")
    val row = Profiling.profileNumeric(df, Seq("x")).collect().head
    assert(row.isNullAt(row.fieldIndex("std")))
    val plan = Profiling.profileNumeric(fixture.select(col("v").cast("double").as("v")),
      Seq("v")).queryExecution.executedPlan.toString
    assert("LocalTableScan".r.findAllIn(plan).size == 1)
  }

  test("keySkew: heavy hitters with share, boundary ties break on key") {
    val df = Seq("a", "a", "a", "b", "b", "c", "c").toDF("k")
    val top = Profiling.keySkew(df, "k", 2)
      .as[(String, Long, Double)].collect().toSeq
    // b and c tie at 2; the boundary slot goes to 'b' (key asc)
    assert(top == Seq(("a", 3L, 0.428571), ("b", 2L, 0.285714)))
  }

  test("keySkew scans the corpus once: total reuses the per-key exchange") {
    val q = SparkEntry.queries("profile_skew")(spark, sf001)
    q.collect() // AQE: exchange reuse materializes in the final plan
    // toString prints final + initial plan; judge only the final one
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"),
      s"total must reuse the per-key counts exchange, not rescan:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      "the corpus must scan exactly once")
  }

  test("empty column / constraint lists are rejected") {
    intercept[IllegalArgumentException](Profiling.profileColumns(fixture, Nil))
    intercept[IllegalArgumentException](Profiling.checkConstraints(fixture, Nil))
    intercept[IllegalArgumentException](Profiling.profileNumeric(fixture, Nil))
    intercept[IllegalArgumentException](Profiling.pairwiseCorr(fixture, Nil))
  }

  test("valueEntropy: uniform column normalizes to 1, constant column to zero entropy") {
    import spark.implicits._
    val df = Seq(("a", "x"), ("b", "x"), ("c", "x"), ("d", "x"))
      .toDF("uniform", "constant")
    val got = Profiling.valueEntropy(df, Seq("uniform", "constant"))
      .orderBy("col_name")
      .select("col_name", "n_nonnull", "n_distinct", "entropy", "norm_entropy")
      .as[(String, Long, Long, Double, Option[Double])].collect().toSeq
    assert(got(0) == (("constant", 4L, 1L, 0.0, None)), s"constant: ${got(0)}")
    assert(got(1)._3 == 4L && math.abs(got(1)._4 - math.log(4)) < 1e-5)
    assert(got(1)._5.exists(n => math.abs(n - 1.0) < 1e-6), "uniform normalizes to 1")
  }

  test("pairwiseCorr: exact ±1 on linear columns, null on constants, pairwise deletion") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1.0, 2.0, Some(5.0), 7.0),
      (2.0, 4.0, Some(3.0), 7.0),
      (3.0, 6.0, Some(1.0), 7.0),
      (4.0, 8.0, None, 7.0))
      .toDF("x", "y2", "yneg", "c")
    val got = Profiling.pairwiseCorr(df,
        Seq(("x", "y2"), ("x", "yneg"), ("x", "c")))
      .select("col_x", "col_y", "n_pairs", "corr")
      .as[(String, String, Long, Option[Double])].collect()
      .map(r => (r._2, r._3, r._4)).toSet
    assert(got == Set(
      ("y2", 4L, Some(1.0)),     // perfect linear
      ("yneg", 3L, Some(-1.0)),  // null row dropped from THIS pair only
      ("c", 4L, None)))          // zero variance -> null, not NaN
  }

  test("profileDrift: null-ratio movement, distinct deltas, min/max-changed flags") {
    val oldDf = Seq((1L, Some("a")), (2L, Some("b")), (3L, Some("c")), (4L, Some("c")))
      .toDF("k", "s")
    // new snapshot: a null appears, the max k grows, distinct s shrinks
    val newDf = Seq((1L, Some("a")), (2L, None: Option[String]), (5L, Some("a")))
      .toDF("k", "s")
    val got = graft.operators.Profiling.profileDrift(oldDf, newDf, Seq("k", "s"))
      .orderBy("col_name")
      .as[(String, Long, Long, Double, Double, Long, Long, Boolean, Boolean)]
      .collect().toSeq
    assert(got == Seq(
      ("k", 4L, 3L, 0.0, 0.0, 4L, 3L, false, true),      // max 4 -> 5
      ("s", 4L, 3L, 0.0, 0.333333, 3L, 1L, false, true)), // max c -> a
      s"drift report mismatch: $got")
  }

  test("funnelRates: per-step counts and conversion rates from a hand-built funnel") {
    import java.sql.Timestamp
    def t(m: Int) = new Timestamp(m * 60000L)
    val e = Seq(
      (1L, "u1", "view", t(0)), (2L, "u1", "click", t(1)), (3L, "u1", "purchase", t(2)),
      (4L, "u2", "view", t(0)), (5L, "u2", "click", t(1)),
      (6L, "u3", "view", t(0))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = graft.operators.Events.funnelRates(e, Seq("view", "click", "purchase"))
      .orderBy("step")
      .as[(Long, String, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, "view", 3L, 1.0, 1.0),
      (2L, "click", 2L, 0.666667, 0.666667),
      (3L, "purchase", 1L, 0.5, 0.333333)),
      s"funnel rates mismatch: $got")
  }

  test("distinctSketchRollup: merging fine sketches equals sketching the union; exact at small cardinality") {
    import org.apache.spark.sql.functions._
    // users overlap ACROSS days — a count rollup would double-count
    // (g=a days sum to 5 rows but only 3 distinct users)
    val df = Seq(
      ("a", "d1", 10L), ("a", "d1", 11L), ("a", "d2", 10L),
      ("a", "d2", 12L), ("a", "d3", 11L),
      ("b", "d1", 20L), ("b", "d2", 20L)
    ).toDF("g", "day", "u")
    val merged = graft.operators.Analytics
      .distinctSketchRollup(df, Seq("g", "day"), Seq("g"), "u")
      .as[(String, Long)].collect().toMap
    // sparse-mode HLL is exact at these cardinalities, so the merged
    // estimate must equal the true distinct count — and in particular
    // NOT the naive sum of per-day counts
    assert(merged == Map("a" -> 3L, "b" -> 1L), s"got $merged")
    // associativity: merging per-day sketches == one sketch of all rows
    val direct = df.groupBy("g")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(u, 14))").as("n"))
      .as[(String, Long)].collect().toMap
    assert(merged == direct, s"union-of-sketches must equal sketch-of-union: $merged vs $direct")
  }

  test("psiDrift: zero for identical halves; out-of-range drift lands in the edge bin") {
    import org.apache.spark.sql.functions._
    val ref = (0 to 9).map(_.toDouble).toDF("x")
    val same = graft.operators.Profiling.psiDrift(ref, ref, "x")
      .select("psi_total").distinct().as[Double].head()
    assert(same == 0.0, s"identical distributions must give PSI 0, got $same")
    // every current value far beyond the reference range → all 10
    // rows clamp into bin 9
    val shifted = (0 to 9).map(v => v + 100.0).toDF("x")
    val got = graft.operators.Profiling.psiDrift(ref, shifted, "x")
      .orderBy("bin")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got.map(_._3) == Seq(0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 10L),
      s"clamped counts wrong: $got")
    // replicate the smoothed-share PSI in plain doubles
    val terms = (0 until 10).map { b =>
      val pR = (1 + 0.5) / (10 + 5.0)
      val pC = ((if (b == 9) 10 else 0) + 0.5) / (10 + 5.0)
      (pC - pR) * math.log(pC / pR)
    }
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.head._6 == r6(terms.sum), s"psi mismatch: ${got.head._6} vs ${r6(terms.sum)}")
  }

  test("benford: exact string-digit extraction, zero/negative guard, chi-square fold") {
    import org.apache.spark.sql.functions._
    // digits: 1.0→1, 1.5→1, 25.0→2, 0.09→9; 0.004 rounds to 0 and
    // -5 is negative — both must drop
    val df = Seq(1.0, 1.5, 25.0, 0.09, 0.004, -5.0).toDF("x")
    val got = graft.operators.Profiling.benford(df, "x")
      .orderBy("digit")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    val n = Map(1L -> 2L, 2L -> 1L, 9L -> 1L).withDefaultValue(0L)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val chi2 = r6((1 to 9).map { d =>
      val p = math.log10(1.0 + 1.0 / d)
      val dev = n(d.toLong) - 4 * p
      dev * dev / (4 * p)
    }.sum)
    val expect = (1 to 9).map { d =>
      (d.toLong, n(d.toLong), r6(n(d.toLong) / 4.0),
       r6(math.log10(1.0 + 1.0 / d)), chi2)
    }
    assert(got == expect, s"got $got\nexpect $expect")
  }

  test("ksDrift: hand-computed statistic; result independent of partition count") {
    // A = {1,2,3,4}, B = {3,4,5,6}: ECDF gap peaks at v=2 (and v=4):
    // |2/4 - 0/4| = 0.5
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")
    for (p <- Seq(1, 3, 32)) {
      val got = graft.operators.Profiling.ksDrift(a, b, "x", numPartitions = p)
        .as[(Double, Long, Long)].head()
      assert(got == ((0.5, 4L, 4L)), s"numPartitions=$p got $got")
    }
    // identical distributions → KS 0
    val same = graft.operators.Profiling.ksDrift(a, a, "x")
      .as[(Double, Long, Long)].head()
    assert(same == ((0.0, 4L, 4L)))
  }

  test("w1Drift: hand-computed earth-mover integral; partition-count invariant") {
    // A = {1,2,3,4}, B = {3,4,5,6} — |F_A-F_B| over merged support:
    // [1,2): 0.25, [2,3): 0.5, [3,4): 0.5, [4,5): 0.5, [5,6): 0.25
    // → W1 = 0.25+0.5+0.5+0.5+0.25 = 2.0 (a pure shift by 2 of half
    // the mass... exactly the mean shift for a translation)
    val a = Seq(1.0, 2.0, 3.0, 4.0).toDF("x")
    val b = Seq(3.0, 4.0, 5.0, 6.0).toDF("x")
    for (p <- Seq(1, 3, 32)) {
      val got = graft.operators.Profiling.w1Drift(a, b, "x", numPartitions = p)
        .as[(Double, Long, Long)].head()
      assert(got == ((2.0, 4L, 4L)), s"numPartitions=$p got $got")
    }
    // identical distributions → W1 0; and W1 of a pure +c shift = c
    assert(graft.operators.Profiling.w1Drift(a, a, "x")
      .as[(Double, Long, Long)].head() == ((0.0, 4L, 4L)))
    val shifted = Seq(1.5, 2.5, 3.5, 4.5).toDF("x")
    assert(graft.operators.Profiling.w1Drift(a, shifted, "x")
      .as[(Double, Long, Long)].head() == ((0.5, 4L, 4L)),
      "W1 of a +0.5 translation must be 0.5")
  }

  test("autoExpectations: learned bounds catch range breaks and null-budget breaches") {
    val ref = Seq((1L, Some(10.0)), (2L, Some(20.0)), (3L, Some(30.0)),
      (4L, None)).toDF("k", "v") // null share 0.25
    val ok = Seq((5L, Some(15.0)), (6L, Some(25.0)), (7L, Some(30.0)),
      (8L, None)).toDF("k", "v")
    val bad = Seq((5L, Some(5.0)), (6L, Some(35.0)), (7L, None),
      (8L, None)).toDF("k", "v") // range broken both ways, nulls 0.5
    def run(cur: org.apache.spark.sql.DataFrame) =
      graft.operators.Profiling.autoExpectations(ref, cur, Seq("v"))
        .select("min_ok", "max_ok", "null_ok")
        .as[(Boolean, Boolean, Boolean)].head()
    assert(run(ok) == ((true, true, true)), "in-bounds snapshot must pass")
    assert(run(bad) == ((false, false, false)),
      "range breaks and null breach must all flag")
  }

  test("keyCandidates: unique, duplicated, and nullable columns classify correctly") {
    val df = Seq(
      (1L, "a", Some(10.0)), (2L, "a", Some(20.0)),
      (3L, "b", None), (4L, "b", Some(40.0)))
      .toDF("id", "grp", "v")
    val got = graft.operators.Profiling.keyCandidates(df, Seq("id", "grp", "v"))
      .orderBy("col_name")
      .as[(String, Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("grp", 4L, 4L, 2L, 0.5, false),
      ("id", 4L, 4L, 4L, 1.0, true),
      // v is unique among its 3 non-nulls but the null disqualifies it
      ("v", 4L, 3L, 3L, 0.75, false)), s"key verdicts: $got")
  }

  test("topKSketchRollup: merged frequent-items counts are exact under the tracking cap") {
    import org.apache.spark.sql.functions._
    // items spread across fine groups — a per-group top-k union would
    // miss x's global dominance (never top-1 in any single day)
    val df = Seq(
      ("d1", "y"), ("d1", "y"), ("d1", "x"),
      ("d2", "z"), ("d2", "z"), ("d2", "x"),
      ("d3", "w"), ("d3", "w"), ("d3", "x"), ("d3", "x")
    ).toDF("day", "v")
    val got = graft.operators.Analytics
      .topKSketchRollup(df, Seq("day"), "v", k = 2)
      .as[(String, Long)].collect().toMap
    // 4 distinct items < maxItemsTracked=16 -> no eviction, counts
    // exact: x=4 globally tops every per-day winner (y/z/w = 2)
    assert(got("x") == 4L, s"got $got")
    assert(got.size == 2 && got.values.forall(Set(4L, 2L)), s"got $got")
    // merge equals direct: combining per-day sketches must count like
    // one global pass
    val direct = df.groupBy("v").agg(count(lit(1)).as("n"))
      .as[(String, Long)].collect().toMap
    assert(got.forall { case (k, n) => direct(k) == n },
      s"merged counts diverge from exact: $got vs $direct")
  }

  test("audienceDifference: theta A-not-B is exact in sparse mode, ordered pairs") {
    import org.apache.spark.sql.functions._
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L),
      ("c", 9L)).toDF("g", "u")
    val got = graft.operators.Analytics.audienceDifference(df, "g", "u")
      .select(col("type_a"), col("type_b"),
        round(col("n_only_a_est")).cast("long").as("n"))
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // a={1,2,3}, b={2,3,4}, c={9}: a\b=1, b\a=1, a\c=3, c\a=1, ...
    assert(got(("a", "b")) == 1L && got(("b", "a")) == 1L, s"got $got")
    assert(got(("a", "c")) == 3L && got(("c", "a")) == 1L, s"got $got")
    assert(got(("b", "c")) == 3L && got(("c", "b")) == 1L, s"got $got")
    assert(got.size == 6, s"ordered pair frame must be |groups|^2 - diag: $got")
  }

  test("kllQuantileRollup: merged per-group sketches are exact in the retain-all regime") {
    import org.apache.spark.sql.functions._
    // 1..100 scattered across 4 fine groups — merge must see the
    // global distribution, not any single group's
    val df = (1L to 100L).map(v => (s"g${v % 4}", v)).toDF("g", "v")
    val got = graft.operators.Analytics
      .kllQuantileRollup(df, Seq("g"), "v", Seq(25, 50, 75, 90))
      .as[(Long, Long)].collect().toMap
    // n = 100 << k: retain-all regime, quantiles are real data values
    // within one rank of the target
    for ((p, q) <- got) assert(math.abs(q - p) <= 1, s"p$p -> $q: $got")
    // deterministic: same input, same partitioning-independent result
    val again = graft.operators.Analytics
      .kllQuantileRollup(df.repartition(7), Seq("g"), "v", Seq(25, 50, 75, 90))
      .as[(Long, Long)].collect().toMap
    assert(again == got, s"partitioning changed retain-all quantiles: $again vs $got")
  }

  test("audienceOverlap: pairwise theta intersection is exact in sparse mode") {
    // a∩b = {2,3}, a∩c = {1}, b∩c = {} — the empty overlap must
    // report 0, not be absent (sketch intersection of disjoint sets)
    val df = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 2L), ("b", 3L), ("b", 4L),
      ("c", 1L), ("c", 9L)
    ).toDF("g", "u")
    val got = graft.operators.Analytics.audienceOverlap(df, "g", "u")
      .as[(String, String, Long)].collect()
      .map { case (a, b, n) => (a, b) -> n }.toMap
    assert(got == Map(("a", "b") -> 2L, ("a", "c") -> 1L, ("b", "c") -> 0L),
      s"got $got")
  }

  test("madOutliers: hand-computed median/MAD flags the spike only; robust to the spike itself") {
    import graft.operators.Profiling
    val df = ((1 to 9).map(i => (i.toLong, i.toDouble)) :+ (10L, 1000.0))
      .toDF("id", "v")
    val got = Profiling.madOutliers(df, "id", "v", cutoff = 3.5)
      .as[(Long, Double, Double)].collect().toSeq
    // median = 5.5, abs devs sorted = 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,
    // 4.5,994.5 → MAD = 2.5; z(1000) = 994.5/(1.4826·2.5), z(9) ≈ 0.94
    val expectZ = BigDecimal(994.5 / (1.4826 * 2.5))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((10L, 1000.0, expectZ)), s"got $got")
    // the spike does NOT poison the estimator: removing it leaves the
    // same median/MAD verdict for the rest (nothing flagged)
    val clean = Profiling.madOutliers(df.where(col("id") < 10), "id", "v", cutoff = 3.5)
    assert(clean.count() == 0)
  }

  test("cmsEstimates: one-sided error always; wide grid exact; width-1 grid returns N for every key") {
    import graft.operators.Analytics
    val ev = Tables.events(spark, sf001)
    val wide = Analytics.cmsEstimates(ev, "event_type", depth = 4, width = 256)
      .as[(String, Long, Long, Long)].collect()
    assert(wide.nonEmpty)
    // the CMS guarantee: never an underestimate
    assert(wide.forall { case (_, est, exact, over) => est >= exact && over == est - exact },
      s"one-sided error violated: ${wide.mkString(",")}")
    // 5 keys across 4×256 cells: no collisions, so the sketch is exact
    assert(wide.forall { case (_, est, exact, _) => est == exact },
      s"width-256 grid must be collision-free for 5 keys: ${wide.mkString(",")}")
    // degenerate width 1: every key collides into the same counter in
    // every row, so each estimate is the TOTAL row count
    val n = ev.count()
    val tiny = Analytics.cmsEstimates(ev, "event_type", depth = 4, width = 1)
      .as[(String, Long, Long, Long)].collect()
    assert(tiny.forall(_._2 == n),
      s"width-1 estimates must all equal N=$n: ${tiny.mkString(",")}")
  }

  test("fdAudit: holding and violated candidates, null rhs counts as a value") {
    val got = Profiling.fdAudit(fixture, Seq(("id", "s"), ("s", "v")))
      .select("lhs", "rhs", "n_classes", "n_violating", "violation_share", "holds")
      .as[(String, String, Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    // id→s: ids unique → every class has exactly one rhs value (null
    // for id 3 counts as that one value) → holds.
    // s→v: classes a {10}, b {null, 10} → 2 rhs values → violating,
    // null-s {30} → 1 of 3 classes violates
    assert(got == Seq(
      ("id", "s", 4L, 0L, 0.0, true),
      ("s", "v", 3L, 1L, 0.333333, false)), s"got $got")
  }

  test("exactQuantiles: value at rank ceil(p*N/100), duplicate-aware, partitioning-independent") {
    // sorted: 10,20,20,30,40,50,60,70,80,100 (N=10) → ranks
    // p25→3, p50→5, p75→8, p90→9, p100→10
    val vals = Seq(50L, 20L, 10L, 100L, 30L, 20L, 80L, 40L, 70L, 60L).toDF("v")
    val expect = Seq((25L, 3L, 20L), (50L, 5L, 40L), (75L, 8L, 70L),
      (90L, 9L, 80L), (100L, 10L, 100L))
    for (np <- Seq(1, 5)) {
      val got = Profiling.exactQuantiles(vals, "v", Seq(25, 50, 75, 90, 100),
          numPartitions = np)
        .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
      assert(got == expect, s"numPartitions=$np got $got")
    }
    // empty input → empty output (rank 0 matches nothing)
    assert(Profiling.exactQuantiles(vals.where(lit(false)), "v", Seq(50)).count() == 0)
  }

  test("heavyHitters: exact groupBy answer from bounded MG candidates under any partitioning") {
    import graft.operators.Analytics
    // 60×a + 25×b + 15 singletons: N=100, capacity 3 → threshold
    // N/4 = 25 — a qualifies (60 > 25), b does NOT (25 > 25 is
    // strict). The singletons force real decrement-all evictions.
    val rows = (Seq.fill(60)("a") ++ Seq.fill(25)("b") ++
      (1 to 15).map(i => s"s$i")).toDF("k")
    for (np <- Seq(1, 7)) {
      val got = Analytics.heavyHitters(rows.repartition(np), "k", capacity = 3)
        .as[(String, Long)].collect().toSeq
      assert(got == Seq(("a", 60L)), s"np=$np got $got")
    }
    // capacity above the domain size: MG never evicts → equals the
    // plain groupBy + HAVING answer wholesale
    val all = Analytics.heavyHitters(rows, "k", capacity = 200)
      .as[(String, Long)].collect().toSeq
    assert(all == Seq(("a", 60L), ("b", 25L)) ++ (1 to 15).map(i => (s"s$i", 1L))
      .sortBy(_._1), s"got $all")
  }

  test("chiSquareIndependence: hand-computed 2x2, zero cells completed from marginals") {
    // symmetric association: obs (x,p)=3 (x,q)=1 (y,p)=1 (y,q)=3;
    // n=8, all marginals 4, expected 2 per cell → chi2 = 4·0.5 = 2.0,
    // dof 1, V = sqrt(2/8) = 0.5
    val df = (Seq.fill(3)(("x", "p")) ++ Seq(("x", "q"), ("y", "p")) ++
      Seq.fill(3)(("y", "q"))).toDF("a", "b")
    val r = Profiling.chiSquareIndependence(df, "a", "b")
      .select("n_rows", "r_levels", "c_levels", "dof", "chi2", "cramers_v")
      .as[(Long, Long, Long, Long, Double, Double)].head()
    assert(r == ((8L, 2L, 2L, 1L, 2.0, 0.5)), s"got $r")
    // perfect association with EMPTY cells (x,q) and (y,p): the grid
    // completion must charge their full expected mass → chi2 = n = 4
    val perfect = Seq(("x", "p"), ("x", "p"), ("y", "q"), ("y", "q")).toDF("a", "b")
    val p = Profiling.chiSquareIndependence(perfect, "a", "b")
      .select("chi2", "cramers_v").as[(Double, Double)].head()
    assert(p == ((4.0, 1.0)), s"got $p")
  }

  test("giniCoefficient: 0 for equality, (n-1)/n for total concentration, bucket-count invariant") {
    import graft.operators.Analytics
    val equal = (1L to 4L).map(i => (i, 5L)).toDF("id", "v")
    val g0 = Analytics.giniCoefficient(equal, "id", "v")
      .as[(Long, Long, Double)].head()
    assert(g0 == ((4L, 20L, 0.0)), s"equal shares must score 0: $g0")
    // one holder of everything among 4 → (n−1)/n = 0.75; ranks span
    // buckets because the zeros and the 100 land in different ranges
    val conc = Seq((1L, 0L), (2L, 0L), (3L, 0L), (4L, 100L)).toDF("id", "v")
    val g1 = Analytics.giniCoefficient(conc, "id", "v")
      .as[(Long, Long, Double)].head()
    assert(g1 == ((4L, 100L, 0.75)), s"total concentration must score 0.75: $g1")
    // the bucketed two-phase rank must be invariant to bucket count
    val mixed = (1L to 100L).map(i => (i, i * i % 97)).toDF("id", "v")
    val a = Analytics.giniCoefficient(mixed, "id", "v", numBuckets = 1).head()
    val b = Analytics.giniCoefficient(mixed, "id", "v", numBuckets = 1024).head()
    assert(a == b, s"bucket count changed the exact rank sum: $a vs $b")
  }

  test("freshness: lag vs corpus watermark, 7d share, stale flag") {
    import java.sql.Timestamp
    def h(hh: Long) = new Timestamp(hh * 3600000L)
    // watermark = hour 1000. 'live' last at 1000 (lag 0, both rows in
    // 7d); 'stale' last at hour 100 → lag 900 h > 168 → stale, and
    // its rows fall outside the trailing 7 days
    val df = Seq(("live", h(999)), ("live", h(1000)), ("stale", h(100)))
      .toDF("src", "ts")
    val got = Profiling.freshness(df, "src", "ts")
      .orderBy("src")
      .select("src", "n_total", "n_last_7d", "lag_hours", "is_stale")
      .as[(String, Long, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(("live", 2L, 2L, 0.0, false),
      ("stale", 1L, 0L, 900.0, true)), s"got $got")
  }

  test("skyline2D: dominance, both-axis ties kept, bucket-count invariant") {
    import graft.operators.Analytics
    // frontier: (1.0,3) and (2.0,5). (2.0,3) dominated by (1.0,3)
    // (same size, cheaper); (3.0,5) dominated by (2.0,5); (1.5,1)
    // dominated by (1.0,3). Duplicate (2.0,5) rows BOTH survive —
    // neither strictly dominates the other.
    val df = Seq((1L, 1.0, 3), (2L, 2.0, 3), (3L, 2.0, 5), (4L, 2.0, 5),
      (5L, 3.0, 5), (6L, 1.5, 1)).toDF("id", "price", "size")
    val got = Analytics.skyline2D(df, "id", "price", "size")
      .as[(Long, Double, Long)].collect().toSeq
    assert(got == Seq((1L, 1.0, 3L), (3L, 2.0, 5L), (4L, 2.0, 5L)), s"got $got")
    // equal-price non-max rows drop; bucket count never changes the set
    val a = Analytics.skyline2D(df, "id", "price", "size", numBuckets = 1)
      .collect().toSeq
    assert(a == Analytics.skyline2D(df, "id", "price", "size", numBuckets = 1024)
      .collect().toSeq, "bucket count changed the frontier")
  }

  test("hhiByMarket: monopoly 1.0, duopoly 0.5, effective competitors = 1/HHI") {
    import graft.operators.Analytics
    val df = Seq(
      ("mono", "a", 100L),
      ("duo", "a", 50L), ("duo", "b", 25L), ("duo", "b", 25L), // b split rows sum
      ("asym", "a", 90L), ("asym", "b", 10L))
      .toDF("m", "p", "x")
    val got = Analytics.hhiByMarket(df, "m", "p", "x").orderBy("market")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got(0) == (("asym", 2L, 100L, 0.82, 1.219512)), s"got $got")
    assert(got(1) == (("duo", 2L, 100L, 0.5, 2.0)), s"got $got")
    assert(got(2) == (("mono", 1L, 100L, 1.0, 1.0)), s"got $got")
  }

  test("lorenzDeciles: values 1..10 land one per decile with triangular cumulative shares") {
    import graft.operators.Analytics
    val df = (1L to 10L).map(i => (i, i)).toDF("id", "v")
    val got = Analytics.lorenzDeciles(df, "id", "v")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(got.size == 10 && got.forall(_._2 == 1L), s"got $got")
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (dec, _, mass, cum, share) =>
      assert(mass == dec && cum == dec * (dec + 1) / 2, s"decile $dec: $got")
      assert(share == r6(dec * (dec + 1) / 2 / 55.0), s"decile $dec share: $got")
    }
    // bucket-count invariance of the shared ranking core
    val a = Analytics.lorenzDeciles(df, "id", "v", numBuckets = 1).collect().toSeq
    val b = Analytics.lorenzDeciles(df, "id", "v", numBuckets = 512).collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("nullPatterns: co-occurrence patterns with shares and the complete flag") {
    val df = Seq(
      (Some("x"), Some(1)), (None, Some(2)), (None, None), (None, Some(3))
    ).toDF("a", "b")
    val got = Profiling.nullPatterns(df, Seq("a", "b"))
      .orderBy("pattern")
      .select("pattern", "n_rows", "share", "is_complete")
      .as[(String, Long, Double, Boolean)].collect().toSeq
    assert(got == Seq(
      ("0,0", 1L, 0.25, true),
      ("1,0", 2L, 0.5, false),
      ("1,1", 1L, 0.25, false)), s"got $got")
  }

  test("sequenceGaps: bucket-local and cross-boundary gaps, dups, empty-gap case") {
    // buckets of 10: {1,2,3,7} | {25,26} | {41}; local gap 3→7 (3),
    // boundary gaps 7→25 (17) and 26→41 (14); Σgap = 34 = n_missing;
    // one duplicate 25 → n_dup_rows 1
    val keys = Seq(1L, 2L, 3L, 7L, 25L, 25L, 26L, 41L).toDF("k")
    val g = Profiling.sequenceGaps(keys, "k", bucketSize = 10L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)].head()
    assert(g == ((8L, 7L, 1L, 1L, 41L, 34L, 3L, 34L, 17L)), s"got $g")
    // dense keys: zero gaps, null max_gap
    val dense = Seq(5L, 6L, 7L).toDF("k")
    val d = Profiling.sequenceGaps(dense, "k", bucketSize = 10L)
      .select("n_missing", "n_gaps", "max_gap")
      .as[(Long, Long, Option[Long])].head()
    assert(d == ((0L, 0L, None)), s"got $d")
  }

  test("momentsByGroup: symmetric data has ~0 skew; a planted outlier drives it positive") {
    import java.sql.Timestamp
    // symmetric {1,2,3} repeated: skewness 0, kurtosis of the
    // 3-point uniform = -1.5 exactly
    val sym = Seq.fill(10)(Seq(1.00, 2.00, 3.00)).flatten
      .map(v => ("a", v)).toDF("event_type", "value")
    val s = graft.operators.Profiling.momentsByGroup(sym, "event_type", "value")
      .select("n", "mean", "skewness", "kurtosis_excess")
      .as[(Long, Double, Double, Double)].head()
    assert(s._1 == 30L && s._2 == 2.0)
    assert(math.abs(s._3) < 1e-9, s"symmetric skew: ${s._3}")
    assert(math.abs(s._4 - (-1.5)) < 1e-9, s"3-point-uniform kurtosis: ${s._4}")
    // one huge outlier -> strongly right-skewed, heavy-tailed
    val skewed = (Seq.fill(29)(1.00) :+ 1000.00)
      .map(v => ("b", v)).toDF("event_type", "value")
    val k = graft.operators.Profiling.momentsByGroup(skewed, "event_type", "value")
      .select("skewness", "kurtosis_excess").as[(Double, Double)].head()
    assert(k._1 > 5.0 && k._2 > 20.0, s"outlier must show in the tail stats: $k")
  }

  test("decayedTopK: recency beats raw count; weights are exact dyadic integers") {
    import graft.operators.Analytics
    import java.sql.Date
    def d(s: String) = Date.valueOf(s)
    // item A: 3 hits 60 days old (2 half-lives: 3·2^-2 = 0.75)
    // item B: 1 fresh hit (weight 1) — fewer hits, higher decayed score
    // item C: 1 hit beyond the 40-half-life cap — weight exactly 0
    val df = (Seq.fill(3)(("A", d("2026-01-01"))) :+ ("B", d("2026-03-02"))
      :+ ("C", d("2020-01-01"))).toDF("k", "dt")
    val got = Analytics.decayedTopK(df, "k", "dt", halfLifeDays = 30, k = 5)
      .select("key", "n", "decayed").as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got("B") == ((1L, 1.0)) && got("A") == ((3L, 0.75)), got.toString)
    assert(got("C") == ((1L, 0.0)), s"beyond the cap must weigh exactly 0: $got")
    val order = Analytics.decayedTopK(df, "k", "dt", 30, 5)
      .select("key").as[String].collect().toSeq
    assert(order == Seq("B", "A", "C"), s"recency must outrank count: $order")
  }

  test("sliceFinder: shifted slice ranks first with the hand-computed z") {
    import graft.operators.Profiling
    val df = (Seq.fill(30)(("a", 0.0)) ++ Seq.fill(10)(("b", 4.0)))
      .toDF("g", "value")
    val got = Profiling.sliceFinder(df, Seq("g" -> col("g")), "value", topK = 10)
      .orderBy("rnk")
      .select("rnk", "dim", "value", "n", "mean_slice", "z")
      .as[(Long, String, String, Long, Double, Double)].collect().toSeq
    // global mean 1, population var 3; z_b = 3/sqrt(3/10), z_a = -1/sqrt(3/30)
    def z(meanS: Double, n: Double) =
      BigDecimal((meanS - 1.0) / math.sqrt(3.0 / n))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == ((1L, "g", "b", 10L, 4.0, z(4.0, 10))), got(0).toString)
    assert(got(1) == ((2L, "g", "a", 30L, 0.0, z(0.0, 30))), got(1).toString)
    assert(math.abs(got(0)._6) > math.abs(got(1)._6),
      "the shifted slice must out-rank the baseline slice")
  }

  test("bottomK: merge law — per-group rollup equals the direct global cut") {
    import graft.operators.Analytics
    val df = (1 to 500).map(i => (i % 13, s"u${i % 97}")).toDF("g", "uid")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.select("rnk", "key", "h").as[(Long, String, Long)].collect().toSet
    val merged = Analytics.bottomKRollup(
      Analytics.bottomKSketch(df, Seq("g"), "uid", k = 8), k = 8)
    val direct = Analytics.bottomKRollup(
      Analytics.bottomKSketch(df.withColumn("one", lit(1)), Seq("one"), "uid", k = 8),
      k = 8)
    assert(rows(merged) == rows(direct), "per-group merge must equal direct cut")
    assert(merged.select("est_distinct").distinct().count() == 1)
    // population smaller than k: the sketch IS the population, est exact
    val tiny = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("g", "uid")
    val t = Analytics.bottomKRollup(
      Analytics.bottomKSketch(tiny, Seq("g"), "uid", k = 8), k = 8)
      .select("key", "est_distinct").as[(String, Double)].collect()
    assert(t.map(_._1).toSet == Set("x", "y") && t.forall(_._2 == 2.0), t.toSeq.toString)
  }

  test("mutualInformation: bijection reads NMI=1 with MI=H; independence reads MI=0") {
    // bijection: b is a relabeling of a → I(A;B) = H(A) = H(B), NMI = 1
    val bij = Seq("x", "x", "y", "z", "z", "z").map(a => (a, a.toUpperCase))
      .toDF("a", "b")
    val r1 = Profiling.mutualInformation(bij, "a", "b")
      .select("mi", "h_a", "h_b", "nmi")
      .as[(Double, Double, Double, Option[Double])].head()
    assert(r1._1 == r1._2 && r1._2 == r1._3, s"MI must equal H at a bijection: $r1")
    assert(r1._4.contains(1.0), s"NMI must be 1 at a bijection: $r1")
    // independent balanced grid: every (a, b) cell equally likely → MI = 0
    val ind = (for { a <- Seq("x", "y"); b <- Seq("p", "q", "r") } yield (a, b))
      .toDF("a", "b")
    val r2 = Profiling.mutualInformation(ind, "a", "b")
      .select("mi", "nmi", "a_levels", "b_levels")
      .as[(Double, Option[Double], Long, Long)].head()
    assert(r2._1 == 0.0 && r2._2.contains(0.0), s"independence must read MI=0: $r2")
    assert(r2._3 == 2 && r2._4 == 3)
    // constant column: zero entropy on one side → NMI undefined (null)
    val const = Seq(("x", "p"), ("x", "q")).toDF("a", "b")
    val r3 = Profiling.mutualInformation(const, "a", "b")
      .select("h_a", "nmi").as[(Double, Option[Double])].head()
    assert(r3._1 == 0.0 && r3._2.isEmpty, s"constant side must null NMI: $r3")
  }

  test("hillTailIndex: exact Pareto sample recovers its alpha; ties contribute zero") {
    import graft.operators.Analytics
    // exact Pareto(alpha=2) order stats: x_i = xk / sqrt(u_i) with
    // u ranks — use x_i = 100 * (n/i)^(1/2) for i = 1..n: Hill on the
    // full sample estimates alpha ≈ 2 (bias O(1/k))
    val n = 200
    val xs = (1 to n).map(i => 100.0 * math.sqrt(n.toDouble / i))
    val df = xs.map(x => Tuple1(x)).toDF("v")
    val got = Analytics.hillTailIndex(df, "v", k = n)
      .select("k_used", "alpha").as[(Long, Double)].head()
    assert(got._1 == n && math.abs(got._2 - 2.0) < 0.15,
      s"planted Pareto(2) must read alpha near 2: $got")
    // all-equal values: every log excess is 0 -> alpha undefined (null)
    val flat = Analytics.hillTailIndex(
        Seq.fill(10)(Tuple1(5.0)).toDF("v"), "v", k = 5)
      .select("alpha").as[Option[Double]].head()
    assert(flat.isEmpty, s"flat tail must null alpha: $flat")
  }

  test("rfmMigration: every customer lands in one transition cell; halves make absences") {
    import graft.operators.Analytics
    import java.sql.Timestamp
    // days 1..10 (midpoint split at day 5): cust 1 orders in both
    // halves, cust 2 only early (churn), cust 3 only late (acquired)
    val rows = Seq(
      (1L, "2024-01-01", 100.0), (1L, "2024-01-09", 200.0),
      (2L, "2024-01-02", 50.0),
      (3L, "2024-01-10", 75.0))
    val df = rows.map { case (c, d, p) =>
      (c, Timestamp.valueOf(s"$d 00:00:00"), p)
    }.toDF("o_custkey", "o_orderdate", "o_totalprice")
    val got = Analytics.rfmMigration(df)
      .select("seg_before", "seg_after", "n_customers")
      .as[(String, String, Long)].collect().toSeq
    assert(got.map(_._3).sum == 3L, s"3 customers, 3 cells: $got")
    assert(got.exists(r => r._1 != "absent" && r._2 == "absent"),
      s"churned customer must show: $got")
    assert(got.exists(r => r._1 == "absent" && r._2 != "absent"),
      s"acquired customer must show: $got")
    assert(got.exists(r => r._1 != "absent" && r._2 != "absent"),
      s"retained customer must show: $got")
  }

  test("abcAnalysis: boundary crosser stays A; classes partition the catalog") {
    import graft.operators.Analytics
    // revenues 50, 40, 9, 1 → cum shares .5, .9, .99, 1.0
    // A: keys starting below 80% (50, 40); B: below 95% (9); C: rest
    val rows = Seq((1L, 50.0), (2L, 40.0), (3L, 9.0), (4L, 1.0))
      .flatMap { case (k, r) => Seq((k, r, 0.0)) }
      .toDF("l_partkey", "l_extendedprice", "l_discount")
    val got = Analytics.abcAnalysis(rows, "l_partkey")
      .select("rnk", "key", "cum_share", "abc_class")
      .as[(Long, Long, Double, String)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 1L, 0.5, "A"), (2L, 2L, 0.9, "A"),
      (3L, 3L, 0.99, "B"), (4L, 4L, 1.0, "C")), s"$got")
  }

  test("trimmedMeans: one fat-finger row moves the mean, not the robust pair") {
    // 1..19 plus one 1000: t = floor(20*.05) = 1 from each side
    val vals = ((1 to 19).map(_.toDouble) :+ 1000.0).map(("a", _))
    val got = Profiling.trimmedMeans(vals.toDF("g", "v"), "g", "v")
      .select("n", "n_trimmed_each_side", "mean", "trimmed_mean",
        "winsorized_mean")
      .as[(Long, Long, Double, Double, Double)].head()
    // trimmed: mean(2..19) = 10.5; winsorized clamps 1→2 and 1000→19
    assert(got == ((20L, 1L, 59.5, 10.5, 10.5)), s"$got")
    // duplicates straddle the fence: 5×7 with t=... n=5, t=0 → all kept
    val dup = Seq.fill(5)(("b", 7.0))
    val g2 = Profiling.trimmedMeans(dup.toDF("g", "v"), "g", "v")
      .select("mean", "trimmed_mean", "winsorized_mean")
      .as[(Double, Double, Double)].head()
    assert(g2 == ((7.0, 7.0, 7.0)), s"$g2")
  }

  test("jarqueBera: symmetric light-tail sample passes, a planted heavy tail fails") {
    // near-uniform symmetric values: K ≈ -1.2, S ≈ 0 → JB small at n=20
    val tame = (1 to 20).map(i => ("a", (i % 10).toDouble))
    // same body plus two extreme spikes → huge kurtosis, JB explodes
    val spiky = tame.map { case (_, v) => ("b", v) } ++
      Seq(("b", 5000.0), ("b", -5000.0))
    val got = Profiling.jarqueBera((tame ++ spiky).toDF("g", "v"), "g", "v")
      .select("g", "jb", "normal_at_5pct")
      .as[(String, Double, Boolean)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got("a")._2 && got("a")._1 < 5.991, s"tame group must pass: $got")
    assert(!got("b")._2 && got("b")._1 > 5.991, s"spiked group must fail: $got")
  }

  test("ebShrunkRates: small-n keys pull toward the prior, big-n keys stay; flat spread disables") {
    import graft.operators.Analytics
    // 10 well-measured keys at rate .2 with some spread, plus a
    // lucky 1-of-1 and an unlucky 0-of-1
    val rows = (1 to 10).flatMap { k =>
      (1 to 100).map(i => (k.toLong, i <= 15 + k)) // rates .16 .. .25
    } ++ Seq((90L, true), (91L, false))
    val got = Analytics.ebShrunkRates(rows.toDF("key", "ok"), "key",
        col("ok"))
      .select("key", "raw_rate", "shrunk_rate")
      .as[(Long, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val (rawLucky, shrunkLucky) = got(90L)
    assert(rawLucky == 1.0 && shrunkLucky < 0.6 && shrunkLucky > 0.15,
      s"1-of-1 must shrink hard toward the pool: $got")
    val (_, shrunkUnlucky) = got(91L)
    assert(shrunkUnlucky > 0.05, s"0-of-1 must be pulled up off zero: $got")
    val (rawBig, shrunkBig) = got(5L)
    assert(math.abs(shrunkBig - rawBig) < 0.05,
      s"n=100 keys must barely move: $got")
    // zero spread: no signal in the rates → prior undefined, raw served
    val flat = Analytics.ebShrunkRates(
      (1 to 4).flatMap(k => Seq((k.toLong, true), (k.toLong, false)))
        .toDF("key", "ok"), "key", col("ok"))
      .select("raw_rate", "shrunk_rate", "alpha")
      .as[(Double, Double, Option[Double])].collect()
    assert(flat.forall(r => r._1 == r._2 && r._3.isEmpty),
      s"flat spread must disable shrinkage: ${flat.toSeq}")
  }

  test("hbosOutliers: the doubly-rare row ranks first; constant features contribute 0") {
    // 40 inliers hug the low corner; one row is alone in the top bin
    // of BOTH features, one is rare on a single feature only
    val rows = (1L to 40L).map(i => (i, 1.0 + (i % 3) * 0.1, 10.0)) ++
      Seq((97L, 99.0, 10.0), (99L, 99.0, 999.0))
    val df = rows.toDF("rid", "x", "y")
    val top = Profiling.hbosOutliers(df, "rid", Seq("x", "y"), bins = 4, topK = 3)
      .select("rnk", "id", "hbos").as[(Long, Long, Double)].collect()
    assert(top.head._2 == 99L, s"doubly-rare row must rank first: ${top.toSeq}")
    assert(top(1)._2 == 97L, s"singly-rare row second: ${top.toSeq}")
    assert(top.head._3 > top(1)._3 && top(1)._3 > top(2)._3)
    // a constant feature lands every row in one bin with p=1 → +0
    val withConst = Profiling.hbosOutliers(df.withColumn("z", lit(7.0)),
        "rid", Seq("x", "y", "z"), bins = 4, topK = 3)
      .select("rnk", "id", "hbos").as[(Long, Long, Double)].collect()
    assert(withConst.toSeq == top.toSeq,
      s"constant feature must not move any score: ${withConst.toSeq} vs ${top.toSeq}")
  }

  test("rocAuc: perfect separation scores 1, all-ties score 0.5, hand case exact") {
    import spark.implicits._
    // perfect: every positive outscores every negative
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      .toDF("score", "y")
    val p = Profiling.rocAuc(perfect, "score", "y")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(p == ((2L, 2L, 1.0, 1.0, 0.025)), s"perfect: $p")
    // Brier check: q in {900, 800, 200, 100}; errors (1000-q) for pos,
    // q for neg: (100²+200²+200²+100²)/(4·10⁶) = 100000/4e6 = 0.025 ✓
    // all scores tie → AUC exactly 0.5 (the ½·P(=) term)
    val ties = Seq((0.5, true), (0.5, true), (0.5, false)).toDF("score", "y")
    val t = Profiling.rocAuc(ties, "score", "y")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(t._3 == 0.5 && t._4 == 0.0, s"ties: $t")
    // hand case: pos scores {0.9, 0.4}, neg {0.6, 0.1}; concordant
    // pairs: (0.9>0.6), (0.9>0.1), (0.4>0.1) = 3 of 4 → AUC 0.75
    val hand = Seq((0.9, true), (0.4, true), (0.6, false), (0.1, false))
      .toDF("score", "y")
    val h = Profiling.rocAuc(hand, "score", "y")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(h._3 == 0.75 && h._4 == 0.5, s"hand: $h")
  }

  test("rocAuc: degenerate single-class input — nulls by default, raises under onDegenerate=fail") {
    import spark.implicits._
    val onePos = Seq((0.9, true), (0.4, true)).toDF("score", "y")
    // default posture: class counts exact, auc/gini explicit nulls
    val r = Profiling.rocAuc(onePos, "score", "y").collect().head
    assert(r.getLong(0) == 2L && r.getLong(1) == 0L, s"counts: $r")
    assert(r.isNullAt(2) && r.isNullAt(3), s"auc/gini must be null: $r")
    // fail posture: the degenerate eval raises with both counts
    val ex = intercept[Exception] {
      Profiling.rocAuc(onePos, "score", "y", onDegenerate = "fail").collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("n_neg=0"), s"unexpected failure: $msgs")
    // a healthy input under fail mode is untouched
    val ok = Profiling.rocAuc(
      Seq((0.9, true), (0.1, false)).toDF("score", "y"),
      "score", "y", onDegenerate = "fail")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(ok._3 == 1.0, s"healthy fail-mode: $ok")
    intercept[IllegalArgumentException] {
      Profiling.rocAuc(onePos, "score", "y", onDegenerate = "bogus")
    }
  }

  test("rocCurve: monotone cumulative rates ending at (1, 1)") {
    import spark.implicits._
    val df = Seq((0.9, true), (0.7, false), (0.7, true), (0.3, false),
      (0.1, true)).toDF("score", "y")
    val got = Profiling.rocCurve(df, "score", "y")
      .orderBy(org.apache.spark.sql.functions.desc("threshold"))
      .as[(Double, Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(0.9, 0.7, 0.3, 0.1), s"thresholds: $got")
    // cum counts monotone, final point is (tpr, fpr) = (1, 1)
    assert(got.map(_._2) == Seq(1L, 2L, 2L, 3L) &&
      got.map(_._3) == Seq(0L, 1L, 2L, 2L), s"cums: $got")
    assert(got.last._4 == 1.0 && got.last._5 == 1.0, s"terminal: ${got.last}")
  }

  test("avgPrecision: perfect run scores 1, hand case matches the step sum") {
    import spark.implicits._
    val perfect = Seq((0.9, true), (0.8, true), (0.2, false)).toDF("score", "y")
    val p = Profiling.avgPrecision(perfect, "score", "y")
      .as[(Long, Long, Double)].head()
    assert(p == ((2L, 1L, 1.0)), s"perfect AP: $p")
    // ranking pos, neg, pos: terms (1/2)*(1/1) + (1/2)*(2/3) = 0.833333
    val hand = Seq((0.9, true), (0.6, false), (0.3, true)).toDF("score", "y")
    val h = Profiling.avgPrecision(hand, "score", "y")
      .as[(Long, Long, Double)].head()
    assert(h == ((2L, 1L, 0.833333)), s"hand AP: $h")
  }

  test("woeIv: hand-computed WoE/IV; a zero-sided category is excluded") {
    import spark.implicits._
    // cat A: 3 pos / 1 neg; cat B: 1 pos / 3 neg; cat C: 2 pos / 0 neg
    // (excluded). P = N = 4 over surviving cats.
    val df = (Seq.fill(3)(("A", true)) ++ Seq(("A", false)) ++
      Seq(("B", true)) ++ Seq.fill(3)(("B", false)) ++
      Seq.fill(2)(("C", true))).toDF("cat", "y")
    val got = Profiling.woeIv(df, "cat", "y").orderBy("category")
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    val woeA = BigDecimal(math.log(3.0)).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    val ivA = BigDecimal(BigDecimal((3.0 / 4 - 1.0 / 4) * math.log(3.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val ivTot = BigDecimal(2 * ivA).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1) == Seq("A", "B"), s"C must be excluded: $got")
    assert(got.head == (("A", 3L, 1L, woeA, ivA, ivTot)), s"A: ${got.head}")
    // B mirrors A: woe = -ln 3, same IV term
    assert(got(1) == (("B", 1L, 3L, -woeA, ivA, ivTot)), s"B: ${got(1)}")
  }

  test("regressionEval: perfect predictions score MAE 0 / R2 1; hand case exact") {
    import spark.implicits._
    val perfect = Seq((1.5, 1.5), (2.0, 2.0), (4.5, 4.5)).toDF("p", "a")
    val gp = Profiling.regressionEval(perfect, "p", "a")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(gp == ((3L, 0.0, 0.0, 0.0, 1.0)), s"perfect: $gp")
    // preds 1 unit high and low: MAE 1, bias 0, RMSE 1;
    // actuals {1, 3}: SST = 2, SSE = 2 -> R2 = 0
    val hand = Seq((2.0, 1.0), (2.0, 3.0)).toDF("p", "a")
    val gh = Profiling.regressionEval(hand, "p", "a")
      .as[(Long, Double, Double, Double, Double)].head()
    assert(gh == ((2L, 1.0, 0.0, 1.0, 0.0)), s"hand: $gh")
  }

  test("classReport: hand-computed P/R/F1; never-predicted class reports precision 0") {
    import spark.implicits._
    // actual 0: predicted {0, 0, 1}; actual 1: predicted {1};
    // actual 2: predicted {1} — class 2 never predicted
    val df = Seq((0L, 0L), (0L, 0L), (0L, 1L), (1L, 1L), (2L, 1L))
      .toDF("actual", "predicted")
    val got = Profiling.classReport(df, "actual", "predicted")
      .orderBy("class")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    // class 0: tp 2, fp 0, fn 1 -> P 1, R 2/3, F1 4/5
    // class 1: tp 1, fp 2, fn 0 -> P 1/3, R 1, F1 1/2
    // class 2: tp 0, predicted never -> P 0 (convention), R 0, F1 0
    assert(got == Seq(
      (0L, 3L, 2L, 2L, 1.0, 0.666667, 0.8),
      (1L, 1L, 1L, 3L, 0.333333, 1.0, 0.5),
      (2L, 1L, 0L, 0L, 0.0, 0.0, 0.0)), s"report: $got")
  }

  test("liftChart: ties never split across tiles; capture sums to 1") {
    import spark.implicits._
    // 10 rows, two score levels (ties): 5 at 0.9 (4 pos), 5 at 0.1
    // (1 pos) — each level is one bin, midpoint-rank tiles keep each
    // level together (level 1 -> tile floor(10*5/20)=2, level 2 ->
    // floor(10*15/20)=7)
    val df = (Seq.fill(4)((0.9, true)) ++ Seq((0.9, false)) ++
      Seq((0.1, true)) ++ Seq.fill(4)((0.1, false))).toDF("score", "y")
    val got = Profiling.liftChart(df, "score", "y")
      .orderBy("tile")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (2L, 5L, 4L, 0.8, 1.6, 0.8),
      (7L, 5L, 1L, 0.2, 0.4, 1.0)), s"lift: $got")
  }

  test("calibrationReport: bands split on exact edges, gap = pos_rate - mean_pred") {
    import spark.implicits._
    // q = 100, 100, 500, 900 → buckets 1, 1, 5, 9
    val df = Seq((0.1, true), (0.1, false), (0.5, true), (0.9, false))
      .toDF("score", "y")
    val got = Profiling.calibrationReport(df, "score", "y")
      .orderBy("bucket")
      .as[(Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 1L, 0.1, 0.5, 0.4),
      (5L, 1L, 1L, 0.5, 1.0, 0.5),
      (9L, 1L, 0L, 0.9, 0.0, -0.9)), s"calibration: $got")
  }
}
