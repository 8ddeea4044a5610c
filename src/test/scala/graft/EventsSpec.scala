package graft

import java.sql.Timestamp
import graft.operators.Events

class EventsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(m * 60000L)

  test("funnel: strict in-order first-completion semantics per user") {
    // u1: full funnel in order → 3
    // u2: purchase BEFORE click → stuck at 2 (click counts, purchase doesn't recur)
    // u3: view only → 1
    // u4: click/purchase but never view → absent (funnel starts at step 1)
    val e = Seq(
      (1L, "view", ts(0)), (1L, "click", ts(10)), (1L, "purchase", ts(20)),
      (2L, "view", ts(0)), (2L, "purchase", ts(5)), (2L, "click", ts(10)),
      (3L, "view", ts(0)),
      (4L, "click", ts(0)), (4L, "purchase", ts(5))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.funnel(e, Seq("view", "click", "purchase"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 3L), (2L, 2L), (3L, 1L)))
  }

  test("funnel: 6-step depth guard checkpoints rounds without changing results") {
    // steps.size > 4 flips funnel() into per-round localCheckpoint
    // mode (the r14 depth guard against the 2^(steps−1) lazy-plan
    // doubling). Results must match the hand-computed strict
    // first-completion semantics exactly.
    val s6 = Seq("a", "b", "c", "d", "e", "f")
    val e = Seq(
      // u1 completes all 6 in order
      (1L, "a", ts(0)), (1L, "b", ts(1)), (1L, "c", ts(2)),
      (1L, "d", ts(3)), (1L, "e", ts(4)), (1L, "f", ts(5)),
      // u2 stalls after d (e never arrives; f out of order is ignored)
      (2L, "a", ts(0)), (2L, "b", ts(1)), (2L, "f", ts(2)),
      (2L, "c", ts(3)), (2L, "d", ts(4)),
      // u3 only the first step
      (3L, "a", ts(9))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.funnel(e, s6)
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 6L), (2L, 4L), (3L, 1L)))
  }

  test("funnel: same-timestamp step does not count (strictly after)") {
    val e = Seq(
      (1L, "view", ts(5)), (1L, "click", ts(5)), // simultaneous → click rejected
      (2L, "view", ts(5)), (2L, "click", ts(6))
    ).toDF("user_id", "event_type", "ts")
    val got = Events.funnel(e, Seq("view", "click"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L), (2L, 2L)))
  }

  test("retention: cohort by first-seen date, day-offset counts") {
    val day = 86400000L
    val e = Seq(
      (1L, new Timestamp(0L)), (1L, new Timestamp(day)),        // d0 cohort, back d1
      (2L, new Timestamp(0L)),                                  // d0 cohort only
      (3L, new Timestamp(day)), (3L, new Timestamp(3 * day))    // d1 cohort, back d2
    ).toDF("user_id", "ts")
    val got = Events.retention(e, maxDays = 30)
      .orderBy("cohort_date", "day_offset")
      .select("day_offset", "n_users").as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L, 2L), (1L, 1L), (0L, 1L), (2L, 1L)))
  }

  test("transitionMatrix: row-stochastic per from_type, cross-user pairs never counted") {
    val e = Seq(
      (1L, "u1", "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "u1", "click", Timestamp.valueOf("2024-01-01 00:00:01")),
      (3L, "u1", "view", Timestamp.valueOf("2024-01-01 00:00:02")),
      (4L, "u2", "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (5L, "u2", "buy", Timestamp.valueOf("2024-01-01 00:00:01"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.transitionMatrix(e)
      .orderBy("from_type", "to_type")
      .select("from_type", "to_type", "n_trans", "prob")
      .as[(String, String, Long, Double)].collect().toSeq
    // u1: view->click, click->view; u2: view->buy. No u1-last -> u2-first pair.
    assert(got == Seq(
      ("click", "view", 1L, 1.0),
      ("view", "buy", 1L, 0.5),
      ("view", "click", 1L, 0.5)))
  }

  test("funnelDurations: exact step gaps for completers, stalled and out-of-order users drop") {
    val e = Seq(
      // u1 completes in order: 10 s then 30 s
      (1L, "u1", "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "u1", "click", Timestamp.valueOf("2024-01-01 00:00:10")),
      (3L, "u1", "purchase", Timestamp.valueOf("2024-01-01 00:00:40")),
      // u2 stalls after click
      (4L, "u2", "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (5L, "u2", "click", Timestamp.valueOf("2024-01-01 00:00:05")),
      // u3's purchase precedes its click — not a completion
      (6L, "u3", "view", Timestamp.valueOf("2024-01-01 00:00:00")),
      (7L, "u3", "purchase", Timestamp.valueOf("2024-01-01 00:00:01")),
      (8L, "u3", "click", Timestamp.valueOf("2024-01-01 00:00:02"))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.funnelDurations(e, Seq("view", "click", "purchase"))
      .select("user_id", "ms_view_click", "ms_click_purchase", "ms_total")
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("u1", 10000L, 30000L, 40000L)))
  }

  test("interArrival: exact ms gaps, single-event users dropped, tie-break on event_id") {
    val e = Seq(
      (1L, "u1", Timestamp.valueOf("2024-01-01 00:00:00")),
      (2L, "u1", Timestamp.valueOf("2024-01-01 00:00:10")),
      (3L, "u1", Timestamp.valueOf("2024-01-01 00:00:40")),
      (5L, "u2", Timestamp.valueOf("2024-01-01 00:00:00")), // same ts: event_id
      (4L, "u2", Timestamp.valueOf("2024-01-01 00:00:00")), // order 4 -> 5
      (6L, "u3", Timestamp.valueOf("2024-01-01 00:00:00"))  // lone event: no gap
    ).toDF("event_id", "user_id", "ts")
    val got = Events.interArrival(e)
      .orderBy("user_id")
      .select("user_id", "n_gaps", "mean_gap_ms", "min_gap_ms", "max_gap_ms")
      .as[(String, Long, Double, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("u1", 2L, 20000.0, 10000L, 30000L),
      ("u2", 1L, 0.0, 0L, 0L)))
  }

  test("appendDatePartitioned: untouched days byte-identical; a re-run day replaces wholesale") {
    def ev(rows: (Long, String)*) = rows.map { case (id, d) =>
      (id, Timestamp.valueOf(s"$d 12:00:00"), "view")
    }.toDF("event_id", "ts", "event_type")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_lake_upsert_${System.nanoTime()}"
    Events.writeDatePartitioned(
      ev(1L -> "2024-01-01", 2L -> "2024-01-02", 3L -> "2024-01-02"), path)
    def dayFiles(d: String) = new java.io.File(s"$path/event_date=$d")
      .listFiles().filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified())).toSet
    val day1Before = dayFiles("2024-01-01")
    // delta: new day 3 + a REPROCESS of day 2 (one event instead of two)
    Events.appendDatePartitioned(
      ev(9L -> "2024-01-02", 4L -> "2024-01-03"), path)
    assert(dayFiles("2024-01-01") == day1Before,
      "a day the delta never carries must not be rewritten")
    val got = spark.read.parquet(path)
      .selectExpr("event_id", "cast(event_date as string)")
      .as[(Long, String)].collect().toSet
    assert(got == Set((1L, "2024-01-01"), (9L, "2024-01-02"), (4L, "2024-01-03")),
      s"reprocessed day must be replaced wholesale, got $got")
  }

  test("peakConcurrency: overlap counting, closed intervals, midnight-spanning sessions") {
    import java.sql.Timestamp
    def t(d: Long, m: Long) = new Timestamp(d * 86400000L + m * 60000L)
    val e = Seq(
      // day 0: u1 session 600-610, u2 session 605-605 → overlap of 2
      (1L, 1L, t(0, 600)), (2L, 1L, t(0, 610)), (3L, 2L, t(0, 605)),
      // u3 lone session at 720
      (4L, 3L, t(0, 720)),
      // u4 spans midnight: 23:50 day0 → 00:05 day1 (15 min gap, one session)
      (5L, 4L, t(0, 1430)), (6L, 4L, t(1, 5))
    ).toDF("event_id", "user_id", "ts")
      .withColumn("event_type", org.apache.spark.sql.functions.lit("view"))
    val got = Events.peakConcurrency(e, gapMinutes = 30)
      .orderBy("day")
      .selectExpr("cast(day as string)", "peak_concurrency", "n_active_sessions")
      .as[(String, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("1970-01-01", 2L, 4L),   // u1+u2 overlap; 4 sessions touch day 0
      ("1970-01-02", 1L, 1L)),  // u4's clamped tail segment
      s"got $got")
  }

  test("kaplanMeier: hand-computed curve with conversion, censoring, and the terminal-day zero") {
    import java.sql.Timestamp
    def t(d: Long) = new Timestamp(d * 86400000L)
    // 4 users, all entering at day 0 (first event):
    //  u1 converts day 1, u2 converts day 2, u3 never (censored at
    //  tmax = day 3), u4 converts day 3.
    // Day 1: n=4, d=1 → S=3/4. Day 2: n=3, d=1 → S=3/4·2/3=1/2.
    // Day 3: n=2, d=1, c=1 → 1−d/n=1/2 → S=1/4.
    val e = Seq(
      (1L, 1L, "view", t(0)), (2L, 1L, "purchase", t(1)),
      (3L, 2L, "view", t(0)), (4L, 2L, "purchase", t(2)),
      (5L, 3L, "view", t(0)),
      (6L, 4L, "view", t(0)), (7L, 4L, "purchase", t(3))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val got = Events.kaplanMeier(e, "purchase")
      .orderBy("day")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 4L, 1L, 0L, 0.75),
      (2L, 3L, 1L, 0L, 0.5),
      (3L, 2L, 1L, 1L, 0.25)), s"got $got")
    // terminal-day full conversion → survival exactly 0, not NULL
    val all = Seq(
      (1L, 1L, "view", t(0)), (2L, 1L, "purchase", t(1)),
      (3L, 2L, "view", t(0)), (4L, 2L, "purchase", t(1))
    ).toDF("event_id", "user_id", "event_type", "ts")
    val z = Events.kaplanMeier(all, "purchase")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(z == Seq((1L, 2L, 2L, 0L, 0.0)), s"got $z")
  }

  test("slidingDistinctSketch: windows merge hourly sketches; overlapping users counted once") {
    import java.sql.Timestamp
    def t(h: Long) = new Timestamp(h * 3600000L)
    // u1 appears in hours 0 AND 2 — any window spanning both must
    // count them once; sparse-mode HLL is exact at these sizes
    val e = Seq(
      (1L, 1L, t(0)), (2L, 2L, t(0)), (3L, 1L, t(2)), (4L, 3L, t(2))
    ).toDF("event_id", "user_id", "ts")
    val got = Events.slidingDistinctSketch(e, windowHours = 3)
      .as[(Long, Long)].collect().toMap
    // window w covers hours [w, w+2]; hours present: 0, 2
    assert(got == Map(
      -2L -> 2L,          // hours {0}
      -1L -> 2L,          // hours {0}
      0L -> 3L,           // hours {0, 2}: users {1, 2, 3}, u1 once
      1L -> 2L,           // hours {2}
      2L -> 2L), s"got $got")
  }

  test("abTest: Welch z on purchase values from a hand-built split") {
    import java.sql.Timestamp
    def t(h: Long) = new Timestamp(h * 3600000L)
    // variant = user_id % 2: A (even users) values {30, 50}, B (odd) {10, 20, 40};
    // non-purchase rows must not contribute
    val e = Seq(
      (1L, 2L, "purchase", 30.0), (2L, 2L, "purchase", 50.0),
      (3L, 1L, "purchase", 10.0), (4L, 1L, "purchase", 20.0),
      (5L, 3L, "purchase", 40.0), (6L, 2L, "view", 999.0)
    ).map { case (id, u, tp, v) => (id, u, tp, t(id), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.abTest(e, "purchase")
      .as[(Long, Long, Double, Double, Double, Boolean)].collect().toSeq
    // replicate the fixed IEEE expression on the exact scaled sums
    val (s1a, s2a, na) = (8000.0, 34000000.0, 2L)   // 3000+5000; 3000²+5000²
    val (s1b, s2b, nb) = (7000.0, 21000000.0, 3L)   // 1000+2000+4000
    val meanA = s1a / (na * 100.0); val meanB = s1b / (nb * 100.0)
    val vA = (s2a / 10000.0 - (s1a / 100.0) * (s1a / 100.0) / na) / (na - 1)
    val vB = (s2b / 10000.0 - (s1b / 100.0) * (s1b / 100.0) / nb) / (nb - 1)
    val z = (meanA - meanB) / math.sqrt(vA / na + vB / nb)
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((2L, 3L, r6(meanA), r6(meanB), r6(z), math.abs(z) > 1.96)),
      s"got $got (expected z=$z)")
  }

  test("ratioMetric: hand-computed delta-method SE and CI") {
    import java.sql.Timestamp
    def t(h: Long) = new Timestamp(h * 3600000L)
    // u1: 2 views + $3 purchase (x=300c, y=2); u2: 1 view (x=0, y=1)
    // → R = 300/3 = 100 c/view; varx=45000, vary=0.5, cov=150
    // → se = sqrt((45000+10000·0.5−2·100·150)/2)/1.5 = 66.6667 c
    val e = Seq(
      (1L, 1L, "view", 0.0), (2L, 1L, "view", 0.0), (3L, 1L, "purchase", 3.0),
      (4L, 2L, "view", 0.0), (5L, 2L, "error", 9.0))
      .map { case (id, u, tp, v) => (id, u, tp, t(id), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.ratioMetric(e)
      .as[(Long, Option[Double], Option[Double], Option[Double], Option[Double])]
      .head()
    assert(got == ((2L, Some(1.0), Some(0.666667), Some(-0.306667),
      Some(2.306667))), s"got $got")
  }

  test("srmCheck: distinct users per arm, chi-square flag at the 3.841 cut") {
    import java.sql.Timestamp
    def t(h: Long) = new Timestamp(h * 3600000L)
    // users {1,2,3}: arm0={2}, arm1={1,3} → chi2 = 2·(0.5²/1.5) = 1/3
    val bal = (1L to 3L).flatMap(u => Seq((u * 10, u), (u * 10 + 1, u)))
      .map { case (id, u) => (id, u, "view", t(id), 0.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val g1 = Events.srmCheck(bal).as[(Long, Long, Double, Boolean)].head()
    assert(g1 == ((1L, 2L, 0.333333, false)), s"got $g1")
    // 20 vs 2 users: chi2 = 2·(9²/11) ≈ 14.7 → SRM
    val skew = ((1L to 20L).map(_ * 2) ++ Seq(1L, 3L)).zipWithIndex
      .map { case (u, i) => (i.toLong, u, "view", t(i.toLong), 0.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val g2 = Events.srmCheck(skew).as[(Long, Long, Double, Boolean)].head()
    assert(g2._1 == 20L && g2._2 == 2L && g2._4, s"got $g2")
  }

  test("conformalForecast: hand-checked interval; too-small calibration refuses to certify") {
    import java.sql.Timestamp
    def day(dd: Int) = new Timestamp(dd * 86400000L)
    // even days (train) exactly linear: cents 100+50x; odd days
    // (calibration) off by ±10 cents → every |resid| = 0.1
    val cents = Map(0 -> 100, 1 -> 160, 2 -> 200, 3 -> 240, 4 -> 300, 5 -> 340)
    val e = cents.toSeq.map { case (dd, c) =>
      (dd.toLong, 1L, "purchase", day(dd), c / 100.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    // α=0.5: k = ceil((3+1)·0.5) = 2 → q̂ = 0.1; ŷ(6) = 4.0
    val got = Events.conformalForecast(e, alpha = 0.5)
      .as[(String, Long, Option[Long], Option[Double], Option[Double],
           Option[Double], Option[Double])].head()
    assert(got == (("purchase", 3L, Some(3L), Some(4.0), Some(0.1),
      Some(3.9), Some(4.1))), s"got $got")
    // α=0.1 needs the 4th of 3 calibration residuals → null interval
    val strict = Events.conformalForecast(e, alpha = 0.1)
      .as[(String, Long, Option[Long], Option[Double], Option[Double],
           Option[Double], Option[Double])].head()
    assert(strict._4 == Some(4.0) && strict._5.isEmpty && strict._6.isEmpty,
      s"got $strict")
  }

  test("forecastBacktest: strictly-earlier training, hand-checked predictions, degenerate origins null") {
    import java.sql.Timestamp
    def day(dd: Int) = new Timestamp(dd * 86400000L)
    // one event per day, daily cents 100,200,300,500 at x=0..3
    val e = Seq((1L, 0, 1.0), (2L, 1, 2.0), (3L, 2, 3.0), (4L, 3, 5.0))
      .map { case (id, dd, v) => (id, 1L, "purchase", day(dd), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.forecastBacktest(e, lastDays = 7)
      .orderBy("day")
      .select("n_train", "actual", "predicted", "error")
      .as[(Long, Double, Option[Double], Option[Double])].collect().toSeq
    assert(got == Seq(
      (0L, 1.0, None, None),              // no training days
      (1L, 2.0, None, None),              // single point: dx = 0
      (2L, 3.0, Some(3.0), Some(0.0)),    // fit on (0,1),(1,2) → ŷ(2)=3
      (3L, 5.0, Some(4.0), Some(-1.0))),  // fit on first three → ŷ(3)=4
      s"got $got")
  }

  test("permutationTest: null-effect data yields a non-significant p; identical values give p=1") {
    import java.sql.Timestamp
    def t(h: Long) = new Timestamp(h * 3600000L)
    // all users share the same value → every NON-degenerate
    // relabeling's mean diff is 0 = |obs| (a replicate that drew all
    // users into one arm has no statistic and counts as not-extreme)
    val flat = (1L to 8L).map(u => (u, u, "purchase", t(u), 25.0))
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val g1 = Events.permutationTest(flat, "purchase", reps = 50)
      .as[(Long, Double, Long, Long, Double)].head()
    assert(g1._1 == 8L && g1._2 == 0.0 && g1._3 == 50L, s"got $g1")
    assert(g1._4 >= 45L && g1._5 > 0.9, s"flat data must look null: $g1")
    // user-grain relabeling: a user's rows move together — a user
    // with two rows contributes both to whichever arm it draws, so
    // per-replicate masses stay multiples of whole-user bundles
    val multi = Seq((1L, 1L, 10.0), (2L, 1L, 10.0), (3L, 2L, 50.0), (4L, 3L, 30.0))
      .map { case (id, u, v) => (id, u, "purchase", t(id), v) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val g2 = Events.permutationTest(multi, "purchase", reps = 50)
      .as[(Long, Double, Long, Long, Double)].head()
    assert(g2._1 == 3L && g2._3 == 50L, s"got $g2")
    assert(g2._5 > 0.0 && g2._5 <= 1.0, s"p out of range: $g2")
  }

  test("lastTouchAttribution: latest in-window touch wins; stale and missing touches go direct") {
    import java.sql.Timestamp
    def t(h: Long) = new Timestamp(h * 3600000L)
    val e = Seq(
      // u1: view@0, click@1, purchase@2 → click (latest touch wins)
      (1L, 1L, "view", t(0), 10.0), (2L, 1L, "click", t(1), 0.0),
      (3L, 1L, "purchase", t(2), 100.0),
      // u2: view@0, purchase@30 → touch outside the 24 h window → direct
      (4L, 2L, "view", t(0), 0.0), (5L, 2L, "purchase", t(30), 50.0),
      // u3: purchase with no touch at all → direct
      (6L, 3L, "purchase", t(5), 25.0),
      // u4: touch AFTER the purchase must not attribute
      (7L, 4L, "purchase", t(1), 40.0), (8L, 4L, "click", t(2), 0.0)
    ).toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.lastTouchAttribution(e, Seq("view", "click"), "purchase",
        lookbackMs = 24L * 3600 * 1000)
      .as[(String, Long, Double)].collect()
      .map { case (c, n, r) => c -> ((n, r)) }.toMap
    assert(got == Map(
      "click" -> ((1L, 100.0)),
      "direct" -> ((3L, 115.0))), s"got $got")
  }

  test("shapleyAttribution: hand-solved 2-channel lattice, efficiency axiom holds") {
    // u1 {A} converts, u2 {A,B} converts, u3 {B} doesn't, u4 {} converts
    // v: v(∅)=1, v({A})=2, v({B})=1, v({A,B})=3
    // φ_A = (1·(2−1) + 1·(3−1))/2 = 1.5 ; φ_B = (0 + 1·(3−2))/2 = 0.5
    val e = Seq(
      (1L, "A"), (1L, "buy"),
      (2L, "A"), (2L, "B"), (2L, "buy"),
      (3L, "B"),
      (4L, "buy")).toDF("user_id", "event_type")
    val got = Events.shapleyAttribution(e, Seq("A", "B"), "buy")
      .select("channel", "phi", "v_all", "v_none", "share")
      .as[(String, Double, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 1.5, 3L, 1L, 0.75)), got("A").toString)
    assert(got("B") == (("B", 0.5, 3L, 1L, 0.25)), got("B").toString)
    // efficiency: Σφ = v(all) − v(∅)
    assert(got.values.map(_._2).sum == 2.0)
  }

  test("resampleLocf: carry-forward across grid, on-grid events carried, leading nulls honest") {
    import org.apache.spark.sql.functions._
    // corpus spans 0..130 min → hourly grid at 0, 60, 120.
    // user 1: value 5.0 at t=0 (ON the grid) then 7.0 at 70 min
    // user 2: first event at 90 min → grid 0 and 60 must stay null
    val df = Seq(
      (1L, ts(0), 1L, "a", 5.0, "{}"),
      (2L, ts(70), 1L, "a", 7.0, "{}"),
      (3L, ts(90), 2L, "a", 9.0, "{}"),
      (4L, ts(130), 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.resampleLocf(df, stepMinutes = 60)
      .as[(Long, java.sql.Timestamp, Option[Double])].collect().toSeq
      .map { case (u, g, v) => (u, g.getTime / 60000, v) }.sorted
    assert(got == Seq(
      (1L, 0L, Some(5.0)), (1L, 60L, Some(5.0)), (1L, 120L, Some(7.0)),
      (2L, 0L, None), (2L, 60L, None), (2L, 120L, Some(9.0))), s"got $got")
  }

  test("sessionFeatures: per-event ids/offsets consistent with sessionize boundaries") {
    import org.apache.spark.sql.functions._
    // user 1: events at 0, 10, 50 min → sessions {0,10} and {50}
    val df = Seq(
      (1L, ts(0), 1L, "a", 1.0, "{}"),
      (2L, ts(10), 1L, "a", 1.0, "{}"),
      (3L, ts(50), 1L, "a", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.sessionFeatures(df, gapMinutes = 30)
      .select("event_id", "session_id", "idx_in_session", "ms_since_start", "ms_since_prev")
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 1L, 1L, 0L, None),
      (2L, 1L, 2L, 600000L, Some(600000L)),
      (3L, 2L, 1L, 0L, None)), s"got $got")
  }

  test("botUsers: metronomic user flags, bursty human does not, short history excluded") {
    import org.apache.spark.sql.functions._
    val m = 60000L
    // user 1: 30 events exactly 1 min apart (CV = 0 → bot)
    val bot = (0 until 30).map(i => (100L + i, new Timestamp(i * m), 1L, "click", 1.0, "{}"))
    // user 2: 30 events with alternating 1 min / 29 min gaps (CV ≈ 0.93)
    val human = {
      var t = 0L
      (0 until 30).map { i =>
        val r = (200L + i, new Timestamp(t), 2L, "click", 1.0, "{}")
        t += (if (i % 2 == 0) 1 * m else 29 * m); r
      }
    }
    // user 3: only 5 events — below minEvents, excluded entirely
    val short = (0 until 5).map(i => (300L + i, new Timestamp(i * m), 3L, "click", 1.0, "{}"))
    val df = (bot ++ human ++ short)
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.botUsers(df, minEvents = 20, maxCv = 0.5)
      .select("user_id", "n_events", "cv", "is_bot")
      .as[(Long, Long, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._4)) == Seq((1L, 30L, true), (2L, 30L, false)),
      s"got $got")
    assert(got(0)._3 == 0.0, "constant gaps must give CV exactly 0")
    assert(got(1)._3 > 0.8, s"alternating gaps must give high CV, got ${got(1)._3}")
  }

  test("ewmaDaily: closed form equals the recursion s_t = a*x_t + (1-a)*s_{t-1}") {
    import org.apache.spark.sql.functions._
    val day = 86400000L
    val rows = Seq( // one event per day: x = 10, 20, 30 on days 0, 1, 2
      (1L, new Timestamp(0L), 1L, "a", 10.0, "{}"),
      (2L, new Timestamp(day), 1L, "a", 20.0, "{}"),
      (3L, new Timestamp(2 * day), 1L, "a", 30.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.ewmaDaily(rows, alpha = 0.3)
      .select("day", "value", "ewma")
      .as[(java.sql.Date, Double, Double)].collect().toSeq.sortBy(_._1.getTime)
    // s0 = 10; s1 = .3·20 + .7·10 = 13; s2 = .3·30 + .7·13 = 18.1
    assert(got.map(_._2) == Seq(10.0, 20.0, 30.0))
    assert(got.map(_._3) == Seq(10.0, 13.0, 18.1), s"got $got")
  }

  test("cusumChangepoints: level shift peaks |S| at the last pre-shift day") {
    def dts(d: Int) = new Timestamp(d * 86400000L)
    // daily series 1,1,5,5 — mean 3; S (in value units) = -2,-4,-2,0:
    // |S| maxes on day 2, the boundary of the shift
    val e = Seq(
      ("a", dts(0), 1.0), ("a", dts(1), 1.0),
      ("a", dts(2), 5.0), ("a", dts(3), 5.0)
    ).toDF("event_type", "ts", "value")
    val byDay = Events.cusumChangepoints(e).orderBy("day")
      .select("cusum", "is_changepoint").as[(Double, Boolean)].collect().toSeq
    assert(byDay == Seq((-2.0, false), (-4.0, true), (-2.0, false), (0.0, false)),
      s"got $byDay")
  }

  test("dowSeasonality: weekday index is the exact ratio of day means") {
    // 2024-01-01 and 01-08 are Mondays (totals 1.0, 2.0), 01-02 Tuesday (3.0)
    def d(s: String) = Timestamp.valueOf(s + " 12:00:00")
    val e = Seq(
      ("a", d("2024-01-01"), 1.0), ("a", d("2024-01-08"), 2.0),
      ("a", d("2024-01-02"), 3.0)
    ).toDF("event_type", "ts", "value")
    val got = Events.dowSeasonality(e)
      .select("dow_iso", "n_days", "mean_value", "seasonal_index")
      .as[(Long, Long, Double, Double)].collect().toSeq.sortBy(_._1)
    // overall mean 2.0: Monday mean 1.5 → 0.75; Tuesday mean 3.0 → 1.5
    assert(got == Seq((1L, 2L, 1.5, 0.75), (2L, 1L, 3.0, 1.5)), s"got $got")
  }

  test("diffInDiff: hand-computed 4-cell effect nets out the shared trend") {
    def dts(d: Int) = new Timestamp(d * 86400000L)
    // range days 0..10, post = day > 5. control (odd uid): 10,10 → 12,14
    // (Δ = +3); treated (even uid): 20,22 → 30,32 (Δ = +10); DiD = +7
    val rows = Seq(
      (1L, 0, 10.0), (1L, 1, 10.0), (1L, 9, 12.0), (1L, 10, 14.0),
      (2L, 0, 20.0), (2L, 1, 22.0), (2L, 9, 30.0), (2L, 10, 32.0))
    val e = rows.map { case (u, d0, v) => (u, "purchase", dts(d0), v) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.diffInDiff(e)
      .select("mean_c_pre", "mean_c_post", "mean_t_pre", "mean_t_post",
              "did_estimate", "t_stat")
      .as[(Double, Double, Double, Double, Double, Double)].collect().head
    assert(got._1 == 10.0 && got._2 == 13.0 && got._3 == 21.0 && got._4 == 31.0,
      s"cell means off: $got")
    assert(got._5 == 7.0, s"did must be +7, got ${got._5}")
    assert(got._6 > 0, "t-stat must be positive for a positive effect")
  }

  test("cupedEffect: hand-computed integer moments; adjustment removes pre-period variance") {
    def dts(d: Int) = new Timestamp(d * 86400000L)
    // days 0..3, post = day ≥ 2. Per-user (x=pre, y=post) cents:
    // treated u2 (1000,1200), u4 (500,600); control u1 (800,900), u3 (400,400)
    val rows = Seq(
      (2L, 0, 10.0), (2L, 2, 12.0), (4L, 1, 5.0), (4L, 3, 6.0),
      (1L, 0, 8.0), (1L, 2, 9.0), (3L, 1, 4.0), (3L, 3, 4.0))
    val e = rows.map { case (u, d0, v) => (u, "purchase", dts(d0), v) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.cupedEffect(e)
      .as[(Long, Long, Double, Double, Double, Double, Double, Double)].head()
    // hand-derived exact sums: n=4 sx=2700 sy=3100 sxx=2050000
    // sxy=2380000 syy=2770000 → covnum=1150000 varxnum=910000
    // varynum=1470000; θ=1150000/910000; raw effect (900−650)/100=2.5;
    // cuped effect (250 − θ·(750−675) + θ·(600−675))/100
    val theta = 1150000.0 / 910000.0
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._1 == 2L && got._2 == 2L)
    assert(got._3 == 2.5, s"raw effect: $got")
    assert(got._5 == r6(theta), s"theta: $got")
    assert(got._6 == r6((250.0 - theta * 150.0) / 100.0), s"cuped effect: $got")
    assert(got._8 == r6(1150000.0 * 1150000.0 / (910000.0 * 1470000.0)),
      s"var reduction: $got")
    // the covariate-aligned fixture must cut the standard error
    assert(got._7 < got._4, s"CUPED se must shrink: se_raw=${got._4} se_cuped=${got._7}")
  }

  test("sessionFunnel: in-session strict sequence counts; cross-session steps earn no credit") {
    def ts(ms: Long) = new Timestamp(ms)
    val m = 60000L
    val rows = Seq(
      // u1 session 1: full strict sequence → reaches 3
      (1L, 1L, "view", 0L), (2L, 1L, "click", m), (3L, 1L, "purchase", 2 * m),
      // u2: view in session 1, click 2h later = SESSION 2 → step 1 twice
      (4L, 2L, "view", 0L), (5L, 2L, "click", 120 * m),
      // u3 session 1: click before view → only step 1 (strict order)
      (6L, 3L, "click", 0L), (7L, 3L, "view", m))
      .map { case (e, u, t0, off) => (e, u, t0, ts(off), 1.0) }
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val got = Events.sessionFunnel(rows, Seq("view", "click", "purchase"))
      .orderBy("step").as[(Long, Long, Double)].collect().toSeq
    // step-1 sessions: u1s1, u2s1(view), u3s1(view) = 3; u2's click
    // session has no view → not counted
    assert(got == Seq((1L, 3L, 1.0), (2L, 1L, 0.333333), (3L, 1L, 0.333333)),
      s"got $got")
  }

  test("activityStreaks: islands split on gaps; repeats within a day collapse") {
    def dts(d: Int) = new Timestamp(d * 86400000L)
    // u1: days 1,2,3 then 7,8 (two streaks); u2: day 5 twice (one)
    val e = (Seq(1, 2, 3, 7, 8).map(d0 => (1L, d0)) ++ Seq((2L, 5), (2L, 5)))
      .map { case (u, d0) => (u, "view", dts(d0), 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.activityStreaks(e).orderBy("user_id")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 5L, 3L, 2L), (2L, 1L, 1L, 1L)), s"got $got")
  }

  test("retentionFit: a clean halving cohort fits λ≈ln2, half-life ≈ 1 day, R²≈1") {
    def dts(d: Int) = new Timestamp(d * 86400000L)
    // 8 users on day0; 4 return day1; 2 day2; 1 day3 →
    // r = 0.5, 0.25, 0.125 — exact exponential with rate ln 2
    val rows = (1 to 8).map(u => (u.toLong, 0)) ++
      (1 to 4).map(u => (u.toLong, 1)) ++
      (1 to 2).map(u => (u.toLong, 2)) ++ Seq((1L, 3))
    val e = rows.map { case (u, d0) => (u, "view", dts(d0), 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.retentionFit(e)
      .as[(Long, Double, Double, Double, Double)].head()
    assert(got._1 == 3L, s"three fit points: $got")
    assert(math.abs(got._2 - 0.693147) < 1e-3, s"decay must be ≈ ln2: $got")
    assert(math.abs(got._4 - 1.0) < 1e-2, s"half-life ≈ 1 day: $got")
    assert(got._5 > 0.9999, s"clean exponential must fit: $got")
    assert(math.abs(got._3 - 1.0) < 1e-2, s"anchor e^a ≈ 1: $got")
  }

  test("typeAffinity: hand-computed support/lift/jaccard; repeats collapse to distinct users") {
    def ts(ms: Long) = new Timestamp(ms)
    // u1 {A,B} (B twice — distinct collapses), u2 {A,B}, u3 {A}
    val e = Seq((1L, "A", 1L), (1L, "B", 2L), (1L, "B", 3L),
      (2L, "A", 4L), (2L, "B", 5L), (3L, "A", 6L))
      .map { case (u, t0, m) => (u, t0, ts(m), 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.typeAffinity(e)
      .as[(String, String, Long, Long, Long, Double, Double, Double)].head()
    assert(got == (("A", "B", 3L, 2L, 2L, 0.666667, 1.0, 0.666667)), s"got $got")
  }

  test("funnelUnordered: any order completes, missing step excludes, span is first-to-set-complete") {
    def ts(ms: Long) = new Timestamp(ms)
    val e = Seq(
      // u1 completes in REVERSE order (strict funnel would reject)
      (1L, "purchase", 1000L), (1L, "click", 2000L), (1L, "view", 5000L),
      // u2 misses 'click'
      (2L, "view", 1000L), (2L, "purchase", 2000L),
      // u3 completes with repeats — first occurrences count
      (3L, "view", 100L), (3L, "view", 9000L), (3L, "click", 300L),
      (3L, "purchase", 700L))
      .map { case (u, t0, m) => (u, t0, ts(m), 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.funnelUnordered(e, Seq("view", "click", "purchase"))
      .orderBy("user_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 4000L), (3L, 600L)), s"got $got")
  }

  test("activeUsers: trailing windows, idle-day zero DAU, range trim, stickiness guards") {
    def dts(d: Int) = new Timestamp(d * 86400000L)
    // u1 active day 0; u2 active days 0 and 8 → 9 reported days
    val e = Seq((1L, 0), (2L, 0), (2L, 8))
      .map { case (u, d0) => (u, "view", dts(d0), 1.0) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.activeUsers(e).orderBy("day")
      .select("dau", "wau", "mau", "stickiness_dw", "stickiness_dm")
      .as[(Long, Long, Long, Option[Double], Double)].collect().toSeq
    assert(got.size == 9, s"windows past max(day) must trim: ${got.size}")
    assert(got(0) == ((2L, 2L, 2L, Some(1.0), 1.0)), s"day0: ${got(0)}")
    assert(got(1) == ((0L, 2L, 2L, Some(0.0), 0.0)), s"day1: ${got(1)}")
    assert(got(7) == ((0L, 0L, 2L, None, 0.0)),
      s"day7 leaves the 7d window → null stickiness: ${got(7)}")
    assert(got(8) == ((1L, 1L, 2L, Some(1.0), 0.5)), s"day8: ${got(8)}")
  }

  test("powerAnalysis: hand-computed n-per-arm from exact moments, MDE grid, infeasible flag") {
    def dts(d: Int) = new Timestamp(d * 86400000L)
    // per-user totals (cents): 100, 200, 300, 400 → n=4 s1=1000
    // s2=300000, μ=250, s² = (4·300000 − 10⁶)/12
    val e = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0))
      .map { case (u, v) => (u, "purchase", dts(u.toInt), v) }
      .toDF("user_id", "event_type", "ts", "value")
    val got = Events.powerAnalysis(e, mdes = Seq(0.1, 0.5))
      .orderBy("mde")
      .as[(Double, Double, Double, Double, Long, Long, Boolean)].collect().toSeq
    val variance = (4.0 * 300000.0 - 1000.0 * 1000.0) / (4.0 * 3.0)
    val zsum = 1.959964 + 0.841621
    def npa(delta: Double) = math.ceil(2.0 * zsum * zsum * variance / (delta * delta)).toLong
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.size == 2)
    assert(got(0) == ((0.1, 2.5, r6(math.sqrt(variance) / 100.0), 0.25,
      npa(25.0), 4L, false)), s"got ${got(0)}")
    assert(got(1)._4 == 1.25 && got(1)._5 == npa(125.0), s"got ${got(1)}")
    assert(got(1)._5 < got(0)._5, "bigger effect needs fewer users")
  }

  test("eraseUsers: affected days rewritten, emptied day deleted, untouched days byte-identical") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_erasure").toString + "/lake"
    val day = 86400000L
    val base = 1704067200000L // 2024-01-01 UTC
    // day0: users 1 and 2; day1: user 3 only; day2: user 1 only
    val rows = Seq(
      (1L, new Timestamp(base + 1000), 1L, "view", 1.0, "{}"),
      (2L, new Timestamp(base + 2000), 2L, "view", 1.0, "{}"),
      (3L, new Timestamp(base + day + 1000), 3L, "click", 1.0, "{}"),
      (4L, new Timestamp(base + 2 * day + 1000), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    Events.writeDatePartitioned(rows, path)
    def fileState(d: String): Set[(String, Long, Long)] = {
      val dir = new java.io.File(s"$path/event_date=$d")
      if (!dir.exists()) Set.empty
      else dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }
    val day0Before = fileState("2024-01-01")
    val day2Before = fileState("2024-01-03")
    assert(day0Before.nonEmpty && day2Before.nonEmpty)

    // erasing user 3 empties day1 entirely; days 0 and 2 untouched
    Events.eraseUsers(spark, path, Seq(3L))
    assert(fileState("2024-01-02").isEmpty, "emptied day dir must be deleted")
    assert(fileState("2024-01-01") == day0Before, "day0 files must be untouched")
    assert(fileState("2024-01-03") == day2Before, "day2 files must be untouched")
    assert(new java.io.File(s"$path/_SUCCESS").exists(), "marker must be restored")

    // erasing user 2 rewrites day0 (user 1's row survives), day2 untouched
    Events.eraseUsers(spark, path, Seq(2L))
    assert(fileState("2024-01-01") != day0Before, "day0 must have been rewritten")
    assert(fileState("2024-01-03") == day2Before, "day2 still untouched")
    val left = spark.read.parquet(path)
      .select("event_id").as[Long].collect().toSeq.sorted
    assert(left == Seq(1L, 4L), s"got $left")

    // erasing an absent user is a no-op (no marker churn, no rewrites)
    val day2Mid = fileState("2024-01-03")
    Events.eraseUsers(spark, path, Seq(99L))
    assert(fileState("2024-01-03") == day2Mid)
  }

  test("cepPattern: negation blocks, window bounds, error-before-click harmless") {
    import org.apache.spark.sql.functions.col
    // u1: click(1') → purchase(10') — match, gap 9 min
    // u2: click(1') → error(5') → purchase(10') — BLOCKED
    // u3: click(1') → purchase(120') — outside the 1 h window
    // u4: purchase(10') with no click — no match
    // u5: error(0') → click(1') → purchase(10') — error BEFORE the
    //     click does not block
    val rows = Seq(
      (1L, 1, 1L, "click"), (2L, 10, 1L, "purchase"),
      (3L, 1, 2L, "click"), (4L, 5, 2L, "error"), (5L, 10, 2L, "purchase"),
      (6L, 1, 3L, "click"), (7L, 120, 3L, "purchase"),
      (8L, 10, 4L, "purchase"),
      (9L, 0, 5L, "error"), (10L, 1, 5L, "click"), (11L, 10, 5L, "purchase"))
      .map { case (id, m, u, tp) => (id, ts(m), u, tp, 1.0, "{}") }
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Events.cepPattern(rows, "click", "purchase", "error",
        windowMs = 3600L * 1000)
      .select("user_id", "first_id", "then_id", "gap_ms")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1L, 1L, 2L, 9L * 60000),
      (5L, 10L, 11L, 9L * 60000)), s"got $got")
  }

  test("compactSmallPartitions: fragmented day → one file; single-file and oversize days untouched; content preserved") {
    import org.apache.spark.sql.functions._
    val path = java.nio.file.Files.createTempDirectory("graft_compact").toString + "/lake"
    val day = 86400000L
    val base = 1704067200000L // 2024-01-01 UTC
    val day0 = (1 to 6).map(i =>
      (i.toLong, new Timestamp(base + i * 1000), 1L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    Events.writeDatePartitioned(day0.repartition(3), path)
    val day1 = Seq((10L, new Timestamp(base + day + 1000), 2L, "view", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    day1.withColumn("event_date", to_date(col("ts")))
      .coalesce(1).write.mode("append").partitionBy("event_date").parquet(path)
    def files(d: String): Set[(String, Long, Long)] = {
      val dir = new java.io.File(s"$path/event_date=$d")
      dir.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => (f.getName, f.length(), f.lastModified())).toSet
    }
    assert(files("2024-01-01").size == 3 && files("2024-01-02").size == 1)
    val day1Before = files("2024-01-02")

    // everything "oversize" → survey alone, zero mutations
    assert(Events.compactSmallPartitions(spark, path, targetBytes = 1L).isEmpty)
    assert(files("2024-01-01").size == 3)

    val compacted = Events.compactSmallPartitions(spark, path)
    assert(compacted == Seq("2024-01-01"), s"got $compacted")
    assert(files("2024-01-01").size == 1, "fragmented day must compact to one file")
    assert(files("2024-01-02") == day1Before,
      "single-file day must stay byte-identical (minFiles)")
    assert(new java.io.File(s"$path/_SUCCESS").exists())
    val ids = spark.read.parquet(path)
      .select("event_id").as[Long].collect().toSeq.sorted
    assert(ids == ((1L to 6L) :+ 10L), s"got $ids")
  }

  test("holtDaily: hand-computed integer recurrence, sign-safe floor halving") {
    // one type, six days; dollar values chosen so the milli-cent state
    // hits an ODD positive dividend (day 5) and an ODD negative one
    // (day 6) — pinning floorDiv (arithmetic shift) semantics
    val e = Seq(
      ("a", Timestamp.valueOf("2024-01-01 12:00:00"), 10.00),
      ("a", Timestamp.valueOf("2024-01-02 12:00:00"), 20.00),
      ("a", Timestamp.valueOf("2024-01-03 12:00:00"), 10.00),
      ("a", Timestamp.valueOf("2024-01-04 12:00:00"), 5.00),
      ("a", Timestamp.valueOf("2024-01-05 12:00:00"), 0.01),
      ("a", Timestamp.valueOf("2024-01-06 12:00:00"), 0.02)
    ).toDF("event_type", "ts", "value")
    val got = Events.holtDaily(e).orderBy("day")
      .select("value", "level", "trend", "forecast_next")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      (10.0, 10.0, 0.0, 10.0),
      (20.0, 15.0, 2.5, 17.5),
      (10.0, 13.75, 0.625, 14.375),
      (5.0, 9.6875, -1.71875, 7.96875),
      (0.01, 3.98937, -3.70844, 0.28093),
      (0.02, 0.15046, -3.77368, -3.62322)),
      s"hand-computed Holt state mismatch: $got")
    // partitioning-independence: the fold runs off a sorted collect
    val again = Events.holtDaily(e.repartition(5)).orderBy("day")
      .select("value", "level", "trend", "forecast_next")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(again == got)
  }

  test("cemMatch: share-based treatment, matched-cell filter, control reweighting, arm means") {
    // cell (view bin 1, click bin 0):
    //  u1 treated (3/10 errors > 20%), buys 10.00 total
    //  u2 control (1/7 errors), buys 6.00; u4 control, buys nothing
    //  -> w_c = (1/2)*(2/1) = 1.0, y_t = 10.0, y_c = 3.0
    // u3: 12 views -> cell (2, 0), control alone -> unmatched, dropped
    def ev(u: String, t: String, m: Int, v: Double) =
      (u, t, Timestamp.valueOf(f"2024-01-03 10:$m%02d:00"), v)
    val rows =
      (1 to 3).map(i => ev("u1", "error", i, 0.0)) ++
      (4 to 8).map(i => ev("u1", "view", i, 0.0)) ++
      Seq(ev("u1", "purchase", 9, 4.00), ev("u1", "purchase", 10, 6.00),
          ev("u2", "error", 1, 0.0), ev("u2", "purchase", 2, 6.00)) ++
      (3 to 7).map(i => ev("u2", "view", i, 0.0)) ++
      (1 to 6).map(i => ev("u4", "view", i, 0.0)) ++
      (1 to 12).map(i => ev("u3", "view", i, 0.0))
    val e = rows.toDF("user_id", "event_type", "ts", "value")
    val got = Events.cemMatch(e, "error", "purchase", "view", "click")
      .select("cov1_bin", "cov2_bin", "m_t", "m_c", "control_weight",
        "y_t_mean", "y_c_mean")
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    assert(got == Seq((1L, 0L, 1L, 2L, 1.0, 10.0, 3.0)), s"CEM cell mismatch: $got")
  }

  test("mannWhitney: hand-computed U with average ranks and tie correction") {
    // A (even users): 1.00, 2.00, 2.00; B (odd): 2.00, 3.00
    // ranks: 100->1, 200->avg(2,3,4)=3, 300->5; R_A=7, U_A=1
    // mu=3, sig2=(6/12)*((5+1)-24/20)=2.4, z=-2/sqrt(2.4)=-1.290994
    val e = Seq(
      (0L, "purchase", Timestamp.valueOf("2024-01-01 10:00:00"), 1.00),
      (2L, "purchase", Timestamp.valueOf("2024-01-01 10:01:00"), 2.00),
      (2L, "purchase", Timestamp.valueOf("2024-01-01 10:02:00"), 2.00),
      (1L, "purchase", Timestamp.valueOf("2024-01-01 10:03:00"), 2.00),
      (3L, "purchase", Timestamp.valueOf("2024-01-01 10:04:00"), 3.00),
      (0L, "view", Timestamp.valueOf("2024-01-01 10:05:00"), 9.99)
    ).toDF("user_id", "event_type", "ts", "value")
    val got = Events.mannWhitney(e, "purchase", numBuckets = 4)
      .select("n_a", "n_b", "u_stat", "z_score", "significant")
      .as[(Long, Long, Double, Double, Boolean)].head()
    assert(got._1 == 3L && got._2 == 2L)
    assert(got._3 == 1.0, s"U: ${got._3}")
    assert(math.abs(got._4 - (-1.290994)) < 1e-6, s"z: ${got._4}")
    assert(!got._5)
  }

  test("holtWintersDaily: constant series is a fixed point; weekly spike lands in its seasonal slot") {
    // constant: l=y, b=0, s=0 exactly, every day
    val flat = (0 until 10).map(i =>
      ("a", new Timestamp(i * 86400000L + 3600000L), 5.00))
      .toDF("event_type", "ts", "value")
    val f = Events.holtWintersDaily(flat).orderBy("day")
      .select("value", "level", "trend", "seasonal", "fitted")
      .as[(Double, Double, Double, Double, Double)].collect().toSeq
    assert(f.forall(_ == ((5.0, 5.0, 0.0, 0.0, 5.0))), s"constant fixed point broken: $f")
    // weekly +70 spike on slot of day 0, 28 days: the spike's seasonal
    // state turns strongly positive, base days' negative; the fitted
    // value on the last spike day sits far above the level alone
    val spiky = (0 until 28).map { i =>
      val v = if (i % 7 == 0) 80.00 else 10.00
      ("a", new Timestamp(i * 86400000L + 3600000L), v)
    }.toDF("event_type", "ts", "value")
    val s = Events.holtWintersDaily(spiky).orderBy("day")
      .select("value", "level", "seasonal", "fitted")
      .as[(Double, Double, Double, Double)].collect().toSeq
    // NOTE: without seasonal-mean renormalization the (level, seasonal)
    // split is not identifiable — only their SUM (fitted) is pinned.
    // Assert fit quality and the spike slot's seasonal dominance.
    val lastSpike = s(21); val lastBase = s.last
    assert(lastSpike._1 == 80.0 && lastSpike._3 > lastBase._3 + 30.0,
      s"spike slot's seasonal must dominate base slots: $lastSpike vs $lastBase")
    assert(math.abs(lastSpike._4 - 80.0) < math.abs(lastSpike._2 - 80.0),
      "fitted must beat bare level on the spike day")
    // the seasonal model's claim: on a periodic series it beats plain
    // Holt — compare mean |fit error| over the last two weeks
    val hw = s.takeRight(14).map(r => math.abs(r._4 - r._1)).sum / 14.0
    val holt = Events.holtDaily(spiky).orderBy("day")
      .select("value", "forecast_next").as[(Double, Double)].collect().toSeq
    val holtFit = holt.takeRight(14).map(r => math.abs(r._2 - r._1)).sum / 14.0
    assert(hw < holtFit,
      s"Holt-Winters must beat trend-only Holt on a weekly pattern: $hw vs $holtFit")
    // partitioning never changes the fold
    val again = Events.holtWintersDaily(spiky.repartition(5)).orderBy("day")
      .select("value", "level", "seasonal", "fitted")
      .as[(Double, Double, Double, Double)].collect().toSeq
    assert(again == s)
  }

  test("metricTree: sequential substitution telescopes to exactly the revenue delta") {
    // a: 10 views, 2 purchases of 10.00; b: 20 views, 3 of 15.00
    // dViews=10*0.2*10=20, dConv=20*(-0.05)*10=-10, dAov=20*0.15*5=15 -> 25
    def day(d: Int, t: String, v: Double, i: Int) =
      (t, Timestamp.valueOf(f"1970-01-0$d 10:${i / 60}%02d:${i % 60}%02d"), v)
    val rows =
      (1 to 10).map(i => day(2, "view", 0.0, i)) ++
      Seq(day(2, "purchase", 10.00, 11), day(2, "purchase", 10.00, 12)) ++
      (1 to 20).map(i => day(4, "view", 0.0, i)) ++
      (1 to 3).map(i => day(4, "purchase", 15.00, 30 + i))
    val e = rows.toDF("event_type", "ts", "value")
      .withColumn("user_id", org.apache.spark.sql.functions.lit(1L))
    val got = Events.metricTree(e).orderBy("factor")
      .select("factor", "value_a", "value_b", "contribution")
      .as[(String, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("aov", 10.0, 15.0, 15.0),
      ("conversion", 0.2, 0.15, -10.0),
      ("total_revenue", 20.0, 45.0, 25.0),
      ("views", 10.0, 20.0, 20.0)), s"decomposition mismatch: $got")
    // the telescoping identity: factor contributions sum to the total
    val parts = got.filter(_._1 != "total_revenue").map(_._4).sum
    assert(math.abs(parts - 25.0) < 1e-9)
  }

  test("eventStudy: pre-day effect is exactly zero; post-day shows the gap net of baseline") {
    val e = Seq(
      (0L, "purchase", Timestamp.valueOf("2024-01-01 10:00:00"), 10.00),
      (1L, "purchase", Timestamp.valueOf("2024-01-01 11:00:00"), 8.00),
      (0L, "purchase", Timestamp.valueOf("2024-01-03 10:00:00"), 20.00),
      (1L, "purchase", Timestamp.valueOf("2024-01-03 11:00:00"), 9.00)
    ).toDF("user_id", "event_type", "ts", "value")
    val got = Events.eventStudy(e).orderBy("day")
      .select("post", "day_gap", "effect")
      .as[(Boolean, Double, Double)].collect().toSeq
    assert(got == Seq((false, 2.0, 0.0), (true, 11.0, 9.0)),
      s"event-study curve mismatch: $got")
  }

  test("weibullFit: heavy-tail conversions read k < 1, late-clustered read k > 1") {
    import java.sql.Timestamp
    def fixture(durations: Seq[Int]) =
      durations.zipWithIndex.flatMap { case (dd, i) =>
        val u = i.toLong + 1
        Seq((u, 2L * u, Timestamp.valueOf("2024-01-01 00:00:00"), "view"),
          (u, 2L * u + 1,
            Timestamp.valueOf(java.time.LocalDateTime.of(2024, 1, 1, 0, 0)
              .plusDays(dd).format(java.time.format.DateTimeFormatter
                .ofPattern("yyyy-MM-dd HH:mm:ss"))), "purchase"))
      }.toDF("user_id", "event_id", "ts", "event_type")
    // geometric-ish heavy tail: survivors get progressively safer
    val decel = Events.weibullFit(
        fixture(Seq(1, 1, 1, 1, 1, 2, 2, 2, 4, 4, 8, 16, 32, 64, 128, 256)),
        "purchase")
      .select("shape_k", "r2", "decelerating_hazard")
      .as[(Double, Double, Boolean)].head()
    assert(decel._1 < 1.0 && decel._3, s"heavy tail must read k < 1: $decel")
    assert(decel._2 > 0.8, s"the linearized fit should be tight: $decel")
    // wear-out: almost everyone converts in a narrow late band
    val accel = Events.weibullFit(
        fixture(Seq(40, 45, 48, 50, 52, 54, 55, 56, 57, 58)), "purchase")
      .select("shape_k", "decelerating_hazard")
      .as[(Double, Boolean)].head()
    assert(accel._1 > 1.0 && !accel._2, s"late cluster must read k > 1: $accel")
  }

  test("upliftCurve: effect concentrated on high-score users; qini cumulative") {
    import java.sql.Timestamp
    // pre = 2024-01-01, post = 2024-01-02 (integer midpoint split).
    // high-score users (3 pre views): treated 2,4 convert post,
    // control 1,3 don't. low-score users 5 (control), 6 (treated):
    // one pre view, nobody converts.
    val pre = Seq(1L, 2L, 3L, 4L).flatMap(u => Seq.fill(3)(u)) ++ Seq(5L, 6L)
    val rows = pre.map(u => (u, "2024-01-01", "view")) ++
      Seq((2L, "2024-01-02", "purchase"), (4L, "2024-01-02", "purchase"))
    val df = rows.zipWithIndex.map { case ((u, d, t), i) =>
      (u, i.toLong, Timestamp.valueOf(s"$d 10:00:00"), t)
    }.toDF("user_id", "event_id", "ts", "event_type")
    val got = Events.upliftCurve(df, "purchase")
      .select("score", "n_t", "x_t", "n_c", "x_c", "uplift", "qini")
      .as[(Long, Long, Long, Long, Long, Double, Double)]
      .collect().sortBy(-_._1).toSeq
    assert(got == Seq(
      (3L, 2L, 2L, 2L, 0L, 1.0, 2.0),
      (1L, 3L, 2L, 3L, 0L, 0.666667, 2.0)), s"$got")
  }

  test("markovSteadyState: symmetric chain is uniform; biased chain converges to pi*P = pi") {
    import java.sql.Timestamp
    def seq2ev(types: Seq[String]) = types.zipWithIndex.map { case (t, i) =>
      (1L, i.toLong, Timestamp.valueOf(f"2024-01-01 10:${i}%02d:00"), t, 1.0)
    }.toDF("user_id", "event_id", "ts", "event_type", "value")
    // A <-> B round robin: uniform is the exact fixed point
    val sym = Events.markovSteadyState(seq2ev(Seq("A", "B", "A", "B", "A")),
        rounds = 5)
      .as[(String, Double)].collect().toMap
    assert(sym == Map("A" -> 0.5, "B" -> 0.5), s"$sym")
    // P(A->B)=1, P(B->A)=1/3, P(B->B)=2/3: stationary (0.25, 0.75);
    // second eigenvalue -1/3 → 8 rounds land well inside 1e-3
    val bias = Events.markovSteadyState(seq2ev(Seq("A", "B", "B", "B", "A")),
        rounds = 8)
      .as[(String, Double)].collect().toMap
    assert(math.abs(bias("A") - 0.25) < 1e-3 &&
      math.abs(bias("B") - 0.75) < 1e-3, s"$bias")
    assert(math.abs(bias.values.sum - 1.0) < 1e-4, s"mass leak: $bias")
  }

  test("resampleLerp: interior gaps interpolate linearly, edges stay null, observed exact") {
    import java.sql.Timestamp
    def ev(day: Int, typ: String, v: Double) =
      (1L, Timestamp.valueOf(f"2024-01-$day%02d 10:00:00"), typ, v)
    // type A observed days 1 and 4 (values 1.0, 4.0) → days 2, 3 lerp
    // to 2.0, 3.0; type B observed only day 3 → its other spine days
    // are leading/trailing and stay null
    val df = Seq(ev(1, "A", 1.0), ev(4, "A", 4.0), ev(3, "B", 9.0))
      .toDF("user_id", "ts", "event_type", "value")
    val got = Events.resampleLerp(df)
      .select("event_type", "day", "observed", "value")
      .as[(String, java.sql.Date, Boolean, Option[Double])]
      .collect().toSeq.sortBy(r => (r._1, r._2.toString))
    val a = got.filter(_._1 == "A").map(r => (r._3, r._4))
    assert(a == Seq((true, Some(1.0)), (false, Some(2.0)),
      (false, Some(3.0)), (true, Some(4.0))), s"lerp: $got")
    val b = got.filter(_._1 == "B").map(r => (r._3, r._4))
    assert(b == Seq((false, None), (false, None), (true, Some(9.0)),
      (false, None)), s"edges must stay null: $got")
  }

  test("sequentialMonitor: boundary crossing stops; the stop flag survives a later lapse") {
    import java.sql.Timestamp
    // arm A = even user_id, arm B = odd; one look per day
    def batch(day: String, n: Int, convA: Int, convB: Int) =
      (0 until n).flatMap { i =>
        Seq((2L * i, day, if (i < convA) "purchase" else "view"),
            (2L * i + 1, day, if (i < convB) "purchase" else "view"))
      }
    val rows = batch("2024-01-01", 10, 1, 1) ++   // z = 0, no stop
      batch("2024-01-02", 10, 10, 0) ++           // cum 11/20 vs 1/20: z > 2.8
      batch("2024-01-03", 200, 100, 100)          // balanced flood: z lapses
    val df = rows.map { case (u, d, t) =>
      (u, Timestamp.valueOf(s"$d 12:00:00"), t)
    }.toDF("user_id", "ts", "event_type")
    val got = Events.sequentialMonitor(df, "purchase", zCrit = 2.8)
      .select("day", "n_a", "x_a", "n_b", "x_b", "significant", "stopped")
      .as[(java.sql.Date, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().toSeq.sortBy(_._1.toString)
    assert(got.map(r => (r._2, r._3, r._4, r._5)) ==
      Seq((10L, 1L, 10L, 1L), (20L, 11L, 20L, 1L), (220L, 111L, 220L, 101L)),
      s"cumulative counts: $got")
    assert(got.map(r => (r._6, r._7)) ==
      Seq((false, false), (true, true), (false, true)),
      s"look verdicts: day-2 crossing must stop; day-3 lapse must stay stopped: $got")
    // z at the crossing look: hand chain 0.5 / sqrt(0.3·0.7·0.1)
    val z2 = Events.sequentialMonitor(df, "purchase", zCrit = 2.8)
      .where(org.apache.spark.sql.functions.col("n_a") === 20)
      .select("z").as[Double].head()
    val expect = math.rint(0.5 / math.sqrt(0.3 * 0.7 * 0.1) * 1e6) / 1e6
    assert(math.abs(z2 - expect) < 1e-9, s"z: $z2 vs $expect")
  }

  test("positionAttribution: U-shaped 40/20/40 credit, 1-touch 100%, 2-touch 50/50, no-touch direct") {
    def ev(id: Long, user: Long, t: String, tp: String, v: Double) =
      (id, user, Timestamp.valueOf(t), tp, v)
    val rows = Seq(
      // user 1: 4 touches then a 100.00 purchase -> 40/6.67·3? no:
      // first view 40, last click 40, two middles 10 each
      ev(1, 1, "2024-01-01 10:00:00", "view", 0),
      ev(2, 1, "2024-01-01 11:00:00", "click", 0),
      ev(3, 1, "2024-01-01 12:00:00", "view", 0),
      ev(4, 1, "2024-01-01 13:00:00", "click", 0),
      ev(5, 1, "2024-01-01 14:00:00", "purchase", 100.0),
      // user 2: one touch -> 100% to click
      ev(6, 2, "2024-01-01 10:00:00", "click", 0),
      ev(7, 2, "2024-01-01 11:00:00", "purchase", 50.0),
      // user 3: two touches -> 50/50
      ev(8, 3, "2024-01-01 10:00:00", "view", 0),
      ev(9, 3, "2024-01-01 11:00:00", "click", 0),
      ev(10, 3, "2024-01-01 12:00:00", "purchase", 10.0),
      // user 4: touch OUTSIDE the 24h lookback -> direct
      ev(11, 4, "2024-01-01 10:00:00", "view", 0),
      ev(12, 4, "2024-01-03 10:00:00", "purchase", 7.0))
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.positionAttribution(rows, Seq("view", "click"),
        "purchase", lookbackMs = 24L * 3600 * 1000)
      .orderBy("channel")
      .as[(String, Long, Double)].collect().toSeq
    // view: 40 (first of u1) + 10 (middle of u1) + 5 (50% of u3) = 55
    // click: 40 (last of u1) + 10 (middle) + 50 (u2) + 5 (u3) = 105
    // direct: 7 (u4)
    assert(got == Seq(("click", 4L, 105.0), ("direct", 1L, 7.0),
      ("view", 3L, 55.0)), s"credits: $got")
  }

  test("growthAccounting: new/retained/resurrected sum to DAU; churn reads off yesterday") {
    val rows = Seq(
      (1L, 1L, "2024-01-01"), (2L, 2L, "2024-01-01"),   // d1: 2 new
      (3L, 1L, "2024-01-02"), (4L, 3L, "2024-01-02"),   // d2: 1 retained, 1 new; 2 churned? no: u2 churns
      (5L, 2L, "2024-01-04"))                           // d4: u2 resurrects
      .map { case (e, u, d) =>
        (e, u, Timestamp.valueOf(s"$d 12:00:00"), "view", 0.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.growthAccounting(rows).orderBy("day")
      .select("day", "n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned")
      .as[(java.sql.Date, Long, Long, Long, Long, Long)].collect().toSeq
      .map(r => (r._1.toString, r._2, r._3, r._4, r._5, r._6))
    assert(got == Seq(
      ("2024-01-01", 2L, 2L, 0L, 0L, 0L),
      ("2024-01-02", 2L, 1L, 1L, 0L, 1L),  // u2 didn't return
      ("2024-01-03", 0L, 0L, 0L, 0L, 2L),  // EVERYONE went inactive: the
                                           // churn-only day still reports
                                           // (full-outer fix — a left join
                                           // silently lost this churn)
      ("2024-01-04", 1L, 0L, 0L, 1L, 0L),  // u2 back
      ("2024-01-05", 0L, 0L, 0L, 0L, 1L)), // u2's final churn, day after
      s"growth accounting: $got")
    // the identity holds on every row
    assert(got.forall(r => r._2 == r._3 + r._4 + r._5))
  }

  test("cumulativeUsers: each user counts once on the first-seen day") {
    val rows = Seq(
      (1L, 1L, "2024-01-01"), (2L, 1L, "2024-01-03"), // user 1 -> day 1 only
      (3L, 2L, "2024-01-01"),                          // user 2 -> day 1
      (4L, 3L, "2024-01-03"), (5L, 3L, "2024-01-05"))  // user 3 -> day 3
      .map { case (e, u, d) =>
        (e, u, Timestamp.valueOf(s"$d 12:00:00"), "view", 0.0) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.cumulativeUsers(rows).orderBy("day")
      .select("day", "n_new", "n_cumulative")
      .as[(java.sql.Date, Long, Long)].collect().toSeq
      .map(r => (r._1.toString, r._2, r._3))
    assert(got == Seq(("2024-01-01", 2L, 2L), ("2024-01-03", 1L, 3L)),
      s"growth curve: $got")
  }

  test("btydSummary: x/t_x/T and mean repeat value match the hand computation") {
    val rows = Seq(
      // user 1: purchases on days 1, 5, 11 (values 10, 20, 30);
      // obs_end = day 21 (user 2's last) → x=2, t_x=10, T=20,
      // monetary = (20+30)/2 = 25
      (1L, 1L, "2024-01-01", "purchase", 10.0),
      (2L, 1L, "2024-01-05", "purchase", 20.0),
      (3L, 1L, "2024-01-11", "purchase", 30.0),
      (4L, 2L, "2024-01-21", "purchase", 99.0), // one-shot: x=0, null money
      (5L, 2L, "2024-01-22", "view", 1.0))      // non-purchase ignored
      .map { case (e, u, d, tp, v) =>
        (e, u, Timestamp.valueOf(s"$d 12:00:00"), tp, v) }
      .toDF("event_id", "user_id", "ts", "event_type", "value")
    val got = Events.btydSummary(rows)
      .orderBy("user_id")
      .select("user_id", "x", "t_x", "t_age", "monetary_value")
      .as[(Long, Long, Long, Long, Option[Double])].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 10L, 20L, Some(25.0)),
      (2L, 0L, 0L, 0L, None)), s"btyd frame: $got")
  }

  test("typeOverlapMatrix: exact both-counts, Jaccard, and lift vs independence") {
    val rows = Seq(
      (1L, 1L, "a"), (2L, 1L, "b"),            // user 1: a, b
      (3L, 2L, "a"), (4L, 2L, "b"), (5L, 2L, "a"), // user 2: a, b (dup a)
      (6L, 3L, "a"),                            // user 3: a only
      (7L, 4L, "c"))                            // user 4: c only
      .map { case (e, u, tp) =>
        (e, u, Timestamp.valueOf("2024-01-01 10:00:00"), tp) }
      .toDF("event_id", "user_id", "ts", "event_type")
    val got = Events.typeOverlapMatrix(rows)
      .orderBy("type_a", "type_b")
      .select("type_a", "type_b", "n_a", "n_b", "n_both", "jaccard", "lift")
      .as[(String, String, Long, Long, Long, Double, Double)].collect().toSeq
    // audiences: a = {1,2,3}, b = {1,2}, c = {4}; N = 4
    // (a,b): both 2, jaccard 2/3, lift 2*4/(3*2) = 4/3
    def r6(x: Double) = math.rint(x * 1e6) / 1e6
    assert(got == Seq(
      ("a", "b", 3L, 2L, 2L, r6(2.0 / 3), r6(4.0 / 3))),
      s"overlap matrix (disjoint pairs must not appear): $got")
  }

  test("markovEntropyRate: deterministic chain reads 0 bits; fair coin reads 1") {
    def mk(rows: Seq[(Long, String)]) =
      rows.zipWithIndex.map { case ((u, tp), i) =>
        (i.toLong, u, Timestamp.valueOf(s"2024-01-01 10:${"%02d".format(i % 60)}:00"), tp)
      }.toDF("event_id", "user_id", "ts", "event_type")
    // deterministic 2-cycle a->b->a->b...: every row entropy 0
    val cyc = mk((0 until 20).map(i => (1L, if (i % 2 == 0) "a" else "b")))
    val got0 = Events.markovEntropyRate(cyc, rounds = 8)
      .select("state", "h_state_bits", "entropy_rate_bits")
      .as[(String, Double, Double)].collect().toSeq.sortBy(_._1)
    assert(got0.forall(r => r._2 == 0.0 && r._3 == 0.0),
      s"deterministic chain must read 0 bits: $got0")
    // fair coin: (a a b b)×4 + a gives 16 transitions with counts
    // aa = ab = bb = ba = 4 — every conditional entropy exactly 1 bit
    val coin = mk(((0 until 16).map(i =>
      1L -> (if (i % 4 < 2) "a" else "b")) :+ (1L -> "a")))
    val got1 = Events.markovEntropyRate(coin, rounds = 16)
      .select("h_state_bits", "entropy_rate_bits")
      .as[(Double, Double)].collect().toSeq
    assert(got1.forall(r => math.abs(r._1 - 1.0) < 1e-6 &&
      math.abs(r._2 - 1.0) < 1e-5),
      s"fair-coin chain must read 1 bit: $got1")
  }
}
