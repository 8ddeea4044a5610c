package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, Long, String, String)*) =
    rows.map { case (id, u, t, typ) => (id, u, ts(t), typ) }
      .toDF("event_id", "user_id", "ts", "event_type")

  test("asOfJoin: latest right row at or before each left row, per key") {
    val e = events(
      (1L, 7L, "2026-01-01 10:00:00", "view"),
      (2L, 7L, "2026-01-01 10:05:00", "view"),
      (3L, 7L, "2026-01-01 10:05:00", "purchase"), // equal ts → view 2 matches (<=)
      (4L, 7L, "2026-01-01 11:00:00", "purchase"), // latest view = 2
      (5L, 9L, "2026-01-01 09:00:00", "purchase")) // no view for user 9 → null
    val got = Joins.asOfJoin(
        e.where($"event_type" === "purchase"), e.where($"event_type" === "view"),
        Seq("user_id"), "ts", "event_id", Seq())
      .select($"event_id", $"matched.r_event_id".as("m"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(3L -> Some(2L), 4L -> Some(2L), 5L -> None))
  }

  test("asOfJoin: ties among right rows resolve to greatest id (deterministic)") {
    val e = events(
      (1L, 7L, "2026-01-01 10:00:00", "view"),
      (2L, 7L, "2026-01-01 10:00:00", "view"), // same ts as 1
      (3L, 7L, "2026-01-01 10:30:00", "purchase"))
    val got = Joins.asOfJoin(
        e.where($"event_type" === "purchase"), e.where($"event_type" === "view"),
        Seq("user_id"), "ts", "event_id", Seq())
      .select($"matched.r_event_id").as[Long].collect().toSeq
    assert(got == Seq(2L))
  }

  test("asOfJoinNearest: min |Δts| either side, backward wins ties, nulls only when no view exists") {
    val e = events(
      (1L, 7L, "2026-01-01 09:00:00", "view"),
      (2L, 7L, "2026-01-01 10:10:00", "view"),
      (3L, 7L, "2026-01-01 10:00:00", "purchase"), // prev 60m, next 10m → forward 2
      (4L, 7L, "2026-01-01 09:01:00", "purchase"), // prev 1m, next 69m → backward 1
      (5L, 8L, "2026-01-01 10:00:00", "purchase"), // no view for user 8 → null
      (6L, 9L, "2026-01-01 10:00:00", "view"),
      (7L, 9L, "2026-01-01 10:20:00", "view"),
      (8L, 9L, "2026-01-01 10:10:00", "purchase")) // tie 10m/10m → backward 6
    val got = Joins.asOfJoinNearest(
        e.where($"event_type" === "purchase"), e.where($"event_type" === "view"),
        Seq("user_id"), "ts", "event_id", Seq())
      .select($"event_id", $"matched.r_event_id".as("m"), $"direction")
      .as[(Long, Option[Long], Option[String])].collect()
      .map { case (k, v, d) => k -> ((v, d)) }.toMap
    assert(got == Map(
      3L -> ((Some(2L), Some("forward"))),
      4L -> ((Some(1L), Some("backward"))),
      5L -> ((None, None)),
      8L -> ((Some(6L), Some("backward")))), s"got $got")
  }

  test("asOfJoin tolerance: stale matches null out, fresh ones survive, winner unchanged") {
    val l = Seq((10L, 1L, new Timestamp(7200000L)), (11L, 2L, new Timestamp(7200000L)))
      .toDF("event_id", "k", "ts")
    // key 1's last right row is 2 h old (stale at 1 h tolerance);
    // key 2 has a fresh one 30 min back
    val r = Seq((1L, 1L, new Timestamp(0L)), (2L, 2L, new Timestamp(5400000L)))
      .toDF("event_id", "k", "ts")
    val got = Joins.asOfJoin(l, r, Seq("k"), "ts", "event_id", Seq(),
        toleranceMs = Some(3600000L))
      .select($"event_id", $"matched.r_event_id")
      .as[(Long, Option[Long])].collect().toMap
    assert(got == Map(10L -> None, 11L -> Some(2L)),
      s"stale match must null, fresh must survive: $got")
  }

  test("rangeJoin: pairs within window, same key, no double counting across bins") {
    val e = events(
      (1L, 7L, "2026-01-01 10:00:00", "click"),
      (2L, 7L, "2026-01-01 10:59:59", "error"), // in [0, 1h) of click 1
      (3L, 7L, "2026-01-01 11:00:00", "error"), // exactly 1h → excluded
      (4L, 7L, "2026-01-01 09:59:59", "error"), // before click → excluded
      (5L, 8L, "2026-01-01 10:10:00", "error")) // other user → excluded
    val got = Joins.rangeJoin(
        e.where($"event_type" === "click"), e.where($"event_type" === "error"),
        Seq("user_id"), "ts", windowSeconds = 3600)
      .select($"l.event_id", $"r.event_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L)))
  }

  test("intervalOverlapJoin equals the brute-force inequality join") {
    // random-ish intervals spanning 0..10 buckets, incl. exact-touch
    // and containment cases; key splits the space in two
    val mk = (rows: Seq[(Long, Long, Long, Long)], p: String) =>
      rows.map { case (id, k, a, b) =>
        (id, k, new Timestamp(a * 600000L), new Timestamp(b * 600000L)) }
        .toDF(s"${p}_id", "k", s"${p}_start", s"${p}_end")
    val lRows = Seq((1L, 0L, 0L, 5L), (2L, 0L, 10L, 12L), (3L, 1L, 3L, 30L),
                    (4L, 1L, 40L, 41L), (5L, 0L, 7L, 7L))
    val rRows = Seq((1L, 0L, 5L, 6L), (2L, 0L, 13L, 20L), (3L, 1L, 29L, 45L),
                    (4L, 1L, 0L, 2L), (5L, 0L, 6L, 8L))
    val l = mk(lRows, "l"); val r = mk(rRows, "r")
    val brute = (for {
      (li, lk, la, lb) <- lRows; (ri, rk, ra, rb) <- rRows
      if lk == rk && la <= rb && ra <= lb
    } yield (li, ri)).toSet
    val got = Joins.intervalOverlapJoin(l, r, Seq("k"),
        "l_start", "l_end", "r_start", "r_end", bucketSeconds = 1800)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(got == brute)

    // an INVERTED interval (end < start) is empty — it must be
    // dropped, not exploded into a descending bogus bucket list
    // (sequence defaults to step −1) that replicates the row
    val lBad = mk(lRows :+ (99L, 0L, 12L, 2L), "l")
    val gotBad = Joins.intervalOverlapJoin(lBad, r, Seq("k"),
        "l_start", "l_end", "r_start", "r_end", bucketSeconds = 1800)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(gotBad == brute, "inverted interval must match nothing and change nothing")
  }

  // brute-force reference: every unordered pair within edit distance
  private def bruteFuzzy(rows: Seq[(Long, String)], maxDist: Int): Set[(Long, Long, Long)] = {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    (for {
      (ia, sa) <- rows; (ib, sb) <- rows
      if ia < ib && lev(sa, sb) <= maxDist
    } yield (ia, ib, lev(sa, sb).toLong)).toSet
  }

  test("fuzzySelfJoin: complete vs brute force across subst/insert/delete, k=1 and k=2") {
    val rows = Seq(
      1L -> "kitten", 2L -> "sitten", 3L -> "sittin", 4L -> "sitting",
      5L -> "kitchen", 6L -> "mitten", 7L -> "smitten", 8L -> "bolt",
      9L -> "boat", 10L -> "bat", 11L -> "unrelatedstring")
    val df = rows.toDF("id", "s")
    for (k <- Seq(1, 2)) {
      val got = Joins.fuzzySelfJoin(df, "id", "s", maxDist = k)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == bruteFuzzy(rows, k), s"k=$k blocking must be lossless")
    }
  }

  test("fuzzySelfJoin: pairs matched through several segments appear once") {
    // identical strings match in every segment slot and shift
    val df = Seq(1L -> "aaaaaaaa", 2L -> "aaaaaaaa", 3L -> "aaaaaaab").toDF("id", "s")
    val got = Joins.fuzzySelfJoin(df, "id", "s", maxDist = 1)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.size == got.distinct.size && got.toSet ==
      Set((1L, 2L, 0L), (1L, 3L, 1L), (2L, 3L, 1L)))
  }

  test("fuzzySelfJoin: short strings (empty segments) still resolve correctly") {
    val rows = Seq(1L -> "a", 2L -> "b", 3L -> "ab", 4L -> "", 5L -> "abc")
    val got = Joins.fuzzySelfJoin(rows.toDF("id", "s"), "id", "s", maxDist = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == bruteFuzzy(rows, 2))
  }

  test("saltedJoin equals the plain join") {
    val big = (1L to 100L).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .as[(Long, Long, String)].collect().toSet
    val salted = Joins.saltedJoin(big, small, Seq("k"), numSalts = 4, saltSource = "v")
      .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
    assert(salted == plain)
  }

  test("adaptiveSaltedJoin equals the plain join across all-cold, mixed, and all-hot thresholds") {
    // key 0 is hot (34 rows), keys 1/2 are cold (33 each)
    val big = (1L to 100L).map(i => (i % 3, i)).toDF("k", "v")
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "name")
    val plain = big.join(small, Seq("k")).select("k", "v", "name")
      .as[(Long, Long, String)].collect().toSet
    for (threshold <- Seq(1000L, 34L, 1L)) {
      val got = Joins.adaptiveSaltedJoin(big, small, Seq("k"),
          hotThreshold = threshold, numSalts = 4, saltSource = "v")
        .select("k", "v", "name").as[(Long, Long, String)].collect().toSet
      assert(got == plain, s"threshold=$threshold salting must be result-invisible")
    }
  }

  test("bloomPrefilterJoin equals the plain join — false positives removed, misses dropped") {
    val big = (1L to 1000L).map(i => (i, s"row$i")).toDF("bk", "payload")
    // small side hits only 1% of big keys — the prefilter's sweet spot
    val small = (1L to 10L).map(i => (i * 100L, s"dim${i}")).toDF("sk", "name")
    val plain = big.join(small, col("bk") === col("sk"))
      .select("bk", "payload", "name")
      .as[(Long, String, String)].collect().toSet
    val bloomed = Joins.bloomPrefilterJoin(big, "bk", small, "sk",
        expectedItems = 100L, numBits = 4096L)
      .select("bk", "payload", "name")
      .as[(Long, String, String)].collect().toSet
    assert(bloomed == plain, "prefilter must be result-invisible")
    // keys in small but absent from big contribute nothing
    val smallMiss = Seq((99999L, "ghost")).toDF("sk", "name")
    assert(Joins.bloomPrefilterJoin(big, "bk", smallMiss, "sk").count() == 0)
  }

  test("bloomPrefilterJoin: empty small side yields an empty result, not a crash") {
    val big = Seq((1L, "a")).toDF("bk", "payload")
    val small = Seq.empty[(Long, String)].toDF("sk", "name")
    assert(Joins.bloomPrefilterJoin(big, "bk", small, "sk").count() == 0)
  }

  test("relationalDivision: only full-bundle customers qualify; partial coverage reported") {
    val orders = Seq((10L, 1L), (11L, 1L), (20L, 2L), (30L, 3L))
      .toDF("o_orderkey", "o_custkey")
    // cust 1 covers parts 7 and 8 across two orders; cust 2 covers 7
    // twice (distinct = 1); cust 3 touches nothing in the bundle
    val li = Seq((10L, 7L), (11L, 8L), (20L, 7L), (20L, 7L), (30L, 99L))
      .toDF("l_orderkey", "l_partkey")
    val bundle = Seq(7L, 8L).toDF("p")
    val got = Joins.relationalDivision(orders, li, bundle, "p")
      .select("o_custkey", "n_covered", "qualifies")
      .as[(Long, Long, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 2L, true), (2L, 1L, false)), s"quotient: $got")
  }

  test("spatialGridJoin equals the brute-force containment join; boundary points inclusive") {
    import org.apache.spark.sql.functions._
    // points on cell boundaries and rect edges; rect B spans 3x2 cells
    val pts = Seq((1L, 0.0, 0.0), (2L, 100.0, 50.0), (3L, 250.0, 149.9),
      (4L, 80.0, 150.0), (5L, 300.0, 10.0), (6L, 99.99, 99.99))
      .toDF("pid", "x", "y")
    val rects = Seq((10L, 0.0, 0.0, 80.0, 150.0), (20L, 50.0, 40.0, 299.0, 149.9))
      .toDF("rect_id", "x0", "y0", "x1", "y1")
    val got = Joins.spatialGridJoin(pts, "pid", "x", "y", rects, "rect_id",
        cellSize = 100.0)
      .select("pid", "rect_id").as[(Long, Long)].collect().toSeq.sorted
    // brute force replay
    val p = pts.as[(Long, Double, Double)].collect()
    val r = rects.as[(Long, Double, Double, Double, Double)].collect()
    val exp = (for ((pid, x, y) <- p; (rid, x0, y0, x1, y1) <- r
      if x >= x0 && x <= x1 && y >= y0 && y <= y1) yield (pid, rid))
      .toSeq.sorted
    assert(got == exp, s"grid join: $got vs brute $exp")
    // sanity: the boundary point (80, 150) is inside rect 10 (inclusive)
    assert(got.contains((4L, 10L)), s"inclusive bounds: $got")
    // each pair appears exactly once (a point lives in ONE cell)
    assert(got.distinct == got, "no duplicate pairs")
    // the cell-cover fan-out guard: a rect huge relative to cellSize
    // must fail with an actionable message BEFORE the explode builds
    val ex = intercept[IllegalArgumentException] {
      Joins.spatialGridJoin(pts, "pid", "x", "y", rects, "rect_id",
        cellSize = 0.01, maxCellsPerRect = 1000L)
    }
    assert(ex.getMessage.contains("raise cellSize"), ex.getMessage)
  }

  test("spatialOverlapJoin equals the brute-force separating-axis join; each pair exactly once") {
    // A1 spans 3x3 cells; B10 touches A1 only at the single corner
    // point (250,250) — inclusive bounds must count it; B12 is
    // disjoint from everything; B11 is strictly inside A1
    val ra = Seq((1L, 0.0, 0.0, 250.0, 250.0), (2L, 500.0, 500.0, 600.0, 520.0))
      .toDF("a_id", "x0", "y0", "x1", "y1")
    val rb = Seq((10L, 250.0, 250.0, 300.0, 300.0),
      (11L, 100.0, 90.0, 120.0, 110.0), (12L, 601.0, 500.0, 700.0, 505.0),
      (13L, 0.0, 480.0, 990.0, 530.0)) // wide strip crossing A2 in many cells
      .toDF("b_id", "x0", "y0", "x1", "y1")
    val got = Joins.spatialOverlapJoin(ra, "a_id", rb, "b_id", cellSize = 100.0)
      .as[(Long, Long)].collect().toSeq.sorted
    val a = ra.as[(Long, Double, Double, Double, Double)].collect()
    val b = rb.as[(Long, Double, Double, Double, Double)].collect()
    val exp = (for ((ai, ax0, ay0, ax1, ay1) <- a; (bi, bx0, by0, bx1, by1) <- b
      if ax0 <= bx1 && bx0 <= ax1 && ay0 <= by1 && by0 <= ay1)
      yield (ai, bi)).toSeq.sorted
    assert(got == exp, s"overlap join: $got vs brute $exp")
    assert(got.contains((1L, 10L)), "corner-touch must count (inclusive bounds)")
    assert(got.contains((2L, 13L)), "multi-cell shared cover must emit once")
    assert(got.distinct == got, "single-cell acceptance must prevent duplicates")
  }

  test("spatialKnnJoin: 3x3 ring finds every neighbor within radius; rank/tie-break/radius-cut exact") {
    // points on a lattice around the query, including two exact ties
    // and one point at exactly the radius (inclusive)
    val pts = Seq((1L, 10.0, 0.0), (2L, -10.0, 0.0), (3L, 0.0, 25.0),
      (4L, 60.0, 0.0), (5L, 0.0, -61.0), (6L, 59.0, 59.0), (7L, 3.0, 4.0))
      .toDF("pid", "x", "y")
    val qs = Seq((100L, 0.0, 0.0)).toDF("qid", "qx", "qy")
    val got = Joins.spatialKnnJoin(pts, "pid", "x", "y", qs, "qid", "qx", "qy",
        k = 4, radius = 60.0)
      .select("qid", "rnk", "pid", "dist")
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._2)
    // dists: p7=5, p1=10, p2=10 (tie broken by pid), p3=25, p4=60
    // (exactly radius, inclusive — but rank 5 > k), p5=61 out,
    // p6=sqrt(2)*59>60 out (the corner the residual must prune)
    assert(got == Seq((100L, 1L, 7L, 5.0), (100L, 2L, 1L, 10.0),
      (100L, 3L, 2L, 10.0), (100L, 4L, 3L, 25.0)), s"knn: $got")
    // k above the neighbor count: the radius cut governs; p4 at
    // exactly the radius is IN, p5/p6 stay out
    val all = Joins.spatialKnnJoin(pts, "pid", "x", "y", qs, "qid", "qx", "qy",
        k = 10, radius = 60.0)
      .select("pid").as[Long].collect().toSeq.sorted
    assert(all == Seq(1L, 2L, 3L, 4L, 7L), s"radius cut: $all")
  }
}
