package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pageRank: 2-node cycle converges to equal ranks summing to 1") {
    val edges = Seq(("a", "b", 1.0), ("b", "a", 1.0)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w", iters = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr("a") - 0.5) < 1e-9)
    assert(math.abs(pr("b") - 0.5) < 1e-9)
  }

  test("pageRank: star graph ranks the hub above the leaves; mass conserved") {
    // 4 leaves all pointing at the hub; hub is dangling (its mass
    // redistributes uniformly), so total mass must stay 1.
    val edges = (1 to 4).map(i => (s"leaf$i", "hub", 1.0)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w", iters = 20)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("hub") > pr("leaf1"))
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
    (2 to 4).foreach(i => assert(math.abs(pr(s"leaf$i") - pr("leaf1")) < 1e-9))
  }

  test("pageRank: edge weights steer rank (heavier edge -> higher rank)") {
    // c splits its vote 3:1 between a and b; a and b both return to c.
    val edges = Seq(
      ("c", "a", 3.0), ("c", "b", 1.0),
      ("a", "c", 1.0), ("b", "c", 1.0)).toDF("src", "dst", "w")
    val pr = Graph.pageRank(edges, "src", "dst", "w", iters = 30)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr("a") > pr("b"))
    assert(math.abs(pr.values.sum - 1.0) < 1e-6)
  }

  test("personalizedPageRank: hand-computed 2 rounds; unreachable non-seed stays 0; absent seeds excluded") {
    // a→b, c→a; seeds {a}. r1: a=0.15, b=0.85, c=0.
    // r2: dang=pr(b)=0.85 restarts into a → a=0.15+0.85·0.85=0.8725,
    // b=0.85·0.15=0.1275, c unreachable from the seed stays 0.
    val edges = Seq(("a", "b", 1.0), ("c", "a", 1.0)).toDF("src", "dst", "w")
    val seeds = Seq("a").toDF("node")
    val pr = Graph.personalizedPageRank(edges, "src", "dst", "w", seeds, iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(math.abs(pr("a") - 0.8725) < 1e-9, s"got $pr")
    assert(math.abs(pr("b") - 0.1275) < 1e-9, s"got $pr")
    assert(pr("c") == 0.0, s"got $pr")
    assert(math.abs(pr.values.sum - 1.0) < 1e-9)
    // a seed absent from the graph must not leak restart mass: the
    // normalization runs over the seed ∩ node intersection
    val pr2 = Graph.personalizedPageRank(edges, "src", "dst", "w",
        Seq("a", "zzz").toDF("node"), iters = 2)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(pr2 == pr, s"absent seed changed the ranks: $pr2 vs $pr")
  }

  test("randomWalks: hops follow edges, walks terminate at dangling nodes, deterministic") {
    // a→b only; b dangling. Every walk from a must be a,b (stop); from
    // b just b. Deterministic: two runs identical.
    val line = Seq(("a", "b", 1.0)).toDF("src", "dst", "w")
    val got = Graph.randomWalks(line, "src", "dst", "w", walksPerNode = 2, length = 3)
      .orderBy("walk_id", "step")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(got == Seq(
      ("a#1", 0L, "a"), ("a#1", 1L, "b"), ("a#2", 0L, "a"), ("a#2", 1L, "b"),
      ("b#1", 0L, "b"), ("b#2", 0L, "b")), s"got $got")
    // weighted pick: c→x (w=3), c→y (w=1); every hop lands on x or y
    // and the empirical mix over many walks leans to the heavy edge
    val fork = Seq(("c", "x", 3.0), ("c", "y", 1.0)).toDF("src", "dst", "w")
    val hops = Graph.randomWalks(fork, "src", "dst", "w", walksPerNode = 40, length = 1)
      .where(col("step") === 1 && col("walk_id").startsWith("c#"))
      .collect().map(_.getString(2)).toSeq
    assert(hops.length == 40 && hops.forall(Set("x", "y")), s"got $hops")
    assert(hops.count(_ == "x") > hops.count(_ == "y"),
      s"3:1 edge weights must favor x: ${hops.count(_ == "x")} vs ${hops.count(_ == "y")}")
    val again = Graph.randomWalks(fork, "src", "dst", "w", walksPerNode = 40, length = 1)
      .where(col("step") === 1 && col("walk_id").startsWith("c#"))
      .collect().map(_.getString(2)).toSeq
    assert(again == hops, "walks must be deterministic")
  }

  test("alsUserStep: closed-form solve matches an independent md5+normal-equations recompute") {
    def md5mod(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 1000L
    }
    val ratings = Seq(("u1", "alpha", 3L), ("u1", "beta", 2L), ("u2", "beta", 5L))
      .toDF("user", "item", "r")
    val got = Graph.alsUserStep(ratings, "user", "item", "r")
      .orderBy("user")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    def solve(items: Seq[(String, Long)]): (Double, Double) = {
      val ys = items.map { case (i, r) => (md5mod(i + ":1"), md5mod(i + ":2"), r) }
      val a = ys.map(t => t._1 * t._1).sum.toDouble / 1e6 + 0.1
      val b = ys.map(t => t._1 * t._2).sum.toDouble / 1e6
      val c = ys.map(t => t._2 * t._2).sum.toDouble / 1e6 + 0.1
      val d1 = ys.map(t => t._3 * t._1).sum.toDouble / 1e3
      val d2 = ys.map(t => t._3 * t._2).sum.toDouble / 1e3
      val det = a * c - b * b
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      (r6((c * d1 - b * d2) / det), r6((a * d2 - b * d1) / det))
    }
    val (x1a, x2a) = solve(Seq(("alpha", 3L), ("beta", 2L)))
    val (x1b, x2b) = solve(Seq(("beta", 5L)))
    assert(got.toSeq == Seq(("u1", 2L, x1a, x2a), ("u2", 1L, x1b, x2b)),
      s"got ${got.toSeq}, want ${Seq(("u1", 2L, x1a, x2a), ("u2", 1L, x1b, x2b))}")
    // the solve must satisfy the regularized normal equations:
    // (YᵀY+λI)x ≈ Yᵀr for u1 (residual at rounding precision)
    val ys = Seq("alpha", "beta").map(i => (md5mod(i + ":1") / 1e3, md5mod(i + ":2") / 1e3))
    val rs = Seq(3.0, 2.0)
    val lhs1 = (ys.map(y => y._1 * y._1).sum + 0.1) * x1a + ys.map(y => y._1 * y._2).sum * x2a
    val rhs1 = ys.zip(rs).map { case (y, r) => y._1 * r }.sum
    assert(math.abs(lhs1 - rhs1) < 1e-4, s"normal equations violated: $lhs1 vs $rhs1")
  }

  test("hits: star graph — leaves are pure hubs, the center the pure authority") {
    val edges = (1 to 4).map(i => (s"leaf$i", "hub", 1.0)).toDF("src", "dst", "w")
    val got = Graph.hits(edges, "src", "dst", "w", iters = 10)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val (hubAuth, hubHub) = got("hub")
    assert(math.abs(hubAuth - 1.0) < 1e-6 && math.abs(hubHub) < 1e-9)
    (1 to 4).foreach { i =>
      val (a, h) = got(s"leaf$i")
      assert(math.abs(a) < 1e-9 && math.abs(h - 0.25) < 1e-6)
    }
  }

  test("hits: heavier-weighted destination earns more authority") {
    val edges = Seq(("s", "a", 3.0), ("s", "b", 1.0)).toDF("src", "dst", "w")
    val got = Graph.hits(edges, "src", "dst", "w", iters = 5)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(got("a") > got("b"))
  }

  test("labelPropagation: two triangles joined by a weak bridge split into their min-label communities") {
    val edges = Seq(
      ("a", "b", 10.0), ("b", "c", 10.0), ("a", "c", 10.0),
      ("d", "e", 10.0), ("e", "f", 10.0), ("d", "f", 10.0),
      ("c", "d", 1.0)).toDF("src", "dst", "w")
    val got = Graph.labelPropagation(edges, "src", "dst", "w", iters = 5)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(got == Map("a" -> "a", "b" -> "a", "c" -> "a",
                      "d" -> "d", "e" -> "d", "f" -> "d"),
      s"triangles must keep their own min labels across the weak bridge, got $got")
  }

  test("shortestPaths: relaxes multi-hop paths and prefers the cheaper route") {
    // s->a->t costs 1+1=2, s->t direct costs 5; b is unreachable from s.
    val edges = Seq(
      ("s", "a", 1.0), ("a", "t", 1.0), ("s", "t", 5.0),
      ("b", "s", 1.0)).toDF("src", "dst", "len")
    val got = Graph.shortestPaths(edges, "src", "dst", "len", lit("s"), iters = 4)
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(got("s").contains(0.0))
    assert(got("a").contains(1.0))
    assert(got("t").contains(2.0), s"multi-hop must beat the direct edge, got ${got("t")}")
    assert(got("b").isEmpty, "unreachable node must stay NULL (infinity)")
  }

  test("shortestPaths: iters bounds hop count — a path longer than iters stays unrelaxed") {
    val chain = Seq(("n0", "n1", 1.0), ("n1", "n2", 1.0), ("n2", "n3", 1.0))
      .toDF("src", "dst", "len")
    val short = Graph.shortestPaths(chain, "src", "dst", "len", lit("n0"), iters = 2)
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(short("n2").contains(2.0) && short("n3").isEmpty)
    val full = Graph.shortestPaths(chain, "src", "dst", "len", lit("n0"), iters = 3)
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(full("n3").contains(3.0))
  }

  test("triangleCount: counts per node; direction, duplicates, and self-loops ignored") {
    // triangle a-b-c plus a pendant d off a; edge a->b also appears
    // reversed and duplicated, a has a self-loop — none may change counts
    val edges = Seq(
      ("a", "b"), ("b", "a"), ("a", "b"),
      ("b", "c"), ("c", "a"), ("a", "d"), ("a", "a")).toDF("src", "dst")
    val got = Graph.triangleCount(edges, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 1L, "b" -> 1L, "c" -> 1L, "d" -> 0L), s"got $got")
  }

  test("triangleCount: K4 gives every node C(3,2)=3 triangles; hub-and-spoke gives zero") {
    val k4 = (for {
      Seq(u, v) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (u, v)).toDF("src", "dst")
    val gotK4 = Graph.triangleCount(k4, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotK4.values.toSet == Set(3L), s"K4 must give 3 per node, got $gotK4")
    // star: the hub's neighbors never interconnect — no triangles anywhere
    val star = (1 to 5).map(i => ("hub", s"leaf$i")).toDF("src", "dst")
    val gotStar = Graph.triangleCount(star, "src", "dst")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotStar.values.forall(_ == 0L), s"star has no triangles, got $gotStar")
  }

  test("labelPropagation: sync schedule is deterministic, including the known pair oscillation") {
    // a lone pair swaps labels every sync round (the documented
    // GraphX-LPA bipartite oscillation) — the point is that the
    // schedule is a pure function of the round count, which is what
    // lets a SQL oracle replay it
    val edges = Seq(("x", "y", 2.0)).toDF("src", "dst", "w")
    val odd = Graph.labelPropagation(edges, "src", "dst", "w", iters = 3)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(odd == Map("x" -> "y", "y" -> "x"))
    val even = Graph.labelPropagation(edges, "src", "dst", "w", iters = 4)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(even == Map("x" -> "x", "y" -> "y"))
  }

  test("kCore: 2-core peels pendant chain transitively; K4 core survives with degree 3") {
    // K4 on a..d, plus a chain d-e-f: e and f have degree ≤ 2 only
    // through each other — a 2-core peel must cascade f, then e
    val k4 = (for {
      Seq(u, v) <- Seq("a", "b", "c", "d").combinations(2).toSeq
    } yield (u, v)) ++ Seq(("d", "e"), ("e", "f"))
    val got = Graph.kCore(k4.toDF("src", "dst"), "src", "dst", k = 2, iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("a" -> 3L, "b" -> 3L, "c" -> 3L, "d" -> 3L), s"got $got")
  }

  test("kCore: direction, duplicate edges, and self-loops are ignored; k above max degree empties") {
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "b"), ("a", "a"), ("b", "c"))
      .toDF("src", "dst")
    val one = Graph.kCore(edges, "src", "dst", k = 1, iters = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // dup/reverse edges collapse to one undirected edge; self-loop gone
    assert(one == Map("a" -> 1L, "b" -> 2L, "c" -> 1L), s"got $one")
    assert(Graph.kCore(edges, "src", "dst", k = 3, iters = 2).count() == 0L)
  }

  test("associationRules: hand-computed support/confidence/lift with canonical a<b pairs") {
    // baskets: {a,b}, {a,b}, {a,c} → n_total=3; n_a=3, n_b=2, n_c=1
    val rel = Seq(("a", 1), ("b", 1), ("a", 2), ("b", 2), ("a", 3), ("c", 3))
      .toDF("item", "c")
    val got = Graph.associationRules(rel, "item", "c", k = 10, minSupport = 1)
      .select("item_a", "item_b", "n_both", "conf_a_to_b", "conf_b_to_a", "lift")
      .as[(String, String, Long, Double, Double, Double)].collect().toSeq
    // both pairs lift exactly 1.0 (independence on this fixture);
    // tie order → (a,b) before (a,c)
    assert(got == Seq(
      ("a", "b", 2L, 0.666667, 1.0, 1.0),
      ("a", "c", 1L, 0.333333, 1.0, 1.0)), s"got $got")
  }

  test("absorptionProbability: target pinned to 1, hops gated by iters, dangling stays 0") {
    val chain = Seq(("a", "b", 1.0), ("b", "t", 1.0)).toDF("src", "dst", "w")
    def p(iters: Int) = Graph.absorptionProbability(chain, "src", "dst", "w",
        lit("t"), iters).collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val one = p(1)
    assert(one("t") == 1.0 && one("b") == 1.0 && one("a") == 0.0, s"got $one")
    assert(p(2)("a") == 1.0)
    // branch: a splits 50/50 between t and a dangling x → p(a) = 0.5
    val branch = Seq(("a", "t", 1.0), ("a", "x", 1.0)).toDF("src", "dst", "w")
    val b = Graph.absorptionProbability(branch, "src", "dst", "w", lit("t"), 3)
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(b("a") == 0.5 && b("x") == 0.0, s"got $b")
  }

  test("adamicAdar: hand-computed inverse-log weights, size-1 and oversize containers cut, a<b canonical") {
    // container A = {1,2} (deg 2), B = {1,2,3} (deg 3), C = {4} (deg 1
    // → cut), D = 300 items incl. 1 and 2 (deg 300 > 200 → df-cut)
    val rel = (Seq((1L, "A"), (2L, "A"), (1L, "B"), (2L, "B"), (3L, "B"),
        (4L, "C")) ++ (1L to 300L).map(i => (i, "D")))
      .toDF("item", "c")
    val got = Graph.adamicAdar(rel, "item", "c", k = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    val w2 = math.rint(1.0 / math.log(2.0) * 1e9).toLong
    val w3 = math.rint(1.0 / math.log(3.0) * 1e9).toLong
    def sc(ws: Seq[Long]): Double =
      BigDecimal(ws.sum / 1e9).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // pair (1,2): containers A and B; (1,3) and (2,3): B only. The
    // size-300 container would have tied every pair upward — its
    // absence IS the df-cut assertion
    assert(got == Seq(
      (1L, 2L, 2L, sc(Seq(w2, w3))),
      (1L, 3L, 1L, sc(Seq(w3))),
      (2L, 3L, 1L, sc(Seq(w3)))), s"got $got (w2=$w2 w3=$w3)")
  }

  test("neighborhoodJaccard: hand-computed overlap; degrees on the df-cut relation") {
    // same fixture as adamicAdar: A = {1,2}, B = {1,2,3}, C = {4}
    // (size 1 → cut), D = 300 items (df-cut). On the cut relation
    // N(1) = N(2) = {A,B}, N(3) = {B}: J(1,2) = 2/2, J(1,3) =
    // J(2,3) = 1/2. Had degrees used the UNCUT relation, D would
    // have inflated every denominator — this fixture is the
    // self-consistency assertion.
    val rel = (Seq((1L, "A"), (2L, "A"), (1L, "B"), (2L, "B"), (3L, "B"),
        (4L, "C")) ++ (1L to 300L).map(i => (i, "D")))
      .toDF("item", "c")
    val got = Graph.neighborhoodJaccard(rel, "item", "c", k = 10)
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1.0),
      (1L, 3L, 1L, 0.5),
      (2L, 3L, 1L, 0.5)), s"got $got")
  }

  test("markovRemovalAttribution: removing the load-bearing channel kills its paths, no renormalization") {
    // A → P always; B → P or C 50/50 (C is a dead end). Starts split
    // A/B evenly → conv_full = 0.5·1 + 0.5·0.5 = 0.75.
    // Remove A: only B's direct half survives → 0.25, effect 2/3.
    // Remove C: B's P-edge keeps p = 0.5 (NOT renormalized to 1) →
    // conv unchanged, effect 0 — the no-renormalization assertion.
    val edges = Seq(("A", "P", 1.0), ("B", "P", 1.0), ("B", "C", 1.0))
      .toDF("src", "dst", "w")
    val starts = Seq(("A", 1L), ("B", 1L)).toDF("node", "n_start")
    val got = Graph.markovRemovalAttribution(edges, starts,
        "src", "dst", "w", "node", "n_start",
        target = "P", channels = Seq("A", "C"), iters = 3)
      .orderBy("channel")
      .as[(String, Double, Double, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("A", 0.75, 0.25, 0.666667, 1.0),
      ("C", 0.75, 0.75, 0.0, 0.0)), s"got $got")
  }

  test("modularity: two clean triangles score Q=0.357142; one-blob partition scores 0") {
    // triangles a-b-c and d-e-f, bridge c-d, unit weights. Perfect
    // partition: 2m=14, per triangle Σ_in=6, Σ_tot=7 →
    // contribution 6/14 − (7/14)² = 0.178571 each, Q = 0.357142
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"),
      ("d", "e"), ("e", "f"), ("d", "f"), ("c", "d"))
      .map { case (s0, d0) => (s0, d0, 1L) }.toDF("src", "dst", "w")
    val good = Seq(("a", "X"), ("b", "X"), ("c", "X"),
      ("d", "Y"), ("e", "Y"), ("f", "Y")).toDF("node", "community")
    val got = Graph.modularity(edges, "src", "dst", "w", good, "node", "community")
      .orderBy("community")
      .as[(String, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      ("X", 3L, 6L, 7L, 0.178571, 0.357142),
      ("Y", 3L, 6L, 7L, 0.178571, 0.357142)), s"got $got")
    // degenerate one-community partition: Q must be exactly 0
    val blob = good.select(col("node"), lit("Z").as("community"))
    val q0 = Graph.modularity(edges, "src", "dst", "w", blob, "node", "community")
      .select("q_modularity").as[Double].head()
    assert(q0 == 0.0, s"one blob must score 0, got $q0")
  }

  test("degreeDistribution: exact histogram under dup/reversed/self edges; single-bin nulls the fit") {
    // triangle a-b-c plus pendant d on c: degrees 2,2,3,1 →
    // hist {1→1, 2→2, 3→1}; noise rows must not change it
    val edges = Seq(("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"),
      ("b", "a"), ("a", "b"), ("d", "d")).toDF("src", "dst")
    val got = Graph.degreeDistribution(edges, "src", "dst")
      .orderBy("degree")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 1L), (2L, 2L), (3L, 1L)),
      s"got $got")
    assert(got.forall(_._3.isDefined), "3-bin histogram must fit a slope")
    // one edge → every node degree 1 → single bin → dx = 0 → null fit
    val k2 = Graph.degreeDistribution(Seq(("x", "y")).toDF("src", "dst"),
        "src", "dst")
      .as[(Long, Long, Option[Double], Option[Double])].collect().toSeq
    assert(k2 == Seq((1L, 2L, None, None)), s"got $k2")
  }

  test("multi-source SSSP + closeness: hand graph, unreachable sources excluded, harmonic graceful") {
    // a -1-> b -2-> c; sources {a, c}: from a dists (0,1,3); from c
    // only c itself (no out-edges) — b and a unreached
    val e = Seq(("a", "b", 1.0), ("b", "c", 2.0)).toDF("src", "dst", "len")
    val dist = Graph.multiSourceShortestPaths(e, "src", "dst", "len",
      Seq("a", "c"), iters = 3)
    val got = Graph.closenessFromDistances(dist).orderBy("node")
      .select("node", "n_reached", "sum_dist", "closeness", "harmonic")
      .as[(String, Long, Double, Option[Double], Double)].collect().toSeq
    assert(got == Seq(
      ("a", 1L, 0.0, None, 0.0),            // only its own 0-distance
      ("b", 1L, 1.0, Some(1.0), 1.0),       // reached by a only
      ("c", 2L, 3.0, Some(0.666667), 0.333333)), // 2/(0+3); 1/3
      s"hand-computed closeness mismatch: $got")
  }

  test("walkPmi: hand-computed skip-gram pairs and PMI over one walk") {
    // walk x->y->z->x, window 1: 6 directed adjacent pairs, every
    // marginal 2, every co-count 1 -> PMI = ln(6/4) for all
    val w = Seq(
      ("w1", 0L, "x"), ("w1", 1L, "y"), ("w1", 2L, "z"), ("w1", 3L, "x")
    ).toDF("walk_id", "step", "node")
    val got = Graph.walkPmi(w, window = 1, k = 10)
      .orderBy("rnk")
      .select("node", "context", "c_nc", "pmi")
      .as[(String, String, Long, Double)].collect().toSeq
    val p = 0.405465 // round(ln(1.5), 6)
    assert(got == Seq(
      ("x", "y", 1L, p), ("x", "z", 1L, p), ("y", "x", 1L, p),
      ("y", "z", 1L, p), ("z", "x", 1L, p), ("z", "y", 1L, p)),
      s"hand-computed walk PMI mismatch: $got")
  }

  test("greedyMatching: valid conflict-free pairs; maximal on the fixture graph") {
    // propose-accept with per-round md5 roles: verify STRUCTURE, not
    // one hand round (roles are hash-drawn) — validity is the contract
    val e = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("b", "e"))
      .toDF("src", "dst")
    val got = Graph.greedyMatching(e, "src", "dst", rounds = 8)
      .select("node_a", "node_b").as[(String, String)].collect().toSeq
    val gn = got.flatMap(p => Seq(p._1, p._2))
    assert(gn.distinct.size == gn.size, "a node matched twice")
    val gset = gn.toSet
    val openSmall = Seq(("a","b"),("b","c"),("c","d"),("b","e"))
      .count(p => !gset.contains(p._1) && !gset.contains(p._2))
    assert(openSmall == 0, "small graph must reach a maximal matching")
    // validity on the fixture graph: no node matched twice, and the
    // matching is MAXIMAL (no remaining edge joins two unmatched)
    val le = spark.read.parquet(s"$sf001/lineitem.parquet")
      .selectExpr("concat('s', l_suppkey) AS src", "concat('p', l_partkey) AS dst")
    val m = Graph.greedyMatching(le, "src", "dst", rounds = 8)
      .select("node_a", "node_b").as[(String, String)].collect().toSeq
    val nodes = m.flatMap(p => Seq(p._1, p._2))
    assert(nodes.distinct.size == nodes.size, "a node matched twice")
    val matchedSet = nodes.toSet
    val open = le.as[(String, String)].collect()
      .count(p => !matchedSet.contains(p._1) && !matchedSet.contains(p._2))
    assert(open == 0, s"$open edges still join two unmatched nodes (not maximal)")
  }

  test("greedyMatchingWeighted: valid matching, prefers heavy edges, beats half the optimum") {
    // path a-b-c with w(a,b)=10, w(b,c)=1: the weighted matcher must
    // take the heavy edge (greedy local-max), never strand it
    val p = Seq(("a", "b", 10L), ("b", "c", 1L)).toDF("src", "dst", "w")
    val m1 = Graph.greedyMatchingWeighted(p, "src", "dst", "w", rounds = 8)
      .select("node_a", "node_b", "w").as[(String, String, Long)].collect().toSeq
    assert(m1.map(_._3).sum == 10L, s"must match the heavy edge: $m1")
    // supplier–part graph with count weights: matching is valid (no
    // node twice), maximal (no open edge), deterministic across
    // partitionings, and total weight >= 1/2 a per-node upper bound
    val le = spark.read.parquet(s"$sf001/lineitem.parquet")
      .groupBy(concat(lit("s"), col("l_suppkey")).as("src"),
               concat(lit("p"), col("l_partkey")).as("dst"))
      .agg(count(lit(1)).as("w"))
    val m = Graph.greedyMatchingWeighted(le, "src", "dst", "w", rounds = 8)
      .select("node_a", "node_b", "w").as[(String, String, Long)].collect().toSeq
    val nodes = m.flatMap(x => Seq(x._1, x._2))
    assert(nodes.distinct.size == nodes.size, "a node matched twice")
    val matchedSet = nodes.toSet
    val edges = le.as[(String, String, Long)].collect()
    val open = edges.count(e =>
      !matchedSet.contains(e._1) && !matchedSet.contains(e._2))
    assert(open == 0, s"$open edges still join two unmatched nodes (not maximal)")
    // 1/2-approx witness: any concrete matching lower-bounds OPT, and
    // the algorithm guarantees total >= OPT/2 — so total*2 must beat
    // the SEQUENTIAL greedy-by-weight matching's total
    val free = scala.collection.mutable.Set.empty[String]
    var wGreedy = 0L
    edges.sortBy(e => (-e._3, e._1, e._2)).foreach { e =>
      if (!free.contains(e._1) && !free.contains(e._2)) {
        free += e._1; free += e._2; wGreedy += e._3
      }
    }
    assert(m.map(_._3).sum * 2 >= wGreedy,
      s"total weight ${m.map(_._3).sum} below half the greedy witness $wGreedy")
    val again = Graph.greedyMatchingWeighted(le.repartition(7), "src", "dst", "w",
        rounds = 8)
      .select("node_a", "node_b", "w").as[(String, String, Long)].collect().toSeq
    assert(again.sortBy(_._1) == m.sortBy(_._1), "partitioning changed the matching")
    intercept[IllegalArgumentException] {
      Graph.greedyMatchingWeighted(p, "src", "dst", "w", rounds = 0)
    }
  }

  test("neighborhoodFunction: tiny-graph balls exact (HLL sparse mode), monotone in hops") {
    // path a-b-c-d, 2-hop balls: |B(a)|=3, |B(b)|=4, |B(c)|=4,
    // |B(d)|=3 — at these cardinalities HLL is exact, so the
    // estimates are the true counts
    val p = Seq(("a", "b"), ("b", "c"), ("c", "d")).toDF("src", "dst")
    val got = Graph.neighborhoodFunction(p, "src", "dst", hops = 2)
      .select(col("node"), round(col("n_ball_approx")).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(got == Map("a" -> 3L, "b" -> 4L, "c" -> 4L, "d" -> 3L), s"got $got")
    // 1-hop is the degree+1 ball; ball sizes are monotone in hops
    val h1 = Graph.neighborhoodFunction(p, "src", "dst", hops = 1)
      .select(col("node"), round(col("n_ball_approx")).cast("long").as("n"))
      .as[(String, Long)].collect().toMap
    assert(h1 == Map("a" -> 2L, "b" -> 3L, "c" -> 3L, "d" -> 2L), s"got $h1")
    assert(got.forall { case (k, v) => v >= h1(k) })
    intercept[IllegalArgumentException] {
      Graph.neighborhoodFunction(p, "src", "dst", hops = 0)
    }
  }

  test("ANF profile: served estimates identical to a fresh run; ensure never re-runs the rounds") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_anf_${System.nanoTime()}"
    val p = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("a", "e"))
      .toDF("src", "dst")
    Graph.ensureAnfProfile(p, "src", "dst", path, hops = 2)
    // deterministic sketches: the served table IS a fresh run's output
    val served = Graph.anfFromProfile(spark, path)
      .as[(String, Double)].collect().toMap
    val direct = Graph.neighborhoodFunction(p, "src", "dst", hops = 2)
      .as[(String, Double)].collect().toMap
    assert(served == direct, s"served $served diverges from direct $direct")
    // build-once proof: edges is by-name — with the marker present, a
    // poisoned source plan must never be evaluated
    Graph.ensureAnfProfile(
      sys.error("ensureAnfProfile re-ran the rounds"): org.apache.spark.sql.DataFrame,
      "src", "dst", path, hops = 2)
    // a marker-less (crashed) profile refuses to serve
    intercept[IllegalArgumentException] {
      Graph.anfFromProfile(spark, s"${path}_nonexistent")
    }
  }

  test("basket graph: served consumers match direct operators; ensure never re-runs the explode") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_basket_${System.nanoTime()}"
    val rel = spark.read.parquet(s"$sf001/lineitem.parquet")
    Graph.ensureBasketGraph(rel, "l_partkey", "l_orderkey", path)
    // byte-for-byte result parity: every served consumer must equal
    // its direct operator (same exact integers, same rounding)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).toSeq
    assert(rows(Graph.adamicAdarFromGraph(spark, path, k = 20)) ==
      rows(Graph.adamicAdar(rel, "l_partkey", "l_orderkey", k = 20)))
    assert(rows(Graph.neighborhoodJaccardFromGraph(spark, path, k = 20)) ==
      rows(Graph.neighborhoodJaccard(rel, "l_partkey", "l_orderkey", k = 20)))
    assert(rows(Graph.associationRulesFromGraph(spark, path, k = 20, minSupport = 2)) ==
      rows(Graph.associationRules(rel, "l_partkey", "l_orderkey", k = 20,
        minSupport = 2)))
    // preferential attachment: exact cut-degree products, and the
    // score is the degree product row by row
    val pa = Graph.preferentialAttachmentFromGraph(spark, path, k = 20)
      .select("n_a", "n_b", "pa_score")
      .as[(Long, Long, Long)].collect().toSeq
    assert(pa.nonEmpty && pa.forall(r => r._3 == r._1 * r._2),
      s"pa_score must be the exact degree product: ${pa.take(3)}")
    assert(pa.map(_._3) == pa.map(_._3).sorted.reverse,
      "top-k must be pa_score-descending")
    // the pair edges are the distinct df-cut co-occurrence pairs
    val e = rel.selectExpr("l_partkey AS item", "l_orderkey AS c").distinct()
    val ok = e.groupBy("c").agg(count(lit(1)).as("deg"))
      .where(col("deg") >= 2 && col("deg") <= 200).select("c")
    val p = e.join(ok, Seq("c"))
    val direct = p.as("a").join(p.as("b"),
        col("a.c") === col("b.c") && col("a.item") < col("b.item"))
      .select(col("a.item").as("src"), col("b.item").as("dst")).distinct()
      .as[(Long, Long)].collect().toSet
    val served = Graph.basketPairEdges(spark, path)
      .as[(Long, Long)].collect().toSet
    assert(served == direct, "materialized pair edges diverge from the direct explode")
    // build-once proof: rel is by-name — with the commit marker
    // present, a poisoned source plan must never be evaluated
    Graph.ensureBasketGraph(
      sys.error("ensureBasketGraph re-evaluated the source"): org.apache.spark.sql.DataFrame,
      "l_partkey", "l_orderkey", path)
    // a marker-less (crashed) graph refuses to serve
    val bad = s"${path}_nonexistent"
    intercept[IllegalArgumentException] {
      Graph.adamicAdarFromGraph(spark, bad)
    }
  }

  test("appendBasketDelta: merge equals rebuild; untouched buckets byte-identical") {
    val rel = spark.read.parquet(s"$sf001/lineitem.parquet")
    val tmp = System.getProperty("java.io.tmpdir")
    val up = s"$tmp/graft_spec_basket_up_${System.nanoTime()}"
    val full = s"$tmp/graft_spec_basket_full_${System.nanoTime()}"
    // half/half split on the CONTAINER key (whole containers — the
    // additive contract), then upsert must reproduce the full build
    Graph.writeBasketGraph(rel.where(col("l_orderkey") % 2 === 0),
      "l_partkey", "l_orderkey", up)
    Graph.appendBasketDelta(rel.where(col("l_orderkey") % 2 === 1),
      "l_partkey", "l_orderkey", up)
    Graph.writeBasketGraph(rel, "l_partkey", "l_orderkey", full)
    def pairsOf(p: String) = spark.read.parquet(s"${p}_pairs")
      .select("item_a", "item_b", "n_common", "w_sum")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(pairsOf(up) == pairsOf(full), "merged pairs diverge from rebuild")
    def degOf(p: String) = spark.read.parquet(s"${p}_degrees")
      .as[(Long, Long, Long)].collect().toSet
    assert(degOf(up) == degOf(full), "merged degrees diverge from rebuild")
    def totOf(p: String) = spark.read.parquet(s"${p}_stats")
      .as[Long].collect().toSeq
    assert(totOf(up) == totOf(full), "merged container total diverges")
    // commit marker restored after the upsert
    assert(new java.io.File(s"${up}_stats/_SUCCESS").exists())
    // a one-pair delta touches ONE bucket; every other bucket's files
    // must remain byte-identical (same names, sizes, mtimes)
    def listing(p: String): Map[String, (Long, Long)] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"${p}_pairs"))
        .filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> (f.length(), f.lastModified())).toMap
    }
    val before = listing(up)
    val tinyDelta = Seq((900001L, 1L), (900002L, 1L))
      .toDF("item", "container") // one new container, one new pair
    Graph.appendBasketDelta(tinyDelta, "item", "container", up)
    val after = listing(up)
    val touched = spark.read.parquet(s"${up}_pairs")
      .where(col("item_a") === 900001L)
      .select(col("bucket").cast("long")).as[Long].collect().toSeq.distinct
    assert(touched.size == 1)
    val keptBefore = before.filterNot(_._1.contains(s"bucket=${touched.head}"))
    val keptAfter = after.filterNot(_._1.contains(s"bucket=${touched.head}"))
    assert(keptBefore == keptAfter,
      "an untouched bucket was rewritten by the delta merge")
  }

  test("assortativity: a pure star scores -1; a degree-regular graph is undefined") {
    // 5 orders, each {hub, leaf_i}: deg(hub)=5, deg(leaf)=1 → r = −1
    val star = (1L to 5L).flatMap(i => Seq((100L + i, 1L), (100L + i, 10L + i)))
      .toDF("l_orderkey", "l_partkey")
    val p1 = s"${System.getProperty("java.io.tmpdir")}/graft_spec_assort_${System.nanoTime()}"
    Graph.ensureBasketGraph(star, "l_partkey", "l_orderkey", p1)
    val r1 = Graph.assortativityFromGraph(spark, p1)
      .as[(Long, Option[Double])].head()
    assert(r1 == ((5L, Some(-1.0))), r1.toString)
    // two disjoint edges: every endpoint degree 1 → zero variance → NULL
    val reg = Seq((201L, 1L), (201L, 2L), (202L, 3L), (202L, 4L))
      .toDF("l_orderkey", "l_partkey")
    val p2 = s"${System.getProperty("java.io.tmpdir")}/graft_spec_assort2_${System.nanoTime()}"
    Graph.ensureBasketGraph(reg, "l_partkey", "l_orderkey", p2)
    val r2 = Graph.assortativityFromGraph(spark, p2)
      .as[(Long, Option[Double])].head()
    assert(r2 == ((2L, None)), s"degree-regular must be undefined, got $r2")
  }

  test("expectedAbsorptionTime: deterministic chain counts its exact distance; truncation caps it") {
    // a → b → c → T (probability-1 hops): exact distances 3, 2, 1
    val e = Seq(("a", "b", 1.0), ("b", "c", 1.0), ("c", "T", 1.0))
      .toDF("src", "dst", "w")
    val got = Graph.expectedAbsorptionTime(e, "src", "dst", "w", lit("T"),
        iters = 6)
      .as[(String, Double)].collect().toMap
    assert(got == Map("a" -> 3.0, "b" -> 2.0, "c" -> 1.0, "T" -> 0.0), got.toString)
    // a state that cannot reach the target grows with the horizon
    // (truncated expectation, never a fake finite answer)
    val loop = Seq(("x", "y", 1.0), ("y", "x", 1.0), ("c", "T", 1.0))
      .toDF("src", "dst", "w")
    val t4 = Graph.expectedAbsorptionTime(loop, "src", "dst", "w", lit("T"), 4)
      .as[(String, Double)].collect().toMap
    val t8 = Graph.expectedAbsorptionTime(loop, "src", "dst", "w", lit("T"), 8)
      .as[(String, Double)].collect().toMap
    assert(t4("x") == 4.0 && t8("x") == 8.0,
      s"unreachable state must track the horizon: ${t4("x")}/${t8("x")}")
  }

  test("simRank: shared in-neighbor scores C, disjoint ancestry scores 0, diagonal 1") {
    // x → {a, b}, y → c : I(a)=I(b)={x} ⇒ s(a,b)=C·s(x,x)=0.8 and
    // stays there; c's ancestry is disjoint ⇒ 0 against everything
    val e = Seq(("x", "a"), ("x", "b"), ("y", "c")).toDF("src", "dst")
    val got = Graph.simRank(e, "src", "dst", c = 0.8, rounds = 3)
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val nodes = Seq("a", "b", "c", "x", "y")
    nodes.foreach(n => assert(got((n, n)) == 1.0, s"diagonal $n"))
    assert(got(("a", "b")) == 0.8 && got(("b", "a")) == 0.8, got.toString)
    // every other off-diagonal pair has no similar ancestry
    for (p <- nodes; q <- nodes
         if p != q && Set(p, q) != Set("a", "b"))
      assert(got((p, q)) == 0.0, s"($p,$q) must be 0: ${got((p, q))}")
  }

  test("kTruss: the pendant edge peels, the triangle survives as a 3-truss fixed point") {
    // triangle {1,2,3} (each pair co-purchased twice) + pendant edge
    // (1,4) — k-core at k=1 keeps the star, the 3-truss must not
    val rel = Seq(
      (101L, 1L), (101L, 2L), (102L, 1L), (102L, 2L),
      (103L, 1L), (103L, 3L), (104L, 1L), (104L, 3L),
      (105L, 2L), (105L, 3L), (106L, 2L), (106L, 3L),
      (107L, 1L), (107L, 4L), (108L, 1L), (108L, 4L)
    ).toDF("l_orderkey", "l_partkey")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_truss_${System.nanoTime()}"
    Graph.ensureBasketGraph(rel, "l_partkey", "l_orderkey", path)
    val got = Graph.kTrussFromGraph(spark, path, k = 3, rounds = 3,
        minSupport = 2)
      .select("item_a", "item_b", "support")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L), (1L, 3L, 1L), (2L, 3L, 1L)),
      s"expected exactly the triangle with support 1: $got")
  }

  test("neighborSample: fanout bounds, hop-2 frontier from samples only, prefix-consistent") {
    import spark.implicits._
    // star: hub 1 touches 2..8; node 2 also touches 9 (hop-2 reach)
    val edges = ((2L to 8L).map(n => (1L, n)) :+ (2L, 9L)).toDF("src", "dst")
    val seeds = Seq(1L).toDF("seed")
    def run(fanouts: Seq[Int]) =
      Graph.neighborSample(edges, "src", "dst", seeds, "seed", fanouts)
        .select("hop", "src", "dst", "rnk").as[(Long, Long, Long, Long)]
        .collect().toSeq.sorted
    val got = run(Seq(3, 2))
    val h1 = got.filter(_._1 == 1L)
    assert(h1.size == 3 && h1.forall(_._2 == 1L) && h1.map(_._4).sorted == Seq(1L, 2L, 3L))
    // hop 2 expands ONLY the sampled hop-1 dsts
    val h2 = got.filter(_._1 == 2L)
    val f1 = h1.map(_._3).toSet
    assert(h2.nonEmpty && h2.forall(r => f1.contains(r._2)), s"$h2 vs $f1")
    assert(h2.groupBy(_._2).values.forall(_.size <= 2), "hop-2 fanout bound")
    // deterministic; a smaller fanout is a PREFIX of the larger one
    assert(run(Seq(3, 2)) == got)
    val wide = run(Seq(5, 2)).filter(r => r._1 == 1L && r._4 <= 3)
    assert(wide == h1, s"fanout-3 sample must be the fanout-5 prefix: $wide vs $h1")
  }

  test("clusteringCoefficient: K4 reads 1, a star reads 0, triangle+pendant hand value") {
    import spark.implicits._
    def run(es: Seq[(Long, Long)]) =
      Graph.clusteringCoefficient(es.toDF("src", "dst"), "src", "dst")
        .select("n_nodes", "n_edges", "n_wedges", "n_triangles",
          "clustering_coef")
        .as[(Long, Long, Long, Long, Option[Double])].head()
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    assert(run(k4) == ((4L, 6L, 12L, 4L, Some(1.0))), s"${run(k4)}")
    val star = (2L to 5L).map(n => (1L, n))
    assert(run(star) == ((5L, 4L, 6L, 0L, Some(0.0))), s"${run(star)}")
    // triangle 1-2-3 with pendant 4 on node 3: wedges = 1+1+3+0 = 5,
    // one triangle → C = 3/5
    val tp = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    assert(run(tp) == ((4L, 4L, 5L, 1L, Some(0.6))), s"${run(tp)}")
  }

  test("coreness: K4 with a pendant chain — clique reads 3, chain reads 1, bridge node both") {
    import spark.implicits._
    // K4 on 1-4; chain 4-5-6 hangs off node 4
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val edges = (k4 ++ Seq((4L, 5L), (5L, 6L))).toDF("src", "dst")
    val got = Graph.coreness(edges, "src", "dst", rounds = 4)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L, 6L -> 1L),
      s"core numbers: $got")
    // monotone truncation: one round gives an UPPER bound (node 5's
    // h-index over degrees {4's deg 4, 6's deg 1} is 1 already; node
    // 4 starts at its degree 4 and settles to 3)
    val r1 = Graph.coreness(edges, "src", "dst", rounds = 1)
      .as[(Long, Long)].collect().toMap
    assert(r1.forall { case (n, c) => c >= got(n) },
      s"earlier rounds must upper-bound the fixed point: $r1 vs $got")
  }

  test("betweennessSampled: path graph puts all load on the interior; square splits σ") {
    import spark.implicits._
    def run(edges: Seq[(Long, Long)], srcs: Seq[Long]) =
      Graph.betweennessSampled(edges.toDF("src", "dst"), "src", "dst",
          srcs.toDF("u"), "u", hops = 4)
        .select("node", "n_sources", "betweenness")
        .as[(Long, Long, Double)].collect().sortBy(_._1).toSeq
    // path 1-2-3-4, all sources: interior nodes carry 4 ordered pairs
    val path = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L, 2L, 3L, 4L))
    assert(path == Seq((2L, 3L, 4.0), (3L, 3L, 4.0)),
      s"endpoints drop (zero), interior carries 4 (3 non-self sources): $path")
    // square 1-2-4-3-1: two equal-length 1→4 paths split σ — each
    // midpoint carries 0.5 per traversing direction
    val sq = run(Seq((1L, 2L), (2L, 4L), (1L, 3L), (3L, 4L)),
      Seq(1L, 2L, 3L, 4L))
    assert(sq == Seq((1L, 3L, 1.0), (2L, 3L, 1.0), (3L, 3L, 1.0), (4L, 3L, 1.0)),
      s"every node bridges one pair at σ-share 1/2 each way: $sq")
    // hop truncation: a 5-node path at hops=4 still reaches, but a
    // source subset only counts ITS pairs
    val sub = run(Seq((1L, 2L), (2L, 3L), (3L, 4L)), Seq(1L))
    assert(sub == Seq((2L, 1L, 2.0), (3L, 1L, 1.0)), s"single-source deps: $sub")
  }

  test("neighborSample: undirected reach (an edge stored one way samples both ways)") {
    import spark.implicits._
    val edges = Seq((5L, 6L)).toDF("src", "dst")
    val fromDst = Graph.neighborSample(edges, "src", "dst",
        Seq(6L).toDF("seed"), "seed", Seq(2))
      .select("src", "dst").as[(Long, Long)].collect().toSeq
    assert(fromDst == Seq((6L, 5L)), s"must traverse the reverse direction: $fromDst")
  }

  test("katzCentrality: a 2-cycle gives every node the geometric series sum") {
    import spark.implicits._
    // a<->b deterministic chain: P is the swap permutation, so each
    // round's walk mass is exactly beta^k at every node and
    // katz = sum_{k=1..6} 0.5^k = 0.984375
    val edges = Seq(("a", "b", 3.0), ("b", "a", 7.0)).toDF("src", "dst", "w")
    val got = Graph.katzCentrality(edges, "src", "dst", "w",
        beta = 0.5, iters = 6)
      .orderBy("node").as[(String, Double)].collect().toSeq
    assert(got == Seq(("a", 0.984375), ("b", 0.984375)), s"katz: $got")
    // a pure sink collects the source's damped mass but returns none:
    // source keeps only its round-1 self-start flow-out (gets 0)
    val oneWay = Seq(("s", "t", 1.0)).toDF("src", "dst", "w")
    val g2 = Graph.katzCentrality(oneWay, "src", "dst", "w",
        beta = 0.5, iters = 6)
      .orderBy("node").as[(String, Double)].collect().toMap
    assert(g2("s") == 0.0 && g2("t") == 0.5,
      s"sink receives 0.5 once, source receives nothing: $g2")
  }

  test("hopProfile: exact N(h) on a path graph; 90% effective diameter reads off the curve") {
    import spark.implicits._
    // path 1-2-3-4-5: |B_1| sums = 5 + 2*4 = 13; B_2 adds 2-hop pairs
    // (1,3),(2,4),(3,5) both ways = 19; B_3 adds (1,4),(2,5)x2 = 23;
    // full horizon N(4) would be 25 — at maxHops 3 the last hop IS
    // the horizon, share 1.0
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val got = Graph.hopProfile(edges, "src", "dst", maxHops = 3)
      .orderBy("hop")
      .select("hop", "n_pairs", "share", "is_effective_diameter")
      .as[(Long, Long, Double, Boolean)].collect().toSeq
    def sh(n: Long) = math.rint(n.toDouble / 23 * 1e6) / 1e6
    assert(got == Seq(
      (1L, 13L, sh(13), false),
      (2L, 19L, sh(19), false), // 0.826 < 0.9
      (3L, 23L, 1.0, true)), s"hop curve: $got")
  }

  test("reciprocity: mutual edges counted per node and globally; self-loops and dups ignored") {
    import spark.implicits._
    // a<->b mutual, a->c one-way, c->a one-way (so a-c IS mutual),
    // b->c one-way, self-loop d->d dropped, duplicate a->b collapses
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"),
      ("b", "c"), ("d", "d"), ("a", "b")).toDF("src", "dst")
    val got = Graph.reciprocity(edges, "src", "dst")
      .orderBy("node")
      .select("node", "n_out", "n_mutual", "node_reciprocity",
        "graph_reciprocity")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    // distinct non-loop edges: a->b, b->a, a->c, c->a, b->c (5);
    // mutual: a->b, b->a, a->c, c->a (4) -> global 0.8
    assert(got == Seq(
      ("a", 2L, 2L, 1.0, 0.8),
      ("b", 2L, 1L, 0.5, 0.8),
      ("c", 1L, 1L, 1.0, 0.8)), s"reciprocity: $got")
  }
}
