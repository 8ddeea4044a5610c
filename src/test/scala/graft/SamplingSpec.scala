package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions.{col, count, expr, lit, sum}

class SamplingSpec extends SparkSpec {

  test("groupKFold: cluster members share a fold; folds stay in range") {
    import spark.implicits._
    val cm = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 7L), (8L, 8L), (9L, 9L), (10L, 10L))
      .toDF("doc_id", "cluster_id")
    val got = graft.operators.Sampling.groupKFold(cm, k = 5)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.forall(r => r._3 >= 0 && r._3 < 5), s"fold range: $got")
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._3).toSet)
    assert(byCluster.forall(_._2.size == 1),
      s"every cluster must land whole in one fold: ${byCluster.toMap}")
    // the md5 draw actually spreads clusters across folds
    assert(got.map(_._3).toSet.size >= 2, "folds must not collapse")
    intercept[IllegalArgumentException] {
      graft.operators.Sampling.groupKFold(cm, k = 1)
    }
  }
  import spark.implicits._

  private def fixture = (1 to 200).map { i =>
    (i.toLong, if (i % 2 == 0) "g1" else "g2",
     if (i == 10) 1e6 else 1e-3)
  }.toDF("id", "g", "w")

  test("weighted reservoir: k rows per group, ranks 1..k") {
    val out = Sampling.weightedReservoirPerGroup(fixture, "g", "id", "w", 5)
      .select("g", "rk").as[(String, Long)].collect()
    val byGroup = out.groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byGroup == Map("g1" -> Seq(1L, 2L, 3L, 4L, 5L),
                          "g2" -> Seq(1L, 2L, 3L, 4L, 5L)))
  }

  test("weight dominates: a 10^9-times-heavier row always ranks first") {
    val out = Sampling.weightedReservoirPerGroup(fixture, "g", "id", "w", 5)
      .where($"g" === "g1").orderBy("rk")
      .select("id").as[Long].collect()
    assert(out.head == 10L, s"heavy row must win its group, got ${out.toSeq}")
  }

  test("deterministic: identical kept set across runs") {
    def run() = Sampling.weightedReservoirPerGroup(fixture, "g", "id", "w", 5)
      .select("id", "rk").as[(Long, Long)].collect().toSet
    assert(run() == run())
  }

  test("per-partition pre-selection is invisible: result identical across partitionings") {
    // the bounded-heap partial top-k must forward exactly the rows the
    // window would keep, however the input is split
    def run(parts: Int) = Sampling.weightedReservoirPerGroup(
        fixture.repartition(parts), "g", "id", "w", 5)
      .select("id", "g", "rk").as[(Long, String, Long)].collect().toSet
    assert(run(1) == run(7) && run(7) == run(32))
    // string ids take the fallback (no pre-selection) path and must
    // still produce k ranked rows per group
    val sdf = fixture.selectExpr("cast(id as string) AS id", "g", "w").repartition(5)
    val s = Sampling.weightedReservoirPerGroup(sdf, "g", "id", "w", 3)
      .select("g", "rk").as[(String, Long)].collect()
    assert(s.groupBy(_._1).view.mapValues(_.length).toMap == Map("g1" -> 3, "g2" -> 3))
  }

  test("mixToGroupTarget: under-target groups keep everything, " +
       "over-target groups downsample near the target") {
    val df = ((1 to 1000).map(i => (i.toLong, "big")) ++
              (1001 to 1010).map(i => (i.toLong, "small")))
      .toDF("id", "g")
    val out = Sampling.mixToGroupTarget(df, "g", "id", 100)
      .select("g", "id", "keep_rate").as[(String, Long, Double)].collect()
    val small = out.filter(_._1 == "small")
    assert(small.length == 10 && small.forall(_._3 == 1.0),
      "a group under target must keep every row at rate 1")
    val big = out.filter(_._1 == "big")
    assert(big.forall(_._3 == 0.1))
    // md5-Bernoulli at rate 0.1 over 1000 rows: expect ~100, allow 3 sigma
    assert(big.length > 60 && big.length < 140,
      s"expected ~100 kept from the big group, got ${big.length}")
    // deterministic: the same draw every run
    val again = Sampling.mixToGroupTarget(df, "g", "id", 100)
      .select("id").as[Long].collect().toSet
    assert(again == out.map(_._2).toSet)
  }

  test("sample_quality_cut scores the corpus once: cut reuses the exchange") {
    val q = SparkEntry.queries("sample_quality_cut")(spark, sf001)
    q.collect() // AQE: exchange reuse materializes in the final plan
    val p = q.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    assert(p.contains("ReusedExchange"),
      s"the percentile cut must reuse the scored-corpus exchange:\n$p")
    assert("FileScan".r.findAllIn(p).size == 1,
      "the documents corpus must scan (and score) exactly once")
  }

  test("non-positive weights are excluded") {
    val df = Seq((1L, "g", 1.0), (2L, "g", 0.0), (3L, "g", -2.0))
      .toDF("id", "g", "w")
    val kept = Sampling.weightedReservoirPerGroup(df, "g", "id", "w", 10)
      .select("id").as[Long].collect().toSet
    assert(kept == Set(1L))
  }

  test("temperatureMix: α=1 keeps natural proportions, α<1 favors the rare group") {
    import org.apache.spark.sql.functions._
    val df = (1 to 90).map(i => (i.toLong, "big")) ++ (91 to 100).map(i => (i.toLong, "small"))
    val d = df.toDF("id", "g")
    def rates(alpha: Double): Map[String, Double] =
      Sampling.temperatureMix(d, "g", "id", alpha, targetTotal = 50)
        .select("g", "keep_rate").distinct()
        .as[(String, Double)].collect().toMap
    val natural = rates(1.0)
    // α=1: rate = (n/N)·T/n = T/N for every group
    assert(natural.values.forall(r => math.abs(r - 0.5) < 1e-6), s"$natural")
    val flat = rates(0.5)
    assert(flat("small") > flat("big"),
      s"α<1 must favor the rare group: $flat")
    assert(flat("small") <= 1.0 && flat("big") < 0.5)
    intercept[IllegalArgumentException](Sampling.temperatureMix(d, "g", "id", 1.5, 10))
  }

  test("abAssign: disjoint exhaustive arms, stable across runs, near-weight shares") {
    val ids = (1L to 1000L).toDF("id")
    val arms = Seq("control" -> 50, "treatment_a" -> 30, "treatment_b" -> 20)
    val a1 = Sampling.abAssign(ids, "id", arms)
      .as[(Long, Long, String)].collect().toSeq
    // exhaustive + bucket→arm mapping respects the cumulative ranges
    assert(a1.size == 1000)
    a1.foreach { case (_, b, arm) =>
      val expect = if (b < 50) "control" else if (b < 80) "treatment_a" else "treatment_b"
      assert(arm == expect, s"bucket $b mapped to $arm")
    }
    // pure function of the id: a second run assigns identically
    val a2 = Sampling.abAssign(ids, "id", arms)
      .as[(Long, Long, String)].collect().toSeq
    assert(a1.sortBy(_._1) == a2.sortBy(_._1))
    // md5 buckets are near-uniform: shares land within ±5pp of weights
    val shares = a1.groupBy(_._3).view.mapValues(_.size / 1000.0).toMap
    assert(math.abs(shares("control") - 0.5) < 0.05 &&
           math.abs(shares("treatment_a") - 0.3) < 0.05 &&
           math.abs(shares("treatment_b") - 0.2) < 0.05, s"$shares")
    intercept[IllegalArgumentException](
      Sampling.abAssign(ids, "id", Seq("a" -> 60, "b" -> 60)))
  }

  test("balanceClasses: every class downsampled to exactly the minority count, deterministic") {
    val df = ((1 to 100).map(i => (i.toLong, "big")) ++
              (101 to 130).map(i => (i.toLong, "mid")) ++
              (131 to 140).map(i => (i.toLong, "small")))
      .toDF("id", "cls")
    val got = Sampling.balanceClasses(df, "cls", "id")
      .as[(Long, String)].collect().toSeq
    val byClass = got.groupBy(_._2).view.mapValues(_.size).toMap
    assert(byClass == Map("big" -> 10, "mid" -> 10, "small" -> 10), s"$byClass")
    // the minority class survives INTACT (rank <= its own count)
    assert(got.filter(_._2 == "small").map(_._1).toSet == (131L to 140L).toSet)
    val again = Sampling.balanceClasses(df, "cls", "id")
      .as[(Long, String)].collect().toSeq
    assert(got.toSet == again.toSet, "md5 draw must reproduce exactly")
  }

  test("neymanAllocation: zero-variance stratum gets rate 0, varying stratum absorbs the budget") {
    // stratum A constant (s=0 → n·s = 0 → allocation 0); B varies →
    // owns the whole budget; target ≥ n_B caps its rate at 1
    val df = (1L to 6L).map(i => (i, "A", 50L)) ++
      Seq((7L, "B", 10L), (8L, "B", 90L), (9L, "B", 20L), (10L, "B", 80L))
    val got = Sampling.neymanAllocation(
        df.toDF("id", "stratum", "x"), "stratum", "id", "x", targetTotal = 100)
      .select("id", "stratum", "keep_rate")
      .as[(Long, String, Double)].collect().toSeq
    assert(got.forall(_._2 == "B"), s"constant stratum must keep nothing: $got")
    assert(got.map(_._1).toSet == Set(7L, 8L, 9L, 10L), s"got $got")
    assert(got.forall(_._3 == 1.0), "B's capped rate must be exactly 1.0")
  }

  test("effectiveSampleSize: uniform weights → ess = n; one dominant weight collapses it") {
    // A: four equal weights → ESS 4, efficiency 1. B: (1000,1,1,1) →
    // ESS = 1003²/1000003 ≈ 1.006 — four rows, one row of information
    val df = ((1 to 4).map(i => (i.toLong, "A", 10L)) ++
      Seq((5L, "B", 1000L), (6L, "B", 1L), (7L, "B", 1L), (8L, "B", 1L)) ++
      Seq((9L, "C", 0L), (10L, "C", -5L))) // non-positive weights drop
      .toDF("id", "stratum", "w")
    val got = Sampling.effectiveSampleSize(df, "stratum", "w")
      .orderBy("stratum")
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.size == 2, s"stratum C had no positive weights: $got")
    assert(got(0) == (("A", 4L, 40L, 4.0, 1.0)), s"got $got")
    val essB = 1003.0 * 1003.0 / 1000003.0
    assert(got(1) == (("B", 4L, 1003L, r6(essB), r6(essB / 4.0))), s"got $got")
  }

  test("groupKFold: a group never straddles folds; shares sum to 1; assignment is stable") {
    // 40 groups × 3 rows each — fold must be constant per group
    val df = (1L to 40L).flatMap(g => (1 to 3).map(r => (g, r))).toDF("g", "r")
    val audit = Sampling.groupKFold(df, "g", k = 5)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    assert(audit.map(_._1).forall(f => f >= 0 && f < 5))
    assert(audit.map(_._2).sum == 120L && audit.map(_._3).sum == 40L,
      s"every row and group lands in exactly one fold: $audit")
    assert(audit.forall(a => a._2 == a._3 * 3),
      s"3 rows per group ⇒ n_rows = 3·n_groups per fold (group integrity): $audit")
    assert(audit == Sampling.groupKFold(df.repartition(7), "g", k = 5)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1))
  }

  test("poissonBootstrapMean: constant metric has zero-width CI; deterministic under repartitioning") {
    val df = (1L to 50L).map(i => (i, 2.0)).toDF("id", "v")
    val got = Sampling.poissonBootstrapMean(df, "id", "v", reps = 100)
      .as[(Long, Long, Double, Double, Double, Double)].head()
    // every replicate mean of a constant IS the constant, whatever
    // the Poisson weights drew → degenerate interval, zero boot SE
    assert(got == ((50L, 100L, 2.0, 2.0, 2.0, 0.0)), s"got $got")
    // varying metric: identical output across partitionings (no RNG
    // state; the md5 draw is row-content-derived)
    val vary = (1L to 60L).map(i => (i, (i % 7).toDouble)).toDF("id", "v")
    val a = Sampling.poissonBootstrapMean(vary, "id", "v", reps = 100).head()
    val b = Sampling.poissonBootstrapMean(vary.repartition(7), "id", "v", reps = 100).head()
    assert(a == b, s"partitioning changed the bootstrap: $a vs $b")
    assert(a.getDouble(3) < a.getDouble(4), "varying metric must widen the CI")
    assert(a.getDouble(5) > 0, "boot SE must be positive")
    // the CI must bracket the point estimate
    assert(a.getDouble(3) <= a.getDouble(2) && a.getDouble(2) <= a.getDouble(4))
  }

  test("ppsSystematic: exactly n grid hits, heavy items guaranteed in, partitioning-independent") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .selectExpr("doc_id", "cast(size(split(trim(text), '\\s+')) as long) as n_tokens")
    val s = Sampling.ppsSystematic(docs, "doc_id", "n_tokens",
        n = 20, seed = "spec")
      .select("id", "w", "n_hits").as[(Long, Long, Long)].collect().toSeq
    // THE systematic property: the grid has exactly n points
    assert(s.map(_._3).sum == 20L, s"grid must land exactly n hits: $s")
    assert(s.forall(_._3 >= 1))
    // an item with w >= T/n spans a full step and MUST be drawn
    val t = docs.selectExpr("sum(n_tokens)").as[Long].head()
    val ids = s.map(_._1).toSet
    docs.selectExpr("doc_id", "n_tokens").as[(Long, Long)].collect()
      .filter(r => r._2 * 20 >= t)
      .foreach(r => assert(ids.contains(r._1), s"heavy item ${r._1} missed"))
    val again = Sampling.ppsSystematic(docs.repartition(7), "doc_id", "n_tokens",
        n = 20, seed = "spec")
      .select("id", "w", "n_hits").as[(Long, Long, Long)].collect().toSeq
    assert(again.sortBy(_._1) == s.sortBy(_._1))
  }

  test("ppsSystematic: heavy weight lines (T >= 2^31) select exactly n; T >= 2^63 raises") {
    // pre-widening, u = shiftright(h*t, 32) wrapped negative once
    // T >= 2^31 and the grid predicate silently selected the wrong
    // rows — this fixture (T ≈ 3·2^33) failed on that code
    val heavy = Seq((1L, 1L << 33), (2L, (1L << 33) + 7L), (3L, (1L << 33) + 13L))
      .toDF("id", "w")
    val s = Sampling.ppsSystematic(heavy, "id", "w", n = 6, seed = "heavy")
      .select("id", "n_hits").as[(Long, Long)].collect().toSeq
    assert(s.map(_._2).sum == 6L, s"grid must land exactly n hits on a heavy line: $s")
    // ~equal thirds of the line at n=6 → every item drawn ~twice
    assert(s.map(_._1).toSet == Set(1L, 2L, 3L), s"all three heavy items must appear: $s")
    // the residual bound is ENFORCED, not a silent wrap: three 2^62
    // weights sum past 2^63 and the guard must raise
    val over = Seq((1L, 1L << 62), (2L, 1L << 62), (3L, 1L << 62)).toDF("id", "w")
    val e = intercept[Exception] {
      Sampling.ppsSystematic(over, "id", "w", n = 2, seed = "over").collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("total weight must be < 2^63")),
      s"expected the guard message, got: ${msgs(e)}")
  }

  test("epochShuffle: positions are an exact permutation matching the md5 rank") {
    val ids = (1 to 300).map(_.toLong)
    val df = ids.toDF("doc_id")
    val out = Sampling.epochShuffle(df, "doc_id", "epochX")
      .as[(Long, Long)].collect().toMap
    // permutation 0..n-1
    assert(out.values.toSeq.sorted == (0L until 300L).toSeq)
    // exact rank of (md5(seed|id), id) — the order the oracle replays
    def hex(s: String) = {
      val d = java.security.MessageDigest.getInstance("MD5")
      d.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    }
    val expect = ids.sortBy(i => (hex(s"epochX|$i"), i)).zipWithIndex
      .map { case (i, p) => i -> p.toLong }.toMap
    assert(out == expect)
  }

  test("epochShuffle: reproducible from the seed alone; a new seed reorders") {
    val df = (1 to 300).map(_.toLong).toDF("doc_id")
    def run(seed: String, parts: Int) =
      Sampling.epochShuffle(df.repartition(parts), "doc_id", seed)
        .as[(Long, Long)].collect().toMap
    // partitioning-invariant and run-to-run identical
    assert(run("e1", 1) == run("e1", 13) && run("e1", 13) == run("e1", 32))
    // a different seed is a genuinely different epoch order
    val a = run("e1", 8); val b = run("e2", 8)
    assert(a != b && a.count { case (k, v) => b(k) == v } < 30,
      "two seeds must agree on almost no positions")
  }

  test("epochPack: offsets are the exact prefix sum in shuffle-position order") {
    val items = (1 to 120).map(i => (i.toLong, (i % 7 + 1).toLong))
      .toDF("doc_id", "n_tokens")
    val out = Sampling.epochPack(items, "doc_id", "n_tokens", "eP", seqTokens = 16L)
      .select("doc_id", "position", "n_cost", "stream_offset", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val pos = Sampling.epochShuffle(items, "doc_id", "eP")
      .as[(Long, Long)].collect().toMap
    // replay the pack as a plain fold over position order
    val inOrder = out.sortBy(_._2)
    var off = 0L
    inOrder.foreach { case (id, p, c, so, seq, sq) =>
      assert(p == pos(id), s"doc $id position drifted")
      assert(so == off && seq == off / 16 && sq == off % 16,
        s"doc $id at position $p: offset $so expected $off")
      off += c
    }
    // partitioning-invariant
    val again = Sampling.epochPack(items.repartition(13), "doc_id", "n_tokens",
        "eP", 16L)
      .select("doc_id", "stream_offset").as[(Long, Long)].collect().toMap
    assert(again == out.map(r => r._1 -> r._4).toMap)
  }

  test("lengthBuckets: boundary ladder, waste ratios, and clamp accounting") {
    val df = Seq(10L, 16L, 17L, 100L, 2000L).toDF("n_tokens")
    val got = Sampling.lengthBuckets(df, "n_tokens", minLen = 16, maxLen = 1024)
      .orderBy("bucket")
      .select("bucket", "n_docs", "total_tokens", "kept_tokens",
        "padded_slots", "pad_waste", "truncation_loss")
      .as[(Long, Long, Long, Long, Long, Double, Double)].collect().toSeq
    // 10,16 → bucket 16; 17 → 32; 100 → 128; 2000 → clamped 1024
    assert(got.map(r => (r._1, r._2)) ==
      Seq((16L, 2L), (32L, 1L), (128L, 1L), (1024L, 1L)), got.toString)
    val b16 = got.head
    assert(b16._3 == 26L && b16._4 == 26L && b16._5 == 32L &&
      b16._6 == 0.1875 && b16._7 == 0.0, b16.toString)
    val clamped = got.last
    // 2000 tokens into a 1024 slot: 976 lost to the clamp, no padding
    assert(clamped._3 == 2000L && clamped._4 == 1024L && clamped._5 == 1024L &&
      clamped._6 == 0.0 && clamped._7 == 0.488, clamped.toString)
  }

  test("epochPlan: integer targets, epoch counts, and rates on a hand fixture") {
    // two sources: srcA 100 tokens w=3, srcB 50 tokens w=1 -> wsum 4
    val docs = ((1 to 10).map(i => (i.toLong, "srcA", 10L)) ++
                (11 to 15).map(i => (i.toLong, "srcB", 10L)))
      .toDF("doc_id", "source", "n_tokens")
    val out = Sampling.epochPlan(docs, "source", "n_tokens",
        expr("CASE WHEN source = 'srcA' THEN 3 ELSE 1 END"), budget = 420L)
      .orderBy("source")
      .select("source", "w", "src_tokens", "target_tokens", "full_epochs",
        "n_epochs", "last_keep_rate", "repeat_factor")
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().toSeq
    // srcA: target (420*3) div 4 = 315 -> 3 full + 15/100 partial
    assert(out(0) == (("srcA", 3L, 100L, 315L, 3L, 4L, 0.15, 3.15)), s"srcA: ${out(0)}")
    // srcB: target (420*1) div 4 = 105 -> 2 full + 5/50 partial
    assert(out(1) == (("srcB", 1L, 50L, 105L, 2L, 3L, 0.1, 2.1)), s"srcB: ${out(1)}")
    // floor shares never overshoot the budget
    assert(out.map(_._4).sum <= 420L)
  }

  test("leakageFreeSplit: cluster mates never straddle a split boundary") {
    val map = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 4L),
      (6L, 6L), (7L, 7L)).toDF("doc_id", "cluster_id")
    val got = Sampling.leakageFreeSplit(map)
      .select("doc_id", "cluster_id", "split")
      .as[(Long, Long, String)].collect().toSeq
    val byCluster = got.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    assert(byCluster.values.forall(_.size == 1),
      s"a cluster straddles splits: $got")
    assert(got.map(_._3).toSet.subsetOf(Set("train", "val", "test")))
    // assignment depends only on the cluster id (doc ids irrelevant)
    val relabeled = Sampling.leakageFreeSplit(
        map.withColumn("doc_id", col("doc_id") + 100))
      .select("cluster_id", "split").as[(Long, String)].collect().toSet
    assert(relabeled == got.map(r => (r._2, r._3)).toSet)
  }

  test("rakeWeights: unbiased sample keeps weight 1; biased cut converges to both margins") {
    def cells(rows: Seq[(String, Long)]) = rows.toDF("a", "b")
    val pop = Seq(("x", 1L), ("x", 1L), ("x", 2L), ("y", 1L), ("y", 2L), ("y", 2L))
    val tA = cells(pop).groupBy("a").agg(count(lit(1)).as("target"))
    val tB = cells(pop).groupBy("b").agg(count(lit(1)).as("target"))
    // sample == population → every factor is exactly 1, weights stay 1.0
    val same = Sampling.rakeWeights(cells(pop), "a", "b", tA, tB, rounds = 3)
      .select("weight").as[Double].collect()
    assert(same.forall(_ == 1.0), s"unbiased sample must keep weight 1: ${same.toSeq}")
    // drop one (x,1) row → IPF must push both weighted margins back
    val biased = Sampling.rakeWeights(cells(pop.tail), "a", "b", tA, tB, rounds = 8)
    val mA = biased.groupBy("a").agg(sum("weighted_n").as("m"))
      .join(tA, "a").select(col("a"), (col("m") - col("target")).as("d"))
      .as[(String, Double)].collect()
    val mB = biased.groupBy("b").agg(sum("weighted_n").as("m"))
      .join(tB, "b").select(col("b"), (col("m") - col("target")).as("d"))
      .as[(Long, Double)].collect()
    assert(mA.forall(r => math.abs(r._2) < 0.01), s"A margins: ${mA.toSeq}")
    assert(mB.forall(r => math.abs(r._2) < 0.01), s"B margins: ${mB.toSeq}")
    // upweighted cell is the depleted one
    val w = biased.where(col("a") === "x" && col("b") === 1)
      .select("weight").as[Double].head()
    assert(w > 1.5, s"depleted cell must be upweighted: $w")
  }
}
