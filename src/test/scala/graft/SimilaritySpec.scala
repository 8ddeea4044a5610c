package graft

import org.apache.spark.sql.functions._
import graft.operators.Similarity
import graft.functions.VectorFunctions._

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("vector functions: dot, norm, cosine on known vectors") {
    val df = Seq((Array(1f, 2f, 3f), Array(4f, 5f, 6f))).toDF("a", "b")
    val (d, ca) = df.select(
      dot(col("a"), col("b")),
      round(cosine(col("a"), col("b")), 6)).as[(Double, Double)].head()
    assert(d == 32.0)
    assert(math.abs(ca - 0.974632) < 1e-6)
    val z = Seq((Array(0f, 0f), Array(1f, 1f))).toDF("a", "b")
      .select(cosine(col("a"), col("b"))).as[Option[Double]].head()
    assert(z.isEmpty, "zero-norm cosine must be null")
  }

  test("brute-force top-k: k rows per query, self excluded, descending scores") {
    val e = Tables.embeddings(spark, sf001)
    val got = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 3), "vec_id", "embedding", 4)
    val rows = got.as[(Long, Long, Double, Long)].collect()
    assert(rows.length == 12)
    assert(rows.forall { case (q, c, _, _) => q != c })
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._4).map(_._3)
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
  }

  test("hardNegatives: every result crosses labels; scores dominate same-label exclusions") {
    val e = Tables.embeddings(spark, sf001)
    val got = Similarity.hardNegatives(e, e.where(col("vec_id") < 3),
      "vec_id", "embedding", "label", k = 4)
    val rows = got.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Int]("anchor_label") != r.getAs[Int]("neg_label")),
      "a hard negative shares its anchor's label")
    // per anchor: exactly k rows, rnk 1..k, descending scores
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.length == 4)
      val sorted = g.sortBy(_.getAs[Long]("rnk"))
      assert(sorted.map(_.getAs[Double]("score")).sliding(2)
        .forall(p => p.head >= p.last))
    }
  }

  test("rankingEval: hand-computed nDCG/MRR, missing-query zeros, perfect run scores 1") {
    import spark.implicits._
    val truth = Seq((1L, 10L, 1L), (1L, 11L, 2L), (2L, 20L, 1L), (2L, 21L, 2L),
      (3L, 30L, 1L), (3L, 31L, 2L)).toDF("query_id", "corpus_id", "rnk")
    // q1: approx = truth reversed → both hits, first hit at rank 1 → rr 1.
    // dcg = C(1)+C(2), idcg = C(1)+C(2) → ndcg 1 (set-identical, binary rel).
    // q2: one hit at rank 2 → dcg = C(2) = round(1e9/log2(3)), rr = 0.5.
    // q3: absent from approx → all zeros.
    val approx = Seq((1L, 11L, 1L), (1L, 10L, 2L), (2L, 99L, 1L), (2L, 20L, 2L))
      .toDF("query_id", "corpus_id", "rnk")
    val got = Similarity.rankingEval(approx, truth, k = 2)
      .orderBy("query_id").as[(Long, Long, Double, Double)].collect().toSeq
    val c1 = 1e9
    val c2 = math.round(1e9 / (math.log(3) / math.log(2))).toDouble
    val ndcg2 = BigDecimal(c2 / (c1 + c2)).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got == Seq((1L, 2L, 1.0, 1.0), (2L, 1L, ndcg2, 0.5), (3L, 0L, 0.0, 0.0)),
      s"got $got")
  }

  test("irMetrics: hand-computed precision/recall@k, empty-retrieval queries report zeros") {
    import spark.implicits._
    // q1: 3 relevant, retrieved 2 of them in the top-2 → p@2 = 1.0,
    //     recall = 2/3. q2: 2 relevant, retrieved ranks hold 1 hit +
    //     1 miss → p@2 = 0.5, recall = 0.5. q3: judged but nothing
    //     retrieved → zeros with n_rel intact. rank-3 rows are cut.
    val qrels = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L),
      (3L, 30L)).toDF("query_id", "corpus_id")
    val retrieved = Seq((1L, 10L, 1L), (1L, 11L, 2L), (1L, 12L, 3L),
      (2L, 99L, 1L), (2L, 20L, 2L)).toDF("query_id", "corpus_id", "rnk")
    val got = Similarity.irMetrics(retrieved, qrels, k = 2)
      .orderBy("query_id")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 3L, 1.0, 0.666667),
      (2L, 2L, 1L, 2L, 0.5, 0.5),
      (3L, 0L, 0L, 1L, 0.0, 0.0)), s"ir metrics: $got")
  }

  test("irMetrics: unjudged retrieved query — omitted by default, raises under onDegenerate=fail") {
    import spark.implicits._
    val qrels = Seq((1L, 10L)).toDF("query_id", "corpus_id")
    val retrieved = Seq((1L, 10L, 1L), (9L, 99L, 1L))
      .toDF("query_id", "corpus_id", "rnk")
    // default: query 9 (no qrels row) silently drops from the report
    val got = Similarity.irMetrics(retrieved, qrels, k = 2)
      .select("query_id").as[Long].collect().toSeq
    assert(got == Seq(1L), s"default must omit unjudged queries: $got")
    // fail: the unjudged query raises by name
    val ex = intercept[Exception] {
      Similarity.irMetrics(retrieved, qrels, k = 2, onDegenerate = "fail").collect()
    }
    val msgs = Iterator.iterate(ex: Throwable)(_.getCause).takeWhile(_ != null)
      .map(m => Option(m.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("query '9'"), s"unexpected failure: $msgs")
    // fully judged input under fail mode matches the default output
    val healthy = Similarity.irMetrics(
      retrieved.where(col("query_id") === 1L), qrels, k = 2,
      onDegenerate = "fail")
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(healthy == Seq((1L, 1L, 1L, 1L, 0.5, 1.0)), s"healthy: $healthy")
  }

  test("ivfCellBalance: counts cover the corpus, shares sum to 1, load factors average 1 over present cells") {
    val e = Tables.embeddings(spark, sf001)
    val n = e.count()
    val got = Similarity.ivfCellBalance(e, "vec_id", "embedding", numCells = 16)
      .as[(Long, Long, Double, Double)].collect().toSeq
    assert(got.map(_._2).sum == n, "every vector must land in exactly one cell")
    assert(math.abs(got.map(_._3).sum - 1.0) < 1e-4, s"shares must sum to 1: $got")
    assert(got.forall(r => r._1 >= 1 && r._1 <= 16))
    // load factor is share·numCells — exact scaling relation
    got.foreach(r => assert(math.abs(r._4 - r._3 * 16) < 1e-4, s"bad load factor: $r"))
  }

  test("kmeansElbow: inertia non-increasing in k, cells bounded by k, deterministic") {
    val e = Tables.embeddings(spark, sf001)
    val got = Similarity.kmeansElbow(e, "vec_id", "embedding", ks = Seq(2, 4, 8))
      .orderBy("k").as[(Long, Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(2L, 4L, 8L))
    assert(got.forall(r => r._3 <= r._1 && r._3 >= 1), s"cells out of range: $got")
    assert(got.map(_._2).distinct.size == 1, "every k must score the whole corpus")
    // more clusters can only tighten (or tie) the fit
    assert(got.map(_._4).sliding(2).forall(p => p.head >= p.last - 1e-9),
      s"inertia must be non-increasing in k: $got")
    val again = Similarity.kmeansElbow(e, "vec_id", "embedding", ks = Seq(2, 4, 8))
      .orderBy("k").as[(Long, Long, Long, Double)].collect().toSeq
    assert(again == got, "elbow must be deterministic")
  }

  test("lsh top-k recall vs brute force") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    // This corpus has no strong neighbors (max cosine ≈ 0.4), the
    // hardest regime for hyperplane LSH — few bits + many tables is
    // the right operating point.
    val approx = Similarity.lshTopK(e, q, "vec_id", "embedding", 5, nbits = 2, numTables = 8)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.5, s"LSH recall $recall too low for 2 bits × 8 tables")
  }

  test("ivf top-k: k rows per query, deterministic across runs") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 4)
    val run1 = Similarity.ivfTopK(e, q, "vec_id", "embedding", 3).collect().toSeq
    val run2 = Similarity.ivfTopK(e, q, "vec_id", "embedding", 3).collect().toSeq
    assert(run1 == run2)
    assert(run1.size == 12)
  }

  test("ivf recall rises with nprobe, reaching exact at nprobe = numCells") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val got = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
          numCells = 16, nprobe = nprobe)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      (exact & got).size.toDouble / exact.size
    }
    val r4 = recall(4)
    val r16 = recall(16) // probe everything → brute force
    assert(r16 == 1.0, s"full probe must equal brute force, got $r16")
    assert(r4 <= r16 && r4 >= 0.3, s"nprobe=4 recall $r4 out of expected band")
  }

  test("kmeansIterations: iters=1 matches the audited single step; iters=2 deterministic") {
    val e = Tables.embeddings(spark, sf001)
    val one = Similarity.kmeansIterations(e, "vec_id", "embedding", numCells = 4, iters = 1)
      .orderBy("cell_id", "dim").as[(Long, Long, Double)].collect().toSeq
    val step = Similarity.kmeansIteration(e, "vec_id", "embedding", numCells = 4)
      .orderBy("cell_id", "dim").as[(Long, Long, Double)].collect().toSeq
    assert(one == step, "multi-iteration driver at n=1 must equal the single step")
    val twoA = Similarity.kmeansIterations(e, "vec_id", "embedding", numCells = 4, iters = 2)
      .orderBy("cell_id", "dim").as[(Long, Long, Double)].collect().toSeq
    val twoB = Similarity.kmeansIterations(e, "vec_id", "embedding", numCells = 4, iters = 2)
      .orderBy("cell_id", "dim").as[(Long, Long, Double)].collect().toSeq
    assert(twoA == twoB, "iteration chain must be deterministic")
    assert(twoA != one, "second iteration should move the centroids on this corpus")
  }


  test("kmeansIterations survives deep runs: checkpointEvery cuts lineage, result stable") {
    val e = Tables.embeddings(spark, sf001).where(col("vec_id") < 64)
    // 12 iterations crosses the checkpointEvery=10 boundary; the
    // lineage cut must not change the (converged) result
    val deep = Similarity.kmeansIterations(e, "vec_id", "embedding",
        numCells = 4, iters = 12)
      .orderBy("cell_id", "dim").as[(Long, Long, Double)].collect().toSeq
    val deepNoCut = Similarity.kmeansIterations(e, "vec_id", "embedding",
        numCells = 4, iters = 12, checkpointEvery = 100)
      .orderBy("cell_id", "dim").as[(Long, Long, Double)].collect().toSeq
    assert(deep == deepNoCut, "checkpointing is an execution detail, not a semantic one")
  }

  test("lsh at production params (nbits=6, 4 tables) is genuinely lossy: 0 < recall < 1") {
    // the sim_lsh_recall gate (nbits=4 × 16 tables) sits in the
    // near-exhaustive regime where recall=1.0 is structural; this
    // pins the LOSSY regime so the recall machinery is shown to
    // measure something real, not a tautology
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", k = 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val lsh = Similarity.lshTopK(e, q, "vec_id", "embedding", k = 5, nbits = 6, numTables = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (exact & lsh).size.toDouble / exact.size
    assert(recall > 0.0, "lossy params must still find some true neighbors")
    assert(recall < 1.0, s"recall $recall == 1 means the gate is back in the structural regime")
  }

  test("trained IVF index: Lloyd iterations move the quantizer, queries stay well-formed") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 6)
    val seeded  = s"${System.getProperty("java.io.tmpdir")}/graft_spec_ivf_seeded"
    val trained = s"${System.getProperty("java.io.tmpdir")}/graft_spec_ivf_trained"
    Similarity.writeIvfIndex(e, "vec_id", "embedding", seeded, numCells = 8)
    Similarity.writeIvfIndex(e, "vec_id", "embedding", trained, numCells = 8, trainIters = 2)
    // training must actually move the centroids (raw sample → means)
    // seeded centroids are raw float vectors, trained are rounded
    // doubles — compare in double
    val c0 = spark.read.parquet(s"${seeded}_centroids")
      .select(col("cell_id"), col("centroid").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    val c2 = spark.read.parquet(s"${trained}_centroids")
      .select(col("cell_id"), col("centroid").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(c0 != c2, "2 Lloyd iterations must refine the seeded sample")
    // and the trained index still answers exactly k rows per query
    val got = Similarity.ivfTopKIndexed(trained, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect()
    assert(got.length == 30 && got.forall { case (qq, c, _, _) => qq != c })
    // trained cells cover the corpus: every corpus vector is in the index
    assert(spark.read.parquet(trained).count() == e.count())
  }

  test("materialized IVF index returns exactly the in-memory IVF result") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 6)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_ivf_index"
    Similarity.writeIvfIndex(e, "vec_id", "embedding", path, numCells = 16)
    val mem = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5)
      .orderBy("query_id", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    val idx = Similarity.ivfTopKIndexed(path, q, "vec_id", "embedding", 5)
      .orderBy("query_id", "rnk").as[(Long, Long, Double, Long)].collect().toSeq
    assert(idx == mem, "index changes where the corpus lives, not the answer")
  }

  test("appendIvfDelta INSERT: untouched cells byte-identical, content equals frozen-centroid assignment") {
    val e = Tables.embeddings(spark, sf001)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_ivf_upsert_${System.nanoTime()}"
    // a SPARSE delta (3 vectors → ≤3 of 8 cells) so untouched cells
    // exist to assert on; the driver gate covers the half-corpus case
    Similarity.writeIvfIndex(e.where(col("vec_id") >= 3),
      "vec_id", "embedding", path, numCells = 8)
    def cellFiles() = new java.io.File(path).listFiles()
      .filter(_.getName.startsWith("cell_id="))
      .map(d => d.getName ->
        d.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => (f.getName, f.lastModified())).toSet).toMap
    val before = cellFiles()
    Similarity.appendIvfDelta(e.where(col("vec_id") < 3),
      "vec_id", "embedding", path)
    val after = cellFiles()
    // the frozen-quantizer invariant: post-upsert content == the FULL
    // corpus assigned against the stored (half-trained) centroids
    val centroids = spark.read.parquet(s"${path}_centroids")
    val expect = Similarity.assignToCells(
        e.select(col("vec_id").as("corpus_id"), col("embedding").as("cvec"))
          .withColumn("cnrm", l2Norm(col("cvec"))), centroids)
      .select(col("corpus_id"), col("cell_id"))
      .as[(Long, Long)].collect().toSet
    val got = spark.read.parquet(path)
      .select(col("corpus_id"), col("cell_id").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(got == expect, "index content must equal frozen-centroid full assignment")
    // cells the delta never touched keep their files byte-for-byte
    val touched = after.keySet.filter(k => !before.contains(k) || after(k) != before(k))
    val untouched = before.keySet -- touched
    assert(untouched.nonEmpty, "fixture must leave some cell untouched")
    untouched.foreach { k =>
      assert(after(k) == before(k), s"$k files must be byte-identical (not rewritten)")
    }
    assert(touched.size < before.size + touched.count(!before.contains(_)),
      "a delta must not rewrite every pre-existing cell")
    // commit marker restored — the index serves again
    assert(new java.io.File(s"${path}_centroids/_SUCCESS").exists())
  }

  test("appendIvfDelta UPDATE: migrated vector leaves no stale row; emptied cell deleted; marker gates serving") {
    // two orthogonal 2-d vectors → one per cell (numCells=2 seeds both)
    val base = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("vec_id", "embedding")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_ivf_migrate_${System.nanoTime()}"
    Similarity.writeIvfIndex(base, "vec_id", "embedding", path, numCells = 2)
    val cellOf = spark.read.parquet(path)
      .select(col("corpus_id"), col("cell_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(cellOf(1L) != cellOf(2L), "fixture must place the two vectors in distinct cells")
    // re-ingest id 2 with a vector that now sits next to id 1 — it
    // must MIGRATE cells, emptying its old cell entirely
    Similarity.appendIvfDelta(Seq((2L, Array(1f, 0.01f))).toDF("vec_id", "embedding"),
      "vec_id", "embedding", path)
    val rows = spark.read.parquet(path)
      .select(col("corpus_id"), col("cell_id").cast("long"))
      .as[(Long, Long)].collect().toSeq
    assert(rows.count(_._1 == 2L) == 1, "re-ingested id must appear exactly once (no stale duplicate)")
    assert(rows.toMap.apply(2L) == cellOf(1L), "updated vector must land in its new cell")
    assert(!new java.io.File(s"$path/cell_id=${cellOf(2L)}").exists(),
      "cell emptied by the migration must be deleted (dynamic overwrite skips it)")
    // a crashed maintenance op leaves no marker — serving must refuse
    new java.io.File(s"${path}_centroids/_SUCCESS").delete()
    val q = Seq((9L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val ex = intercept[IllegalArgumentException] {
      Similarity.ivfTopKIndexed(path, q, "vec_id", "embedding", k = 1)
    }
    assert(ex.getMessage.contains("commit marker"))
  }

  test("int8 top-k: high recall vs float exact, zero vectors dropped, deterministic") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val i8 = Similarity.int8TopK(e, q, "vec_id", "embedding", 5)
    val got = i8.select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    // quantization error (≤ 0.5/scale per component) only perturbs
    // near-ties at the top-k boundary — recall stays high
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.8, s"int8 recall $recall below 0.8")
    // integer dots are exact in double: two runs are bit-identical
    val run2 = Similarity.int8TopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(run2 == got)
    // an all-zero vector has no defined scale — dropped from both sides
    import spark.implicits._
    val withZero = e.select(col("vec_id"), col("embedding"))
      .union(Seq((9999L, Array.fill(64)(0f))).toDF("vec_id", "embedding"))
    val z = Similarity.int8TopK(withZero, withZero.where(col("vec_id") === 9999L),
      "vec_id", "embedding", 5)
    assert(z.count() == 0, "zero vector must quantize away, not NaN-poison scores")
  }

  test("pq top-k: k rows per query, deterministic, finer codebooks raise recall") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val got = Similarity.pqTopK(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.length == 40 && got.forall { case (qq, c, _, _) => qq != c })
    val run2 = Similarity.pqTopK(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.sortBy(r => (r._1, r._4)) == run2.sortBy(r => (r._1, r._4)))
    // quantization-granularity monotonicity (the PQ design knob): a
    // 1-subspace, tiny-codebook quantizer must not beat the default
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def recall(m: Int, ksub: Int): Double = {
      val r = Similarity.pqTopK(e, q, "vec_id", "embedding", 5, m = m, ksub = ksub)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      (exact & r).size.toDouble / exact.size
    }
    val coarse = recall(1, 4)
    val fine = recall(8, 64)
    assert(fine >= coarse,
      s"finer quantization (8x64 -> $fine) must not lose to coarser (1x4 -> $coarse)")
    assert(fine >= 0.15, s"default-params recall $fine collapsed")
    // Lloyd-trained codebooks must not lose to the raw seeded sample
    // (on this corpus training lifts recall ~0.30 -> ~0.38 at sf0.01)
    val trained = {
      val r = Similarity.pqTopK(e, q, "vec_id", "embedding", 5, trainIters = 2)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      (exact & r).size.toDouble / exact.size
    }
    assert(trained >= fine,
      s"trained recall $trained must not drop below untrained $fine")
  }

  test("ivf-pq top-k: k rows per query, deterministic, recall rises with nprobe") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val got = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.length == 40 && got.forall { case (qq, c, _, _) => qq != c })
    val run2 = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect().toSeq
    assert(got.sortBy(r => (r._1, r._4)) == run2.sortBy(r => (r._1, r._4)))
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    def recall(nprobe: Int): Double = {
      val r = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5, nprobe = nprobe)
        .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
      (exact & r).size.toDouble / exact.size
    }
    val narrow = recall(2)
    val wide = recall(16) // all cells probed: candidate set = flat PQ on residuals
    assert(wide >= narrow,
      s"probing every cell ($wide) must not lose to 2 cells ($narrow)")
  }

  test("ivf-pq rerank: exact scores on candidates, recall >= plain ivf-pq") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect()
      .map { case (qq, c, s, _) => (qq, c) -> s }.toMap
    val rr = Similarity.ivfPqRerankTopK(e, q, "vec_id", "embedding", k = 5, kCand = 50)
      .as[(Long, Long, Double, Long)].collect()
    assert(rr.length == 40 && rr.forall { case (qq, c, _, _) => qq != c })
    // stage-2 scores are EXACT cosines: any returned pair that the
    // brute-force top-5 also contains must carry the identical score
    rr.foreach { case (qq, c, s, _) =>
      exact.get((qq, c)).foreach(es => assert(es == s,
        s"rerank score $s != exact $es for ($qq,$c)")) }
    val plain = Similarity.ivfPqTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val rrSet = rr.map(r => (r._1, r._2)).toSet
    val exSet = exact.keySet
    assert((exSet & rrSet).size >= (exSet & plain).size,
      s"refine must not lose recall: rerank ${(exSet & rrSet).size} vs plain ${(exSet & plain).size}")
  }

  test("kmeans|| seeding: k distinct corpus ids, weights descending, deterministic, far-spread beats none") {
    val e = Tables.embeddings(spark, sf001)
    // l·rounds = 24 expected candidates — comfortably above k on the
    // 100-vector sf0.001 corpus (l=4 leaves a 7-candidate pool here)
    val got = Similarity.kmeansParallelInit(e, "vec_id", "embedding",
        k = 8, l = 8, rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got.length == 8, s"need 8 seeds, got ${got.length}")
    assert(got.map(_._1) == (1L to 8L), "rnk must be 1..k")
    assert(got.map(_._2).distinct.length == 8, "seeds must be distinct ids")
    val ids = e.select("vec_id").as[Long].collect().toSet
    assert(got.forall(r => ids(r._2)), "every seed must be a real corpus id")
    val ws = got.map(_._3)
    assert(ws.zip(ws.tail).forall { case (a, b) => a >= b },
      "weights must be non-increasing in rank order")
    assert(ws.sum <= ids.size, "captured counts cannot exceed the corpus")
    val again = Similarity.kmeansParallelInit(e, "vec_id", "embedding",
        k = 8, l = 8, rounds = 3)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == again, "md5-deterministic draws must reproduce exactly")
    // the candidate pool must genuinely grow past the single first
    // center — i.e. the oversampling rounds drew something
    assert(ws.length > 1 && ws(1) > 0, "rounds must contribute candidates")
    // refinement: one Lloyd round from the seeds emits a full
    // (cell, dim) mean grid over exactly the seed cells, deterministic
    val refined = Similarity.kmeansParallelRefine(e, "vec_id", "embedding",
        k = 8, l = 8, rounds = 3, iters = 1)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    val cells = refined.map(_._1).distinct
    assert(cells == (1L to 8L), s"refined cells $cells must be the 8 seed ranks")
    assert(refined.count(_._1 == 1L) == 64, "each surviving cell carries all 64 dims")
    val refined2 = Similarity.kmeansParallelRefine(e, "vec_id", "embedding",
        k = 8, l = 8, rounds = 3, iters = 1)
      .as[(Long, Long, Double)].collect().toSeq.sorted
    assert(refined == refined2, "refinement must be deterministic")
  }

  test("pq rerank (flat refine): exact scores on candidates, recall >= plain pq") {
    val e = Tables.embeddings(spark, sf001)
    val q = e.where(col("vec_id") < 8)
    val exact = Similarity.bruteForceTopK(e, q, "vec_id", "embedding", 5)
      .as[(Long, Long, Double, Long)].collect()
      .map { case (qq, c, s, _) => (qq, c) -> s }.toMap
    val rr = Similarity.pqRerankTopK(e, q, "vec_id", "embedding", k = 5, kCand = 50)
      .as[(Long, Long, Double, Long)].collect()
    assert(rr.length == 40 && rr.forall { case (qq, c, _, _) => qq != c })
    // stage-2 scores are EXACT cosines, same contract as ivfPqRerankTopK
    rr.foreach { case (qq, c, s, _) =>
      exact.get((qq, c)).foreach(es => assert(es == s,
        s"rerank score $s != exact $es for ($qq,$c)")) }
    val plain = Similarity.pqTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val rrSet = rr.map(r => (r._1, r._2)).toSet
    val exSet = exact.keySet
    assert((exSet & rrSet).size >= (exSet & plain).size,
      s"refine must not lose recall: rerank ${(exSet & rrSet).size} vs plain ${(exSet & plain).size}")
  }

  test("mips: norm carries signal cosine erases; augmentation reduction ranks identically") {
    // v2 = 3·v1 (same direction): cosine ties them, MIPS must rank the
    // longer one above for a positively-aligned query
    val vecs = Seq(
      (1L, Array(1f, 0f)), (2L, Array(3f, 0f)),
      (3L, Array(0f, 2f)), (4L, Array(2f, 2f)))
    val df = vecs.toDF("vec_id", "embedding")
    val q = df.where(col("vec_id") === 1L)
    val mips = Similarity.mipsTopK(df, q, "vec_id", "embedding", k = 3)
      .select("corpus_id", "score", "rnk")
      .as[(Long, Double, Long)].collect().toSeq
    assert(mips == Seq((2L, 3.0, 1L), (4L, 2.0, 2L), (3L, 0.0, 3L)), s"got $mips")
    // the exact MIPS→cosine augmentation must produce the same result
    // set in the same order (scores differ — order may not)
    val aug = Similarity.mipsViaCosineAugmentation(df, q, "vec_id", "embedding", k = 3)
      .select("corpus_id", "rnk").as[(Long, Long)].collect().toSeq
    assert(aug == mips.map(r => (r._1, r._3)), s"augmented ranking diverged: $aug")
  }

  test("kcenterSample: one center per planted cluster, monotone radii, first radius null") {
    // three tight direction-clusters; a 4th pick must be a near-dup
    // of an existing center (tiny radius)
    val vecs = Seq(
      (1L, Array(1f, 0f, 0f)), (2L, Array(0.99f, 0.01f, 0f)),
      (3L, Array(0f, 1f, 0f)), (4L, Array(0.01f, 0.99f, 0f)),
      (5L, Array(0f, 0f, 1f)), (6L, Array(0f, 0.01f, 0.99f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.kcenterSample(vecs, "vec_id", "embedding", k = 4)
      .as[(Long, Long, Option[Double])].collect().toSeq.sortBy(_._1)
    assert(got.map(_._1) == Seq(1L, 2L, 3L, 4L), s"got $got")
    assert(got.head._3.isEmpty, "first center has no radius")
    val radii = got.tail.map(_._3.get)
    assert(radii == radii.sorted.reverse, s"radii must be non-increasing: $radii")
    // centers 1-3 cover the three clusters: each planted direction
    // appears among the chosen ids' cluster (ids 1/2 = x, 3/4 = y,
    // 5/6 = z)
    val clusters = got.take(3).map(_._2).map(id => (id + 1) / 2).toSet
    assert(clusters == Set(1L, 2L, 3L),
      s"first 3 centers must hit all 3 planted clusters: $got")
    // the 4th radius is tiny (everything is near a center by then)
    assert(radii.last < 0.01, s"4th pick must be a near-dup: ${radii.last}")
  }

  test("centroidClassify: separable clusters give a diagonal confusion matrix; score ties break to min label") {
    import spark.implicits._
    def jit(i: Int) = 0.01f * i
    val rows = (1 to 4).map(i => (i.toLong, Array(1f, jit(i), 0f, 0f), 0)) ++
      (5 to 8).map(i => (i.toLong, Array(0f, jit(i), 1f, 0f), 1))
    val got = Similarity.centroidClassify(rows.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
      .orderBy("true_label", "pred_label")
      .as[(Int, Int, Long)].collect().toSeq
    assert(got == Seq((0, 0, 4L), (1, 1, 4L)), s"diagonal expected: $got")
    // label 7's two vectors cancel to a zero-norm centroid (dropped);
    // both then sit equidistant from centroids 4 and 9 → min label 4
    val tie = Seq((1L, Array(1f, 0f), 9), (2L, Array(0f, 1f), 4),
      (3L, Array(1f, 1f), 7), (4L, Array(-1f, -1f), 7))
    val t = Similarity.centroidClassify(tie.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label")
      .as[(Int, Int, Long)].collect().toSeq
    val mid = t.filter(_._1 == 7)
    assert(mid == Seq((7, 4, 2L)),
      s"equal cosine to labels 4 and 9 must pick 4: $t")
  }

  test("knnClassify: separable clusters score 1.0 per class; vote ties break to the min label") {
    import spark.implicits._
    // two tight clusters on orthogonal axes, 4 vectors each — every
    // neighbor shares the query's label
    def jit(i: Int) = 0.01f * i
    val rows = (1 to 4).map(i => (i.toLong, Array(1f, jit(i), 0f, 0f), 0)) ++
      (5 to 8).map(i => (i.toLong, Array(0f, jit(i), 1f, 0f), 1))
    val e = rows.toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(e, "vec_id", "embedding", "label", k = 3,
        dim = 4)
      .orderBy("true_label")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(got == Seq((0, 4L, 4L, 1.0), (1, 4L, 4L, 1.0)), s"got $got")
    // 1-vs-1 vote tie (k=2, one neighbor each side): min label wins.
    // mid sits between the two clusters; its two neighbors carry
    // labels 7 and 3 → predicted 3 ≠ true 5 → class 5 scores 0
    val tie = Seq(
      (1L, Array(1f, 0f), 3), (2L, Array(0.8f, 0.6f), 5),
      (3L, Array(0f, 1f), 7))
    val t = Similarity.knnClassify(tie.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", k = 2, dim = 2)
      .orderBy("true_label")
      .as[(Int, Long, Long, Double)].collect().toSeq
    assert(t.find(_._1 == 5).exists(r => r._3 == 0L),
      s"tied vote must break to min label (3), not true label 5: $t")
  }

  test("spherical k-means: unit centroids, direction beats magnitude, cohesion in range") {
    // two directions in 2-D with wildly different magnitudes: spherical
    // assignment must cluster by ANGLE, and each trained centroid must
    // sit on the unit sphere
    val vecs = Seq(
      (1L, Array(10.0f, 0.1f)), (2L, Array(0.5f, 0.01f)), (3L, Array(8.0f, 0.2f)),
      (4L, Array(0.1f, 12.0f)), (5L, Array(0.02f, 0.4f)), (6L, Array(0.3f, 9.0f))
    ).toDF("vec_id", "embedding")
    val c = vecs.select(col("vec_id").as("id"), col("embedding").as("vec"))
      .withColumn("nrm", l2Norm(col("vec")))
    val cen = Similarity.sphericalCentroids(c, numCells = 2, iters = 2)
      .select("cell_id", "ctrnrm").as[(Long, Double)].collect().toSeq
    assert(cen.size == 2)
    cen.foreach { case (_, n) =>
      assert(math.abs(n - 1.0) < 1e-4, s"centroid must be unit-norm, got $n")
    }
    val out = Similarity.sphericalKmeans(vecs, "vec_id", "embedding",
        numCells = 2, iters = 2)
      .orderBy("cell_id")
      .select("n_members", "cohesion").as[(Long, Double)].collect().toSeq
    assert(out.map(_._1).sum == 6L)
    assert(out == Seq((3L, out(0)._2), (3L, out(1)._2)), s"3/3 split by direction: $out")
    assert(out.forall(r => r._2 > 0.9 && r._2 <= 1.0), s"tight cones cohere: $out")
  }

  test("binaryTopK: sign words and Hamming ranking hand-checked") {
    // 64-dim vectors; q sets dims {1, 33}; c1 identical; c2 flips dim 1
    // and adds dim 2 (hamming 2); c3 orthogonal-ish {5, 40, 41} (h 5)
    def vec(dims: Set[Int]): Array[Float] =
      Array.tabulate(64)(i => if (dims.contains(i + 1)) 1.0f else -1.0f)
    val rows = Seq(
      (0L, vec(Set(1, 33))),
      (1L, vec(Set(1, 33))),
      (2L, vec(Set(2, 33))),
      (3L, vec(Set(5, 40, 41)))
    ).toDF("vec_id", "embedding")
    val got = Similarity.binaryTopK(rows, rows.where(col("vec_id") === 0L),
        "vec_id", "embedding", k = 3)
      .orderBy("rnk")
      .select("corpus_id", "hamming", "rnk")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L, 1L), (2L, 2L, 2L), (3L, 5L, 3L)),
      s"hand-computed hamming ranking mismatch: $got")
  }

  test("mmrRerank: near-duplicate of the top hit is demoted below a diverse result") {
    // q = x-axis; A1 and A2 nearly identical (sim ~1), B diverse
    // (sim ~0.57): relevance order is A1, A2, B but MMR (lambda 0.7)
    // must pick A1, then B, then A2
    val rows = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 1.0f, 0.0f)),    // A1
      (2L, Array(2.0f, 1.01f, 0.0f)),   // A2 (near-dup of A1)
      (3L, Array(2.0f, -1.1f, 0.0f))    // B (diverse)
    ).toDF("vec_id", "embedding")
    val q = rows.where(col("vec_id") === 0L)
    val plain = Similarity.bruteForceTopK(rows, q, "vec_id", "embedding", k = 3)
      .orderBy("rnk").select("corpus_id").as[Long].collect().toSeq
    assert(plain == Seq(1L, 2L, 3L), s"relevance order: $plain")
    val mmr = Similarity.mmrRerank(rows, q, "vec_id", "embedding",
        k = 3, depth = 3, lambdaTenths = 7)
      .orderBy("rnk").select("corpus_id").as[Long].collect().toSeq
    assert(mmr == Seq(1L, 3L, 2L), s"MMR must demote the near-dup: $mmr")
  }

  test("kmeansPurity: invariants on the fixture and partitioning-independence") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val got = Similarity.kmeansPurity(e, "vec_id", "embedding", "label",
        numCells = 8, iters = 2)
      .orderBy("cell_id")
      .select("cell_id", "n_points", "majority_label", "n_majority", "purity")
      .as[(Long, Long, Int, Long, Double)].collect().toSeq
    assert(got.map(_._2).sum == e.count(), "every vector lands in exactly one cell")
    got.foreach { r =>
      assert(r._4 <= r._2 && r._4 >= 1)
      assert(r._5 > 0.0 && r._5 <= 1.0)
      assert(math.abs(r._5 - r._4.toDouble / r._2) < 1e-6)
    }
    val again = Similarity.kmeansPurity(e.repartition(7), "vec_id", "embedding",
        "label", numCells = 8, iters = 2)
      .orderBy("cell_id")
      .select("cell_id", "n_points", "majority_label", "n_majority", "purity")
      .as[(Long, Long, Int, Long, Double)].collect().toSeq
    assert(again == got)
  }

  test("intrinsicDimFromKnn: a 1-D curve reads far lower than a full-rank cloud; duplicates drop") {
    def knnDim(pts: Seq[(Long, Array[Float])]): (Long, Long, Option[Double]) = {
      val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_twonn_${System.nanoTime()}"
      val df = pts.toDF("vec_id", "embedding")
      Similarity.ensureKnnGraph(df, "vec_id", "embedding", path,
        k = 3, nbits = 2, numTables = 8)
      Similarity.intrinsicDimFromKnn(spark, path)
        .as[(Long, Long, Option[Double])].head()
    }
    def pad64(v: Array[Float]) = v ++ Array.fill(64 - v.length)(0f)
    // 60 points on a 1-D arc (deterministic irrational spacing)
    val curve = (0 until 60).map { i =>
      val th = 0.02 * i + 0.003 * ((i * 37) % 11)
      (i.toLong, pad64(Array(math.cos(th).toFloat, math.sin(th).toFloat, 0f)))
    }
    // 60 points of a full-rank 16-D md5-derived cloud
    val cloud = (0 until 60).map { i =>
      val h = java.security.MessageDigest.getInstance("MD5")
        .digest(s"p$i".getBytes).map(b => (b & 0xff).toFloat / 255f - 0.5f)
      (i.toLong, pad64(h.take(16)))
    }
    val (np1, nu1, d1) = knnDim(curve)
    val (np2, nu2, d2) = knnDim(cloud)
    assert(d1.isDefined && d2.isDefined && d1.get < d2.get / 2,
      s"curve must read much lower than cloud: $d1 vs $d2")
    // exact duplicates have no local scale and must be dropped
    val dup = curve.take(20) ++ Seq((100L, curve.head._2), (101L, curve.head._2))
    val (np3, nu3, _) = knnDim(dup)
    assert(nu3 < np3, s"duplicate points must be dropped from the MLE: $np3/$nu3")
  }

  test("labelSpreadFromKnn: labels flow to cluster mates; seeds stay clamped") {
    def pad(v: Array[Float]) = v ++ Array.fill(64 - v.length)(0f)
    def jit(base: Array[Float], i: Int) =
      pad(base.zipWithIndex.map { case (x, j) =>
        x + (if (j < 3) 0.01f * ((i * 7 + j) % 5) else 0f) })
    val a = Array(1f, 0f, 0f); val b = Array(0f, 1f, 0f)
    // cluster A: ids 0 (seed, label 7), 1, 2; cluster B: ids 5 (seed,
    // label 9), 6, 7; id 10 sits INSIDE cluster A but is a seed with
    // label 9 — propagation must never overwrite it (A's non-seeds
    // see a 7-vs-9 seed tie and keep 7 via the min-label tie-break)
    val rows = Seq(
      (0L, jit(a, 0), 7), (1L, jit(a, 1), 7), (2L, jit(a, 2), 7),
      (5L, jit(b, 0), 9), (6L, jit(b, 1), 9), (7L, jit(b, 2), 9),
      (10L, jit(a, 3), 9))
    val df = rows.toDF("vec_id", "embedding", "label")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_lspread_${System.nanoTime()}"
    Similarity.ensureKnnGraph(df, "vec_id", "embedding", path,
      k = 3, nbits = 2, numTables = 8)
    val got = Similarity.labelSpreadFromKnn(spark, path, df,
        "vec_id", "label", seedMod = 5, rounds = 3)
      .select("vec_id", "is_seed", "label_pred", "correct")
      .as[(Long, Boolean, Option[Long], Option[Boolean])]
      .collect().sortBy(_._1).toSeq
    val byId = got.map(r => r._1 -> r).toMap
    assert(byId(0L)._2 && byId(0L)._3.contains(7L) && byId(0L)._4.isEmpty,
      s"seed reports no accuracy: $got")
    // A's non-seeds sit between a 7-seed and a 9-seed: they must be
    // REACHED (some seed label, audited), whichever the LSH-shaped
    // neighborhood elects
    Seq(1L, 2L).foreach { id =>
      assert(byId(id)._3.exists(Set(7L, 9L)) && byId(id)._4.isDefined,
        s"A non-seed unreached: $got")
    }
    // B is clean: only seed 5 feeds it
    assert(byId(6L)._3.contains(9L) && byId(6L)._4.contains(true), s"$got")
    assert(byId(7L)._3.contains(9L) && byId(7L)._4.contains(true), s"$got")
    // the A-embedded seed keeps ITS label against the majority vote
    assert(byId(10L)._2 && byId(10L)._3.contains(9L), s"clamp broken: $got")
    // deterministic across partitionings
    val again = Similarity.labelSpreadFromKnn(spark, path,
        df.repartition(5), "vec_id", "label", seedMod = 5, rounds = 3)
      .select("vec_id", "is_seed", "label_pred", "correct")
      .as[(Long, Boolean, Option[Long], Option[Boolean])]
      .collect().sortBy(_._1).toSeq
    assert(again == got)
  }

  test("dbscan: planted arc — dense blob is core, fringe point is border, far point is noise") {
    def at(deg: Double) = {
      val r = math.toRadians(deg)
      Array(math.cos(r).toFloat, math.sin(r).toFloat, 0f)
    }
    // blob at 0..4° (pairwise dist ≤ 1−cos4° ≈ 0.0024), fringe at 8°
    // (inside ε of ONLY the 4° point), noise at 90°
    val pts = (Seq(1L, 2L, 3L, 4L, 5L).zipWithIndex.map { case (id, i) =>
      (id, at(i.toDouble)) } ++ Seq((10L, at(8.0)), (20L, at(90.0))))
      .toDF("vec_id", "embedding")
    val got = Similarity.dbscan(pts, "vec_id", "embedding",
        eps = 0.003, minPts = 5)
      .select("p", "role", "cluster_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    (1L to 5L).foreach(id =>
      assert(got(id) == (("core", Some(1L))), s"$id: ${got(id)}"))
    assert(got(10L) == (("border", Some(1L))), s"border: ${got(10L)}")
    assert(got(20L) == (("noise", None)), s"noise: ${got(20L)}")
    // partitioning-invariant
    val again = Similarity.dbscan(pts.repartition(5), "vec_id", "embedding",
        0.003, 5)
      .select("p", "role", "cluster_id")
      .as[(Long, String, Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(again == got)
  }

  test("hierSingleLinkage: planted two-group structure resolves; merge distances are monotone") {
    // group A hugs e1, group B hugs e2 — tiny within-group angles,
    // 90° between groups; the dendrogram must exhaust both groups
    // before the final cross-group merge
    def v(x: Float, y: Float, z: Float) = Array(x, y, z)
    val pts = Seq(
      (0L, v(1f, 0.01f, 0f)), (1L, v(1f, 0.02f, 0f)), (2L, v(1f, 0f, 0.01f)),
      (10L, v(0.01f, 1f, 0f)), (11L, v(0.02f, 1f, 0f)), (12L, v(0f, 1f, 0.01f))
    ).toDF("vec_id", "embedding")
    val log = Similarity.hierSingleLinkage(pts, "vec_id", "embedding", rounds = 5)
      .orderBy("step")
      .select("step", "cluster_a", "cluster_b", "dist", "n_clusters")
      .as[(Long, Long, Long, Double, Long)].collect().toSeq
    assert(log.map(_._5) == Seq(5L, 4L, 3L, 2L, 1L))
    // single linkage is monotone: each merge at >= the previous dist
    assert(log.sliding(2).forall { case Seq(a, b) => b._4 >= a._4 },
      s"non-monotone dendrogram: $log")
    // the last merge is the cross-group one: clusters 0 and 10
    assert(log.last._2 == 0L && log.last._3 == 10L, log.last.toString)
    // ...and it sits far above the within-group merges
    assert(log.last._4 > 0.9 && log.init.forall(_._4 < 0.01), log.toString)
    // rounds must fit the point count
    intercept[IllegalArgumentException] {
      Similarity.hierSingleLinkage(pts, "vec_id", "embedding", rounds = 6)
    }
  }

  test("dbscan served path: epsGraph + core-map artifacts reproduce the direct op and build once") {
    val slice = spark.read.parquet(s"$sf001/embeddings.parquet")
      .where(col("vec_id") % 4 === 0)
    val direct = Similarity.dbscan(slice, "vec_id", "embedding",
        eps = 0.74, minPts = 4)
      .select("p", "n_eps", "role", "cluster_id")
      .as[(Long, Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    val epsPath = s"${System.getProperty("java.io.tmpdir")}/graft_spec_eps_${System.nanoTime()}"
    val mapPath = s"${epsPath}_map"
    Similarity.ensureEpsGraph(slice, "vec_id", "embedding", epsPath, maxEps = 0.8)
    Similarity.ensureDbscanMap(spark, epsPath, mapPath, eps = 0.74, minPts = 4)
    val served = Similarity.dbscanServed(spark, epsPath, mapPath,
        slice.select("vec_id"), "vec_id", eps = 0.74, minPts = 4)
      .select("p", "n_eps", "role", "cluster_id")
      .as[(Long, Long, String, Option[Long])].collect().sortBy(_._1).toSeq
    assert(served == direct, "served artifacts must reproduce the direct op")
    assert(direct.exists(_._3 == "core") && direct.exists(_._3 == "noise"),
      "fixture must exercise core and noise roles")
    // SINGLE-BUILD: re-ensure with a poisoned by-name points argument —
    // the marker short-circuit must never dereference it
    Similarity.ensureEpsGraph(
      sys.error("eps graph must not rebuild"): org.apache.spark.sql.DataFrame,
      "vec_id", "embedding", epsPath, maxEps = 0.8)
    // ...and neither ensure rewrites an existing artifact (marker mtime)
    def mtime(p: String) = new java.io.File(s"$p/_SUCCESS").lastModified()
    val (m1, m2) = (mtime(epsPath), mtime(mapPath))
    Similarity.ensureDbscanMap(spark, epsPath, mapPath, eps = 0.74, minPts = 4)
    assert(mtime(epsPath) == m1 && mtime(mapPath) == m2,
      "re-ensure must not rewrite existing artifacts")
  }

  test("ivfTopKFiltered: neighbors honor the predicate; pre-filter beats post-filter") {
    val e = spark.read.parquet(s"$sf001/embeddings.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_filt_${System.nanoTime()}"
    Similarity.ensureIvfIndex(e, "vec_id", "embedding", path, numCells = 16)
    val queries = e.where(col("vec_id") < 8)
    val allowed = e.where(col("label") % 2 === 0)
    val filt = Similarity.ivfTopKFiltered(path, queries, "vec_id", "embedding",
        allowed, "vec_id", k = 5, nprobe = 4)
      .select("query_id", "rnk", "corpus_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(filt.nonEmpty)
    val allowedSet = allowed.select("vec_id").as[Long].collect().toSet
    assert(filt.forall(r => allowedSet(r._3)),
      "every filtered neighbor must satisfy the predicate")
    // pre-filtering returns a FULL k for queries where post-filtering
    // the unfiltered top-5 would keep fewer — the recall point
    val unf = Similarity.ivfTopKIndexed(path, queries, "vec_id", "embedding",
        k = 5, nprobe = 4)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSeq
    val postKept = unf.count(r => allowedSet(r._2))
    assert(filt.size > postKept,
      s"pre-filter (${filt.size} rows) must out-recall post-filter ($postKept rows)")
  }

  test("indexStalenessReport: missing, orphaned, and fresh-share counts are exact") {
    def vec(i: Int) = Array.tabulate(8)(j => (i * 7 + j).toFloat / 10f)
    val indexed = (1 to 10).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val corpus = (3 to 12).map(i => (i.toLong, vec(i))).toDF("vec_id", "embedding")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_stale_${System.nanoTime()}"
    Similarity.ensureIvfIndex(indexed, "vec_id", "embedding", path, numCells = 4)
    val got = Similarity.indexStalenessReport(spark, path, corpus, "vec_id")
      .as[(Long, Long, Long, Long, Double)].head()
    // corpus 3..12 vs index 1..10: missing {11,12}, orphaned {1,2}
    assert(got == ((10L, 10L, 2L, 2L, 0.8)), s"staleness report: $got")
    // a marker-less index refuses to report
    intercept[IllegalArgumentException] {
      Similarity.indexStalenessReport(spark, s"${path}_nonexistent", corpus, "vec_id")
    }
  }
}
