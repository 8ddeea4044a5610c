package graft

import org.apache.spark.sql.functions._
import graft.operators.Embeddings

class EmbeddingsSpec extends SparkSpec {
  import spark.implicits._

  test("int8 quantization: values in [-127, 127], dequantize error bounded") {
    val e = Tables.embeddings(spark, sf001)
    val q = Embeddings.quantizeInt8(e, "vec_id", "embedding")
    val rows = q.select("id", "dim", "q", "scale").as[(Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, _, qv, _) => qv >= -127 && qv <= 127 },
      "quantized values must fit int8")
    // dequantized component must be within half a quantization step
    val err = q.join(e.select(col("vec_id").as("id"), posexplode(col("embedding"))),
        Seq("id"))
      .where(col("dim") === col("pos") + 1)
      .select(abs(col("q") / col("scale") - col("col").cast("double")).as("e"),
              (lit(0.5) / col("scale")).as("bound"))
      .where(col("e") > col("bound") + 1e-9)
    assert(err.count() == 0, "dequantize error must stay within 0.5/scale")
  }

  test("topPrincipalComponent recovers a planted dominant axis, unit-norm") {
    // variance planted on dim 2 (σ²=4 vs σ²≈0 elsewhere): the top
    // component must align with e₂ and report eigenvalue ≈ 4
    val rows = (0 until 40).map { k =>
      val sign = if (k % 2 == 0) 1f else -1f
      (k.toLong, Array(0.01f * (k % 3), 2f * sign, 0.02f * (k % 2)))
    }
    val got = Embeddings.topPrincipalComponent(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", iters = 12)
      .orderBy("dim")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    val loadings = got.map(_._2)
    assert(math.abs(math.abs(loadings(1)) - 1.0) < 0.01,
      s"dim-2 loading should dominate, got ${loadings.toSeq}")
    assert(math.abs(math.sqrt(loadings.map(x => x * x).sum) - 1.0) < 1e-6,
      "component must be unit-norm")
    assert(math.abs(got.head._3 - 4.0) < 0.1,
      s"eigenvalue should be ~4 (planted variance), got ${got.head._3}")
  }

  test("topPrincipalComponents: deflation recovers two planted axes in variance order, near-orthogonal") {
    // σ²=4 planted on dim 2, σ²=1 on dim 3, ~0 elsewhere: component 1
    // must align with e₂ (λ≈4), component 2 with e₃ (λ≈1)
    val rows = (0 until 40).map { k =>
      val s2 = if (k % 2 == 0) 1f else -1f
      val s3 = if ((k / 2) % 2 == 0) 1f else -1f
      (k.toLong, Array(0.01f * (k % 3), 2f * s2, 1f * s3, 0.02f * (k % 2)))
    }
    val got = Embeddings.topPrincipalComponents(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding",
        nComponents = 2, iters = 12)
      .orderBy("component", "dim")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    val c1 = got.filter(_._1 == 1L).sortBy(_._2)
    val c2 = got.filter(_._1 == 2L).sortBy(_._2)
    assert(math.abs(math.abs(c1(1)._3) - 1.0) < 0.01,
      s"component 1 must align with dim 2, got ${c1.map(_._3).toSeq}")
    assert(math.abs(math.abs(c2(2)._3) - 1.0) < 0.01,
      s"component 2 must align with dim 3, got ${c2.map(_._3).toSeq}")
    assert(math.abs(c1.head._4 - 4.0) < 0.1 && math.abs(c2.head._4 - 1.0) < 0.05,
      s"eigenvalues must come out in variance order ~(4, 1), got ${(c1.head._4, c2.head._4)}")
    val dot = c1.map(_._3).zip(c2.map(_._3)).map { case (a, b) => a * b }.sum
    assert(math.abs(dot) < 1e-3, s"components must be near-orthogonal, got dot=$dot")
    // component 1 equals the single-component op (same covariance,
    // same rounds)
    val single = Embeddings.topPrincipalComponent(
        rows.toDF("vec_id", "embedding"), "vec_id", "embedding", iters = 12)
      .orderBy("dim").collect().map(_.getDouble(1)).toSeq
    assert(c1.map(_._3).toSeq == single,
      "first deflation component must equal the single-component op")
  }

  test("whiten: axis-aligned grid scores to exactly ±1 per component (unit variance)") {
    // 4 points at (±2, ±1): covariance diag(4, 1), components = axes,
    // so whitened scores are x/√4 = ±1 and y/√1 = ±1 exactly. 20
    // rounds, not 8: the off-axis residue decays 4× per round and the
    // round-9 contract snaps it to zero once below 5e-10, making the
    // basis (and so the scores) exact instead of convergence-tailed
    val rows = Seq(
      (1L, Array(2f, 1f)), (2L, Array(2f, -1f)),
      (3L, Array(-2f, 1f)), (4L, Array(-2f, -1f)))
    val got = Embeddings.whiten(rows.toDF("vec_id", "embedding"),
        "vec_id", "embedding", nComponents = 2, iters = 20)
      .as[(Long, Long, Double)].collect()
      .map { case (id, c, s) => (id, c) -> s }.toMap
    assert(got == Map(
      (1L, 1L) -> 1.0, (1L, 2L) -> 1.0,
      (2L, 1L) -> 1.0, (2L, 2L) -> -1.0,
      (3L, 1L) -> -1.0, (3L, 2L) -> 1.0,
      (4L, 1L) -> -1.0, (4L, 2L) -> -1.0), s"got $got")
  }

  test("quantization drops all-zero vectors instead of dividing by zero") {
    val z = Seq((1L, Array(0f, 0f, 0f)), (2L, Array(1f, -2f, 0.5f)))
      .toDF("vec_id", "embedding")
    val q = Embeddings.quantizeInt8(z, "vec_id", "embedding")
    val ids = q.select("id").distinct().as[Long].collect().toSet
    assert(ids == Set(2L))
    // max-magnitude component maps to ±127 exactly
    val qm = q.where(col("dim") === 2).select("q").as[Long].head()
    assert(qm == -127L)
  }

  test("centroidDrift: zero for identical slices, exact L2 for a known shift") {
    val a = Seq((1L, Array(1f, 0f)), (2L, Array(0f, 1f))).toDF("id", "embedding")
    val same = graft.operators.Embeddings.centroidDrift(a, a, "embedding")
      .as[(Double, Long, Long)].head()
    assert(same == ((0.0, 2L, 2L)), s"identical slices must drift 0, got $same")
    // shift every vector by +0.3 in dim 1: centroid moves exactly 0.3
    val b = Seq((1L, Array(1.3f, 0f)), (2L, Array(0.3f, 1f))).toDF("id", "embedding")
    val drift = graft.operators.Embeddings.centroidDrift(a, b, "embedding")
      .as[(Double, Long, Long)].head()
    assert(drift._1 == 0.3, s"known 0.3 shift, got $drift")
  }

  test("matryoshka truncation: prefix kept, renorm unit-L2, full-dim truncation is the identity for retrieval") {
    import graft.operators.Similarity
    val e = Tables.embeddings(spark, sf001)
    val tr = Embeddings.matryoshkaTruncate(e, "embedding", dims = 16)
    val rows = tr.select("embedding").as[Array[Float]].collect()
    assert(rows.forall(_.length == 16), "truncation must keep exactly dims coords")
    // renorm: unit L2 within float tolerance
    rows.take(50).foreach { v =>
      val n = math.sqrt(v.map(x => x.toDouble * x).sum)
      assert(math.abs(n - 1.0) < 1e-5, s"renormalized norm $n != 1")
    }
    // prefix preservation up to the scale factor: direction unchanged
    val raw = Embeddings.matryoshkaTruncate(e, "embedding", dims = 16, renorm = false)
      .select("embedding").as[Array[Float]].collect()
    assert(raw.forall(_.length == 16))
    // truncating to the full 64 dims changes nothing for retrieval:
    // top-k on the "truncated" corpus equals exact top-k
    val q64 = Embeddings.matryoshkaTruncate(e, "embedding", dims = 64, renorm = false)
    val a = Similarity.bruteForceTopK(q64, q64.where(col("vec_id") < 4),
        "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val b = Similarity.bruteForceTopK(e, e.where(col("vec_id") < 4),
        "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    assert(a == b, "dims=64 truncation must be the retrieval identity")
    // 16-dim retrieval keeps meaningful recall on this corpus
    val tr16 = Similarity.bruteForceTopK(raw0(e), raw0(e).where(col("vec_id") < 4),
        "vec_id", "embedding", 5)
      .select("query_id", "corpus_id").as[(Long, Long)].collect().toSet
    val recall = (b & tr16).size.toDouble / b.size
    assert(recall > 0.1, s"16-dim prefix recall $recall collapsed")
  }

  private def raw0(e: org.apache.spark.sql.DataFrame) =
    Embeddings.matryoshkaTruncate(e, "embedding", dims = 16, renorm = false)

  test("effectiveDim: single active axis → 1, two equal axes → 2") {
    val oneAxis = Seq((1L, Array(1f, 0f)), (2L, Array(-1f, 0f)))
      .toDF("vec_id", "embedding")
    val g1 = Embeddings.effectiveDim(oneAxis, "embedding")
      .select("n_dims", "effective_dim", "isotropy_ratio")
      .as[(Long, Double, Double)].collect().head
    assert(g1 == ((2L, 1.0, 0.5)), s"got $g1")
    val iso = Seq((1L, Array(1f, 1f)), (2L, Array(-1f, -1f)))
      .toDF("vec_id", "embedding")
    val g2 = Embeddings.effectiveDim(iso, "embedding")
      .select("effective_dim").as[Double].collect().head
    assert(g2 == 2.0, s"got $g2")
  }

  test("dimStats: exact moments and the integer dead-dimension flag") {
    val e = Seq((1L, Array(1f, 3f)), (2L, Array(-1f, 3f)))
      .toDF("vec_id", "embedding")
    val got = Embeddings.dimStats(e, "embedding")
      .select("dim", "mean", "variance", "is_dead")
      .as[(Long, Double, Double, Boolean)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, 0.0, 1.0, false), (2L, 3.0, 0.0, true)), s"got $got")
  }

  test("jlSigns: deterministic ±1 matrix; jlProject basis vector lands on the sign column") {
    val s1 = Embeddings.jlSigns(64, 8, "jl")
    assert(s1 == Embeddings.jlSigns(64, 8, "jl"))
    assert(s1.size == 8 && s1.forall(_.size == 64))
    assert(s1.flatten.forall(v => v == 1L || v == -1L))
    assert(s1.flatten.toSet.size == 2, "a degenerate all-same matrix is no projection")
    // e1 = (1, 0, …): y_j = sign(j,1)/√8, both norms 1, distortion 1
    val e1 = (1L, Array.tabulate(64)(i => if (i == 0) 1f else 0f))
    val zero = (2L, Array.fill(64)(0f))
    val df = Seq(e1, zero).toDF("vec_id", "embedding")
    val rows = Embeddings.jlProject(df, "vec_id", "embedding", dIn = 64, dOut = 8)
      .orderBy("id").collect()
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val r = rows(0)
    assert(r.getDouble(1) == 1.0 && r.getDouble(2) == 1.0 && r.getDouble(3) == 1.0,
      s"unit basis vector must keep its norm exactly: $r")
    (1 to 8).foreach { j =>
      val expect = r6(s1(j - 1)(0).toDouble * 10000.0 / 10000.0 / math.sqrt(8.0))
      assert(r.getDouble(3 + j) == expect, s"y$j: got ${r.getDouble(3 + j)}, want $expect")
    }
    val z = rows(1)
    assert(z.getDouble(1) == 0.0 && z.getDouble(2) == 0.0 && z.isNullAt(3),
      s"zero vector: zero norms, null distortion: $z")
  }

  test("isotropy: collapsed cone reads 1, orthogonal basis reads 0, zero vectors drop") {
    def basis(i: Int) = Array.tabulate(8)(j => if (j == i) 2f else 0f)
    def run(vs: Seq[Array[Float]]) =
      Embeddings.isotropy(
        vs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding"), "embedding")
        .select("n_vecs", "mean_pairwise_cos", "mean_vec_norm")
        .as[(Long, Double, Double)].head()
    // all vectors identical (scaled copies): every pairwise cos = 1
    val cone = run(Seq(basis(0), basis(0), Array.tabulate(8)(j => if (j == 0) 5f else 0f)))
    assert(cone == ((3L, 1.0, 1.0)), s"collapsed cone must read 1: $cone")
    // orthogonal basis: every pairwise cos = 0; ‖Σu‖ = √4/4 = 0.5
    val ortho = run((0 until 4).map(basis))
    assert(ortho._1 == 4L && ortho._2 == 0.0 && ortho._3 == 0.5, s"$ortho")
    // antipodal pair: the one ordered-pair mean is −1; zero vec drops
    val anti = run(Seq(basis(1), basis(1).map(-_), Array.fill(8)(0f)))
    assert(anti._1 == 2L && anti._2 == -1.0 && anti._3 == 0.0, s"$anti")
  }
}
