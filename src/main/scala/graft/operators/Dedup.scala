package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._

/** Deduplication for large-scale training-data pipelines.
  *
  * Scale design (100 TB): the only safe join key is a *bucket* —
  * exact dedup buckets by content hash; near-dup buckets by MinHash
  * band, SimHash band, or hyperplane LSH. All-pairs comparison happens
  * only *within* buckets (candidate pairs), never globally. Hot-bucket
  * skew is the known failure mode; `maxBucketSize` caps it (documented
  * truncation) and AQE skew-join handles moderate skew.
  */
object Dedup {

  /** Exact dedup: group by content hash, keep the smallest id, report
    * multiplicity. One hash-aggregate shuffle on a 128-bit key —
    * optimal at any scale (map-side partial agg shrinks the shuffle to
    * ~|distinct| rows).
    */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup, corpus form: the input rows minus all-but-first of
    * each content group (keep = smallest id). What a training-data
    * pipeline actually materializes; [[exact]] is the report form.
    * One window over the 128-bit content hash — same single shuffle
    * as the aggregate, but rows survive with all their columns.
    */
  def keepFirst(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col(textCol))).orderBy(col(idCol))
    docs
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .drop("rn")
  }

  /** Word-shingle Jaccard near-dup pairs, exact via an inverted
    * index: posting list per shingle hash, ordered doc pairs from
    * each list, count co-occurrences, Jaccard = |∩| / (|A|+|B|−|∩|).
    *
    * Docs carry their shingle count into the posting lists, so no
    * sizes-table joins: the whole op is two shuffles (groupBy shingle,
    * groupBy pair) plus a spread-repartition. Quadratic cost
    * concentrates in high-document-frequency shingles; `maxDocFreq`
    * drops them (a shingle shared by >maxDocFreq docs is a
    * stopword-shingle carrying ~zero similarity signal — standard
    * df-cut). The default is 200: a single hot shingle at df=10000
    * would explode into C(10000,2) ≈ 5·10⁷ pairs — the op that falls
    * over first at 100×. The cut is NOT silent: the posting-list stage
    * carries an `observe` metric (`jaccard_df_cut`: dropped_shingles /
    * max_doc_freq_seen) readable via QueryExecutionListener.
    * Correctness-oracle callers pass maxDocFreq high enough to disable
    * the cut; the 100 TB path is [[minHashPairs]] (same answer shape,
    * LSH candidates only).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   n: Int, threshold: Double, maxDocFreq: Int = 200): DataFrame = {
    // shingles carry their 64-bit hash, not the string: smaller
    // shuffle and long-vs-long compares; intersection counts are
    // unchanged short of a 2^-64 collision. Each doc's shingle count
    // rides along in the posting lists, so Jaccard needs no
    // sizes-table joins — the whole op is exactly two shuffles
    // (groupBy shingle, groupBy pair).
    // n_sh is projected BEFORE the explode so the shingle array does
    // not ride through the Generate (copied into every exploded row)
    val sh = shingleHashRows(docs, idCol, wordShinglesFast(col(textCol), n))
    jaccardFromShingleHashes(sh, docs, threshold, maxDocFreq)
  }

  /** Char n-gram Jaccard near-dup pairs — same exact inverted-index
    * pipeline as [[jaccardPairs]] over character shingles
    * (charShinglesFast): robust to tokenization differences /
    * whitespace mangling that word shingles miss. Char grams are
    * denser, so thresholds run higher than word-shingle thresholds.
    */
  def jaccardPairsChar(docs: DataFrame, idCol: String, textCol: String,
                       n: Int, threshold: Double, maxDocFreq: Int = 200): DataFrame = {
    val sh = shingleHashRows(docs, idCol, charShinglesFast(col(textCol), n))
    jaccardFromShingleHashes(sh, docs, threshold, maxDocFreq)
  }

  /** (doc, n_sh, h) rows: one codegen'd regex pass + explode + one
    * codegen'd string hash per (doc, shingle). n_sh is projected
    * BEFORE the explode so the shingle array does not ride through the
    * Generate (copied into every exploded row).
    */
  private def shingleHashRows(docs: DataFrame, idCol: String, shingles: Column): DataFrame =
    docs
      .select(col(idCol).as("doc"), shingles.as("shs"))
      .select(col("doc"), size(col("shs")).as("n_sh"), col("shs"))
      .select(col("doc"), col("n_sh"), explode(col("shs")).as("s"))
      .select(col("doc"), col("n_sh"), xxhash64(col("s")).as("h"))

  private def jaccardFromShingleHashes(sh: DataFrame, docs: DataFrame,
                                       threshold: Double, maxDocFreq: Int): DataFrame = {
    // posting list per shingle: the aggregation is simultaneously the
    // inverted index, the sizes carrier, and the df-cut (lists longer
    // than maxDocFreq are stopword-shingles — dropped). Multi-doc
    // lists are a small fraction of the corpus, so AQE would coalesce
    // them onto few tasks; the pair explode amplifies C(df,2)-fold,
    // so spread lists across full parallelism BEFORE exploding.
    val nPart = docs.sparkSession.sessionState.conf.numShufflePartitions
    val postings = sh.groupBy("h")
      .agg(collect_list(struct(col("doc"), col("n_sh"))).as("ds"))
      // no silent cap: CollectMetrics is a free pass-through aggregate
      // (no extra job); listeners see how many shingles the df-cut
      // dropped and the hottest df observed
      .observe("jaccard_df_cut",
        sum(when(size(col("ds")) > maxDocFreq, 1L).otherwise(0L)).as("dropped_shingles"),
        max(size(col("ds"))).as("max_doc_freq_seen"))
      .where(size(col("ds")).between(2, maxDocFreq))
      .repartition(nPart)
    // ordered pairs via codegen'd double-explode (no join, no
    // interpreted higher-order functions in the hot path)
    val pairs = postings
      .select(explode(col("ds")).as("a"), col("ds"))
      .select(col("a"), explode(col("ds")).as("b"))
      .where(col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("a.n_sh").as("n_a"),
              col("b.doc").as("doc_b"), col("b.n_sh").as("n_b"))
    pairs
      .groupBy("doc_a", "doc_b", "n_a", "n_b")
      .agg(count(lit(1)).as("n_common"))
      .withColumn("jaccard", round(col("n_common") / (col("n_a") + col("n_b") - col("n_common")), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** Modulus for the MinHash permutation family: the Mersenne prime
    * 2^31−1. Values stay below 2^31, so an affine a·h+b never exceeds
    * ~2^62 — no ANSI long overflow — and the identical arithmetic runs
    * in plain SQL, which is what lets [[minHashPairs]] carry a FULL
    * DuckDB oracle (the oracle reproduces the banding, so both engines
    * compute the same candidate set by construction, not by recall
    * luck).
    */
  private[graft] val MinHashP: Long = 2147483647L

  /** Affine-permutation multipliers/offsets over mod-[[MinHashP]],
    * fixed at plan time from a seeded LCG: a ∈ [1, p−1], b ∈ [0, p−1].
    */
  private[graft] def minHashConsts(n: Int, seed: Long): IndexedSeq[(Long, Long)] = {
    var x = seed
    def next(): Long = { x = x * 6364136223846793005L + 1442695040888963407L; x }
    IndexedSeq.fill(n)((
      java.lang.Math.floorMod(next(), MinHashP - 1) + 1,
      java.lang.Math.floorMod(next(), MinHashP)))
  }

  /** MinHash signature from a pre-hashed shingle column (one md5 per
    * shingle — the expensive string hash — paid once by the caller;
    * pass `h mod anything ≥ 2^31` or the raw 60-bit hash). The k
    * permutations are affine maps mod the prime 2^31−1 — a multiply,
    * add, and mod per element, cheaper than a re-hash and
    * reproducible in any SQL engine. Pure column expressions, no ML
    * fitting, no driver state — a doc's signature is computable in
    * isolation, so this runs identically in batch and streaming.
    *
    * `hashes` must reference a materialized column (withColumn), not
    * an inline expression — it is referenced numHashes times and HOFs
    * get no common-subexpression elimination.
    */
  def minHashSignature(hashes: Column, numHashes: Int): Column = {
    val consts = minHashConsts(numHashes, seed = 42L)
    array(consts.map { case (a, b) =>
      array_min(transform(hashes, h => (lit(a) * (h % MinHashP) + lit(b)) % MinHashP))
    }: _*)
  }

  /** MinHash + LSH banding near-dup pairs (the scale path).
    *
    * signature (numBands·rowsPerBand mins) → band keys (arithmetic
    * fold of each band's slice) → explode → self-join on (band, key) →
    * distinct candidate pairs → exact Jaccard verification on
    * candidates only. P(candidate | J=s) = 1 − (1 − s^r)^b; with the
    * 16×4 defaults that is ≈0.89 at J=0.6 and ≈1 at J≥0.9 — recall is
    * structural only well above the banding design point. The DuckDB
    * oracle therefore REPLAYS the banding (same hashes, same
    * permutations, same band keys) instead of assuming recall=1
    * against exact Jaccard.
    *
    * Every stage is a narrow map or a bucket-key join; the candidate
    * set (not the corpus) pays the quadratic cost.
    */
  def minHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   shingleN: Int = 3, numBands: Int = 16, rowsPerBand: Int = 4,
                   threshold: Double = 0.6,
                   engineNeutralHash: Boolean = true): DataFrame = {
    val numHashes = numBands * rowsPerBand
    // one codegen'd regex pass + explode + one codegen'd string hash
    // per (doc, shingle) — everything downstream (signatures AND
    // verification sets) derives from these rows, never from
    // interpreted array HOFs. The default md5 hash (60 bits, like
    // simhash) keeps the ENTIRE pipeline — permutations, band keys,
    // verification intersections — engine-neutral, so the DuckDB
    // oracle replays it exactly; engineNeutralHash=false swaps in
    // xxhash64 (~2× cheaper string hash, same pipeline, same recall
    // characteristics) for production callers that don't need a SQL
    // twin.
    val shingleHash: Column =
      if (engineNeutralHash) conv(substring(md5(col("s")), 1, 15), 16, 10).cast("long")
      else pmod(xxhash64(col("s")), lit(MinHashP))
    val tok = docs
      .select(col(idCol).as("doc"), explode(wordShinglesFast(col(textCol), shingleN)).as("s"))
      .select(col("doc"), shingleHash.as("h"))

    // ONE aggregation produces both the signature mins and the
    // verification shingle-set: signatures via numHashes codegen'd MIN
    // aggregates (the per-row HOF fold stays out of whole-stage
    // codegen and is ~10× slower), the shingle-set via collect_set of
    // the 60-bit hashes (verification intersects hashes, not strings —
    // identical counts short of 2^-60 collisions). Both consumers
    // below read the same exchange (ReuseExchange), so the corpus is
    // scanned and shuffled once.
    val consts = minHashConsts(numHashes, seed = 42L)
    val minAggs = consts.zipWithIndex.map { case ((a, b), i) =>
      min((lit(a) * (col("h") % MinHashP) + lit(b)) % MinHashP).as(s"m$i")
    }
    val docTable = tok.groupBy(col("doc"))
      .agg(minAggs.head, minAggs.tail :+ collect_set(col("h")).as("sh"): _*)
    val shingleTable = docTable.select(col("doc"), col("sh"))
    val withSig = docTable
      .select(col("doc"), array((0 until numHashes).map(i => col(s"m$i")): _*).as("sig"))

    // band keys only — the heavy shingle arrays must NOT ride through
    // the numBands× explode and the self-join shuffle; they join back
    // on the (small) candidate set for verification. The key is an
    // arithmetic fold of the band's mins mod p (engine-neutral, 8
    // bytes); a cross-band key collision only adds a candidate that
    // exact verification then filters — in BOTH engines alike.
    val banded = withSig.select(
      col("doc"),
      explode(
        transform(sequence(lit(0), lit(numBands - 1)),
          b => struct(b.as("band"),
            aggregate(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), lit(0L),
              (k, m) => (k * lit(1000003L) + m) % MinHashP).as("key")))
      ).as("bk"))
      .select(col("doc"), col("bk.band").as("band"), col("bk.key").as("key"))

    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    candidates
      .join(shingleTable.select(col("doc").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shingleTable.select(col("doc").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("n_common", size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard",
        round(col("n_common") /
          (size(col("sh_a")) + size(col("sh_b")) - col("n_common")), 6))
      .where(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
  }

  /** SimHash of a token multiset: bit j of the signature is the sign
    * of Σ_tokens (bit j of hash(token) ? +1 : −1). Per-row HOF fold —
    * shuffle-free but interpreted; prefer [[simHashTable]] for
    * corpus-scale signature computation (same hash, same bits).
    */
  def simHash(tokensCol: Column): Column = {
    val counts = aggregate(
      tokensCol,
      array_repeat(lit(0L), SimHashBits),
      (acc, t) => {
        val h = conv(substring(md5(t), 1, 15), 16, 10).cast("long")
        zip_with(acc, sequence(lit(0), lit(SimHashBits - 1)),
          (a, j) => a + when(call_function("shiftright", h, j).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      }
    )
    aggregate(
      zip_with(counts, sequence(lit(0), lit(SimHashBits - 1)),
        (c, j) => when(c >= 0, call_function("shiftleft", lit(1L), j)).otherwise(lit(0L))),
      lit(0L), _.bitwiseOR(_))
  }

  /** Signature width: 60 bits = 15 md5 hex chars. md5 (not xxhash64)
    * keeps the token hash engine-neutral, so the ENTIRE simhash
    * pipeline — signatures, banding, hamming — is reproducible in
    * plain SQL and carries a full DuckDB oracle (pigeonhole banding
    * is exact, not lossy: every pair within the radius is found).
    * 60 divides evenly into the (maxHamming+1)=4 bands of 15 bits.
    */
  val SimHashBits = 60

  /** Corpus SimHash signatures via explode + ONE typed aggregate:
    * token rows hash once (codegen'd md5 + conv), then a single
    * `Aggregator` accumulates all per-bit ±1 counts in one primitive
    * long[60] buffer (graft.functions.Aggregators.SimHashSig) with
    * map-side partial aggregation — versus the previous 60 separate
    * SUM(CASE…) columns, this is one aggregate expression and one
    * array-typed partial instead of 60 wide long columns. ~20× faster
    * than the per-row HOF fold; bit semantics unchanged (bit j set iff
    * Σ±1 ≥ 0), so the DuckDB oracle's 60 bit-sum columns still match.
    * Docs with no tokens produce no signature.
    */
  def simHashTable(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs
      .select(col(idCol).as("doc"), explode(tokens(col(textCol))).as("tk"))
      .withColumn("h", conv(substring(md5(col("tk")), 1, 15), 16, 10).cast("long"))
    tok.groupBy(col("doc"))
      .agg(graft.functions.Aggregators.simhashSig(col("h"), SimHashBits).as("sig"))
  }

  /** SimHash near-dup pairs with Hamming distance ≤ maxHamming.
    * Banding by pigeonhole: split the signature into (maxHamming+1)
    * bands — any pair within distance k agrees exactly on ≥1 band, so
    * the candidate set is COMPLETE (this is a partition-pruning
    * technique, not a lossy sketch). Join on (band, bandBits), verify
    * with bit_count(xor). Same bucket-join-verify shape as MinHash;
    * signatures are 8 bytes, so the shuffle is tiny even at 100 TB.
    */
  def simHashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val nBands = maxHamming + 1
    val bandBits = SimHashBits / nBands
    val sigs = simHashTable(docs, idCol, textCol)
    val banded = sigs.select(
      col("doc"), col("sig"),
      explode(transform(sequence(lit(0), lit(nBands - 1)),
        b => struct(b.as("band"),
          call_function("shiftrightunsigned", col("sig"), b * bandBits)
            .bitwiseAND(lit((1L << bandBits) - 1)).as("key")))).as("bk"))
      .select(col("doc"), col("sig"), col("bk.band").as("band"), col("bk.key").as("key"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.key") === col("b.key") &&
          col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
              col("a.sig").as("sig_a"), col("b.sig").as("sig_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))).cast("long"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Connected components over a near-dup pair graph: every doc gets
    * `cluster_id` = the smallest doc id reachable through pairs
    * (singletons cluster with themselves). This is what a dedup
    * pipeline actually materializes — keep `doc_id == cluster_id`, or
    * pick per-cluster representatives by any policy.
    *
    * Distributed min-label propagation: labels start as own id; each
    * round takes the min of a vertex's label and its neighbors'
    * labels; converges in O(component diameter) rounds — near-dup
    * clusters are small and dense, so typically 2-4. Each round is one
    * equi-join + one aggregate; `localCheckpoint` cuts lineage so the
    * plan stays flat at any round count; the per-round convergence
    * check is a control-plane count, not a data collect.
    */
  def connectedClusters(vertices: DataFrame, idCol: String,
                        pairs: DataFrame): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint()
    var labels = vertices.select(col(idCol).as("id"), col(idCol).as("lab"))
      .localCheckpoint()
    var changed = 1L
    while (changed > 0) {
      val nbrMin = edges
        .join(labels.select(col("id").as("src"), col("lab").as("nlab")), "src")
        .groupBy(col("dst").as("id"))
        .agg(min(col("nlab")).as("nbrmin"))
      val updated = labels
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"), col("lab"),
                least(col("lab"), coalesce(col("nbrmin"), col("lab"))).as("lab2"))
        .localCheckpoint()
      changed = updated.where(col("lab2") < col("lab")).count()
      labels = updated.select(col("id"), col("lab2").as("lab"))
    }
    labels.select(col("id").as("doc_id"), col("lab").as("cluster_id"))
  }

  /** Embedding near-dup: exact cosine ≥ threshold over all pairs of a
    * (pre-filtered) set. Exact and quadratic — callers restrict the
    * input (correctness oracle) or use [[embeddingPairsLsh]].
    */
  def embeddingPairsExact(emb: DataFrame, idCol: String, vecCol: String,
                          threshold: Double): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", l2Norm(col("vec")))
    v.as("a").join(v.as("b"), col("a.id") < col("b.id"))
      .withColumn("cos", round(
        cosineFromParts(dotD(col("a.vec"), col("b.vec")), col("a.nrm"), col("b.nrm")), 6))
      .where(col("cos") >= threshold)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("cos"))
  }

  /** Embedding near-dup at scale: hyperplane-LSH bucket join, exact
    * cosine verification within buckets only. Multiple independent
    * bucket tables (numTables) recover recall lost to bit boundaries.
    */
  def embeddingPairsLsh(emb: DataFrame, idCol: String, vecCol: String,
                        threshold: Double, nbits: Int = 12,
                        numTables: Int = 4): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).as("vec"))
      .withColumn("nrm", l2Norm(col("vec")))
    val bucketed = v.select(
      col("id"), col("vec"), col("nrm"),
      explode(array((0 until numTables).map(t =>
        struct(lit(t).as("t"), hyperplaneBucket(col("vec"), nbits, seed = 7 + t).as("bucket"))): _*)).as("tb"))
      .select(col("id"), col("vec"), col("nrm"), col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
              col("a.vec").as("va"), col("b.vec").as("vb"),
              col("a.nrm").as("na"), col("b.nrm").as("nb"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", round(
        cosineFromParts(dotD(col("va"), col("vb")), col("na"), col("nb")), 6))
      .where(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
  }
}
