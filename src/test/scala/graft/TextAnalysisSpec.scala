package graft

import org.apache.spark.sql.functions._
import graft.operators.TextAnalysis

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("token stats count whitespace and BPE-ish tokens") {
    val d = Seq((1L, "Hello, world! 42 times")).toDF("doc_id", "text")
    val got = TextAnalysis.tokenStats(d, "doc_id", "text")
      .select("n_tokens", "n_bpe_tokens").as[(Long, Long)].head()
    // whitespace: [Hello,] [world!] [42] [times]
    // bpe-ish:    [Hello] [,] [world] [!] [42] [times]
    assert(got == ((4L, 6L)))
  }

  test("langid classifies crafted strings per language") {
    val d = Seq(
      (1L, "the cat is in the house and it is happy"),
      (2L, "der hund ist nicht in das haus und die katze"),
      (3L, "el perro y la casa de los vecinos en madrid"),
      (4L, "le chien est dans la maison et les chats"),
      (5L, "今天天气很好我们去公园散步吧这是中文文本内容"),
      (6L, "xqzt bnmp vwry")).toDF("doc_id", "text")
    val got = TextAnalysis.langIdTable(d, "doc_id", "text")
      .orderBy("doc_id").select("lang_pred").as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr", "zh", "und"))
  }

  test("quality score favors natural prose over symbol soup") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and it is a fine day in the park"),
      (2L, "@@@@ #### $$$$ 1234 %%%% ^^^^ 5678 &&&& !!!!")).toDF("doc_id", "text")
    val scores = TextAnalysis.qualityScore(d, "doc_id", "text")
      .orderBy("doc_id").select("quality_score").as[Double].collect()
    assert(scores(0) > 0.6 && scores(1) < 0.3)
  }

  test("fingerprint is invariant to case/punct/extra whitespace") {
    val d = Seq(
      (1L, "Hello, World! This is GREAT."),
      (2L, "hello   world this is great"),
      (3L, "something else entirely here")).toDF("doc_id", "text")
    val fps = TextAnalysis.fingerprints(d, "doc_id", "text")
      .orderBy("doc_id").select("fingerprint").as[String].collect()
    assert(fps(0) == fps(1) && fps(0) != fps(2))
  }

  test("tfidf ranks a doc-specific rare term above corpus-wide terms") {
    val d = Seq(
      (1L, "common words everywhere plus zebra zebra"),
      (2L, "common words everywhere plus nothing"),
      (3L, "common words everywhere plus little")).toDF("doc_id", "text")
    val top = TextAnalysis.tfidfTopTerms(d, "doc_id", "text", k = 1)
      .where($"doc_id" === 1).select("term").as[String].collect()
    assert(top.toSeq == Seq("zebra")) // tf=2 and df=1 → max tfidf
  }

  test("char-bigram LM scores in-distribution text above alien text") {
    val common = (1 to 8).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog again and again"))
    val alien = Seq((9L, "zzqx jjvv wwkk qqpp xxyy zzqx jjvv"))
    val d = (common ++ alien).toDF("doc_id", "text")
    val scores = TextAnalysis.charLmScore(d, "doc_id", "text")
      .orderBy("doc_id").select("avg_logprob").as[Double].collect()
    assert(scores.take(8).forall(_ > scores.last),
      s"alien doc must score lowest: ${scores.toSeq}")
  }

  test("charLmScore: over-cap vocabulary drops the broadcast hints, keeps scores") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("doc_id", "text")
    val hinted   = TextAnalysis.charLmScore(d, "doc_id", "text")
    val fallback = TextAnalysis.charLmScore(d, "doc_id", "text", maxBroadcastVocab = 1)
    assert(fallback.orderBy("doc_id").select("n_bigrams", "avg_logprob")
             .as[(Long, Double)].collect().toSeq ==
           hinted.orderBy("doc_id").select("n_bigrams", "avg_logprob")
             .as[(Long, Double)].collect().toSeq)
    assert(hinted.queryExecution.optimizedPlan.toString.toLowerCase.contains("broadcast"),
      "small vocab must carry explicit broadcast hints")
    assert(!fallback.queryExecution.optimizedPlan.toString.toLowerCase.contains("broadcast"),
      "over-cap vocab must leave the join strategy to the engine")
  }

  test("pii redaction replaces emails/ips/phones and counts them") {
    val d = Seq(
      (1L, "contact bob@example.com or 10.0.0.1 or +1 (555) 123-4567 now"),
      (2L, "no pii here at all")).toDF("doc_id", "text")
    val got = TextAnalysis.piiTable(d, "doc_id", "text").orderBy("doc_id")
      .select("redacted", "n_emails", "n_ips", "n_phones")
      .as[(String, Long, Long, Long)].collect()
    assert(got(0)._1 == "contact <EMAIL> or <IP> or <PHONE> now")
    assert((got(0)._2, got(0)._3, got(0)._4) == ((1L, 1L, 1L)))
    assert(got(1) == (("no pii here at all", 0L, 0L, 0L)))
  }

  test("repetitionStats flags looping text, passes varied text") {
    val d = Seq(
      (1L, "buy now click here buy now click here buy now click here buy now click here"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (3L, "a b")).toDF("doc_id", "text") // < 3 tokens → no grams → absent
    val got = TextAnalysis.repetitionStats(d, "doc_id", "text", n = 3)
      .orderBy("doc_id")
      .select("doc_id", "dup_ratio", "top_gram_share")
      .as[(Long, Double, Double)].collect().toSeq
    assert(got.map(_._1) == Seq(1L, 2L))
    assert(got(0)._2 > 0.5, s"looping doc must show high dup ratio: ${got(0)}")
    assert(got(1)._2 == 0.0, s"varied doc has no duplicate 3-grams: ${got(1)}")
    assert(got(0)._3 > got(1)._3)
  }

  test("contaminationFlags finds docs overlapping the benchmark, scores the share") {
    val train = Seq(
      (1L, "alpha beta gamma delta epsilon"),      // contains benchmark 3-gram
      (2L, "one two three four five six")).toDF("doc_id", "text")
    val bench = Seq((100L, "alpha beta gamma zeta")).toDF("doc_id", "text")
    val got = TextAnalysis.contaminationFlags(train, bench, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect().toSeq
    // doc 1 has 3 distinct 3-grams, exactly one ("alpha beta gamma") in the benchmark
    assert(got == Seq((1L, 1L, 0.333333)))
  }

  test("textRankKeywords: hub word outranks leaves; rank mass sums to ~1; single-token docs safe") {
    // star co-occurrence: "hub" adjacent to every leaf; leaves only
    // ever touch hub → hub must take the top rank
    val d = Seq((1L, "hub aa hub bb hub cc"), (2L, "hub dd"), (3L, "solo"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.textRankKeywords(d, "text", iters = 6, k = 10)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(got.head._1 == "hub", s"got ${got.toSeq}")
    assert(got.map(_._3).toSeq == (1L to got.length), "ranks must be 1..n")
    // 'solo' has no adjacent pair → never becomes a node
    assert(!got.exists(_._1 == "solo"))
    assert(math.abs(got.map(_._2).sum - 1.0) < 1e-3,
      s"rank mass drifted: ${got.map(_._2).sum}")
  }

  test("vocabTopTerms ranks by total frequency with doc frequency carried") {
    val d = Seq(
      (1L, "apple apple banana"),
      (2L, "apple cherry cherry"),
      (3L, "banana apple")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabTopTerms(d, "doc_id", "text", k = 2)
      .orderBy("rnk").as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(("apple", 4L, 3L, 1L), ("banana", 2L, 2L, 2L)))
  }

  test("packTokenBudget: packs respect the budget boundary within a shard") {
    // single shard (nShards=1) so the packing order is just doc_id
    val d = Seq(
      (1L, "a b c d"), (2L, "e f g"), (3L, "h i j k l"), (4L, "m n")
    ).toDF("doc_id", "text")
    // budget 7: doc1 starts at 0 (pack 0), doc2 at 4 (pack 0),
    // doc3 at 7 (pack 1), doc4 at 12 (pack 1)
    val got = TextAnalysis.packTokenBudget(d, "doc_id", "text", budget = 7, nShards = 1)
      .orderBy("doc_id")
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L)))
  }

  test("embeddingQuality flags NaN and near-zero vectors as degenerate") {
    import graft.operators.Embeddings
    val e = Seq(
      (1L, Array(3.0f, 4.0f)),
      (2L, Array(0.0f, 0.0f)),
      (3L, Array(Float.NaN, 1.0f))
    ).toDF("vec_id", "embedding")
    val got = Embeddings.embeddingQuality(e, "vec_id", "embedding")
      .orderBy("id")
      .select("id", "dim", "norm", "has_nan", "is_degenerate")
      .as[(Long, Long, Double, Boolean, Boolean)].collect().toSeq
    assert(got(0) == ((1L, 2L, 5.0, false, false)))
    assert(got(1)._5 && !got(1)._4, "zero vector degenerate without NaN")
    assert(got(2)._4 && got(2)._5, "NaN vector degenerate with NaN flag")
  }

  test("hashFeatures: counts conserve tokens, buckets bounded, same term same bucket") {
    import graft.operators.TextAnalysis
    import org.apache.spark.sql.functions._
    val docs = Seq((1L, "a b a c"), (2L, "a a a")).toDF("doc_id", "text")
    val got = TextAnalysis.hashFeatures(docs, "doc_id", "text", numBuckets = 8)
    val rows = got.select("doc_id", "bucket", "cnt").as[(Long, Long, Long)].collect()
    assert(rows.forall { case (_, b, _) => b >= 0 && b < 8 })
    val perDoc = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(perDoc == Map(1L -> 4L, 2L -> 3L), "bucket counts must conserve tokens")
    // 'a' hashes identically in both docs: doc 2's single bucket is
    // also present in doc 1
    val d2bucket = rows.filter(_._1 == 2L).map(_._2).toSet
    assert(d2bucket.size == 1 && rows.filter(_._1 == 1L).map(_._2).toSet.contains(d2bucket.head))
  }

  test("collocations: fixed pair outranks independent words; floor excludes rare pairs") {
    import graft.operators.TextAnalysis
    // "new york" always co-occurs (PMI high); "the" pairs freely with
    // everything (PMI ~0); "rare pair" appears once (< minCount, cut)
    val docs = (1 to 10).map { i =>
      (i.toLong, s"new york is the city the a$i visited rare" +
        (if (i == 1) " pair" else ""))
    }.toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "doc_id", "text", minCount = 5, k = 5)
      .select("bigram", "rnk").as[(String, Long)].collect().toSeq
    assert(got.nonEmpty && got.map(_._2) == (1L to got.length))
    assert(got.head._1 == "new york", s"strongest collocation should be 'new york', got $got")
    assert(!got.exists(_._1 == "rare pair"), "below-floor pair must be cut")
  }

  test("bm25: exact-match doc outranks partial-match; k bounds output") {
    val docs = Seq(
      (1L, "hash join hash join vector"),
      (2L, "hash table scan"),
      (3L, "sort merge only"),
      (4L, "vector vector vector vector vector vector vector vector")
    ).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", Seq("hash", "join", "vector"), k = 3)
      .collect()
    assert(got.length == 3)
    // doc 1 hits all three query terms — must rank first
    assert(got.head.getLong(0) == 1L)
    // doc 3 matches nothing and must be absent entirely
    assert(!got.map(_.getLong(0)).contains(3L))
  }

  test("bm25Prf: feedback terms expand recall to docs the raw query cannot reach") {
    // 'probe' rides with 'hash' in the feedback docs; doc 5 contains
    // ONLY 'probe' and is invisible to the raw query — expansion
    // must surface it
    val docs = Seq(
      (1L, "hash probe hash probe"),
      (2L, "hash probe build"),
      (3L, "hash build side"),
      (4L, "sort merge only"),
      (5L, "probe probe probe")
    ).toDF("doc_id", "text")
    val raw = graft.operators.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", Seq("hash"), k = 10)
      .select("doc_id").as[Long].collect().toSet
    assert(!raw.contains(5L), "precondition: raw query must miss doc 5")
    val prf = graft.operators.TextAnalysis
      .bm25Prf(docs, "doc_id", "text", Seq("hash"), k = 10,
        fbDocs = 3, fbTerms = 2)
      .select("doc_id", "expansion").as[(Long, String)].collect()
    assert(prf.map(_._1).contains(5L), s"expansion must surface doc 5: ${prf.toSeq}")
    val expansion = prf.head._2.split(",").toSet
    assert(expansion.contains("probe"), s"'probe' must be mined: $expansion")
    assert(!expansion.contains("hash"), "original terms never re-enter the expansion")
  }

  test("bm25TopKBatch: per-query rankings equal the single-query op; duplicate query terms dedupe") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "hash join hash join vector"),
      (2L, "hash table scan"),
      (3L, "sort merge only"),
      (4L, "vector vector vector vector vector vector vector vector")
    ).toDF("doc_id", "text")
    // query 2 repeats its term — batch must dedupe to the single-op
    // Seq("vector") semantics
    val qs = Seq((1L, "hash join"), (2L, "vector vector")).toDF("query_id", "qtext")
    val batch = TextAnalysis.bm25TopKBatch(docs, "doc_id", "text", qs,
        "query_id", "qtext", k = 3)
      .select("query_id", "doc_id", "score", "n_terms_hit")
      .as[(Long, Long, Double, Long)].collect()
      .groupBy(_._1).map { case (q, rs) => q -> rs.map(r => (r._2, r._3, r._4)).toSet }
    val singles = Map(
      1L -> Seq("hash", "join"),
      2L -> Seq("vector")).map { case (q, terms) =>
      q -> TextAnalysis.bm25TopK(docs, "doc_id", "text", terms, k = 3)
        .select("doc_id", "score", "n_terms_hit")
        .as[(Long, Double, Long)].collect().toSet
    }
    assert(batch == singles,
      s"batch rankings must equal per-query single runs: $batch vs $singles")
  }

  test("appendBm25Delta UPDATE: re-ingested doc replaces its old postings everywhere") {
    import graft.operators.TextAnalysis
    val base = Seq((1L, "alpha beta"), (2L, "gamma delta")).toDF("doc_id", "text")
    // doc 2 re-ingested WITHOUT 'gamma' and WITHOUT 'delta' — its old
    // rows live in buckets the new text never touches; a merge that
    // only rewrote new-term buckets would leave them stale
    val update = Seq((2L, "epsilon zeta")).toDF("doc_id", "text")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_spec_bm25_update_${System.nanoTime()}"
    TextAnalysis.writeBm25Index(base, "doc_id", "text", path, numBuckets = 16)
    TextAnalysis.appendBm25Delta(update, "doc_id", "text", path, numBuckets = 16)
    val rebuilt = Seq((1L, "alpha beta"), (2L, "epsilon zeta")).toDF("doc_id", "text")
    Seq(Seq("gamma"), Seq("epsilon"), Seq("alpha", "zeta")).foreach { terms =>
      val served = TextAnalysis.bm25TopKIndexed(spark, path, terms, k = 5,
        numBuckets = 16).collect().toSeq
      val direct = TextAnalysis.bm25TopK(rebuilt, "doc_id", "text", terms, k = 5)
        .collect().toSeq
      assert(served == direct, s"upsert must equal full rebuild for terms=$terms")
    }
  }

  test("chunkTokenWindows: overlapping windows cover the doc, tail clamped, text materialized") {
    import graft.operators.TextAnalysis
    // 10 tokens, 4-token chunks, 1-token overlap → starts every 3
    val docs = Seq((1L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val got = TextAnalysis.chunkTokenWindows(docs, "doc_id", "text",
        chunkTokens = 4, overlapTokens = 1)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "end_tok", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 7L, "t3 t4 t5 t6"),
      (2L, 6L, 10L, "t6 t7 t8 t9"),
      (3L, 9L, 10L, "t9")),
      s"hand-computed chunk plan mismatch: $got")
    // a doc shorter than one chunk yields exactly one clamped chunk
    val short = TextAnalysis.chunkTokenWindows(
        Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text", 4, 1)
      .select("start_tok", "end_tok", "chunk_text")
      .as[(Long, Long, String)].collect().toSeq
    assert(short == Seq((0L, 2L, "a b")))
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkTokenWindows(docs, "doc_id", "text", 4, 4)
    }
  }

  test("duplicatedNgrams: cross-doc spread counted per-doc-distinct, singletons cut") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),       // shares 4-gram with doc 2
      (2L, "the quick brown fox sleeps"),
      (3L, "the quick brown fox jumps the quick brown fox jumps"), // repeats internally
      (4L, "something completely different here")).toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedNgrams(docs, "doc_id", "text", n = 4, k = 10)
      .as[(String, Long, Long)].collect().toSeq
    // "the quick brown fox" in docs 1,2,3 — doc 3's internal repeat
    // must count ONCE (per-doc distinct); all singleton 4-grams cut
    assert(got.head == ("the quick brown fox", 3L, 1L), s"got $got")
    assert(got.forall(_._2 >= 2), "singletons must be cut")
    assert(got.map(_._1).distinct.length == got.length)
  }

  test("vocabGrowth: new terms land in their first-appearance bucket, cumulative monotone") {
    // ids 0..9 with buckets=5 → 2 docs per bucket. Doc 0-1 introduce
    // a,b; docs 4-5 introduce c (plus reuse); docs 8-9 only reuse —
    // growth must be 2, then 1, then saturation
    val docs = Seq(
      (0L, "a b"), (1L, "a"), (2L, "b a"), (3L, "a"),
      (4L, "c a"), (5L, "c"), (6L, "b c"), (7L, "a"),
      (8L, "a b c"), (9L, "c b")).toDF("doc_id", "text")
    val got = TextAnalysis.vocabGrowth(docs, "doc_id", "text", buckets = 5)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((0L, 2L, 2L), (2L, 1L, 3L)),
      s"got $got — expected a,b in bucket 0 and c in bucket 2, cumulative 2→3")
    // the gate fixture saturates in bucket 0 (tiny shared vocabulary) —
    // this synthetic corpus is what proves the bucketing itself
  }

  test("bpeTrainMerges: hand-computed merges, vocab weighting, lexicographic tie-break") {
    import spark.implicits._
    // vocab: "aaab" ×3 → r1 pairs (a,a)=6 (a,b)=3 → merge (a,a);
    // r2 on (aa)(a)(b): (aa,a)=3 ties (a,b)=3 → "(a)(b)" < "(aa)(a)"
    // lexicographically → merge (a,b); r3: (aa,ab)=3
    val docs = Seq((1L, "aaab aaab"), (2L, "aaab")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 3)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a", "a", 6L), (2L, "a", "b", 3L), (3L, "aa", "ab", 3L)),
      s"got $got")
  }

  test("bpeTrainMerges: greedy left-to-right non-overlap — aaaa merges to (aa)(aa)") {
    import spark.implicits._
    val docs = Seq((1L, "aaaa")).toDF("doc_id", "text")
    val got = TextAnalysis.bpeTrainMerges(docs, "text", rounds = 2)
      .as[(Long, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq((1L, "a", "a", 3L), (2L, "aa", "aa", 1L)), s"got $got")
  }

  test("winnowedPairs: a shared long run MUST surface a common fingerprint; strangers share none") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // docs 1 and 2 share a 12-token run (≥ w+k−1 = 8 → guaranteed
    // detection); doc 3 is disjoint vocabulary
    val shared = (1 to 12).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta $shared gamma delta"),
      (2L, s"zeta eta theta $shared iota"),
      (3L, "completely different words with nothing in common here at all " +
        "and still more unrelated filler tokens everywhere"))
      .toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.winnowedPairs(
        docs, "doc_id", "text", k = 5, w = 4, minShared = 1, maxDocFreq = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got.map(r => (r._1, r._2)) == Seq((1L, 2L)),
      s"only the overlapping pair may report: $got")
    assert(got.head._5 >= 1, s"guaranteed detection: $got")
    // deterministic across partitionings
    val again = graft.operators.TextAnalysis.winnowedPairs(
        docs.repartition(3), "doc_id", "text", k = 5, w = 4,
        minShared = 1, maxDocFreq = 10)
      .as[(Long, Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == again)
  }

  test("c4FilterReport: each rule fires on its archetype; attribution follows cascade order") {
    val d = Seq(
      (1L, "the cat sat on the mat today with a friend"),          // clean -> pass
      (2L, "tiny doc"),                                            // 2 tokens -> too_short
      (3L, "the aa bb cc dd ee ff gg hh ij"),                      // mean len < 3 -> word_length
      (4L, "the 12345 67890 11111 22222 33333 44444"),             // digits > 30% -> symbol_soup (fires before low_alpha)
      (5L, "zzz yyy xxx www vvv uuu ttt sss"),                     // alpha fine, no stopword -> no_stopword
      (6L, "the the the the the the the the the the")              // ttr 0.1 -> repetitive
    ).toDF("doc_id", "text")
    val got = TextAnalysis.c4FilterReport(d, "doc_id", "text")
      .orderBy("doc_id").select("doc_id", "first_fail", "kept")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(got == Seq(
      (1L, "pass", true), (2L, "too_short", false), (3L, "word_length", false),
      (4L, "symbol_soup", false), (5L, "no_stopword", false),
      (6L, "repetitive", false)), s"cascade mismatch: $got")
    // the violation VECTOR is independent of the cascade: doc 4 also
    // trips low_alpha even though symbol_soup claimed attribution
    val v4 = TextAnalysis.c4FilterReport(d, "doc_id", "text")
      .where(col("doc_id") === 4L)
      .select("f_symbol_soup", "f_low_alpha", "f_too_short")
      .as[(Boolean, Boolean, Boolean)].head()
    assert(v4 == ((true, true, false)))
  }

  test("knLmScore: hand-computed interpolated KN on a tiny corpus; repartition-stable") {
    // corpus = one doc "a b a b a c": bigrams ab x2, ba x2, ac x1
    // P(b|a) = (2-.75)/3 + (.75*2/3)*(1/3) ~= 0.5833333
    // P(a|b) = (2-.75)/2 + (.75*1/2)*(1/3)  = 0.75
    // P(c|a) = (1-.75)/3 + (.75*2/3)*(1/3) ~= 0.25
    // mean over the 5 occurrences ~= 0.5833333
    val d = Seq((1L, "a b a b a c")).toDF("doc_id", "text")
    val got = TextAnalysis.knLmScore(d, "doc_id", "text")
      .select("n_bigrams", "kn_score").as[(Long, Double)].head()
    assert(got._1 == 5L)
    assert(math.abs(got._2 - 0.5833333) < 2e-6, s"kn_score off: ${got._2}")
    // discounted probabilities live in (0, 1]; a two-doc corpus where
    // one doc is pure repetition must score the repetitive doc HIGHER
    // on raw bigram probability (KN is fluency, not diversity)...
    val d2 = Seq((1L, "x y x y x y x y"), (2L, "x y p q r s t u")).toDF("doc_id", "text")
    val s2 = TextAnalysis.knLmScore(d2, "doc_id", "text")
      .orderBy("doc_id").select("kn_score").as[Double].collect().toSeq
    assert(s2.forall(p => p > 0.0 && p <= 1.0))
    assert(s2(0) > s2(1), s"high-frequency bigrams must score higher: $s2")
    // ...and the model is a pure function of the corpus, not partitioning
    val fx = spark.read.parquet(s"$sf001/documents.parquet")
    val a = TextAnalysis.knLmScore(fx, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val b = TextAnalysis.knLmScore(fx.repartition(7), "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(a == b)
  }

  test("readability: hand-counted words/sentences/vowel-run syllables and the published formulas") {
    val d = Seq((1L, "The cat sat. It ran away!")).toDF("doc_id", "text")
    val got = TextAnalysis.readability(d, "doc_id", "text")
      .select("n_words", "n_sentences", "n_syllables", "flesch_ease", "fk_grade")
      .as[(Long, Long, Long, Double, Double)].head()
    assert((got._1, got._2, got._3) == ((6L, 2L, 7L)), s"counts: $got")
    // wps = 3, spw = 7/6: flesch = 206.835 - 3.045 - 84.6*(7/6) ~= 105.09
    assert(math.abs(got._4 - 105.09) < 1e-4, s"flesch: ${got._4}")
    assert(math.abs(got._5 - (-0.653333)) < 1e-4, s"fk: ${got._5}")
    // no terminal punctuation -> sentence count clamps to 1
    val d2 = Seq((1L, "no punctuation here")).toDF("doc_id", "text")
    val s2 = TextAnalysis.readability(d2, "doc_id", "text")
      .select("n_sentences").as[Long].head()
    assert(s2 == 1L)
  }

  test("ngramNovelty: first-appearance attribution in doc_id order") {
    val d = Seq(
      (1L, "a b c d e f g h i"),   // grams a..h, b..i -> both novel
      (2L, "a b c d e f g h i"),   // exact dup -> novelty 0
      (3L, "a b c d e f g h x")    // a..h seen, b..x new -> 0.5
    ).toDF("doc_id", "text")
    val got = TextAnalysis.ngramNovelty(d, "doc_id", "text", n = 8)
      .orderBy("doc_id")
      .select("doc_id", "n_grams", "n_novel", "novelty")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (1L, 2L, 2L, 1.0), (2L, 2L, 0L, 0.0), (3L, 2L, 1L, 0.5)),
      s"novelty mismatch: $got")
  }

  test("entropyStats: uniform, degenerate, and empty cases") {
    val d = Seq(
      (1L, "abcd"),        // 4 distinct chars, uniform -> ln 4
      (2L, "aaaa"),        // single symbol -> 0
      (3L, "x y x y"),     // words: {x:2, y:2} uniform -> ln 2
      (4L, "")             // empty: n_chars 0, [""] word artifact
    ).toDF("doc_id", "text")
    val got = TextAnalysis.entropyStats(d, "doc_id", "text")
      .orderBy("doc_id")
      .select("doc_id", "n_chars", "char_entropy", "n_words", "word_entropy")
      .as[(Long, Long, Option[Double], Long, Double)].collect().toSeq
    val ln4 = math.rint(math.log(4) * 1e6) / 1e6
    val ln2 = math.rint(math.log(2) * 1e6) / 1e6
    assert(got(0) == ((1L, 4L, Some(ln4), 1L, 0.0)), s"uniform: ${got(0)}")
    assert(got(1) == ((2L, 4L, Some(0.0), 1L, 0.0)), s"degenerate: ${got(1)}")
    assert(got(2)._5 == ln2 && got(2)._4 == 4L, s"word uniform: ${got(2)}")
    assert(got(3) == ((4L, 0L, None, 1L, 0.0)), s"empty: ${got(3)}")
  }

  test("naiveBayesClassify: disjoint vocabularies separate; score matches the closed form") {
    val d = Seq(
      (1L, "x x y", "A"), (2L, "z z w", "B"),
      (3L, "x y y", "A"), (4L, "w z z", "B")).toDF("doc_id", "text", "lang")
    val out = TextAnalysis.naiveBayesClassify(d, "doc_id", "text", "lang")
      .orderBy("doc_id")
      .select("doc_id", "label", "pred_label", "score", "correct")
      .as[(Long, String, String, Double, Boolean)].collect().toSeq
    assert(out.forall(_._5), s"disjoint vocab must classify perfectly: $out")
    // doc 1 under A: V=4, tok_A=6, counts x:3 y:3 -> p = (3+1)/(6+4) = 0.4
    // score = ln(2/4) + 2·ln(0.4) + 1·ln(0.4), each ln round-6-scaled
    val s = math.rint(math.log(0.5) * 1e6) + 3 * math.rint(math.log(0.4) * 1e6)
    val expect = BigDecimal(s / 1e6).setScale(6, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
    assert(out.head._4 == expect, s"closed-form score: got ${out.head._4}, want $expect")
    // partitioning-invariant
    val again = TextAnalysis.naiveBayesClassify(d.repartition(7),
        "doc_id", "text", "lang")
      .select("doc_id", "pred_label", "score")
      .as[(Long, String, Double)].collect().toSet
    assert(again == out.map(r => (r._1, r._3, r._4)).toSet)
  }

  test("naiveBayesApply: all-OOV doc falls back to priors + floors") {
    // train: A has 3 docs/6 tokens, B has 1 doc/2 tokens, V=4
    val train = Seq(
      (1L, "x x", "A"), (2L, "x y", "A"), (3L, "y y", "A"),
      (4L, "z w", "B")).toDF("doc_id", "text", "lang")
    val apply = Seq((9L, "q q q", "A")).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.naiveBayesApply(train, apply, "doc_id", "text", "lang")
      .select("pred_label", "score").as[(String, Double)].head()
    // score_c = ln(n_c/4) + 3·ln(1/(tok_c+4)); A: ln(3/4)+3·ln(1/10),
    // B: ln(1/4)+3·ln(1/6) — each ln round-6-scaled before the sum
    def s(p: Double, f: Double) =
      math.rint(math.log(p) * 1e6) + 3 * math.rint(math.log(f) * 1e6)
    val (sa, sb) = (s(0.75, 0.1), s(0.25, 1.0 / 6))
    assert(got._1 == (if (sa >= sb) "A" else "B"))
    val expect = BigDecimal(math.max(sa, sb) / 1e6)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got._2 == expect, s"OOV score: got ${got._2}, want $expect")
  }

  test("classifierReport: per-class rates, never-predicted class has NULL precision/f1") {
    val preds = Seq(
      ("a", "a", true), ("a", "a", true), ("a", "b", false),
      ("b", "a", false), ("b", "b", true),
      ("c", "a", false)).toDF("label", "pred_label", "correct")
    val got = TextAnalysis.classifierReport(preds).orderBy("class")
      .select("class", "n_true", "n_pred", "tp", "precision", "recall", "f1")
      .as[(String, Long, Long, Long, Option[Double], Double, Option[Double])]
      .collect().toSeq
    // a: n_true 3, pred 4, tp 2 -> p=.5, r=.666667, f1 = 2pr/(p+r)
    val f1a = BigDecimal(2 * 0.5 * 0.666667 / (0.5 + 0.666667))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got(0) == (("a", 3L, 4L, 2L, Some(0.5), 0.666667, Some(f1a))), got(0).toString)
    assert(got(1) == (("b", 2L, 2L, 1L, Some(0.5), 0.5, Some(0.5))), got(1).toString)
    // c never predicted: precision and f1 NULL, recall 0
    assert(got(2) == (("c", 1L, 0L, 0L, None, 0.0, None)), got(2).toString)
  }

  test("burstiness: clumped word scores above the evenly-spread word at equal tf") {
    // 'even' appears once in each of 4 docs (VMR < 1 at equal counts);
    // 'burst' appears 4× in one doc (VMR ≫ 1) — same total tf 4
    val d = Seq(
      (1L, "even burst burst burst burst"), (2L, "even"),
      (3L, "even"), (4L, "even")).toDF("doc_id", "text")
    val got = TextAnalysis.burstiness(d, "doc_id", "text", k = 5)
      .select("term", "tf", "n_docs_with", "vmr")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // even: x = (1,1,1,1), mean 1, var 0 → vmr 0
    assert(got("even") == (("even", 4L, 4L, 0.0)), got("even").toString)
    // burst: x = (4,0,0,0), mean 1, E[x²] 4, var 3 → vmr 3
    assert(got("burst") == (("burst", 4L, 1L, 3.0)), got("burst").toString)
  }

  test("nbUncertaintySample: the genuinely ambiguous doc ranks first") {
    val train = Seq(
      (1L, "x x y", "A"), (2L, "x y y", "A"),
      (3L, "z z w", "B"), (4L, "z w w", "B")).toDF("doc_id", "text", "lang")
    val pool = Seq(
      (10L, "x y", "A"),   // clearly A
      (11L, "z w", "B"),   // clearly B
      (12L, "x z", "A")    // one term from each side — minimal margin
    ).toDF("doc_id", "text", "lang")
    val got = TextAnalysis.nbUncertaintySample(train, pool,
        "doc_id", "text", "lang", k = 3)
      .orderBy("rnk").select("rnk", "doc_id", "margin")
      .as[(Long, Long, Double)].collect().toSeq
    assert(got.head._2 == 12L, s"the x/z doc must be most uncertain: $got")
    // margins come back sorted ascending and the symmetric doc's is 0
    assert(got.map(_._3) == got.map(_._3).sorted && got.head._3 == 0.0,
      got.toString)
  }

  test("entropyStats: H = ln n - (sum k ln k)/n on a skewed hand case") {
    // "aab" chars: {a:2, b:1}, n=3 -> ln3 - (2 ln2)/3
    val d = Seq((1L, "aab")).toDF("doc_id", "text")
    val got = TextAnalysis.entropyStats(d, "doc_id", "text")
      .select("char_entropy").as[Double].head()
    val ln3s = math.rint(math.log(3) * 1e6)
    val ln2s = math.rint(math.log(2) * 1e6)
    val expect = math.rint((3 * ln3s - 2 * ln2s) / 3.0 / 1e6 * 1e6) / 1e6
    assert(math.abs(got - expect) < 1e-9, s"got $got expect $expect")
  }

  test("clusterTopTerms: cluster-specific vocabulary outranks corpus glue; singletons drop") {
    val docs = Seq(
      (1L, "rocket engine thrust common common"),
      (2L, "rocket engine nozzle common common"),
      (3L, "garden soil common common"),
      (4L, "garden seeds common common"),
      (5L, "lonely unique words common")
    ).toDF("doc_id", "text")
    val map = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L), (5L, 5L))
      .toDF("doc_id", "cluster_id")
    val got = TextAnalysis.clusterTopTerms(docs, "doc_id", "text", map, k = 2)
      .select("cluster_id", "rnk", "term")
      .as[(Long, Long, String)].collect().toSeq.sorted
    // "common" appears in EVERY doc → idf ln(5/5) = 0 → never a label
    assert(!got.exists(_._3 == "common"), s"glue must not label: $got")
    assert(got.filter(_._1 == 1L).map(_._3).contains("rocket"), s"$got")
    assert(got.filter(_._1 == 3L).map(_._3).contains("garden"), s"$got")
    // singleton cluster 5 reports nothing
    assert(!got.exists(_._1 == 5L), s"singletons must drop: $got")
  }

  test("jsDrift: identical corpora read 0, disjoint vocabularies read ln 2") {
    val a = Seq((1L, "alpha beta gamma"), (2L, "beta gamma")).toDF("doc_id", "text")
    val same = TextAnalysis.jsDrift(a, a, "text")
      .select("js_divergence", "js_distance", "n_terms_shared")
      .as[(Double, Double, Long)].head()
    assert(same == ((0.0, 0.0, 3L)), s"identical corpora: $same")
    val b = Seq((3L, "delta epsilon zeta")).toDF("doc_id", "text")
    val far = TextAnalysis.jsDrift(a, b, "text")
      .select("js_divergence", "n_terms_shared").as[(Double, Long)].head()
    assert(far._2 == 0L && math.abs(far._1 - math.log(2)) < 1e-5,
      s"disjoint vocab must read ln 2: $far")
    // asymmetric mixes sit strictly between
    val c = Seq((4L, "alpha alpha alpha beta")).toDF("doc_id", "text")
    val mid = TextAnalysis.jsDrift(a, c, "text")
      .select("js_divergence").as[Double].head()
    assert(mid > 0.0 && mid < math.log(2), s"partial overlap in (0, ln2): $mid")
  }

  test("dataCard: totals, dup rate, shares, and quality fold on a hand fixture") {
    val docs = Seq(
      (1L, "the quick brown fox", "en", "web"),
      (2L, "the quick brown fox", "en", "web"),
      (3L, "ein kleiner hund", "de", "books")
    ).toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.dataCard(docs, "doc_id", "text", "lang", "source")
      .as[(String, String, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got(("corpus", "n_docs")) == 3.0)
    assert(got(("corpus", "n_tokens")) == 11.0)
    assert(got(("corpus", "n_distinct_docs")) == 2.0)
    assert(got(("corpus", "dup_rate")) == 0.333333)
    assert(got(("corpus", "tokens_min")) == 3.0 &&
      got(("corpus", "tokens_max")) == 4.0)
    assert(got(("lang_share", "en")) == 0.666667 &&
      got(("lang_share", "de")) == 0.333333)
    assert(got(("source_share", "web")) == 0.666667 &&
      got(("source_share", "books")) == 0.333333)
    val mq = got(("corpus", "mean_quality"))
    assert(mq > 0.0 && mq <= 1.0, s"quality mean out of range: $mq")
  }

  test("rakeKeyphrases: hand-computed deg/freq scores; stopwords split; maxLen drops runs") {
    val docs = Seq(
      (1L, "deep learning of deep learning and fast gpu"),
      (2L, "gpu")
    ).toDF("doc_id", "text")
    val got = TextAnalysis.rakeKeyphrases(docs, "doc_id", "text")
      .select("rnk", "phrase", "n_words", "n_occ", "score")
      .as[(Long, String, Long, Long, Double)].collect().toSeq
    // word scores: deep 4/2=2, learning 4/2=2, fast 2/1=2, gpu 3/2=1.5
    assert(got == Seq(
      (1L, "deep learning", 2L, 2L, 4.0),
      (2L, "fast gpu", 2L, 1L, 3.5),
      (3L, "gpu", 1L, 1L, 1.5)), s"$got")
    // a run longer than maxLen is dropped entirely
    val long = Seq((1L, "w1 w2 w3 w4 w5 w6 w7 and w9")).toDF("doc_id", "text")
    val kept = TextAnalysis.rakeKeyphrases(long, "doc_id", "text", maxLen = 6)
      .select("phrase").as[String].collect().toSeq
    assert(kept == Seq("w9"), s"7-token run must be discarded: $kept")
  }

  test("tfidfKnn: identical docs rank first; df cut prunes hub terms from the pair join") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta common"),     // 1 and 2 identical -> cos 1.0
      (2L, "alpha beta common"),
      (3L, "alpha gamma common"),    // shares alpha+common with 1/2
      (4L, "delta epsilon common"))  // shares only the hub 'common'
      .toDF("doc_id", "text")
    val knn = TextAnalysis.tfidfKnn(docs, "doc_id", "text", k = 3,
        dfCutShare = 1.0)
      .select("doc_id", "rnk", "neighbor_id", "cos")
      .as[(Long, Long, Long, Double)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).toSeq).toMap
    assert(knn(1L).head._3 == 2L && knn(1L).head._4 == 1.0,
      s"identical doc must be doc 1's top neighbor at cos 1: ${knn(1L)}")
    assert(knn(1L).map(_._3).toSet == Set(2L, 3L, 4L))
    // 'common' has df 4/4 — a 0.9 cut drops it; doc 4 then shares NO
    // term with 1/2/3 and must vanish from their candidate lists
    val cut = TextAnalysis.tfidfKnn(docs, "doc_id", "text", k = 3,
        dfCutShare = 0.9)
      .select("doc_id", "neighbor_id").as[(Long, Long)].collect().toSeq
    assert(!cut.exists(p => p._1 == 4L || p._2 == 4L),
      s"hub-only doc must leave the candidate set under the cut: $cut")
    assert(cut.exists(p => p._1 == 1L && p._2 == 2L),
      "non-hub overlap must survive the cut")
  }
}
