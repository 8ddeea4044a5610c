package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The REAL still-image decode path (javax.imageio): encode→decode
  * round-trip, corrupt-payload tolerance, and the fixture-side
  * bounded-distinct payload join.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("ImageCodec: PNG encode->decode round-trips exact dimensions and 3 bands") {
    for ((w, h) <- Seq((16, 16), (17, 23), (64, 56), (1, 1))) {
      val bytes = Multimodal.ImageCodec.png(w, h)
      // a real PNG container, not a fake: magic bytes present
      assert(bytes.take(4).toSeq == Seq(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte))
      assert(Multimodal.ImageCodec.decode(bytes) == Some((w, h, 3)),
        s"round-trip failed for ${w}x$h")
    }
    // deterministic: identical input -> identical bytes (what lets
    // the bounded-distinct payload table stand in for per-row encode)
    assert(Multimodal.ImageCodec.png(20, 24).toSeq ==
      Multimodal.ImageCodec.png(20, 24).toSeq)
  }

  test("extractImageMeta: corrupt payloads surface as decode_ok=false, never an exception") {
    val rows = Seq(
      (1L, "image/png", Multimodal.ImageCodec.png(20, 16)),
      (2L, "image/png", "not an image".getBytes("UTF-8")),
      (3L, "image/png", Array.empty[Byte]))
      .toDF("doc_id", "media_type", "payload")
    val got = Multimodal.extractImageMeta(rows, "doc_id")
      .collect().map(m => m.doc_id -> (m.decode_ok, m.width, m.height, m.channels))
      .toMap
    assert(got(1L) == ((true, 20, 16, 3)))
    assert(got(2L) == ((false, -1, -1, -1)))
    assert(got(3L) == ((false, -1, -1, -1)))
  }

  test("withImagePayload: every fixture doc decodes to its generation formula") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id").limit(200)
    val meta = Multimodal.extractImageMeta(
        Multimodal.withImagePayload(docs, "doc_id"), "doc_id")
      .toDF()
    assert(meta.count() == 200, "payload join must not drop or duplicate rows")
    val bad = meta.where(!col("decode_ok") ||
      col("width") =!= (lit(16) + (col("doc_id") % 13) * 4) ||
      col("height") =!= (lit(16) + ((col("doc_id") / 7).cast("long") % 11) * 4) ||
      col("channels") =!= 3)
    assert(bad.count() == 0, s"decode diverged: ${bad.take(3).mkString(", ")}")
  }

  test("imageDHash: decoded-pixel hash equals the formula recompute; same shape, same hash") {
    import spark.implicits._
    val docs = Seq(1L, 2L, 14L, 79L).toDF("doc_id")
    // doc 79 (79%13=1, 79//7=11≡0 mod 11) shares (20,16) with doc 1
    val got = Multimodal.imageDHash(docs, "doc_id")
      .select("doc_id", "width", "height", "dhash_lo", "dhash_hi")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L)._2 == got(79L)._2 && got(1L)._4 == got(79L)._4 &&
      got(1L)._5 == got(79L)._5, "identical shapes must hash identically")
    // recompute doc 1's hash straight from the pixel formula (no PNG):
    // the engine took the long way through encode→decode and must agree
    val (w, h) = (got(1L)._2.toInt, got(1L)._3.toInt)
    val grid = Array.ofDim[Long](8, 9)
    for (r <- 0 until 8; c <- 0 until 9) {
      val (x0, x1) = (c * w / 9, (c + 1) * w / 9)
      val (y0, y1) = (r * h / 8, (r + 1) * h / 8)
      var s = 0L; var n = 0L
      for (y <- y0 until y1; x <- x0 until x1) {
        s += (((x * 31 + y * 17) & 255) + ((x * 7 + y * 3) & 255) +
          ((x + y) & 255)) / 3
        n += 1
      }
      grid(r)(c) = s / n
    }
    var lo = 0L; var hi = 0L
    for (r <- 0 until 8; c <- 0 until 8)
      if (grid(r)(c) < grid(r)(c + 1)) {
        val b = r * 8 + c
        if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
      }
    assert(got(1L)._4 == lo && got(1L)._5 == hi,
      s"round-trip hash mismatch: ${got(1L)} vs ($lo, $hi)")
  }

  test("imageChannelStats: decoded channel means equal the pixel-formula recompute") {
    import spark.implicits._
    val docs = Seq(7L, 20L).toDF("doc_id")
    val got = graft.operators.Multimodal.imageChannelStats(docs, "doc_id")
      .select("doc_id", "width", "height", "mean_r", "mean_g", "mean_b",
        "mean_luma")
      .as[(Long, Long, Long, Double, Double, Double, Double)]
      .collect().sortBy(_._1).toSeq
    def expect(id: Long) = {
      val w = (16 + (id % 13) * 4).toInt
      val h = (16 + ((id / 7) % 11) * 4).toInt
      var sr = 0L; var sg = 0L; var sb = 0L; var sl = 0L
      for (y <- 0 until h; x <- 0 until w) {
        val r = (x * 31 + y * 17) & 255; val g = (x * 7 + y * 3) & 255
        val b = (x + y) & 255
        sr += r; sg += g; sb += b; sl += (r + g + b) / 3
      }
      def m(s: Long) = math.rint(s.toDouble / (w * h) * 1e6) / 1e6
      (id, w.toLong, h.toLong, m(sr), m(sg), m(sb), m(sl))
    }
    assert(got == Seq(expect(7L), expect(20L)),
      s"decoded stats must equal the formula recompute: $got")
  }

  test("WavCodec: WAV encode->decode round-trips rate/channels/frames and exact sums") {
    for ((rate, n, k) <- Seq((8000, 400, 0), (16000, 840, 4), (8000, 440, 2))) {
      val bytes = Multimodal.WavCodec.wav(rate, n, k)
      // a real RIFF/WAVE container, not a fake: magic bytes present
      assert(bytes.take(4).toSeq == "RIFF".getBytes("US-ASCII").toSeq &&
        bytes.slice(8, 12).toSeq == "WAVE".getBytes("US-ASCII").toSeq)
      var sum = 0L; var sabs = 0L
      for (i <- 0 until n) {
        val s = ((i * 37 + 11 * k) % 2048) - 1024
        sum += s; sabs += math.abs(s)
      }
      assert(Multimodal.WavCodec.decode(bytes) ==
        Some((rate, 1, n.toLong, sum, sabs)),
        s"round-trip failed for rate=$rate n=$n k=$k")
    }
    // deterministic: identical input -> identical bytes
    assert(Multimodal.WavCodec.wav(8000, 400, 1).toSeq ==
      Multimodal.WavCodec.wav(8000, 400, 1).toSeq)
    // corrupt payloads decode to None, never an exception
    assert(Multimodal.WavCodec.decode("not audio".getBytes("UTF-8")).isEmpty)
    assert(Multimodal.WavCodec.decode(Array.empty[Byte]).isEmpty)
  }

  test("audioDecodeStats: every fixture doc decodes to its generation formula") {
    val docs = spark.read.parquet(s"$sf001/documents.parquet")
      .select("doc_id").limit(150)
    val got = Multimodal.audioDecodeStats(docs, "doc_id")
    assert(got.count() == 150, "payload join must not drop or duplicate rows")
    val bad = got.where(!col("decode_ok") ||
      col("channels") =!= 1 ||
      col("sample_rate") =!=
        when(col("doc_id") % 2 === 0, 8000L).otherwise(16000L) ||
      col("n_samples") =!= (lit(400L) + (col("doc_id") % 11) * 40))
    assert(bad.count() == 0, s"decode diverged: ${bad.take(3).mkString(", ")}")
    // phase matters: docs sharing (rate, n) but differing in k must
    // report different waveform sums (the join is keyed on the triple)
    val pair = Multimodal.audioDecodeStats(
        Seq(2L, 24L).toDF("doc_id"), "doc_id")
      .select("doc_id", "sum_samples").as[(Long, Long)].collect().toMap
    assert(pair.size == 2 && pair(2L) != pair(24L),
      s"docs 2 and 24 share (rate=8000, n=480) but k=2 vs k=4 — sums must differ: $pair")
  }

  test("audioChunksBySamples: grid math off the decoded frame count, tail clamped") {
    // doc 1: rate 16000, n = 400 + 40 = 440; step 120 -> starts 0,120,240,360
    val got = Multimodal.audioChunksBySamples(
        Multimodal.audioDecodeStats(Seq(1L).toDF("doc_id"), "doc_id"),
        chunkSamples = 160L, overlapSamples = 40L)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_sample", "end_sample", "n_chunk_samples",
        "start_ms")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 0L, 160L, 160L, 0.0),
      (1L, 120L, 280L, 160L, 7.5),
      (2L, 240L, 400L, 160L, 15.0),
      (3L, 360L, 440L, 80L, 22.5)), s"chunk grid: $got")
    // overlap must sit inside the chunk
    intercept[IllegalArgumentException] {
      Multimodal.audioChunksBySamples(
        Multimodal.audioDecodeStats(Seq(1L).toDF("doc_id"), "doc_id"),
        chunkSamples = 100L, overlapSamples = 100L)
    }
  }

  test("WavFingerprint: decoded-waveform bits equal the sample-formula recompute") {
    val (rate, n, k) = (8000, 440, 2)
    val bytes = Multimodal.WavCodec.wav(rate, n, k)
    val got = Multimodal.WavFingerprint.of(bytes)
    // recompute straight from the generation formula (no WAV)
    val windows = 33
    val sums = new Array[Long](windows); val cnts = new Array[Long](windows)
    for (i <- 0 until n) {
      val s = ((i * 37 + 11 * k) % 2048) - 1024
      val w = (i.toLong * windows / n).toInt
      sums(w) += s; cnts(w) += 1
    }
    var fp = 0L
    for (w <- 0 until windows - 1)
      if (sums(w) * cnts(w + 1) < sums(w + 1) * cnts(w)) fp |= 1L << w
    assert(got == Some((n.toLong, fp)), s"fingerprint: $got vs $fp")
    assert(fp != 0L, "the sawtooth waveform must set some bits")
    // corrupt bytes refuse quietly
    assert(Multimodal.WavFingerprint.of("junk".getBytes).isEmpty)
  }

  test("packStats: per-bin fill with the overshoot bin flagged above 1") {
    // costs 600, 600, 600 into capacity 1024: offsets 0, 600, 1200 →
    // bin 0 holds items 1+2 (cost 1200, fill > 1 — the straddler),
    // bin 1 holds item 3
    val items = Seq((1L, 600L), (2L, 600L), (3L, 600L)).toDF("doc_id", "n")
    val packed = Multimodal.tokenPack(items, "doc_id", "n", seqTokens = 1024L)
    val got = Multimodal.packStats(packed, "seq_id", "n_cost", "seq_offset",
        capacity = 1024L)
      .orderBy("bin_id")
      .select("bin_id", "n_items", "sum_cost", "first_offset", "fill_rate")
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(
      (0L, 2L, 1200L, 0L, math.rint(1200.0 / 1024 * 1e6) / 1e6),
      (1L, 1L, 600L, 176L, math.rint(600.0 / 1024 * 1e6) / 1e6)),
      s"pack stats: $got")
  }
}
