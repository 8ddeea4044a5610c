package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

/** The REAL still-image decode path (javax.imageio): encode→decode
  * round-trip, corrupt-payload tolerance, and the fixture-side
  * bounded-distinct payload join.
  */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("Mp3Codec: header probe recovers CBR parameters from bytes; refuses garbage, truncation, drift") {
    import Multimodal.Mp3Codec
    for (bi <- 1 to 14; ri <- 0 to 2; mono <- Seq(true, false)) {
      val bytes = Mp3Codec.frameStream(bi, ri, mono, nFrames = 4)
      assert(Mp3Codec.probe(bytes) == Some((Mp3Codec.bitrateKbps(bi),
        Mp3Codec.sampleRates(ri), if (mono) 1 else 2, 4L)),
        s"bi=$bi ri=$ri mono=$mono")
    }
    assert(Mp3Codec.probe("not an mpeg stream".getBytes("UTF-8")).isEmpty)
    assert(Mp3Codec.probe(Array.empty[Byte]).isEmpty)
    // a truncated tail is not a clean frame chain
    val full = Mp3Codec.frameStream(9, 0, mono = false, nFrames = 3)
    assert(Mp3Codec.probe(full.dropRight(7)).isEmpty)
    // parameter drift (two streams glued) refuses — this probe does
    // not fake VBR bookkeeping
    val glued = Mp3Codec.frameStream(9, 0, mono = false, 2) ++
      Mp3Codec.frameStream(10, 0, mono = false, 2)
    assert(Mp3Codec.probe(glued).isEmpty)
  }

  test("AacCodec: ADTS probe recovers profile/rate/channels from bytes across the frequency table; refuses garbage and truncation") {
    import Multimodal.AacCodec
    for (ri <- 0 to 12; ch <- Seq(1, 2, 6)) {
      val bytes = AacCodec.adtsStream(ri, ch, nFrames = 3)
      assert(AacCodec.probe(bytes) ==
        Some((2, AacCodec.sampleRates(ri), ch, 3L)), s"ri=$ri ch=$ch")
    }
    assert(AacCodec.probe("no adts sync here".getBytes("UTF-8")).isEmpty)
    assert(AacCodec.probe(Array.empty[Byte]).isEmpty)
    val full = AacCodec.adtsStream(4, 2, nFrames = 3)
    assert(AacCodec.probe(full.dropRight(5)).isEmpty, "truncated tail")
    val glued = AacCodec.adtsStream(4, 2, 2) ++ AacCodec.adtsStream(4, 1, 2)
    assert(AacCodec.probe(glued).isEmpty, "parameter drift")
  }

  test("Mp4Codec: box walker recovers brand/timescale/duration from bytes, both mvhd versions; refuses broken grammar") {
    import Multimodal.Mp4Codec
    assert(Mp4Codec.probe(Mp4Codec.stream("isom", 1000L, 90037L, v1 = false)) ==
      Some(("isom", 1000L, 90037L)))
    // v1 exercises the 64-bit field layout, incl. a duration past 2^32
    assert(Mp4Codec.probe(Mp4Codec.stream("mp42", 48000L, 5000000000L, v1 = true)) ==
      Some(("mp42", 48000L, 5000000000L)))
    assert(Mp4Codec.probe("no boxes here".getBytes("UTF-8")).isEmpty)
    assert(Mp4Codec.probe(Array.empty[Byte]).isEmpty)
    // a size field pointing past the payload is broken grammar
    val broken = Mp4Codec.stream("isom", 1000L, 1000L, v1 = false)
    val bb = java.nio.ByteBuffer.wrap(broken)
    bb.putInt(0, broken.length * 2)
    assert(Mp4Codec.probe(broken).isEmpty)
  }

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

  test("G711Codec: JDK expansion equals the G.711 formulas for ALL 256 codes, both codecs") {
    // This is the pin that justifies the mm_g711_decode oracle: the
    // DuckDB SQL replays exactly these formulas, so the JDK table must
    // match them code-for-code.
    import javax.sound.sampled.AudioFormat.Encoding.{ULAW, ALAW}
    def expand(bytes: Array[Byte]): Seq[Int] = {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val pf = new javax.sound.sampled.AudioFormat(
        javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED,
        in.getFormat.getSampleRate, 16, 1, 2, in.getFormat.getSampleRate, false)
      val pcm = javax.sound.sampled.AudioSystem
        .getAudioInputStream(pf, in).readAllBytes()
      (0 until pcm.length / 2).map(i =>
        (pcm(2 * i + 1).toInt << 8) | (pcm(2 * i) & 0xff))
    }
    // a fixture whose codes sweep all 256 values: n = 256, k = 0 gives
    // code i = (i*37) % 256, a bijection (37 odd → coprime with 256)
    val uGot = expand(Multimodal.G711Codec.compandedWav(ULAW, 8000, 256, 0))
    val uExp = (0 until 256).map { i =>
      val u = 255 - ((i * 37) % 256)
      val t = (((u & 0xf) << 3) + 132) << ((u >> 4) & 7)
      if ((u & 0x80) != 0) 132 - t else t - 132
    }
    assert(uGot == uExp, "ulaw JDK expansion != G.711 formula")
    val aGot = expand(Multimodal.G711Codec.compandedWav(ALAW, 8000, 256, 0))
    val aExp = (0 until 256).map { i =>
      val x = ((i * 37) % 256) ^ 0x55
      val seg = (x >> 4) & 7
      var v = ((x & 0xf) << 4) + 8
      if (seg >= 1) v += 0x100
      if (seg > 1) v <<= (seg - 1)
      if ((x & 0x80) != 0) v else -v
    }
    assert(aGot == aExp, "alaw JDK expansion != G.711 formula")
    // corrupt / non-companded payloads refuse quietly
    assert(Multimodal.G711Codec.decode("junk".getBytes).isEmpty)
    assert(Multimodal.G711Codec.decode(
      Multimodal.WavCodec.wav(8000, 100, 1)).isEmpty,
      "a linear-PCM WAV is not a G.711 payload")
  }

  test("compressedAudioStats: codec + sums FROM THE BYTES, broadcast back per shape") {
    val docs = Seq(0L, 1L, 2L, 9L).toDF("doc_id")
    val got = Multimodal.compressedAudioStats(docs, "doc_id")
      .orderBy("doc_id")
      .select("doc_id", "codec", "n_samples", "sum_samples")
      .as[(Long, String, Long, Long)].collect().toSeq
    def sums(codec: String, n: Int, k: Int): Long =
      (0 until n).map { i =>
        val c = (i * 37 + 11 * k) % 256
        if (codec == "ulaw") {
          val u = 255 - c
          val t = (((u & 0xf) << 3) + 132) << ((u >> 4) & 7)
          if ((u & 0x80) != 0) 132 - t else t - 132
        } else {
          val x = c ^ 0x55
          val seg = (x >> 4) & 7
          var v = ((x & 0xf) << 4) + 8
          if (seg >= 1) v += 0x100
          if (seg > 1) v <<= (seg - 1)
          if ((x & 0x80) != 0) v else -v
        }
      }.map(_.toLong).sum
    val exp = Seq(
      (0L, "ulaw", 240L, sums("ulaw", 240, 0)),
      (1L, "alaw", 264L, sums("alaw", 264, 1)),
      (2L, "ulaw", 288L, sums("ulaw", 288, 2)),
      (9L, "alaw", 240L, sums("alaw", 240, 4)))
    assert(got == exp, s"g711 stats: $got vs $exp")
  }

  test("AviCodec: container round-trips dims/frames/pixel sums, pads DWORD rows, rejects junk") {
    // w=10 forces real DWORD padding (3*10=30 → stride 32): the
    // decoder must skip the 2 pad bytes per row or the sums drift
    for ((w, h, f, k) <- Seq((10, 6, 3, 1), (8, 6, 4, 0), (16, 8, 7, 4))) {
      val bytes = Multimodal.AviCodec.avi(w, h, f, k)
      assert(new String(bytes.take(4), "US-ASCII") == "RIFF" &&
        new String(bytes.slice(8, 12), "US-ASCII") == "AVI ")
      val Some((dw, dh, df, sums)) = Multimodal.AviCodec.decode(bytes)
      assert((dw, dh, df) == (w, h, f), s"dims for ${w}x$h f=$f: got ($dw,$dh,$df)")
      val expSums = (0 until f).map { fr =>
        (for (x <- 0 until w; y <- 0 until h; c <- 0 until 3)
          yield ((x * 7 + y * 13 + fr * 29 + k * 3 + c) % 256).toLong).sum
      }
      assert(sums.toSeq == expSums, s"frame sums for ${w}x$h f=$f")
    }
    assert(Multimodal.AviCodec.decode("junk but long enough".getBytes).isEmpty)
    assert(Multimodal.AviCodec.decode(
      Multimodal.ImageCodec.png(8, 8)).isEmpty, "a PNG is not an AVI")
    // a malformed RIFF ordering movi BEFORE hdrl must decode as None —
    // dims are unknown when the frame chunk arrives, so zeroed sums
    // could otherwise masquerade as a clean decode
    val good = Multimodal.AviCodec.avi(8, 6, 2, 0)
    def le32(v: Int) = Array[Byte](v.toByte, (v >> 8).toByte,
      (v >> 16).toByte, (v >> 24).toByte)
    def cc(s: String) = s.getBytes("US-ASCII")
    // splice a bare '00db' frame chunk right after the 'AVI ' fourcc,
    // ahead of the original hdrl LIST
    val rogue = cc("00db") ++ le32(4) ++ Array[Byte](1, 2, 3, 4)
    val body = rogue ++ good.drop(12)
    val spliced = cc("RIFF") ++ le32(body.length + 4) ++ cc("AVI ") ++ body
    assert(Multimodal.AviCodec.decode(spliced).isEmpty,
      "movi before hdrl must be rejected, not zero-summed")
  }

  test("videoFrameStats: per-frame sums join back per doc; sentinel rows filtered") {
    val docs = Seq(0L, 5L).toDF("doc_id")
    val got = Multimodal.videoFrameStats(docs, "doc_id")
      .orderBy("doc_id", "frame_idx")
      .select("doc_id", "frame_idx", "frame_sum")
      .as[(Long, Long, Long)].collect().toSeq
    // doc 0: w=8 h=6 f=4 k=0; doc 5: w=16 h=8 f=5 k=0
    def fs(w: Int, h: Int, f: Int, k: Int): Seq[Long] =
      (0 until f).map { fr =>
        (for (x <- 0 until w; y <- 0 until h; c <- 0 until 3)
          yield ((x * 7 + y * 13 + fr * 29 + k * 3 + c) % 256).toLong).sum
      }
    val exp = fs(8, 6, 4, 0).zipWithIndex.map { case (s, i) => (0L, i.toLong, s) } ++
      fs(16, 8, 5, 0).zipWithIndex.map { case (s, i) => (5L, i.toLong, s) }
    assert(got == exp, s"video frame stats: $got")
  }

  test("videoSceneCuts: first frame anchors scene 0, cuts advance the scene id") {
    val docs = Seq(0L).toDF("doc_id") // w=8 h=6 f=4 k=0
    val got = Multimodal.videoSceneCuts(docs, "doc_id", threshold = 2000L)
      .orderBy("frame_idx")
      .select("frame_idx", "delta", "is_cut", "scene_id")
      .as[(Long, Long, Boolean, Long)].collect().toSeq
    assert(got.size == 4)
    assert(got.head == ((0L, 0L, false, 0L)),
      s"frame 0 has no predecessor: delta 0, never a cut: ${got.head}")
    // scene id must equal the running cut count at every frame
    var cuts = 0L
    got.foreach { case (_, _, isCut, sid) =>
      if (isCut) cuts += 1
      assert(sid == cuts, s"scene id drift: $got")
    }
    // deltas recompute from the per-frame formula sums
    def fsum(fr: Int): Long =
      (for (x <- 0 until 8; y <- 0 until 6; c <- 0 until 3)
        yield ((x * 7 + y * 13 + fr * 29 + c) % 256).toLong).sum
    val expDeltas = Seq(0L) ++ (1 until 4).map(f => math.abs(fsum(f) - fsum(f - 1)))
    assert(got.map(_._2) == expDeltas, s"deltas: ${got.map(_._2)} vs $expDeltas")
  }

  test("audioActivity: window sums from the decoded bytes, integer-compare gating") {
    val docs = Seq(1L).toDF("doc_id") // rate 16000, n=440, k=1
    val got = Multimodal.audioActivity(docs, "doc_id", windows = 16,
        threshold = 512L)
      .orderBy("window_idx")
      .select("window_idx", "n_in_window", "sum_abs", "active")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(got.size == 16 && got.map(_._2).sum == 440L,
      s"16 windows must cover all 440 samples: $got")
    // recompute straight from the generation formula (no WAV)
    val cnts = new Array[Long](16); val sabs = new Array[Long](16)
    for (i <- 0 until 440) {
      val s = ((i * 37 + 11) % 2048) - 1024
      val w = (i.toLong * 16 / 440).toInt
      cnts(w) += 1; sabs(w) += math.abs(s)
    }
    val exp = (0 until 16).map(w =>
      (w.toLong, cnts(w), sabs(w), sabs(w) > cnts(w) * 512))
    assert(got == exp, s"vad windows: $got vs $exp")
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
