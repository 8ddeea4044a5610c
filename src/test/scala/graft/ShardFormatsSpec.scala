package graft

import graft.operators.ShardFormats._

class ShardFormatsSpec extends SparkSpec {

  test("TarCodec: ustar round-trips names/sizes/sums; checksum validation refuses a flipped byte; truncation refused") {
    val bytes = TarCodec.webdatasetTar(nSamples = 3, k = 2)
    val es = TarCodec.entries(bytes).get
    assert(es.map(_._1) == Seq("00000.txt", "00000.cls", "00001.txt",
      "00001.cls", "00002.txt", "00002.cls"))
    // sizes: txt = 20 + (s%4)*10, cls = 1
    assert(es.map(_._2) == Seq(20L, 1L, 30L, 1L, 40L, 1L))
    // payload sums replay the generation formula
    for (s <- 0 until 3) {
      val len = 20 + (s % 4) * 10
      val expected = (0 until len).map(j => (j * 7 + s * 13 + 2 * 3) % 256).sum
      assert(es(2 * s)._3 == expected, s"sample $s")
      assert(es(2 * s + 1)._3 == '0'.toInt + (s + 2) % 10)
    }
    // a flipped HEADER byte breaks the checksum → the shard refuses
    val flipped = bytes.clone(); flipped(10) = 'X'.toByte
    assert(TarCodec.entries(flipped).isEmpty)
    // truncation (no zero end-blocks) refuses
    assert(TarCodec.entries(bytes.dropRight(1030)).isEmpty)
    assert(TarCodec.entries("not a tar".getBytes("UTF-8")).isEmpty)
    // the JDK has no tar reader to cross-check against — the checksum
    // + magic + round-trip above are the spec-conformance evidence
  }

  test("ZipCodec: inflates through the JDK codec — sizes/sums exact, CRC32 matches the JDK table; corrupt refused") {
    val bytes = ZipCodec.zip(nEntries = 4, k = 3)
    val es = ZipCodec.entries(bytes).get
    assert(es.map(_._1) == Seq("part-0000.bin", "part-0001.bin",
      "part-0002.bin", "part-0003.bin"))
    for (i <- 0 until 4) {
      val len = 30 + (i % 5) * 8
      val payload = Array.tabulate(len)(j => ((j * 11 + i * 17 + 3) % 256).toByte)
      assert(es(i)._2 == len.toLong)
      assert(es(i)._3 == payload.map(_ & 0xFF).map(_.toLong).sum)
      val crc = new java.util.zip.CRC32(); crc.update(payload)
      assert(es(i)._4 == crc.getValue, s"entry $i crc")
    }
    assert(ZipCodec.entries("PK but not really".getBytes("UTF-8")).isEmpty)
    assert(ZipCodec.entries(Array.empty[Byte]).isEmpty)
  }

  test("WarcCodec: record walk recovers type/URI/length/sums; lying Content-Length and truncation refused") {
    val bytes = WarcCodec.warc(nRecords = 5, k = 1)
    val rs = WarcCodec.records(bytes).get
    assert(rs.size == 5)
    for (r <- 0 until 5) {
      val len = 25 + (r % 5) * 15
      assert(rs(r)._1 == (if (r % 4 == 3) "request" else "response"))
      assert(rs(r)._2 == s"http://example.com/doc/$r")
      assert(rs(r)._3 == len.toLong)
      assert(rs(r)._4 ==
        (0 until len).map(j => (j * 5 + r * 19 + 1 * 7) % 256).sum.toLong)
    }
    assert(WarcCodec.records("HTTP/1.1 200 OK\r\n\r\nx".getBytes("UTF-8")).isEmpty)
    assert(WarcCodec.records(bytes.dropRight(3)).isEmpty, "truncated record")
    // a Content-Length pointing past the payload is refused, never
    // read out of bounds
    val lying = new String(bytes, "ISO-8859-1")
      .replaceFirst("Content-Length: 25", "Content-Length: 9925")
      .getBytes("ISO-8859-1")
    assert(WarcCodec.records(lying).isEmpty)
  }
}
