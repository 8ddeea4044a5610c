package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.functions.ODataFunctions._
import graft.operators.Etl

/** Property-style tests for the pure/control-plane pieces (SURVEY §5):
  * OData escaping, /Date(ms)/ codec, dedup idempotence. Raw ScalaCheck
  * generators sampled with a fixed seed (the scalatest bridge artifact
  * is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  test("quote escape round-trips through the stub server's unescape") {
    for (s <- samples(Gen.asciiPrintableStr, 200)) {
      val escaped = odataQuoteEscape(s)
      assert(escaped.replace("''", "'") == s)
      assert(!escaped.replace("''", "").contains("'"))
    }
  }

  test("date codec round-trips arbitrary epoch millis (batched through one plan)") {
    val ms = samples(Gen.choose(-62135596800000L, 253402300799000L), 300)
    val got = ms.toDF("ms")
      .select(unix_millis(odataDateDecode(odataDateEncode(timestamp_millis(col("ms"))))).as("r"))
      .as[Long].collect().toSeq
    assert(got == ms)
  }

  test("dedup is idempotent and order-insensitive on row multisets") {
    val gen = Gen.listOfN(30, Gen.zip(Gen.choose(0, 5), Gen.oneOf("a", "b", "c")))
    for (rows <- samples(gen, 10) if rows.nonEmpty) {
      val df = rows.toDF("k", "v")
      val once = Etl.dedupRows(df)
      assert(once.count() == Etl.dedupRows(once).count())
      assert(once.count() == rows.distinct.size)
      val shuffled = scala.util.Random.shuffle(rows).toDF("k", "v")
      assert(Etl.dedupRows(shuffled).count() == rows.distinct.size)
    }
  }

  test("renameForSink permits duplicate target names at the sink boundary") {
    val df = Seq(("x", "y", 1)).toDF("COCHAR_STRUCTURE", "C0CHAR_STRUCTURE", "v")
    val out = Etl.renameForSink(df,
      Map("COCHAR_STRUCTURE" -> "Structure", "C0CHAR_STRUCTURE" -> "Structure"))
    assert(out.columns.toSeq == Seq("Structure", "Structure", "v"))
    assert(out.collect().head.toSeq == Seq("x", "y", 1))
  }
}
