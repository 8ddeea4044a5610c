package graft

import org.apache.spark.sql.functions._
import graft.plans.StringDistance
import graft.functions.TextFunctions

/** The string-distance kernels (graft.plans.StringDistance): classical
  * test vectors, the DuckDB-pinned conventions (true DL, floored
  * transposition halving, 0.7 boost threshold, empty→0), and the
  * codegen path through real Column expressions.
  */
class StringDistanceSpec extends SparkSpec {
  import spark.implicits._

  test("damerau-levenshtein: TRUE (unrestricted) variant, classical vectors") {
    // the canonical OSA-vs-true discriminator: CA→AC (transpose)→ABC
    // (insert) = 2; the restricted variant forbids editing a
    // transposed pair and says 3
    assert(StringDistance.damerauLevenshtein("CA", "ABC") == 2)
    assert(StringDistance.damerauLevenshtein("kitten", "sitting") == 3)
    assert(StringDistance.damerauLevenshtein("flaw", "lawn") == 2)
    // adjacent transposition costs 1 where Levenshtein charges 2
    assert(StringDistance.damerauLevenshtein("smtih", "smith") == 1)
    assert(StringDistance.damerauLevenshtein("abc", "acb") == 1)
    assert(StringDistance.damerauLevenshtein("ab", "ba") == 1)
    assert(StringDistance.damerauLevenshtein("abcd", "acbd") == 1)
    // identity / empties
    assert(StringDistance.damerauLevenshtein("", "") == 0)
    assert(StringDistance.damerauLevenshtein("a", "") == 1)
    assert(StringDistance.damerauLevenshtein("", "abc") == 3)
    assert(StringDistance.damerauLevenshtein("same", "same") == 0)
  }

  test("jaro-winkler: classical vectors, boost threshold, floored transpositions, empty convention") {
    def jw(a: String, b: String) = StringDistance.jaroWinkler(a, b)
    // the textbook triple (Winkler's own examples)
    assert(math.abs(jw("martha", "marhta") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("dwayne", "duane") - 0.84) < 1e-12)
    assert(math.abs(jw("dixon", "dicksonx") - 0.8133333333333332) < 1e-12)
    // boost threshold: common prefix but jaro <= 0.7 → NO bonus
    assert(math.abs(jw("abXXXX", "abYYYY") - 0.5555555555555555) < 1e-12)
    // prefix cap 4: 8 common chars still bonus only 4
    assert(math.abs(jw("aaaaaaaaab", "aaaaaaaaba") - 0.98) < 1e-12)
    // floored transposition halving (strcmp95 convention, pinned
    // against DuckDB): these two strings match 7 chars with 7
    // out-of-place pairs → t = 3, NOT 3.5
    assert(math.abs(jw("cold plate", "small widget") - 0.6182539682539682) < 1e-12)
    // empty-side convention is 0, identity is 1
    assert(jw("", "") == 0.0)
    assert(jw("a", "") == 0.0)
    assert(jw("a", "a") == 1.0)
    assert(jw("a", "b") == 0.0)
  }

  test("nfc: decomposed sequences recompose; composed text is a fixpoint") {
    val dec = "Cafe\u0301" // e + combining acute, 5 code points
    val comp = "Caf\u00e9" // composed, 4 code points
    val out = spark.range(1).select(
      TextFunctions.nfcNormalize(lit(dec)).as("n"),
      length(lit(dec)).as("ld"),
      length(TextFunctions.nfcNormalize(lit(dec))).as("ln"))
      .as[(String, Int, Int)].collect().head
    assert(out._1 == comp)
    assert(out._2 == 5 && out._3 == 4, "recomposition drops the combining mark")
    val fix = spark.range(1)
      .select(TextFunctions.nfcNormalize(lit(comp)).as("n"))
      .as[String].collect().head
    assert(fix == comp)
  }

  test("column expressions: codegen path agrees with the static kernels; nulls propagate") {
    val df = Seq(
      ("smtih", "smith"),
      ("cold plate", "small widget"),
      ("CA", "ABC"),
      (null.asInstanceOf[String], "x")
    ).toDF("a", "b")
      .select(
        TextFunctions.damerauLevenshtein(col("a"), col("b")).as("dl"),
        TextFunctions.jaroWinkler(col("a"), col("b")).as("jw"))
    val rows = df.collect()
    assert(rows(0).getInt(0) == 1)
    assert(rows(1).getInt(0) == StringDistance.damerauLevenshtein("cold plate", "small widget"))
    assert(rows(2).getInt(0) == 2)
    assert(math.abs(rows(1).getDouble(1) - 0.6182539682539682) < 1e-12)
    assert(rows(3).isNullAt(0) && rows(3).isNullAt(1), "null inputs → null")
    // the SQL-registered forms resolve through GraftExtensions
    val viaSql = spark.sql(
      "SELECT graft_damerau_levenshtein('smtih', 'smith') AS dl, " +
        "round(graft_jaro_winkler('martha', 'marhta'), 6) AS jw, " +
        "graft_nfc('e\u0301') AS n")
      .collect().head
    assert(viaSql.getInt(0) == 1)
    assert(viaSql.getDouble(1) == 0.961111)
    assert(viaSql.getString(2) == "\u00e9")
  }
}
