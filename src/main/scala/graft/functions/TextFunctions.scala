package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the dedup / text-analysis operators.
  * All built from codegen'd or HOF built-ins — no UDFs in the hot
  * path, so the expressions distribute and pipeline at any scale.
  */
object TextFunctions {

  /** Whitespace tokenization (reference docs are space-separated). */
  def tokens(text: Column): Column =
    split(trim(text), "\\s+")

  /** Engine-neutral 60-bit hash = top 60 bits of md5, as one fused
    * native kernel (graft.plans.Md5Prefix64) — bit-identical to
    * `conv(substring(md5(s), 1, 15), 16, 10)` but without the hex
    * string materialization, slice, and radix parse that chain pays
    * per shingle/token.
    */
  def md5Prefix64(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.Md5Prefix64(org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** TRUE Damerau-Levenshtein edit distance (adjacent transpositions
    * cost 1, and — unlike the restricted OSA variant — a transposed
    * pair may be edited again). Native codegen'd kernel
    * (graft.plans.DamerauLevenshtein); DuckDB's
    * `damerau_levenshtein` is the oracle twin on ASCII text.
    */
  def damerauLevenshtein(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.DamerauLevenshtein(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Jaro-Winkler similarity in [0,1] (classical constants: boost
    * threshold 0.7, prefix cap 4, scale 0.1; empty input scores 0).
    * Native codegen'd kernel (graft.plans.JaroWinkler); DuckDB's
    * `jaro_winkler_similarity` is the oracle twin on ASCII text.
    */
  def jaroWinkler(a: Column, b: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.JaroWinkler(
        org.apache.spark.sql.graft.ColumnBridge.expression(a),
        org.apache.spark.sql.graft.ColumnBridge.expression(b)))

  /** Unicode NFC normalization (UAX #15) — composed/decomposed forms
    * of the same text hash identically after this. DuckDB's
    * `nfc_normalize` (utf8proc) is the oracle twin.
    */
  def nfcNormalize(c: Column): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.plans.NfcNormalize(
        org.apache.spark.sql.graft.ColumnBridge.expression(c)))

  /** BPE-ish sub-word tokenization: split on word/number/punct
    * boundaries like a byte-pair pre-tokenizer's regex pass.
    * (Pattern class per the public GPT-2 pre-tokenizer idea:
    * letters-runs, digit-runs, single punctuation.)
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("\\p{L}+|\\p{N}+|[^\\p{L}\\p{N}\\s]"), lit(0))

  /** Normalize for fingerprinting: lowercase, strip non-alnum, collapse
    * whitespace. Deterministic and SQL-expressible (oracle parity).
    */
  def normalized(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", " "), "\\s+", " "))

  /** Word n-gram shingles from a MATERIALIZED token-array column:
    * distinct contiguous n-token windows joined by a single space.
    * Empty array when the doc has fewer than n tokens.
    *
    * `toks` must be an attribute (withColumn), not an inline
    * expression: the column is referenced from inside the transform
    * lambda, and an inline `split` there would re-tokenize the text
    * once per shingle — O(len²) per document.
    */
  def wordShinglesFromTokens(toks: Column, n: Int): Column =
    // guard the short-doc case explicitly: sequence(0, -1) would
    // produce a DESCENDING [0,-1] (Spark defaults step to -1), not an
    // empty array, and the slice at i = -1 then throws
    when(size(toks) >= n,
      array_distinct(
        transform(
          sequence(lit(0), size(toks) - n),
          i => concat_ws(" ", slice(toks, i + 1, lit(n)))
        )
      )).otherwise(array().cast("array<string>"))

  /** Convenience one-shot form — ONLY for small inputs/tests; see
    * [[wordShinglesFromTokens]] for the per-element re-split hazard.
    */
  def wordShingles(text: Column, n: Int): Column =
    wordShinglesFromTokens(tokens(text), n)

  /** Word n-gram shingles via one codegen'd regex pass — the hot-path
    * form. Semantically identical to [[wordShingles]] (verified
    * element-for-element) but ~4× faster: higher-order functions
    * (transform/slice/concat_ws) are interpreted expressions costing
    * ~10 µs per element, while regexp_extract_all runs inside
    * whole-stage codegen. Whitespace is normalized first, then
    * overlapping n-token windows are captured with a consumed
    * token-start anchor + zero-width lookahead, so the matcher
    * advances one token per match.
    */
  def wordShinglesFast(text: Column, n: Int): Column = {
    val norm = regexp_replace(trim(text), "\\s+", " ")
    val pat = "(?:^| )(?=(\\S+" + " \\S+" * (n - 1) + "))"
    array_distinct(regexp_extract_all(norm, lit(pat), lit(1)))
  }

  /** Word n-gram MULTISET via the same codegen'd one-pass regex as
    * [[wordShinglesFast]] but WITHOUT the distinct: repetition
    * analysis needs every occurrence (a doc that repeats one 3-gram
    * fifty times is exactly what the distinct form hides).
    */
  def wordNgramsFast(text: Column, n: Int): Column = {
    val norm = regexp_replace(trim(text), "\\s+", " ")
    val pat = "(?:^| )(?=(\\S+" + " \\S+" * (n - 1) + "))"
    regexp_extract_all(norm, lit(pat), lit(1))
  }

  /** Character n-gram shingles (for fingerprinting / language ID).
    * Same short-input guard as [[wordShinglesFromTokens]]: without it,
    * sequence(0, -1) yields a descending [0, -1] and produces two
    * bogus partial shingles for texts shorter than n.
    */
  def charShingles(text: Column, n: Int): Column =
    when(length(text) >= n,
      array_distinct(
        transform(
          sequence(lit(0), length(text) - n),
          i => text.substr(i + 1, lit(n))
        )
      )).otherwise(array().cast("array<string>"))

  /** Character n-gram shingles via ONE codegen'd regex pass (the
    * hot-path form of [[charShingles]]): a zero-width lookahead
    * captures the n chars starting at every position, so the matcher
    * advances one char per match. (?s) makes `.` cross newlines,
    * matching substr semantics in the SQL oracle.
    */
  def charShinglesFast(text: Column, n: Int): Column =
    array_distinct(regexp_extract_all(text, lit(s"(?s)(?=(.{$n}))"), lit(1)))

  /** 64-bit stable hash of a string column (xxhash64, codegen'd). */
  def stableHash(c: Column, seed: Int = 42): Column = xxhash64(lit(seed), c)
}
