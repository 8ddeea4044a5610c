package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.plans.{DotProduct, HyperplaneBuckets, L2Norm}

/** SparkSessionExtensions entry point: registers the native vector
  * kernels as SQL functions, so pure-SQL users (spark.sql strings,
  * thrift/connect clients) get the codegen'd hot path too:
  *
  * {{{
  * SparkSession.builder()
  *   .config("spark.sql.extensions", "graft.GraftExtensions")
  *   ...
  * spark.sql("SELECT graft_dot(a.embedding, b.embedding) FROM ...")
  * }}}
  *
  * The DataFrame API (graft.functions.VectorFunctions) does NOT
  * require the extension — it builds the expressions directly.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float/double arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => DotProduct(a, b)
        case _ => throw new IllegalArgumentException("graft_dot expects 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_l2norm"),
      info("graft_l2norm", "graft_l2norm(a) - L2 norm of a float/double array"),
      (args: Seq[Expression]) => args match {
        case Seq(a) => L2Norm(a)
        case _ => throw new IllegalArgumentException("graft_l2norm expects 1 argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_md5prefix64"),
      info("graft_md5prefix64",
        "graft_md5prefix64(s) - top 60 bits of md5(s) as a non-negative bigint " +
          "(= conv(substring(md5(s), 1, 15), 16, 10), fused)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.plans.Md5Prefix64(s)
        case _ => throw new IllegalArgumentException("graft_md5prefix64 expects 1 argument")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      info("graft_cosine",
        "graft_cosine(a, b) - cosine similarity of two float/double arrays"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.plans.CosineSim(a, b)
        case _ => throw new IllegalArgumentException("graft_cosine expects 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_damerau_levenshtein"),
      info("graft_damerau_levenshtein",
        "graft_damerau_levenshtein(a, b) - true (unrestricted) Damerau-Levenshtein " +
          "edit distance: insertions, deletions, substitutions, adjacent transpositions"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.plans.DamerauLevenshtein(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_damerau_levenshtein expects 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_jaro_winkler"),
      info("graft_jaro_winkler",
        "graft_jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1] " +
          "(boost threshold 0.7, prefix cap 4, scale 0.1; empty input scores 0)"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => graft.plans.JaroWinkler(a, b)
        case _ => throw new IllegalArgumentException(
          "graft_jaro_winkler expects 2 arguments")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      info("graft_nfc",
        "graft_nfc(s) - Unicode NFC normalization (UAX #15 canonical composition)"),
      (args: Seq[Expression]) => args match {
        case Seq(s) => graft.plans.NfcNormalize(s)
        case _ => throw new IllegalArgumentException("graft_nfc expects 1 argument")
      }))
  }
}
