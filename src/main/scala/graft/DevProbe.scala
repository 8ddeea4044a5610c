package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

// throwaway measurement probe — NOT part of the library; deleted before commit
object DevProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, dir)
    for ((shingles, n, t, label) <- Seq(
        (charShinglesFast(col("text"), 8), 8, 0.3, "char8 t=0.3"),
        (wordShinglesFast(col("text"), 3), 3, 0.12, "word3 t=0.12"))) {
      val sh = docs.select(col("doc_id").as("doc"), shingles.as("shs"))
        .select(col("doc"), size(col("shs")).as("n_sh"), explode(col("shs")).as("s"))
        .select(col("doc"), col("n_sh"), xxhash64(col("s")).as("h"))
      val postings = sh.groupBy("h")
        .agg(collect_list(struct(col("doc"), col("n_sh"))).as("ds"))
        .where(size(col("ds")).between(2, 200))
      val pairs = postings
        .select(explode(col("ds")).as("a"), col("ds"))
        .select(col("a"), explode(col("ds")).as("b"))
        .where(col("a.doc") < col("b.doc"))
      val total = pairs.count()
      val kept = pairs.where(
        least(col("a.n_sh"), col("b.n_sh")).cast("double") >=
          (lit(t) - lit(1e-6)) * greatest(col("a.n_sh"), col("b.n_sh")).cast("double"))
        .count()
      println(f"[probe] $label: pair rows total=$total kept=$kept cut=${100.0*(total-kept)/total}%.1f%%")
    }
    spark.stop()
  }
}
