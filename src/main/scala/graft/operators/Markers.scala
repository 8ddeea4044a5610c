package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Commit-marker probes for materialized artifacts (IVF cells, BM25
  * postings, cluster maps, basket/kNN graphs, PCA bases, date lakes).
  *
  * Resolved through the Hadoop [[org.apache.hadoop.fs.FileSystem]] of
  * the path — NOT `java.io.File` — so the `_SUCCESS` convention holds
  * on any filesystem the WRITE side can target (HDFS, S3A, local).
  * With a `java.io.File` probe, a valid graph on a non-local path
  * would always rebuild under `ensure*` and always refuse to serve
  * under `require*`, because the marker "never exists" on the local
  * disk. The active session's `hadoopConfiguration` resolves the
  * scheme exactly as the writers ([[Graph.appendBasketDelta]],
  * [[TextAnalysis.appendBm25Delta]]) already do.
  */
private[graft] object Markers {
  def exists(marker: String): Boolean = {
    val p = new Path(marker)
    val conf = SparkSession.active.sparkContext.hadoopConfiguration
    p.getFileSystem(conf).exists(p)
  }
}
