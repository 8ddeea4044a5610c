package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Join shapes Spark's built-in operators don't provide directly —
  * as-of, range, and skew-salted equi-join — each written as the
  * plan you'd want on a 1000-executor cluster, not the first plan
  * that returns the right rows.
  */
object Joins {

  /** As-of join: for every left row, the single latest right row with
    * `right.tsCol <= left.tsCol` and equal keys (time-series
    * enrichment / attribution).
    *
    * NOT an inequality join (quadratic, unprunable): both sides union
    * into one stream tagged by side, then ONE window pass per key
    * ordered by (ts, side, id) carries the last-seen right payload
    * forward onto each left row (`last(_, ignoreNulls)` over a
    * running frame). Cost = one shuffle + sort on the key — the same
    * plan shape as sessionization, linear in |L|+|R| at any scale.
    * Right rows sort BEFORE left rows at equal ts (side 0 < 1), so
    * `<=` semantics hold; ties among right rows resolve to the
    * greatest `idCol` — deterministic, unlike raw SQL ASOF.
    *
    * `rightPayload` columns come back null when no right row precedes
    * the left row (left-outer semantics).
    *
    * `toleranceMs` bounds the lookback (the feature-store as-of
    * contract: a feature older than the tolerance is stale, not a
    * match): a carried right row further than `toleranceMs` behind
    * the left row nulls out — applied AFTER the window pass, so the
    * plan is unchanged (one shuffle + sort) and only the acceptance
    * tightens.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, idCol: String,
               rightPayload: Seq[String],
               toleranceMs: Option[Long] = None): DataFrame = {
    val payload = struct(
      (Seq(tsCol, idCol) ++ rightPayload).map(c => col(c).as(s"r_$c")): _*)
    // right rows carry (keys, ts, id) under the left's column names so
    // the two sides union; the left side has no "r" column — unionByName
    // null-fills it with the correct struct type
    val r = right.select(
      Seq(lit(0).as("side"), payload.as("r")) ++
        (keyCols :+ tsCol :+ idCol).map(col): _*)
    val l = left.withColumn("side", lit(1))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("side"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val joined = l.unionByName(r, allowMissingColumns = true)
      .withColumn("matched", last(col("r"), ignoreNulls = true).over(w))
      .where(col("side") === 1)
      .drop("side", "r")
    toleranceMs match {
      case Some(tol) => joined.withColumn("matched",
        when(unix_millis(col(tsCol))
               - unix_millis(col(s"matched.r_$tsCol")) <= tol,
          col("matched"))) // else null — stale match drops to no-match
      case None => joined
    }
  }

  /** NEAREST-in-time as-of join — the bidirectional cousin of
    * [[asOfJoin]] (sensor/feature alignment where context can sit on
    * either side of the observation): each left row takes the right
    * row with the smallest |Δts|, preferring the backward match on a
    * tie (Δ=0 included — an equal-ts right row sorts before the left
    * row and is picked up by the backward pass).
    *
    * Scale shape: the SAME one-union one-sort plan as [[asOfJoin]] —
    * both directional carries share a single window ordering (the
    * backward `last` and forward `first` frames run in one
    * WindowExec pass), so nearest costs exactly what backward does:
    * one shuffle by key, one sort, never an inequality join.
    */
  def asOfJoinNearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                      tsCol: String, idCol: String,
                      rightPayload: Seq[String]): DataFrame = {
    val payload = struct(
      (Seq(tsCol, idCol) ++ rightPayload).map(c => col(c).as(s"r_$c")): _*)
    val r = right.select(
      Seq(lit(0).as("side"), payload.as("r")) ++
        (keyCols :+ tsCol :+ idCol).map(col): _*)
    val l = left.withColumn("side", lit(1))
    def w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("side"), col(idCol))
    val u = l.unionByName(r, allowMissingColumns = true)
      .withColumn("prev", last(col("r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("nxt", first(col("r"), ignoreNulls = true)
        .over(w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .where(col("side") === 1)
    val dp = unix_millis(col(tsCol)) - unix_millis(col(s"prev.r_$tsCol"))
    val dn = unix_millis(col(s"nxt.r_$tsCol")) - unix_millis(col(tsCol))
    u.withColumn("matched",
        when(col("prev").isNull, col("nxt"))
          .when(col("nxt").isNull, col("prev"))
          .when(dp <= dn, col("prev")).otherwise(col("nxt")))
      .withColumn("direction",
        when(col("matched").isNull, lit(null).cast("string"))
          .when(col(s"matched.r_$tsCol") <= col(tsCol), lit("backward"))
          .otherwise(lit("forward")))
      .drop("side", "r", "prev", "nxt")
  }

  /** Range join: all (left, right) pairs with equal keys and
    * `right.tsCol − left.tsCol` in `[0, windowSeconds)`.
    *
    * The scale path is bin-bucketing: left rows replicate into the
    * two `windowSeconds`-wide bins their window overlaps, right rows
    * map to their single bin, and the match becomes an EQUI-join on
    * (keys, bin) + an exact residual filter. Each true pair matches
    * in exactly one bin (the right row's), so no dedup pass is
    * needed. Replication factor is a constant 2 — at 100 TB this is
    * a shuffled hash join on a composite key, never a cross product.
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
                tsCol: String, windowSeconds: Long): DataFrame = {
    val binOf = (c: Column) => floor(unix_millis(c) / (windowSeconds * 1000))
    val l = left.withColumn("bin", explode(array(binOf(col(tsCol)), binOf(col(tsCol)) + 1)))
    val r = right.withColumn("bin", binOf(col(tsCol)))
    val joinKeys = keyCols :+ "bin"
    l.as("l").join(r.as("r"), joinKeys)
      .where(col(s"r.$tsCol") >= col(s"l.$tsCol") &&
             unix_millis(col(s"r.$tsCol")) - unix_millis(col(s"l.$tsCol")) < windowSeconds * 1000)
      .drop("bin")
  }

  /** Interval overlap join: all (left, right) pairs with equal keys
    * whose CLOSED intervals [lStart, lEnd] and [rStart, rEnd]
    * intersect. The both-sides-are-intervals cousin of [[rangeJoin]]
    * (whose right side is a point).
    *
    * Scale path: both sides replicate into every `bucketSeconds`-wide
    * time bucket their interval covers and the match becomes an
    * EQUI-join on (keys, bucket) + the exact overlap residual. A pair
    * sharing several buckets would duplicate, so each true pair is
    * ACCEPTED in exactly one bucket — the one holding
    * max(lStart, rStart), which both intervals provably cover — and
    * no distinct pass ever materializes the (potentially huge) pair
    * set twice. Replication factor = interval length / bucketSeconds
    * + 1: pick the bucket width near the typical interval length. At
    * 100 TB this is a shuffled hash join on a composite key whose
    * fan-out you control — never a cross product.
    *
    * Caller renames columns so the two sides are disjoint.
    *
    * INVERTED intervals (end < start) are dropped before the bucket
    * explode: a reversed closed interval is empty and can match
    * nothing — and without the guard `sequence(bin(start), bin(end))`
    * would silently default to step −1 and emit a DESCENDING bucket
    * list, replicating the malformed row across bogus buckets (the
    * same hazard [[graft.operators.Dedup]]'s shingle sequence guards
    * against).
    */
  def intervalOverlapJoin(left: DataFrame, right: DataFrame,
                          keyCols: Seq[String],
                          lStart: String, lEnd: String,
                          rStart: String, rEnd: String,
                          bucketSeconds: Long): DataFrame = {
    val w = bucketSeconds * 1000
    val bin = (c: Column) => floor(unix_millis(c) / w)
    val l = left.where(col(lEnd) >= col(lStart)).withColumn("bucket",
      explode(sequence(bin(col(lStart)), bin(col(lEnd)))))
    val r = right.where(col(rEnd) >= col(rStart)).withColumn("bucket",
      explode(sequence(bin(col(rStart)), bin(col(rEnd)))))
    l.join(r, (keyCols :+ "bucket").toSeq)
      .where(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
             col("bucket") ===
               floor(greatest(unix_millis(col(lStart)), unix_millis(col(rStart))) / w))
      .drop("bucket")
  }

  /** Fuzzy string self-join: all id pairs whose strings are within
    * Levenshtein distance `maxDist` — the entity-resolution /
    * record-linkage primitive (near-identical names, typo'd keys).
    *
    * NOT a cross join: PassJoin-style pigeonhole segment blocking (Li
    * et al., ICDE 2011). Each string splits into `maxDist + 1`
    * contiguous segments; if edit(a, b) <= maxDist then at least one
    * segment of `a` survives untouched and appears in `b` at a
    * position shifted by at most `maxDist` (each edit moves later
    * characters by at most one). So the indexed side emits its
    * `maxDist + 1` segments keyed by (own length, segment index,
    * segment text), the probe side emits every admissible substring —
    * for each assumed partner length within ±maxDist, each segment
    * slot, each shift in ±maxDist — and the match becomes an
    * EQUI-join on that composite key plus an exact Levenshtein
    * residual. Fan-out per row is the constant
    * (maxDist+1)·(2·maxDist+1)² on the probe side; at 100 TB this is
    * a shuffled hash join on the segment key, never a cross product.
    * The residual uses the threshold form of `levenshtein`, which
    * abandons a pair as soon as its running distance exceeds
    * `maxDist` (O(maxDist·len) not O(len²) per pair).
    *
    * A candidate pair can match through several segments; the
    * threshold-Levenshtein verify runs MAP-SIDE on the raw join
    * output (each duplicate candidate re-verifies — the lev is
    * cheaper than shuffling the candidate) and the surviving matches
    * dedupe with one `distinct` on the skinny (id, id, dist) rows.
    * Strings shorter than `maxDist + 1` produce empty segments whose
    * keys degrade to (length, slot) — still correct (the verify
    * filter holds), just unselective for very short strings.
    *
    * KNOWN ADVERSARIAL CASE: corpora where one positional segment is
    * constant corpus-wide (synthetic serial ids — "Customer#0000…")
    * put every row in one blocking group and the candidate set goes
    * quadratic in that group; deeper PartEnum-style recursion only
    * pushes the problem to the next constant region on such data.
    * Positional-segment blocking is the wrong tool for
    * serial-id-shaped strings — slice the input (the gate does) or
    * use the content-hash dedup family instead.
    *
    * Returns (id_a, id_b, dist) with id_a < id_b, dist <= maxDist.
    */
  def fuzzySelfJoin(df: DataFrame, idCol: String, strCol: String,
                    maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"maxDist must be >= 1, got $maxDist")
    val m = maxDist + 1
    val base = df.select(col(idCol).as("fid"), col(strCol).as("fs"))
      .where(col("fs").isNotNull)
      .withColumn("flen", length(col("fs")).cast("long"))
    // indexed side: the m segments of its own string (0-based starts;
    // substring() is 1-based). Boundary j of length L sits at
    // floor(j*L/m), so segment lengths differ by at most one.
    val indexed = base
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("seg_start", floor(col("j") * col("flen") / m))
      .withColumn("seg_len",
        floor((col("j") + 1) * col("flen") / m) - col("seg_start"))
      .withColumn("seg", expr(
        "substring(fs, cast(seg_start as int) + 1, cast(seg_len as int))"))
      .select(col("fid").as("id_a"), col("fs").as("s_a"),
              col("flen").as("len_a"), col("j"), col("seg"))
    // probe side: for each assumed partner length (±maxDist), each
    // segment slot of THAT length's scheme, each shift (±maxDist),
    // the substring of this string at that window — windows that
    // would run off the string can't hold a full segment and drop.
    val probe = base
      .withColumn("dl", explode(sequence(lit(-maxDist), lit(maxDist))))
      .withColumn("len_a", col("flen") + col("dl"))
      .where(col("len_a") >= 0)
      .withColumn("j", explode(sequence(lit(0), lit(m - 1))))
      .withColumn("seg_start", floor(col("j") * col("len_a") / m))
      .withColumn("seg_len",
        floor((col("j") + 1) * col("len_a") / m) - col("seg_start"))
      // PassJoin's tight shift bound (optimization r13, Li et al.'s
      // position filter): an unedited segment of the partner moves in
      // the probe string by (insertions − deletions) among the ≤ k
      // edits BEFORE it; with len(partner) − len(probe) = dl that
      // nets I ≤ ⌊(k−dl)/2⌋ insertions and D ≤ ⌊(k+dl)/2⌋ deletions,
      // so shift ∈ [−⌊(k+dl)/2⌋, +⌊(k−dl)/2⌋] — the full ±k box the
      // previous probe enumerated is a strict superset (for k=1 the
      // equal-length arm needs ONLY shift 0: a substitution moves
      // nothing — 3× fewer candidates through the verify on
      // same-length-heavy corpora). Completeness is the PassJoin
      // position-filter theorem; the verify filter is unchanged, so
      // the output set is identical.
      .withColumn("shift", explode(sequence(
        (lit(0) - floor((lit(maxDist) + col("dl")) / 2)).cast("int"),
        floor((lit(maxDist) - col("dl")) / 2).cast("int"))))
      .withColumn("pos", col("seg_start") + col("shift"))
      .where(col("pos") >= 0 && col("pos") + col("seg_len") <= col("flen"))
      .withColumn("seg", expr(
        "substring(fs, cast(pos as int) + 1, cast(seg_len as int))"))
      .select(col("fid").as("id_b"), col("fs").as("s_b"),
              col("len_a"), col("j"), col("seg"))
    // Threshold-Levenshtein BEFORE the dedup, not after: on
    // low-entropy corpora (e.g. ids sharing a long constant prefix, so
    // one segment is identical corpus-wide) the blocking join emits
    // O(group²) candidates, and a distinct() on those wide candidate
    // rows is a corpus²-sized shuffle. The banded lev (O(k·n) with
    // early exit) is a MAP-SIDE filter the join output streams
    // through under whole-stage codegen — nothing materializes — and
    // only the true-match sliver reaches the distinct. Same result:
    // dist is a pure function of the pair, so filter-then-dedup ==
    // dedup-then-filter. (174 s → 4 s on the 15k-name gate corpus.)
    indexed.join(probe, Seq("len_a", "j", "seg"))
      .where(col("id_a") < col("id_b"))
      .withColumn("dist",
        levenshtein(col("s_a"), col("s_b"), maxDist).cast("long"))
      .where(col("dist") >= 0) // threshold form yields -1 above maxDist
      .select("id_a", "id_b", "dist").distinct()
  }

  /** Skew-salted equi-join: identical result to `left.join(right,
    * keys)`, but a hot key's rows spread over `numSalts` reducers.
    * The big/skewed side gets a deterministic salt from its row
    * content; the small side replicates ×numSalts. Use when one key
    * dominates (AQE skew-join split handles moderate skew; salting is
    * the explicit form that also works mid-pipeline, e.g. under a
    * window).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
                 numSalts: Int, saltSource: String): DataFrame = {
    val l = big.withColumn("salt", pmod(xxhash64(col(saltSource)), lit(numSalts)))
    val r = small.withColumn("salt", explode(sequence(lit(0), lit(numSalts - 1))))
    l.join(r, keyCols :+ "salt").drop("salt")
  }

  /** Adaptive skew salting: identical result to the plain join, but
    * only keys whose BIG-side frequency reaches `hotThreshold` get
    * salted — cold keys keep salt 0 and the small side replicates
    * ONLY for the hot set, versus [[saltedJoin]]'s blanket ×numSalts
    * replication of every small-side row. The hot-key probe is one
    * count aggregate over the big side's keys (map-side partial
    * count collapses it to per-partition distinct keys before the
    * shuffle) whose above-threshold survivors broadcast — by
    * construction a table small enough to broadcast, or the salt
    * plan was wrong anyway. This is the deterministic, mid-pipeline
    * form of what AQE's skew-join split does at runtime for
    * shuffle-boundary skew only.
    */
  def adaptiveSaltedJoin(big: DataFrame, small: DataFrame,
                         keyCols: Seq[String], hotThreshold: Long,
                         numSalts: Int, saltSource: String): DataFrame = {
    val hot = broadcast(
      big.groupBy(keyCols.map(col): _*).agg(count(lit(1)).as("__n"))
        .where(col("__n") >= hotThreshold)
        .select(keyCols.map(col) :+ lit(true).as("__hot"): _*))
    val l = big.join(hot, keyCols, "left")
      .withColumn("__salt",
        when(col("__hot"), pmod(xxhash64(col(saltSource)), lit(numSalts.toLong)))
          .otherwise(lit(0L)))
      .drop("__hot")
    val r = small.join(hot, keyCols, "left")
      .withColumn("__salt", explode(
        when(col("__hot"), sequence(lit(0L), lit(numSalts.toLong - 1)))
          .otherwise(array(lit(0L)))))
      .drop("__hot")
    l.join(r, keyCols :+ "__salt").drop("__salt")
  }

  /** Bloom-prefiltered equi-join: identical result to
    * `big.join(small, bigKey === smallKey)`, but the BIG side is cut
    * down BEFORE its shuffle by a bloom filter built from the small
    * side's keys — the manual form of Spark's runtime row-level
    * filter (SPARK-32268), for when the small side is the output of a
    * pipeline the optimizer won't inject a runtime filter through.
    * At 100 TB this is the difference between shuffling the whole fact
    * table and shuffling only the ~selectivity fraction that can
    * possibly match (plus the bloom's false-positive sliver, removed
    * by the exact join that follows — which is why the oracle is the
    * PLAIN join: the prefilter must be result-invisible).
    *
    * The sketch is one `numBits`-bit aggregate row (map-side partial
    * merge, constant size regardless of |small|) collected to the
    * driver and re-embedded as a LITERAL, so the probe on the big side
    * stays codegen'd ([[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain]]
    * requires a constant filter) — a control-plane collect of
    * numBits/8 bytes, the same thing Spark's own runtime filter ships
    * to executors as a subquery result.
    */
  def bloomPrefilterJoin(big: DataFrame, bigKey: String,
                         small: DataFrame, smallKey: String,
                         expectedItems: Long = 1000000L,
                         numBits: Long = 8388608L): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.graft.ColumnBridge
    val bfAgg = ColumnBridge.column(
      new BloomFilterAggregate(
        ColumnBridge.expression(xxhash64(col(smallKey))),
        Literal(expectedItems), Literal(numBits)).toAggregateExpression())
    val bfBytes = small.agg(bfAgg.as("bf")).head().getAs[Array[Byte]](0)
    // empty small side → null sketch → nothing can match
    val pre =
      if (bfBytes == null) big.where(lit(false))
      else big.where(ColumnBridge.column(BloomFilterMightContain(
        Literal(bfBytes, org.apache.spark.sql.types.BinaryType),
        ColumnBridge.expression(xxhash64(col(bigKey))))))
    pre.join(small, pre(bigKey) === small(smallKey))
  }

  /** Materialize a table BUCKETED on its join key (hash-bucketed +
    * per-bucket sorted files registered in the catalog) unless it
    * already exists — the pay-the-shuffle-once side of the co-located
    * join story: two fact tables bucketed the same way join with NO
    * exchange on either side, forever after, because the scan itself
    * reports the join's required hash distribution. At 100 TB this is
    * the difference between shuffling both corpora per join and
    * shuffling neither; AQE/broadcast solve the small-dim case, ONLY
    * bucketing solves fact-to-fact. The external `path` keeps data
    * out of the default warehouse; a fresh JVM whose catalog lost the
    * table re-registers by rewriting (gate-scale rebuild — a real
    * deployment re-attaches the existing files via CREATE TABLE).
    */
  def ensureBucketedTable(spark: org.apache.spark.sql.SparkSession,
                          df: => DataFrame, name: String, path: String,
                          key: String, buckets: Int): Unit =
    if (!spark.catalog.tableExists(name)) {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(path), true)
      df.write.mode("overwrite").option("path", path)
        .bucketBy(buckets, key).sortBy(key)
        .saveAsTable(name)
    }

  /** Join two [[ensureBucketedTable]] tables on their bucket keys.
    * With matching bucket counts the physical plan is a sort-merge
    * join whose BOTH sides read pre-bucketed files — zero shuffle
    * (spec-pinned with broadcast disabled in `BucketingSpec`-style
    * assertions; at gate scale the optimizer may still prefer a
    * broadcast, which is also exchange-free on the big side).
    */
  def bucketedEquiJoin(spark: org.apache.spark.sql.SparkSession,
                       leftName: String, rightName: String,
                       leftKey: String, rightKey: String): DataFrame =
    spark.table(leftName).join(spark.table(rightName),
      col(leftKey) === col(rightKey))

  /** RELATIONAL DIVISION (Codd's ÷, the "for all" join): which
    * customers ordered EVERY part in a probe bundle — the classic
    * requirement SQL has no operator for and analysts routinely get
    * wrong with chained EXISTS. Implemented as the count-matching
    * form: restrict the fact table to bundle parts (broadcast — the
    * divisor is bounded by definition), count DISTINCT covered parts
    * per customer, compare against the bundle size. Emits the full
    * coverage report (every customer touching ≥ 1 bundle part, with
    * `qualifies`) rather than only the divided set, so an empty
    * quotient still yields an auditable answer.
    *
    * Scale shape: the bundle restriction is a broadcast semi-join
    * BEFORE the orders join, so the fact scan shrinks to bundle
    * rows first; one distinct-count aggregate per customer; the
    * bundle size rides as a 1-row broadcast.
    */
  def relationalDivision(orders: DataFrame, lineitem: DataFrame,
                         bundle: DataFrame, bundleCol: String): DataFrame = {
    val b = bundle.select(col(bundleCol).as("l_partkey")).distinct()
    val li = lineitem.select(col("l_orderkey"), col("l_partkey"))
      .join(broadcast(b), Seq("l_partkey"))
    val k = b.agg(count(lit(1)).as("bundle_size")) // 1-row scalar
    li.join(orders.select(col("o_orderkey").as("l_orderkey"),
        col("o_custkey")), "l_orderkey")
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("l_partkey")).as("n_covered"))
      .crossJoin(broadcast(k))
      .select(col("o_custkey"), col("n_covered"), col("bundle_size"),
        (col("n_covered") === col("bundle_size")).as("qualifies"))
  }

  /** SPATIAL point-in-rectangle join via GRID BUCKETING — the
    * geo-join shape (points × regions) Spark has no native operator
    * for, written as the plan that survives 100 TB: a raw
    * containment theta-join is a quadratic nested loop, so instead
    * every point hashes to its single grid cell (⌊x/cell⌋, ⌊y/cell⌋),
    * every rectangle EXPLODES to the bounded set of cells it
    * overlaps, and the join becomes a hash EQUI-join on the cell key
    * with the exact containment predicate as the residual. A point
    * lives in exactly one cell, so each (point, rect) pair can match
    * at most once — no post-join dedup. Fan-out is bounded by
    * cells-per-rectangle (choose `cellSize` near the typical rect
    * extent); the rect side is region-sized and broadcasts.
    *
    * The cell-cover explode is VALIDATED against `maxCellsPerRect`
    * before the join builds: a rectangle huge relative to `cellSize`
    * (or a mis-chosen `cellSize`) would multiply the broadcast side by
    * x-cells × y-cells with no diagnostic until the broadcast limit or
    * driver OOM — instead the guard fails with the worst offender's
    * fan-out and the fix (raise `cellSize`). The probe is one 1-row
    * aggregate over the region-sized rect table (control-plane).
    *
    * `rects`: (rectId, x0, y0, x1, y1), inclusive bounds.
    */
  def spatialGridJoin(points: DataFrame, pidCol: String, xCol: String,
                      yCol: String, rects: DataFrame, rectIdCol: String,
                      cellSize: Double, maxCellsPerRect: Long = 4096L): DataFrame = {
    validateCellCover(rects, cellSize, maxCellsPerRect)
    val pc = points.select(col(pidCol), col(xCol).as("px"), col(yCol).as("py"),
      floor(col(xCol) / cellSize).cast("long").as("cx"),
      floor(col(yCol) / cellSize).cast("long").as("cy"))
    val rcells = rects
      .select(col(rectIdCol), col("x0"), col("y0"), col("x1"), col("y1"),
        explode(sequence(floor(col("x0") / cellSize).cast("long"),
          floor(col("x1") / cellSize).cast("long"))).as("cx"))
      .select(col(rectIdCol), col("x0"), col("y0"), col("x1"), col("y1"),
        col("cx"),
        explode(sequence(floor(col("y0") / cellSize).cast("long"),
          floor(col("y1") / cellSize).cast("long"))).as("cy"))
    pc.join(broadcast(rcells), Seq("cx", "cy"))
      .where(col("px").between(col("x0"), col("x1")) &&
             col("py").between(col("y0"), col("y1")))
      .select(col(pidCol), col(rectIdCol), col("px"), col("py"))
  }

  /** Guard shared by the grid-bucketed spatial family: a rectangle
    * huge relative to `cellSize` (or a mis-chosen `cellSize`) would
    * multiply the exploded side by x-cells × y-cells with no
    * diagnostic until the broadcast limit or driver OOM — fail first
    * with the worst offender's fan-out and the fix. One 1-row
    * aggregate over the rect table (control-plane).
    */
  private def validateCellCover(rects: DataFrame, cellSize: Double,
                                maxCellsPerRect: Long): Unit = {
    require(cellSize > 0, s"cellSize must be positive: $cellSize")
    require(maxCellsPerRect > 0, s"maxCellsPerRect must be positive")
    val worst = rects.agg(max(
      (floor(col("x1") / cellSize) - floor(col("x0") / cellSize) + 1) *
      (floor(col("y1") / cellSize) - floor(col("y0") / cellSize) + 1))
      .cast("long")).head() // 1-row scalar: bounded control-plane
    if (!worst.isNullAt(0))
      require(worst.getLong(0) <= maxCellsPerRect,
        s"a rectangle covers ${worst.getLong(0)} grid cells > " +
        s"maxCellsPerRect=$maxCellsPerRect — raise cellSize (now " +
        s"$cellSize) toward the typical rectangle extent, or raise the cap")
  }

  /** Explode a rectangle set to its grid-cell cover (the
    * [[spatialGridJoin]] blocking), columns prefixed so two covers
    * can meet in one join without name collisions.
    */
  private def cellCover(rects: DataFrame, idCol: String, prefix: String,
                        cellSize: Double): DataFrame =
    rects
      .select(col(idCol), col("x0").as(s"${prefix}x0"),
        col("y0").as(s"${prefix}y0"), col("x1").as(s"${prefix}x1"),
        col("y1").as(s"${prefix}y1"))
      .withColumn("cx", explode(sequence(
        floor(col(s"${prefix}x0") / cellSize).cast("long"),
        floor(col(s"${prefix}x1") / cellSize).cast("long"))))
      .withColumn("cy", explode(sequence(
        floor(col(s"${prefix}y0") / cellSize).cast("long"),
        floor(col(s"${prefix}y1") / cellSize).cast("long"))))

  /** SPATIAL rectangle–rectangle OVERLAP join — the polygon-bbox
    * intersection shape (region × region, geofence × coverage-area):
    * both sets explode to their bounded cell covers, candidates meet
    * in a hash EQUI-join on the cell key with the exact separating-
    * axis overlap test as residual, and each overlapping pair is
    * accepted in exactly ONE cell — the cell containing the
    * intersection's lower-left corner (max of the x0s, max of the
    * y0s), which both rectangles cover iff they overlap. That is
    * [[spatialGridJoin]]'s at-most-one-match argument generalized to
    * two exploded sides (the `join_overlap` single-bucket trick in
    * 2-D), so no post-join dedup pass exists to become the shuffle
    * bottleneck. Fan-out on BOTH sides is validated against
    * `maxCellsPerRect` before anything builds.
    *
    * Inclusive bounds on both sets: (rectId, x0, y0, x1, y1).
    */
  def spatialOverlapJoin(rectsA: DataFrame, aIdCol: String,
                         rectsB: DataFrame, bIdCol: String,
                         cellSize: Double,
                         maxCellsPerRect: Long = 4096L): DataFrame = {
    validateCellCover(rectsA, cellSize, maxCellsPerRect)
    validateCellCover(rectsB, cellSize, maxCellsPerRect)
    val a = cellCover(rectsA, aIdCol, "a_", cellSize)
    val b = cellCover(rectsB, bIdCol, "b_", cellSize)
    a.join(b, Seq("cx", "cy"))
      .where(col("a_x0") <= col("b_x1") && col("b_x0") <= col("a_x1") &&
             col("a_y0") <= col("b_y1") && col("b_y0") <= col("a_y1"))
      // single-cell acceptance: claim the pair only where the
      // intersection's lower-left corner lives
      .where(col("cx") ===
               floor(greatest(col("a_x0"), col("b_x0")) / cellSize).cast("long") &&
             col("cy") ===
               floor(greatest(col("a_y0"), col("b_y0")) / cellSize).cast("long"))
      .select(col(aIdCol), col(bIdCol))
  }

  /** FIXED-RADIUS k-NEAREST-NEIGHBOR join on the grid — "the k
    * closest points within distance `radius` of each query", the form
    * geo pipelines actually run (nearest stores to a customer,
    * nearest POIs to a coordinate; an unbounded global kNN over sparse
    * regions is a full-corpus scan by definition). Grid cells are
    * sized AT the radius, so every point within `radius` of a query
    * provably lies in the 3×3 ring around the query's cell
    * (|Δx| ≤ radius ⇒ adjacent cell index): queries explode to their
    * 9 probe cells — constant fan-out, the ring-expansion probe with
    * the expansion bounded to one ring by construction — candidates
    * meet in a hash equi-join on the cell key, the exact
    * squared-distance test prunes the corners, and a per-query
    * window (bounded by the candidate count of 9 cells, never the
    * corpus) keeps rank ≤ k with a deterministic (distance, id)
    * tie-break. A point lives in ONE cell, so no candidate pair
    * duplicates — no dedup pass.
    */
  def spatialKnnJoin(points: DataFrame, pidCol: String, xCol: String,
                     yCol: String, queries: DataFrame, qidCol: String,
                     qxCol: String, qyCol: String, k: Int,
                     radius: Double): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    require(radius > 0, s"radius must be positive: $radius")
    import org.apache.spark.sql.expressions.Window
    val pc = points.select(col(pidCol), col(xCol).as("px"), col(yCol).as("py"),
      floor(col(xCol) / radius).cast("long").as("cx"),
      floor(col(yCol) / radius).cast("long").as("cy"))
    val ring = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val qc = queries
      .select(col(qidCol), col(qxCol).as("qx"), col(qyCol).as("qy"),
        explode(ring).as("d"))
      .select(col(qidCol), col("qx"), col("qy"),
        (floor(col("qx") / radius).cast("long") + col("d.dx")).as("cx"),
        (floor(col("qy") / radius).cast("long") + col("d.dy")).as("cy"))
    val d2 = (col("px") - col("qx")) * (col("px") - col("qx")) +
             (col("py") - col("qy")) * (col("py") - col("qy"))
    val w = Window.partitionBy(qidCol).orderBy(col("dist2"), col(pidCol))
    pc.join(broadcast(qc), Seq("cx", "cy"))
      .withColumn("dist2", d2)
      .where(col("dist2") <= lit(radius * radius))
      .withColumn("rnk", row_number().over(w).cast("long"))
      .where(col("rnk") <= k)
      .select(col(qidCol), col("rnk"), col(pidCol),
        round(sqrt(col("dist2")), 6).as("dist"))
  }

  /** Typo self-join: all id pairs within TRUE Damerau-Levenshtein
    * distance 1 — [[fuzzySelfJoin]]'s transposition-aware sibling
    * (`smtih`/`smith` is DL 1 but Levenshtein 2, so a lev-threshold
    * linkage misses the most common typo class entirely).
    *
    * LOSSLESS blocking by case analysis on the one allowed edit:
    *   - insert / delete / substitute → Levenshtein(a,b) <= 1, and
    *     [[fuzzySelfJoin]]'s PassJoin pigeonhole blocking is lossless
    *     for that (one edit breaks at most one of the two segments);
    *   - adjacent transposition → same length AND same character
    *     MULTISET (an anagram), so blocking on the sorted-character
    *     fingerprint catches every such pair exactly.
    * PassJoin alone would NOT be lossless here: a transposition
    * straddling the two segments' boundary edits both segments with
    * one operation. The union of the two candidate sets is verified
    * with the exact DL kernel and deduped on the skinny id-pair rows.
    * The anagram block is an equi-join on the fingerprint — never a
    * cross product; fingerprint groups are typo-scale small (a
    * corpus-wide anagram cluster would be a data oddity worth
    * seeing, not a plan failure).
    *
    * Fixed at maxDist = 1 BY DESIGN: for k >= 2 the case analysis
    * breaks (a transposition plus a substitution is neither within
    * lev k nor an anagram) — a correct k >= 2 blocking needs
    * PartEnum-style signatures, and DL 1 is what record linkage
    * actually uses for the typo pass.
    *
    * Returns (id_a, id_b, lev, dl) with id_a < id_b, dl <= 1 — lev
    * kept alongside so the transposition pairs (lev 2, dl 1) are
    * visible in the output.
    */
  def typoSelfJoin(df: DataFrame, idCol: String, strCol: String): DataFrame = {
    import graft.functions.TextFunctions.damerauLevenshtein
    val base = df.select(col(idCol).as("fid"), col(strCol).as("fs"))
      .where(col("fs").isNotNull)
    // leg 1: everything within plain Levenshtein 1 (lossless for the
    // ins/del/sub cases) — already (id_a, id_b, dist) with id_a < id_b
    val levPairs = fuzzySelfJoin(df, idCol, strCol, maxDist = 1)
      .select(col("id_a"), col("id_b"))
    // leg 2: anagram blocks (lossless for the transposition case)
    val finger = base.withColumn("fp",
      array_join(array_sort(split(col("fs"), "")), ""))
    val anaPairs = finger.select(col("fid").as("id_a"), col("fp"))
      .join(finger.select(col("fid").as("id_b"), col("fp")), Seq("fp"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
    val named = base.select(col("fid"), col("fs"))
    levPairs.unionByName(anaPairs).distinct()
      .join(named.select(col("fid").as("id_a"), col("fs").as("s_a")), Seq("id_a"))
      .join(named.select(col("fid").as("id_b"), col("fs").as("s_b")), Seq("id_b"))
      .withColumn("dl", damerauLevenshtein(col("s_a"), col("s_b")).cast("long"))
      .where(col("dl") <= 1)
      .withColumn("lev", levenshtein(col("s_a"), col("s_b")).cast("long"))
      .select(col("id_a"), col("id_b"), col("lev"), col("dl"))
  }

  /** Blocked Jaro-Winkler best-match linkage: for every row that
    * shares its blocking key with at least one OTHER row, the single
    * most similar partner by Jaro-Winkler (the de-facto name-matching
    * score), ties broken by partner id. The classical two-stage
    * record-linkage shape: a cheap deterministic BLOCK (an equi-join
    * — shuffled hash, never a cross product; block sizes bound the
    * per-block pair count) then the expensive SCORE only within
    * blocks, then a per-row top-1 window partitioned by id (fully
    * distributed — no global sort).
    *
    * Scores are rounded to 6 decimals BEFORE ranking so the ranking
    * is stable across engines (the oracle replays the same rounded
    * compare); rows with no block partner are absent from the output
    * (inner-join semantics — linkage found nothing to link).
    */
  def jwBestMatch(df: DataFrame, idCol: String, strCol: String,
                  blockCols: Seq[String]): DataFrame = {
    import graft.functions.TextFunctions.jaroWinkler
    val l = df.select(
      (blockCols.map(col) :+ col(idCol).as("id") :+ col(strCol).as("s_l")): _*)
    val r = df.select(
      (blockCols.map(col) :+ col(idCol).as("other") :+ col(strCol).as("s_r")): _*)
    val w = Window.partitionBy(col("id"))
      .orderBy(col("jw").desc, col("other"))
    l.join(r, blockCols)
      .where(col("id") =!= col("other"))
      .withColumn("jw", round(jaroWinkler(col("s_l"), col("s_r")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("id"), col("other"), col("jw"))
  }
}
