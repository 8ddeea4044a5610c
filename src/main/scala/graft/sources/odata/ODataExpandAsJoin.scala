package graft.sources.odata

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, StructField, StructType}

/** EXPAND-AS-JOIN — the scale alternative to inline `$expand` for wide
  * to-many navigations.
  *
  * Inline `$expand`'s cost model is the 100×-scale cliff for
  * collection navs: every parent row carries its ENTIRE child array
  * through every page of every chain, so the child table ships
  * duplicated into the parent stream (and compressed JSON or not, a
  * 50-item order ships its 50 items inside the order row). This
  * strategy plans the nav as what it relationally is: a SEPARATE child
  * entity scan (its own partitioning, its own pushdowns, shipped
  * exactly once) plus a Spark-side key join — AQE/broadcast decides
  * the join shape, exactly the planning Spark is built for.
  * `reportStatistics=true` INHERITS into the child scan, so a small
  * child entity reports its `/$count` to the planner and
  * auto-broadcasts — the two options compose into the classic
  * broadcast-dim join with zero hints.
  *
  * The two strategies are interchangeable by construction: the result
  * schema is identical (parent columns ++ one struct column per
  * single-valued nav, one `array<struct>` per collection nav, nested
  * fields string-typed in declared order), a parent with no children
  * gets an EMPTY array / null struct — the same shapes the inline
  * reader produces. One documented deviation: a collection's element
  * ORDER is `array_sort` order (lexicographic by the declared fields)
  * rather than server order — a deterministic order the join can
  * guarantee; consumers needing server order use inline `$expand`.
  *
  * Contract: `parentKey` must be in the parent's `selectFields`; a
  * single-valued nav's `childKey` must be unique child-side (the same
  * cardinality declaration the inline reader enforces by failing fast
  * on an array — here a duplicate key is detected by a count guard in
  * the child aggregation and fails BY KEY at execution, never
  * silently duplicating parent rows).
  *
  * Failure semantics match the inline reader's too: the child scan is
  * forced `failFast=true` regardless of the parent's tolerance
  * setting. The reader's `failFast=false` tolerance unit is a
  * structure-value chain, and a child entity scan IS one chain — a
  * tolerated child fetch failure would yield zero child rows and hand
  * every parent a clean empty array / null struct, exactly the silent
  * partial-association shape `followNavPages` refuses even under
  * tolerance (the inline strategy drops parent+children coherently).
  * `childOptions` may still set `failFast=false` explicitly — a loud,
  * logged opt-out for a child whose absence the caller can genuinely
  * tolerate.
  */
object ODataExpandAsJoin extends org.apache.spark.internal.Logging {

  /** One navigation planned as a join: `nav`/`collection`/`fields`
    * mirror [[ExpandSpec]]; `childEntity` is the child's entity set,
    * joined on parent.`parentKey` = child.`childKey`. `childOptions`
    * overrides/extends the inherited connection options for the child
    * scan (e.g. its own `skipRangePartitions`, or a different
    * `baseUrl` for a federated association). `childExpand`, when set,
    * is an `expand` option the CHILD scan declares for its own navs
    * (the grandchild level of a nested expansion) — the strategies
    * compose: the first level joins, the second level rides the child
    * scan's inline `$expand`, and the grandchild columns surface
    * inside this nav's element struct exactly where the fully-inline
    * nested expansion puts them.
    */
  final case class JoinNav(nav: String, collection: Boolean,
                           fields: Seq[String], childEntity: String,
                           parentKey: String, childKey: String,
                           childOptions: Map[String, String] = Map.empty,
                           childExpand: Option[String] = None)

  // option keys that must NOT leak from the parent scan into a child
  // scan (entity addressing, parent-shaped partitioning/projection);
  // connection/auth/pacing options inherit — and so does
  // metadataSchema, keeping the two expand strategies interchangeable
  // in TYPED mode too (the child entity set resolves its own types
  // from the same EDMX document, matching what inline $expand derives
  // through the NavigationProperty)
  private val nonInherited = Set(
    "entity", "selectfields", "structurecandidates", "codesentity",
    "expand", "expandstyle", "skiprangepartitions", "skiprangeorderkey",
    "extracolumns", "extracolumnname", "pushdownaggregates",
    "startlink", "carrythreshold",
    // never inherited: the child scan is fail-fast BY DESIGN (object
    // doc) — only an explicit childOptions entry may relax it
    "failfast")

  def scan(spark: SparkSession, options: Map[String, String],
           navs: Seq[JoinNav]): DataFrame = {
    require(navs.nonEmpty, "expand-as-join: no navigations declared")
    require(!options.keys.exists(_.equalsIgnoreCase("expand")),
      "expand-as-join: the parent options must not also declare inline " +
        "'expand' — pick one strategy per nav")
    val parentFields = options.collectFirst {
      case (k, v) if k.equalsIgnoreCase("selectFields") =>
        v.split(",").map(_.trim).toSet
    }.getOrElse(Set.empty[String])
    navs.foreach { n =>
      require(parentFields.contains(n.parentKey),
        s"expand-as-join: parent key '${n.parentKey}' of nav '${n.nav}' " +
          "must be in the parent's selectFields")
    }
    val inherit = options.filterNot { case (k, _) =>
      nonInherited.contains(k.toLowerCase) }

    import scala.jdk.CollectionConverters._
    val parent = spark.read.format("odata").options(options.asJava).load()

    navs.foldLeft(parent) { (df, n) =>
      val childFailFast = n.childOptions.collectFirst {
        case (k, v) if k.equalsIgnoreCase("failFast") => v }
      childFailFast.filterNot(_.toBoolean).foreach { _ =>
        logWarning(s"expand-as-join: childOptions for nav '${n.nav}' " +
          "explicitly set failFast=false — a tolerated child-chain " +
          "failure yields EMPTY associations under parents that are " +
          "present, which nothing downstream can detect") }
      val childOpts = inherit ++
        n.childOptions.filterNot(_._1.equalsIgnoreCase("failFast")) ++ Map(
        "entity" -> n.childEntity,
        "selectFields" -> (n.childKey +: n.fields).distinct.mkString(","),
        "failFast" -> childFailFast.getOrElse("true")) ++
        n.childExpand.map("expand" -> _).toMap
      val child = spark.read.format("odata").options(childOpts.asJava).load()
      // grandchild navs (childExpand) ride the child scan's own
      // inline $expand and surface as nested columns in the element
      // struct, after the scalar fields — the fully-inline nested
      // expansion's layout
      val elemFields = n.fields ++
        n.childExpand.toSeq.flatMap(ODataOptions.parseExpands(_).map(_.nav))
      val elem: Column = struct(elemFields.map(child(_)): _*)
      if (n.collection) {
        // element type from the child's RESOLVED schema (string mode:
        // all strings; metadataSchema: the child entity's Edm types) —
        // hardwiring strings here would type-clash the empty-array
        // branch against a typed collect_list
        val elemType = StructType(elemFields.map(f =>
          StructField(f, child.schema(f).dataType, nullable = true)))
        // array_sort for a DETERMINISTIC element order the join can
        // guarantee (see object doc); collect_list alone is
        // plan-order-dependent
        val grouped = child.groupBy(child(n.childKey).as("__graft_k"))
          .agg(array_sort(collect_list(elem)).as(n.nav))
        df.join(grouped, df(n.parentKey) === grouped("__graft_k"), "left")
          .drop("__graft_k")
          // no children = EMPTY array, the inline reader's shape
          .withColumn(n.nav, coalesce(col(n.nav),
            array().cast(ArrayType(elemType, containsNull = false))))
      } else {
        // enforce the declared cardinality: the inline reader fails
        // fast when a single-valued nav serves an array — here the
        // equivalent violation is a duplicate childKey, which a plain
        // join would silently turn into duplicated parent rows. The
        // count guard shares the join key's shuffle (same hash
        // partitioning, exchange-reusable) and fails BY KEY.
        val one = child.groupBy(child(n.childKey).as("__graft_k"))
          .agg(count(lit(1)).as("__graft_cnt"), first(elem).as(n.nav))
          .select(col("__graft_k"),
            when(col("__graft_cnt") > 1, raise_error(concat(
              lit(s"expand-as-join: nav '${n.nav}' is declared " +
                s"single-valued but child entity '${n.childEntity}' " +
                s"has multiple rows for ${n.childKey}='"),
              col("__graft_k").cast("string"), lit("'"))))
              .otherwise(col(n.nav)).as(n.nav))
        df.join(one, df(n.parentKey) === col("__graft_k"), "left")
          .drop("__graft_k")
      }
    }
  }
}
