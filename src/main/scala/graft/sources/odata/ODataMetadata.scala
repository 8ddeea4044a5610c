package graft.sources.odata

import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `$metadata`-driven TYPED schema (opt-in via `metadataSchema=true`).
  *
  * Every real OData service publishes an EDMX `$metadata` document
  * (OData CSDL) describing each entity type's properties and their
  * `Edm.*` types — it is how every real OData client discovers shape.
  * The reference never reads it (its ByD tenant gates `$metadata`
  * separately, hence the `$select`+`$top=1` probe, `etl.py:100-121`),
  * so STRING-typed columns remain the connector's reference-parity
  * default and the probe remains the fallback; this module adds the
  * typed mode on top: parse the EDMX, map Edm types to native Spark
  * types at the scan, and decode each JSON cell accordingly — deleting
  * the hand-written cast layer every typed consumer otherwise builds.
  *
  * Type mapping (v4 names; the v2 synonyms map the same way):
  *  - Edm.String, Edm.Guid            → string
  *  - Edm.Boolean                     → boolean
  *  - Edm.SByte                       → tinyint
  *  - Edm.Byte, Edm.Int16             → smallint (Byte is unsigned)
  *  - Edm.Int32                       → int
  *  - Edm.Int64                       → bigint
  *  - Edm.Single                      → float
  *  - Edm.Double                      → double
  *  - Edm.Decimal(P,S)                → decimal(P,S) (default 38,18)
  *  - Edm.Date                        → date
  *  - Edm.DateTimeOffset, Edm.DateTime→ timestamp (v2 `/Date(ms)/`
  *                                      wire form decoded too)
  *  - anything else (Edm.Binary, Edm.TimeOfDay, streams, enums…)
  *                                    → string — the faithful
  *    stringified representation the default mode uses everywhere; an
  *    unknown type must degrade to lawful behavior, never to a guess.
  *
  * Parsing is namespace-agnostic on LOCAL element names (EntitySet /
  * EntityType / Property / EntityContainer), which covers both the v4
  * OASIS namespaces and the v2 Microsoft ones with one pass.
  */
object ODataMetadata {

  final case class EdmProperty(name: String, edmType: String,
                               precision: Option[Int], scale: Option[Int]) {
    def sparkType: DataType = edmType match {
      case "Edm.String" | "Edm.Guid" => StringType
      case "Edm.Boolean" => BooleanType
      case "Edm.SByte" => ByteType
      case "Edm.Byte" | "Edm.Int16" => ShortType
      case "Edm.Int32" => IntegerType
      case "Edm.Int64" => LongType
      case "Edm.Single" => FloatType
      case "Edm.Double" => DoubleType
      case "Edm.Decimal" =>
        DecimalType(precision.getOrElse(38), scale.getOrElse(18))
      case "Edm.Date" => DateType
      case "Edm.DateTimeOffset" | "Edm.DateTime" => TimestampType
      case _ => StringType // lawful degradation, see object doc
    }
  }

  /** One navigation property of an entity type: the TARGET type's
    * namespace-qualified name (aliases normalized at parse) and the
    * declared cardinality (`Collection(ns.T)` vs `ns.T`). */
  final case class EdmNav(targetType: String, collection: Boolean)

  /** One entity type: scalar properties + navigation properties. */
  final case class EdmEntityType(props: Map[String, EdmProperty],
                                 navs: Map[String, EdmNav])

  /** The parsed document: entity-set name → namespace-qualified type
    * name, and qualified type name → its declaration. Qualified keying
    * is load-bearing: one EDMX may carry MANY `<Schema>` elements, and
    * two schemas lawfully declare the same local type name — a
    * local-name table would collide last-wins and silently type one
    * entity with the other's properties. */
  final case class EdmModel(setToType: Map[String, String],
                            types: Map[String, EdmEntityType]) {
    /** Resolve a type reference. References in a lawful document are
      * always namespace- or alias-qualified (parse normalizes aliases
      * to namespaces), so the exact lookup hits; a bare local name —
      * seen from lenient producers — resolves only when exactly one
      * schema declares it, and FAILS BY NAME when two do. */
    def findType(ref: String): Option[EdmEntityType] =
      types.get(ref).orElse {
        if (ref.contains(".")) None
        else types.filter(_._1.split('.').last == ref) match {
          case m if m.size == 1 => Some(m.head._2)
          case m if m.size > 1 => throw new IllegalStateException(
            s"odata \\$$metadata: type reference '$ref' is ambiguous — " +
              s"declared as ${m.keys.toSeq.sorted.mkString(" and ")}; " +
              "the document must reference it namespace-qualified")
          case _ => None
        }
      }

    def entityType(entitySet: String): EdmEntityType = {
      val tn = setToType.getOrElse(entitySet, throw new IllegalStateException(
        s"odata \\$$metadata: no EntitySet named '$entitySet' in the " +
          "service document — check the 'entity' option against the " +
          "container's entity sets"))
      findType(tn).getOrElse(throw new IllegalStateException(
        s"odata \\$$metadata: EntitySet '$entitySet' names entity type " +
          s"'$tn' but no EntityType '$tn' is declared"))
    }
  }

  /** Fetch `{service}/$metadata` and parse it. Fail-fast throughout:
    * metadataSchema is an explicit opt-in, so a missing document, an
    * unknown entity set, or a declared select field absent from the
    * entity type is a configuration error worth a loud name —
    * silently string-typing it would defeat the mode.
    */
  def fetchModel(opts: ODataOptions): EdmModel = {
    val url = opts.entityUrl("$metadata")
    val xml = ODataClient.getWithRetry(url, opts.user, opts.password,
      opts.timeoutMs, opts.maxRetries, opts.retryBackoffMs,
      oauth = opts.oauth)
    parseModel(xml)
  }

  /** Property map of the entity type backing `entitySet` (the scalar
    * half of [[parseModel]] — kept as the simple entry point). */
  def parse(xml: String, entitySet: String): Map[String, EdmProperty] =
    parseModel(xml).entityType(entitySet).props

  /** Parse one EDMX document. JDK DOM — no extra dependencies. */
  def parseModel(xml: String): EdmModel = {
    val dbf = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    dbf.setNamespaceAware(true)
    // the document is fetched from a remote service: no external
    // entity resolution, ever
    dbf.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    val doc = dbf.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))

    def elems(parent: org.w3c.dom.Element, local: String): Seq[org.w3c.dom.Element] = {
      val nl = parent.getElementsByTagNameNS("*", local)
      (0 until nl.getLength).map(nl.item(_).asInstanceOf[org.w3c.dom.Element])
    }
    val root = doc.getDocumentElement

    // alias → namespace across every <Schema> (CSDL lets a document
    // reference types through a schema Alias; normalize all references
    // to namespace-qualified form so one table serves both spellings)
    val schemas = elems(root, "Schema")
    val aliasToNs: Map[String, String] = schemas.flatMap { sc =>
      val ns = sc.getAttribute("Namespace")
      Seq(ns -> ns) ++
        Option(sc.getAttribute("Alias")).filter(_.nonEmpty).map(_ -> ns)
    }.toMap
    def qualify(ref: String): String = {
      val i = ref.lastIndexOf('.')
      if (i < 0) ref // bare local name — findType's lenient path
      else {
        val (q, local) = (ref.substring(0, i), ref.substring(i + 1))
        s"${aliasToNs.getOrElse(q, q)}.$local"
      }
    }

    val setToType = elems(root, "EntitySet").map(es =>
      es.getAttribute("Name") -> qualify(es.getAttribute("EntityType"))
    ).toMap

    val CollectionRe = "^Collection\\((.*)\\)$".r
    val types = schemas.flatMap { sc =>
      val ns = sc.getAttribute("Namespace")
      elems(sc, "EntityType").map { et =>
        val props = elems(et, "Property").map { p =>
          def intAttr(a: String): Option[Int] =
            Option(p.getAttribute(a)).filter(_.nonEmpty)
              .flatMap(s => scala.util.Try(s.toInt).toOption)
          val name = p.getAttribute("Name")
          name -> EdmProperty(name, p.getAttribute("Type"),
            intAttr("Precision"), intAttr("Scale"))
        }.toMap
        val navs = elems(et, "NavigationProperty").map { np =>
          val t = np.getAttribute("Type")
          val nav = t match {
            case CollectionRe(inner) => EdmNav(qualify(inner), collection = true)
            case other => EdmNav(qualify(other), collection = false)
          }
          np.getAttribute("Name") -> nav
        }.toMap
        s"$ns.${et.getAttribute("Name")}" -> EdmEntityType(props, navs)
      }
    }.toMap
    EdmModel(setToType, types)
  }

  /** Decode one stringified JSON cell (the client's uniform wire form —
    * scalars via asText, so both `123` and `"123"` arrive as "123")
    * into the Catalyst value of `dt`. Parse failures fail LOUDLY with
    * the field name and offending text: a typed mode that silently
    * nulls a malformed cell is worse than the string mode it replaces.
    */
  def convert(s: String, dt: DataType, field: String): Any =
    try dt match {
      case StringType => UTF8String.fromString(s)
      case BooleanType => s.toBoolean
      case ByteType => s.toByte
      case ShortType => s.toShort
      case IntegerType => s.toInt
      case LongType => s.toLong
      case FloatType => s.toFloat
      case DoubleType => s.toDouble
      case d: DecimalType =>
        org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(s), d.precision, d.scale)
      case DateType =>
        java.time.LocalDate.parse(s).toEpochDay.toInt
      case TimestampType =>
        // v4 wire form: ISO-8601 with offset (Edm.DateTimeOffset);
        // v2 wire form: the legacy "/Date(ms)/" envelope
        if (s.startsWith("/Date(")) {
          // the epoch-ms value is already UTC; the equally lawful
          // /Date(ms±hhmm)/ variant's trailing offset is display-only
          // and must not break the parse
          val inner = s.stripPrefix("/Date(").stripSuffix(")/")
          val ms = "^(-?\\d+)(?:[+-]\\d{4})?$".r.findFirstMatchIn(inner)
            .map(_.group(1).toLong)
            .getOrElse(throw new IllegalArgumentException(
              s"malformed /Date(…)/ literal"))
          ms * 1000L
        } else {
          val odt = java.time.OffsetDateTime.parse(s)
          odt.toInstant.getEpochSecond * 1000000L + odt.getNano / 1000L
        }
      case other => throw new IllegalStateException(
        s"unsupported typed-decode target $other")
    } catch {
      case e: IllegalStateException => throw e
      case e: Exception => throw new IllegalStateException(
        s"odata typed decode: field '$field' value '${s.take(100)}' does " +
          s"not parse as ${dt.simpleString}: ${e.getMessage}")
    }

  /** [[convert]]'s EXTERNAL-row twin — java.sql.Date/Timestamp,
    * java.math.BigDecimal, plain String — for driver-side DataFrame
    * construction (delta-sync merge rows). Delegates to [[convert]]
    * so the decode semantics (incl. the v2 `/Date(ms±hhmm)/` form and
    * the loud-by-name failure) exist exactly once.
    */
  def convertExternal(s: String, dt: DataType, field: String): Any = {
    val v = convert(s, dt, field)
    dt match {
      case StringType => v.asInstanceOf[UTF8String].toString
      case DateType => java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(v.asInstanceOf[Int].toLong))
      case TimestampType => java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plus(v.asInstanceOf[Long],
          java.time.temporal.ChronoUnit.MICROS))
      case _: DecimalType =>
        v.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
      case _ => v // Boolean / integral / floating are external already
    }
  }
}
