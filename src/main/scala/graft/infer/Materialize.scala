package graft.infer

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.types._
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.types.{DataType => SType, _}
import org.apache.spark.sql.{DataFrame, Dataset, Row}

import java.sql.Timestamp
import scala.jdk.CollectionConverters._

/** Materialization of JSON documents under a discovered [[HType]] —
  * including union-typed fields, which `from_json` cannot populate
  * (Spark has no union type; we encode `struct<tag:tinyint,u0,…>`,
  * SURVEY §1.4). This closes the infer→materialize loop for
  * heterogeneous corpora: infer once (distributed aggregation), then
  * one `map` pass converts every document to a typed Row.
  *
  * The reference never materializes data at all (DDL printing only),
  * so this is strictly additive capability. Scale shape: pure per-row
  * conversion on executors; the inferred type tree is closed over
  * (KB-sized) and serialized once per task.
  */
object Materialize {

  // one thread-safe mapper per executor JVM, not per row.
  // USE_BIG_DECIMAL_FOR_FLOATS: Jackson's default parses non-integer
  // JSON numbers into DOUBLES, silently rounding any decimal past
  // double's ~16 significant digits BEFORE conversion ever sees the
  // text — a p22 literal materialized thousands off its written value,
  // violating the "decimal values survive exactly" contract AND the
  // zone-proof premise that a decimal path's materialized value IS its
  // raw literal (the r13 fuzzer caught a metadata SUM answering from
  // exact literal sums while the engine summed double-rounded values).
  // Exact DecimalNodes fix both; float/double columns are unaffected
  // (Double.valueOf of the exact decimal text is the same correctly-
  // rounded double Jackson's own parse produced).
  @transient private lazy val mapper = new ObjectMapper()
    .configure(com.fasterxml.jackson.databind.DeserializationFeature
      .USE_BIG_DECIMAL_FOR_FLOATS, true)

  /** [[InferSchema.toSparkType]] with non-materializable `NullType`
    * leaves replaced by (always-null) strings. */
  def toMaterializableSparkType(t: HType): SType =
    replaceNull(InferSchema.toSparkType(t))

  private def replaceNull(t: SType): SType = t match {
    case NullType => StringType
    case ArrayType(e, n) => ArrayType(replaceNull(e), n)
    case StructType(fs) =>
      StructType(fs.map(f => f.copy(dataType = replaceNull(f.dataType))))
    case other => other
  }

  /** Parse + convert every document in `docs` to Rows under the
    * schema of `inferred` (use the canonical form of the corpus-level
    * inference result). Documents are independent; a doc whose value
    * some field doesn't fit yields null in that field, never a
    * failure. */
  def materialize(docs: Dataset[String], inferred: HType): DataFrame = {
    val schema = toMaterializableSparkType(inferred) match {
      case s: StructType => s
      case other => StructType(Seq(StructField("value", other, nullable = true)))
    }
    val t = inferred
    // HStruct AND HUnion both materialize to a multi-field struct row
    // (the union's struct<tag,u0,…> encoding); only primitive/list
    // roots get wrapped in a single "value" field
    val rowShaped = toMaterializableSparkType(inferred).isInstanceOf[StructType]
    val width = schema.length
    implicit val enc = RowEncoder.encoderFor(schema)
    docs.map(docToRow(_, t, rowShaped, width))
  }

  /** One document string → one external Row under `t` — the map body
    * of [[materialize]], shared with the graftjson DSv2 reader so the
    * source cannot drift from the operator. Corrupt / non-object /
    * null docs become an all-null row for struct-shaped roots (never
    * a null top-level Row — RowEncoder rejects those → job death). */
  private[graft] def docToRow(doc: String, t: HType, rowShaped: Boolean,
                              width: Int): Row = {
    val node =
      try mapper.readTree(if (doc == null || doc.isEmpty) "null" else doc)
      catch { case _: Exception => null }
    nodeToRow(node, t, rowShaped, width)
  }

  /** [[docToRow]] over a character stream — the graftjson whole-file
    * path feeds the file Reader straight to Jackson, so peak memory is
    * bounded by the parsed DOCUMENT TREE, not the file's text size (a
    * StringBuilder staging buffer doubled it). Identical outcomes:
    * valid JSON parses to the same DOM; corrupt/empty input throws or
    * yields a missing node, and both collapse to the all-null row the
    * String twin produces. */
  private[graft] def docToRow(doc: java.io.Reader, t: HType,
                              rowShaped: Boolean, width: Int): Row = {
    val node =
      try mapper.readTree(doc)
      catch { case _: Exception => null }
    nodeToRow(node, t, rowShaped, width)
  }

  private def nodeToRow(node: JsonNode, t: HType, rowShaped: Boolean,
                        width: Int): Row =
    if (rowShaped) convert(node, t) match {
      case r: Row => r
      case _ => Row.fromSeq(Seq.fill(width)(null))
    }
    else Row(convert(node, t))

  /** Parse one document to a Jackson node — null (→ all-null row
    * semantics) on corrupt/empty input, exactly [[docToRow]]'s rule.
    * Exposed so the graftjson reader can parse once and convert
    * selectively without drifting from the operator's parse. */
  private[graft] def parseDoc(doc: String): JsonNode =
    try mapper.readTree(if (doc == null || doc.isEmpty) "null" else doc)
    catch { case _: Exception => null }

  private[graft] def parseDoc(doc: java.io.Reader): JsonNode =
    try mapper.readTree(doc)
    catch { case _: Exception => null }

  // test instrumentation: when enabled, every node→value conversion
  // (struct/list/union node or leaf) ticks once, so specs can pin
  // that nested pruning actually converts LESS (one volatile read per
  // cell when disabled — negligible against the parse)
  private[graft] val countCells = new java.util.concurrent.atomic.AtomicBoolean
  private[graft] val cellsConverted = new java.util.concurrent.atomic.AtomicLong
  @inline private def tick(): Unit =
    if (countCells.get) cellsConverted.incrementAndGet()

  /** MASKED conversion: produce the value for `want` — a (possibly
    * nested-pruned) Spark type whose shape Spark derived from
    * `toMaterializableSparkType(target)` via SchemaPruning —
    * converting ONLY the requested subtree. Struct fields resolve by
    * NAME against the want schema (emitting exactly its shape, so the
    * scan's readSchema and the rows agree and GetStructField ordinals
    * Spark rewrote for the pruned schema stay valid); array elements
    * prune recursively; a union's `tag`/`uN` cells are served
    * individually (only the winning branch converts, and only if
    * requested). With `want` == the full materialized type this is
    * value-identical to [[convert]] (property-pinned). */
  private[graft] def convertPruned(node: JsonNode, target: HType,
                                   want: SType): Any = {
    if (node == null || node.isNull || node.isMissingNode) return null
    (target, want) match {
      case (HStruct(fields), w: StructType) =>
        tick()
        if (!node.isObject) null
        else Row.fromSeq(w.fields.iterator.map { wf =>
          fields.get(wf.name) match {
            case Some(ft) => convertPruned(node.get(wf.name), ft, wf.dataType)
            case None => null // defensive: want must be a subset
          }
        }.toSeq)
      case (HList(elem), ArrayType(we, _)) =>
        tick()
        if (!node.isArray) null
        else node.elements().asScala.map(convertPruned(_, elem, we)).toSeq
      case (HUnion(branches), w: StructType) =>
        tick()
        val vt = JsonInfer.inferNode(node)
        val idx = branches.indexWhere(_.subsumes(vt))
        if (idx < 0) null
        else Row.fromSeq(w.fields.iterator.map { wf =>
          if (wf.name == "tag") java.lang.Byte.valueOf(idx.toByte)
          else {
            // uN cells: only the winning branch carries a value
            val bi =
              try wf.name.stripPrefix("u").toInt
              catch { case _: NumberFormatException => -1 }
            if (bi == idx) convertPruned(node, branches(bi), wf.dataType)
            else null
          }
        }.toSeq)
      case _ => convert(node, target) // leaf (or unexpected shape): full
    }
  }

  /** Convert one Jackson node to the JVM value Spark's RowEncoder
    * expects for `toMaterializableSparkType(target)`. */
  private[infer] def convert(node: JsonNode, target: HType): Any = {
    if (node == null || node.isNull || node.isMissingNode) return null
    tick()
    target match {
      case HNull => null // materialized as (null) string
      case HBool => if (node.isBoolean) node.asBoolean() else null
      case HNum(kind, _, scale) =>
        val text = node.asText()
        try kind match {
          case NumKind.Byte    => java.lang.Byte.valueOf(text)
          case NumKind.Short   => java.lang.Short.valueOf(text)
          case NumKind.Int     => java.lang.Integer.valueOf(text)
          case NumKind.Long    => java.lang.Long.valueOf(text)
          case NumKind.Decimal =>
            new java.math.BigDecimal(text)
              .setScale(scale, java.math.RoundingMode.HALF_UP)
          case NumKind.Float   => java.lang.Float.valueOf(text)
          case NumKind.Double  => java.lang.Double.valueOf(text)
        } catch { case _: NumberFormatException => null }
      case HStr(kind) =>
        val s = node.asText()
        kind match {
          case StrKind.Binary =>
            try s.sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
            catch { case _: NumberFormatException => null }
          case StrKind.Timestamp => parseTimestamp(s)
          case _ => s
        }
      case HList(elem) =>
        if (!node.isArray) null
        else node.elements().asScala.map(convert(_, elem)).toSeq
      case HStruct(fields) =>
        if (!node.isObject) null
        else Row.fromSeq(fields.iterator.map { case (name, ft) =>
          convert(node.get(name), ft)
        }.toSeq)
      case HUnion(branches) =>
        // first branch that subsumes this value's discovered type wins;
        // typed directly off the DOM (re-serializing + re-parsing the
        // node would double-walk every union value)
        val vt = JsonInfer.inferNode(node)
        val idx = branches.indexWhere(_.subsumes(vt))
        val cells = branches.zipWithIndex.map { case (b, i) =>
          if (i == idx) convert(node, b) else null
        }
        if (idx < 0) null
        else Row.fromSeq(java.lang.Byte.valueOf(idx.toByte) +: cells)
    }
  }

  /** The materialized value at a structs-only dotted path — exactly
    * what a GetStructField chain over [[convert]]'s full row extracts
    * (field-wise conversion makes the leaf independent of its
    * siblings), computed without converting anything else. A missing
    * or non-object intermediate yields null, like the chain would.
    * Powers the graftjson reader's nested-filter early skip. */
  private[graft] def convertAtPath(node: JsonNode, t: HType,
                                   segs: List[String]): Any = {
    var n = node
    var ht = t
    var rest = segs
    while (rest.nonEmpty) {
      ht match {
        case HStruct(fields) =>
          fields.get(rest.head) match {
            case Some(child) => ht = child
            case None => return null
          }
          n = if (n == null || !n.isObject) null else n.get(rest.head)
          rest = rest.tail
        case _ => return null // route must be structs-only
      }
    }
    convert(n, ht)
  }

  /** Best-effort parse of the reference's timestamp shapes
    * (`YYYY[-/]MM[-/]DD[T ]HH:MM:SS` + optional zone/quotes,
    * JsonSchemaFinder.java:44-47); unparseable → null. */
  private[infer] def parseTimestamp(s: String): Timestamp = {
    val cleaned = s.stripPrefix("\"").stripSuffix("\"").replace('/', '-')
    val norm = cleaned.replace("T", " ").stripSuffix("Z")
    try Timestamp.valueOf(norm.take(19))
    catch { case _: Exception => null }
  }
}
