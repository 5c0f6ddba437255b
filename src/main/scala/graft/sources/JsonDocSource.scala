package graft.sources

import graft.infer.{InferSchema, InferSchemaCountAgg, Materialize}
import graft.types.HType
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.sql.Row

import java.util
import scala.jdk.CollectionConverters._

/** `spark.read.format("graftjson")` — the reference's schema-inference
  * semantics packaged as a native DataSource V2 table, the missing
  * end-user surface of the infer → materialize loop (reference
  * `JsonSchemaFinder` discovers the shape offline and PRINTS it; here
  * the discovered shape IS the table schema and the documents
  * materialize as typed rows, union fields included — `from_json`
  * cannot do that, SURVEY §1.4).
  *
  * Planning: one distributed inference pass over the files (the CLI's
  * [[graft.infer.InferSchemaCountAgg]] aggregation — tiny partial
  * schemas, one combine; the HType result is KBs and rides into every
  * read task). Execution: one input partition per file, each a plain
  * Hadoop line/whole-file read (`.gz` via the codec factory) feeding
  * [[graft.infer.Materialize.docToRow]] — the SAME conversion the
  * materialize operator runs, so source and operator cannot drift.
  *
  * Column pruning is REAL pushdown ([[SupportsPushDownRequiredColumns]]):
  * a pruned scan converts only the requested top-level fields and
  * ships exactly the pruned row width (the parser still walks each
  * document once — the format is row-major text; skipping bytes
  * within a doc is a storage-format property JSON does not have).
  *
  * Options: `whole=true` reads each FILE as one document unit (the
  * CLI's `--whole` parity mode); default is NDJSON, one row per line.
  * At 100 TB the NDJSON path parallelizes per file here — a
  * production source would add byte-range splits within files; the
  * shape of the interface (inference at planning, pruned typed reads)
  * is the point.
  *
  * Caveat shared with every self-describing text source (CSV/JSON
  * with inferSchema): planning runs a Spark job over the data. Reuse
  * the table handle rather than re-`load`ing per query, or persist
  * the materialized frame. */
class JsonDocSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graftjson"

  // accepted so a caller can round-trip .schema(df.schema) — but the
  // table build still verifies it IS the inferred schema (getTable)
  override def supportsExternalMetadata(): Boolean = true

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val multi = Option(options.get("paths")).map { js =>
      // DataFrameReader.load(paths: _*) encodes the list as a JSON
      // array of strings
      val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
      mapper.readTree(js).elements().asScala.map(_.asText()).toSeq
    }.getOrElse(Seq.empty)
    val single = Option(options.get("path")).toSeq
    val all = (multi ++ single).distinct
    require(all.nonEmpty, "graftjson: no path given (use .load(path))")
    all
  }

  private def inferHType(ps: Seq[String], whole: Boolean): HType =
    JsonDocSource.inferCached(ps, whole)

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    JsonDocSource.sparkSchemaOf(
      inferHType(paths(options), options.getBoolean("whole", false)))

  override def getTable(schema: StructType,
                        partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    val whole = options.getBoolean("whole", false)
    val ps = paths(options)
    val t = inferHType(ps, whole)
    val inferred = JsonDocSource.sparkSchemaOf(t)
    // a user-supplied schema must BE the inferred one: the reader
    // converts through the HType tree (unions and all), and a
    // StructType cannot be mapped back to an HType unambiguously
    require(schema == inferred,
      s"graftjson: user schema must match the inferred schema\n" +
        s"  given:    ${schema.simpleString}\n" +
        s"  inferred: ${inferred.simpleString}")
    new JsonDocTable(ps, whole, t, inferred)
  }
}

private[sources] object JsonDocSource {

  /** Planning-time inference cache, JVM-wide: DataSource lookup
    * constructs a FRESH provider per `.load()`, so an instance field
    * would re-pay the inference job on every read of the same data.
    * The key includes each file's (path, length, mtime) fingerprint —
    * listing is one cheap namenode round-trip vs a full data pass —
    * so modified inputs re-infer and unchanged ones are free. Bounded
    * (128 entries, drop-oldest) because table sets are small and
    * HTypes are KBs. */
  private case class InferKey(paths: Seq[String], whole: Boolean,
                              files: Seq[(String, Long, Long)])
  private val inferCache =
    new java.util.LinkedHashMap[InferKey, HType](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[InferKey, HType]): Boolean = size() > 128
    }
  /** Test-visible count of actual inference JOBS run (not cache hits). */
  private[sources] val inferenceRuns = new java.util.concurrent.atomic.AtomicLong

  private[sources] def inferCached(ps: Seq[String], whole: Boolean): HType = {
    val spark = SparkSession.active
    // listFiles already returns the (path, len, mtime) statuses — one
    // listing round-trip serves expansion AND the cache fingerprint
    val key = InferKey(ps, whole, listFiles(spark, ps))
    inferCache.synchronized {
      Option(inferCache.get(key))
    }.getOrElse {
      val docs = graft.cli.CliSession.readDocs(spark, ps, whole,
        announceTo = new java.io.PrintStream(
          java.io.OutputStream.nullOutputStream()))
      val (t, _) = docs.select(new InferSchemaCountAgg().toColumn).head()
      inferenceRuns.incrementAndGet()
      val canon = t.canonical
      inferCache.synchronized { inferCache.put(key, canon) }
      canon
    }
  }

  def sparkSchemaOf(t: HType): StructType =
    Materialize.toMaterializableSparkType(t) match {
      case s: StructType => s
      case other => StructType(Seq(
        org.apache.spark.sql.types.StructField("value", other, nullable = true)))
    }

  /** Expand dirs and globs to concrete data files (non-hidden) as
    * (path, length, mtime) — the statuses come free with the listing,
    * so the inference-cache fingerprint costs no second FS pass. */
  def listFiles(spark: SparkSession,
                ps: Seq[String]): Seq[(String, Long, Long)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    ps.flatMap { p =>
      val path = new org.apache.hadoop.fs.Path(p)
      val fs = path.getFileSystem(conf)
      val matched = Option(fs.globStatus(path)).map(_.toSeq).getOrElse(Seq.empty)
      val expanded = if (matched.nonEmpty) matched else Seq(fs.getFileStatus(path))
      expanded.flatMap { st =>
        if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile)
        else Seq(st)
      }
    }.filterNot { st =>
      val name = st.getPath.getName
      name.startsWith("_") || name.startsWith(".")
    }.map(st => (st.getPath.toString, st.getLen, st.getModificationTime))
      .sortBy(_._1)
  }
}

private class JsonDocTable(ps: Seq[String], whole: Boolean, t: HType,
                           schema: StructType)
    extends Table with SupportsRead {
  override def name(): String = s"graftjson(${ps.mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new JsonDocScanBuilder(ps, whole, t, schema)
}

private class JsonDocScanBuilder(ps: Seq[String], whole: Boolean, t: HType,
                                 full: StructType)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = full
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    // TOP-LEVEL pruning only: Spark's SchemaPruning may hand nested-
    // pruned struct types (e.g. just `score.u0` of a union field),
    // but the reader materializes whole top-level values — so keep
    // each retained field's FULL type. Spark projects the nested
    // subset above the scan; GetStructField ordinals stay valid
    // because the field's type is unchanged.
    required = StructType(full.fields.filter(f =>
      requiredSchema.fieldNames.contains(f.name)))
  /** BEST-EFFORT pushdown, the parquet row-group-stats contract: the
    * source skips non-matching rows before Catalyst serialization
    * (saving the conversion + shipping of every filtered row), but
    * every filter is ALSO returned as residual so Spark keeps its
    * Filter node — correctness never depends on the source's
    * evaluation, only row volume does. */
  override def pushFilters(filters: Array[org.apache.spark.sql.sources.Filter])
      : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters.filter(JsonDocFilters.supports(_, full))
    filters // all residual — see scaladoc
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] =
    pushed
  override def build(): Scan =
    new JsonDocScan(ps, whole, t, full, required, pushed)
}

private class JsonDocScan(ps: Seq[String], whole: Boolean, t: HType,
                          full: StructType, required: StructType,
                          pushed: Array[org.apache.spark.sql.sources.Filter])
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graftjson ${ps.mkString(",")} ReadSchema: ${required.simpleString} " +
      s"PushedFilters: [${pushed.mkString(", ")}]"
  override def planInputPartitions(): Array[InputPartition] =
    JsonDocSource.listFiles(SparkSession.active, ps)
      .map(f => JsonDocPartition(f._1): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    // ship the SESSION's Hadoop conf to the readers: a fresh executor
    // Configuration would drop every spark.hadoop.* setting (S3
    // credentials/endpoints, codec config) that planning used
    JsonDocReaderFactory(whole, t, full.fieldNames.toSeq, required, pushed,
      new graft.ops.Fs.SerializableConf(
        SparkSession.active.sparkContext.hadoopConfiguration))
}

private case class JsonDocPartition(path: String) extends InputPartition

private case class JsonDocReaderFactory(whole: Boolean, t: HType,
                                        fullNames: Seq[String],
                                        required: StructType,
                                        pushed: Array[org.apache.spark.sql.sources.Filter],
                                        conf: graft.ops.Fs.SerializableConf)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new JsonDocReader(p.asInstanceOf[JsonDocPartition].path, whole, t,
      fullNames, required, pushed, conf.value)
}

/** Early-skip evaluation of simple source filters against the
  * materialized EXTERNAL row (pre-Catalyst). Supported: null probes
  * and comparisons on top-level atomic columns — types whose external
  * class is Comparable and whose filter literal Catalyst hands over
  * as the SAME class (the `supports` gate). Everything else stays
  * residual. Comparison failing on an unexpected class keeps the row
  * (the residual Filter decides) — best-effort can drop only rows it
  * PROVES non-matching. */
private object JsonDocFilters {
  import org.apache.spark.sql.sources._
  import org.apache.spark.sql.types._

  private def atomic(schema: StructType, name: String): Boolean =
    schema.fields.exists(f => f.name == name && (f.dataType match {
      case ByteType | ShortType | IntegerType | LongType | FloatType |
           DoubleType | StringType | BooleanType | TimestampType => true
      case _: DecimalType => true
      case _ => false
    }))

  def supports(f: Filter, schema: StructType): Boolean = f match {
    case EqualTo(a, _) => atomic(schema, a)
    case GreaterThan(a, _) => atomic(schema, a)
    case GreaterThanOrEqual(a, _) => atomic(schema, a)
    case LessThan(a, _) => atomic(schema, a)
    case LessThanOrEqual(a, _) => atomic(schema, a)
    case IsNull(a) => atomic(schema, a)
    case IsNotNull(a) => atomic(schema, a)
    case _ => false
  }

  private def cmp(x: Any, v: Any): Option[Int] = (x, v) match {
    case (a: java.math.BigDecimal, b: java.math.BigDecimal) =>
      Some(a.compareTo(b)) // scale-insensitive, unlike equals
    case (a: Comparable[_], b) if a.getClass == b.getClass =>
      Some(a.asInstanceOf[Comparable[Any]].compareTo(b))
    case _ => None
  }

  /** true = the row may match (ship it); false = provably filtered. */
  def keeps(f: Filter, row: org.apache.spark.sql.Row,
            idx: Map[String, Int]): Boolean = f match {
    case IsNull(a) => row.get(idx(a)) == null
    case IsNotNull(a) => row.get(idx(a)) != null
    case EqualTo(a, v) =>
      val x = row.get(idx(a)); x != null && cmp(x, v).forall(_ == 0)
    case GreaterThan(a, v) =>
      val x = row.get(idx(a)); x != null && cmp(x, v).forall(_ > 0)
    case GreaterThanOrEqual(a, v) =>
      val x = row.get(idx(a)); x != null && cmp(x, v).forall(_ >= 0)
    case LessThan(a, v) =>
      val x = row.get(idx(a)); x != null && cmp(x, v).forall(_ < 0)
    case LessThanOrEqual(a, v) =>
      val x = row.get(idx(a)); x != null && cmp(x, v).forall(_ <= 0)
    case _ => true
  }
}

/** Per-file reader: Hadoop open (+ codec for `.gz`), line or
  * whole-file units, [[Materialize.docToRow]] conversion, top-level
  * projection to the pruned schema, Catalyst serialization. */
private class JsonDocReader(path: String, whole: Boolean, t: HType,
                            fullNames: Seq[String], required: StructType,
                            pushed: Array[org.apache.spark.sql.sources.Filter],
                            conf: org.apache.hadoop.conf.Configuration)
    extends PartitionReader[InternalRow] {

  private val hPath = new org.apache.hadoop.fs.Path(path)
  private val fs = hPath.getFileSystem(conf)
  private val raw: java.io.InputStream = {
    val codec = new org.apache.hadoop.io.compress.CompressionCodecFactory(conf)
      .getCodec(hPath)
    val in = fs.open(hPath)
    if (codec == null) in else codec.createInputStream(in)
  }
  private val reader = new java.io.BufferedReader(
    new java.io.InputStreamReader(raw, java.nio.charset.StandardCharsets.UTF_8))

  private val rowShaped =
    Materialize.toMaterializableSparkType(t)
      .isInstanceOf[StructType]
  private val width = fullNames.length
  // pruned projection: index of each required field in the full row
  private val idx: Array[Int] =
    required.fieldNames.map(n => fullNames.indexOf(n))
  // pushed filters evaluate against the FULL row (a filtered column
  // need not be in the projection)
  private val fullIdx: Map[String, Int] = fullNames.zipWithIndex.toMap
  private val toInternal =
    ExpressionEncoder(RowEncoder.encoderFor(required)).createSerializer()

  private var current: InternalRow = _
  private var wholeDone = false

  @annotation.tailrec
  final override def next(): Boolean = {
    val doc =
      if (whole) {
        if (wholeDone) null
        else {
          wholeDone = true
          val sb = new StringBuilder
          var line = reader.readLine()
          while (line != null) {
            sb.append(line).append('\n'); line = reader.readLine()
          }
          sb.toString()
        }
      } else reader.readLine()
    if (doc == null) { current = null; false }
    else {
      val row = Materialize.docToRow(doc, t, rowShaped, width)
      if (!pushed.forall(JsonDocFilters.keeps(_, row, fullIdx))) next()
      else {
        val pruned = Row.fromSeq(idx.toSeq.map(i =>
          if (i >= 0) row.get(i) else null))
        // copy: the encoder's serializer reuses its UnsafeRow buffer
        current = toInternal(pruned).copy()
        true
      }
    }
  }

  override def get(): InternalRow = current
  override def close(): Unit = reader.close()
}
