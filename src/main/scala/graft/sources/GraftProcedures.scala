package graft.sources

import java.util.Collections

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.Identifier
import org.apache.spark.sql.connector.catalog.procedures.{BoundProcedure, ProcedureParameter, UnboundProcedure}
import org.apache.spark.sql.connector.read.{LocalScan, Scan}
import org.apache.spark.sql.types._

/** SQL-callable maintenance verbs for graftjson tables — the DSv2
  * procedure surface (SPARK-44167) of the catalog:
  *
  * {{{
  *   CALL graft.compact('/data/docs')
  *   CALL graft.recluster('/data/docs', 'doc_id')
  *   CALL graft.zorder('/data/docs', 'n_chars', 'doc_id')
  *   CALL graft.vacuum('/data/docs', retain_saves => 3)
  *   CALL graft.history('/data/docs')
  *   SHOW PROCEDURES IN graft
  * }}}
  *
  * Each verb resolves to the SAME lease-held, marker-committed
  * maintenance op the Scala API runs ([[JsonCompact.compact]] /
  * [[JsonCompact.recluster]] / [[JsonCompact.zorderRecluster]] /
  * [[JsonMeta.vacuum]]) — the procedure layer is pure ADDRESSING, like
  * the catalog itself: no second code path, every crash-safety and
  * single-writer contract is the op's own. Results come back as one
  * summary row (a [[LocalScan]] — the reports are driver-sized by
  * construction), so a SQL-only operator can wire OPTIMIZE-style
  * maintenance into schedulers without any Scala.
  *
  * The reference ships maintenance only as code entry points
  * (JsonSchemaFinder.java:main); the SQL verb form is the Spark-native
  * extension tier, mirroring how warehouse table formats expose
  * compaction to SQL users. */
object GraftProcedures {

  /** One summary frame, driver-local: every maintenance report is a
    * handful of scalars (file counts, save ids) — never data-sized. */
  private final class SummaryScan(schema: StructType,
                                  rs: Array[InternalRow]) extends LocalScan {
    override def rows(): Array[InternalRow] = rs
    override def readSchema(): StructType = schema
    override def description(): String = "graft maintenance summary"
  }

  /** Shared shape: procedures are stateless TEMPLATES (name, params,
    * output schema, run body); [[load]] wraps one per resolution with
    * the OWNING session captured at catalog-load time. */
  private abstract class GraftProc(val procName: String, val desc: String,
                                   params: => Array[ProcedureParameter],
                                   val out: StructType) {
    def paramArray: Array[ProcedureParameter] = params
    def run(spark: SparkSession, input: InternalRow): Array[InternalRow]
  }

  /** One per [[load]] call: binds to itself (parameters are static —
    * no overloading) and runs the verb on the session that RESOLVED
    * the procedure, not whichever session is active on the executing
    * thread (ADVICE r14: in a multi-session driver, `SparkSession
    * .active` at call time could run the maintenance op under a
    * different session's hadoopConfiguration than the one that
    * planned the CALL). */
  private final class BoundGraftProc(p: GraftProc, owner: SparkSession)
      extends UnboundProcedure with BoundProcedure {
    override def name(): String = p.procName
    override def description(): String = p.desc
    override def bind(inputType: StructType): BoundProcedure = this
    override def parameters(): Array[ProcedureParameter] = p.paramArray
    // every verb mutates (or lists) filesystem state
    override def isDeterministic: Boolean = false
    override def call(input: InternalRow): java.util.Iterator[Scan] =
      Collections.singletonList[Scan](
        new SummaryScan(p.out, p.run(owner, input))).iterator()
  }

  private def dirParam: ProcedureParameter =
    ProcedureParameter.in("dir", StringType)
      .comment("table directory (the graftjson path)").build()
  private def targetBytesParam: ProcedureParameter =
    ProcedureParameter.in("target_bytes", LongType)
      .defaultValue((64L << 20).toString)
      .comment("output file size target").build()
  private def refreshMetaParam: ProcedureParameter =
    ProcedureParameter.in("refresh_meta", BooleanType)
      .defaultValue("false")
      .comment("re-capture planning metadata (zones) at commit").build()

  private object Compact extends GraftProc(
    "compact",
    "merge small NDJSON files up to target_bytes under the one-marker " +
      "commit protocol (CALL graft.compact(dir))",
    Array(dirParam, targetBytesParam, refreshMetaParam),
    StructType(Seq(
      StructField("merged_files", IntegerType, nullable = false),
      StructField("merged_into", IntegerType, nullable = false),
      StructField("untouched", IntegerType, nullable = false),
      StructField("rolled_forward", BooleanType, nullable = false)))) {
    override def run(spark: SparkSession,
                     input: InternalRow): Array[InternalRow] = {
      val r = JsonCompact.compact(spark, input.getUTF8String(0).toString,
        targetBytes = input.getLong(1), refreshMeta = input.getBoolean(2))
      Array(InternalRow(r.mergedFiles, r.mergedInto, r.untouched,
        r.rolledForward))
    }
  }

  private val reclusterOut = StructType(Seq(
    StructField("rewritten_files", IntegerType, nullable = false),
    StructField("written_files", IntegerType, nullable = false),
    StructField("rolled_forward", BooleanType, nullable = false)))

  private object Recluster extends GraftProc(
    "recluster",
    "range-cluster NDJSON files by one zone-prunable path " +
      "(CALL graft.recluster(dir, by))",
    Array(dirParam,
      ProcedureParameter.in("by", StringType)
        .comment("dotted path to cluster by").build(),
      targetBytesParam, refreshMetaParam),
    reclusterOut) {
    override def run(spark: SparkSession,
                     input: InternalRow): Array[InternalRow] = {
      val r = JsonCompact.recluster(spark, input.getUTF8String(0).toString,
        input.getUTF8String(1).toString,
        targetBytes = input.getLong(2), refreshMeta = input.getBoolean(3))
      Array(InternalRow(r.rewrittenFiles, r.writtenFiles, r.rolledForward))
    }
  }

  private object Zorder extends GraftProc(
    "zorder",
    "two-key Morton-curve rewrite so probes on EITHER key zone-prune " +
      "(CALL graft.zorder(dir, by_a, by_b))",
    Array(dirParam,
      ProcedureParameter.in("by_a", StringType)
        .comment("first curve key").build(),
      ProcedureParameter.in("by_b", StringType)
        .comment("second curve key").build(),
      targetBytesParam, refreshMetaParam),
    reclusterOut) {
    override def run(spark: SparkSession,
                     input: InternalRow): Array[InternalRow] = {
      val r = JsonCompact.zorderRecluster(spark,
        input.getUTF8String(0).toString, input.getUTF8String(1).toString,
        input.getUTF8String(2).toString,
        targetBytes = input.getLong(3), refreshMeta = input.getBoolean(4))
      Array(InternalRow(r.rewrittenFiles, r.writtenFiles, r.rolledForward))
    }
  }

  private object Vacuum extends GraftProc(
    "vacuum",
    "prune time-travel history to the newest retain_saves save ids; " +
      "as-of reads below the horizon fail with the named retention " +
      "message (CALL graft.vacuum(dir, retain_saves))",
    Array(dirParam,
      ProcedureParameter.in("retain_saves", IntegerType)
        .comment("how many newest saves stay reconstructible").build()),
    StructType(Seq(
      StructField("horizon", LongType, nullable = false),
      StructField("squashed", IntegerType, nullable = false),
      StructField("segments_deleted", IntegerType, nullable = false),
      StructField("retained_saves", IntegerType, nullable = false)))) {
    override def run(spark: SparkSession,
                     input: InternalRow): Array[InternalRow] = {
      val r = JsonMeta.vacuum(spark, input.getUTF8String(0).toString,
        retainSaves = input.getInt(1))
      Array(InternalRow(r.horizon, r.squashed, r.segmentsDeleted,
        r.retainedSaves.size))
    }
  }

  private object History extends GraftProc(
    "history",
    "the save ids available for VERSION AS OF / asOfSave / sinceSave " +
      "on this table, ascending (CALL graft.history(dir))",
    Array(dirParam),
    StructType(Seq(StructField("save_id", LongType, nullable = false)))) {
    override def run(spark: SparkSession,
                     input: InternalRow): Array[InternalRow] =
      JsonMeta.saves(spark, input.getUTF8String(0).toString)
        .map(id => InternalRow(id)).toArray
  }

  private val registry: Seq[GraftProc] =
    Seq(Compact, Recluster, Zorder, Vacuum, History)

  def identifiers: Array[Identifier] =
    registry.map(p => Identifier.of(Array.empty, p.procName)).toArray

  def load(ident: Identifier): UnboundProcedure = {
    val known = registry.map(_.procName).mkString(", ")
    if (ident.namespace().nonEmpty)
      throw new IllegalArgumentException(
        s"graftjson: no procedure namespace " +
          s"'${ident.namespace().mkString(".")}' — procedures live at " +
          s"the catalog root: $known")
    val proc = registry.find(_.procName.equalsIgnoreCase(ident.name()))
      .getOrElse(throw new IllegalArgumentException(
        s"graftjson: unknown procedure '${ident.name()}' — one of: $known"))
    // the session that RESOLVED the CALL owns its execution (ADVICE
    // r14): procedure load happens on the planning session's thread,
    // so `active` here IS the planner
    new BoundGraftProc(proc, SparkSession.active)
  }
}
