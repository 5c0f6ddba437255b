package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.sources.Filter

/** Metadata-only SQL DELETE for graftjson tables (r14) — the zone
  * proofs put to their third use (after file skipping and aggregate
  * answering): `DELETE FROM graft.`dir` WHERE p` succeeds exactly when
  * every live file is DECIDED by its zone under the full conjunction —
  * provably all-match files are removed WHOLE through the same atomic
  * `_compaction/commit` marker every rewrite uses, provably-empty
  * files are untouched, and ONE undecided file fails the statement
  * loudly (the engine never rewrites rows: this store's row-level
  * delete is `overwrite` with a filtered frame, and the error says
  * so). This is the delete a retention pipeline actually runs at
  * 100 TB — drop whole partitions/epochs by time or key range, never
  * read a byte of the data — and clustering (clusterBy / recluster /
  * Z-order) is what makes predicates decidable.
  *
  * Crash/concurrency contracts are the store's own: lease-held
  * (verifyHeld before the marker), marker-atomic (readers see the old
  * table or the new, never a mix), roll-forward idempotent, and the
  * removal lands in the durable history as TOMBSTONES when the table
  * keeps planning metadata — `asOfSave` of a pre-delete save then
  * fails with the named bytes-gone error, never wrong rows. */
object JsonDocDelete {

  /** The file-grain decision: Some(names to remove) when EVERY live
    * file is decided under ALL conjuncts; None otherwise (any dirty
    * file, a file without a zone, an empty conjunction — bare
    * truncate belongs to overwrite — or any undecided file).
    * All-match proofs need complete sighting counts, so a dirty walk
    * anywhere declines the whole statement, mirroring the filtered
    * COUNT(*) discipline. */
  private[sources] def decide(spark: SparkSession, dir: String,
                              filters: Seq[Filter]): Option[Seq[String]] = {
    if (filters.isEmpty) return None
    // constant-folded conjunctions (the engine folds e.g. `id >= 10^6`
    // over a smallint column to FALSE before translation): a FALSE leg
    // means the statement provably matches nothing — a DECIDED no-op,
    // no zone needed; TRUE legs are neutral, and a conjunction of only
    // them is the bare truncate that belongs to overwrite
    if (filters.exists(_.isInstanceOf[org.apache.spark.sql.sources.AlwaysFalse]))
      return Some(Seq.empty)
    val effective = filters.filterNot(
      _.isInstanceOf[org.apache.spark.sql.sources.AlwaysTrue])
    if (effective.isEmpty) return None
    val (t, zonesOpt, listing) = JsonDocSource.inferCached(
      Seq(dir), whole = false, refresh = false, zonemaps = true)
    val zm = zonesOpt.getOrElse(return None)
    val zonePaths = ZoneSkip.eligiblePaths(t)
    val perFile = listing.map { case (p, _, _) => p -> zm.get(p) }
    if (perFile.exists(_._2.isEmpty)) return None
    if (perFile.exists(_._2.exists(_.dirty))) return None
    val removes = Seq.newBuilder[String]
    perFile.foreach {
      case (p, Some(z)) =>
        if (effective.forall(ZoneSkip.provablyAllMatch(_, z, zonePaths)))
          removes += new Path(p).getName
        else if (effective.exists(ZoneSkip.provablyEmpty(_, z, zonePaths)))
          () // the file keeps every row
        else return None
      case _ => return None
    }
    Some(removes.result())
  }

  /** Execute the decided delete under the writer lease; returns the
    * number of files removed. Throws loudly when the predicate is not
    * expressible as whole-file removals. */
  def delete(spark: SparkSession, dir: String,
             filters: Seq[Filter]): Int = {
    val root0 = new Path(dir)
    val fs = root0.getFileSystem(spark.sparkContext.hadoopConfiguration)
    JsonLease.withLease(fs, root0, "delete") { lease =>
      // a crashed predecessor's committed marker owns the slot
      JsonCompact.rollForward(spark, dir)
      // decide UNDER the lease (the pre-flight canDeleteWhere ran
      // without it — the listing may have moved)
      val removes = decide(spark, dir, filters).getOrElse(
        throw new IllegalStateException(
          s"graftjson: DELETE on $dir needs every file PROVABLY decided " +
            "by its zone under the full condition (all rows match, or " +
            "none) — this predicate would require a row rewrite, which " +
            "the store deliberately does not do; recluster/Z-order by " +
            "the delete key so files align with it, or rewrite with " +
            "df.write.mode(\"overwrite\") of the filtered frame"))
      if (removes.nonEmpty) {
        lease.verifyHeld()
        JsonCompact.writeMarker(fs, root0,
          JsonCompact.Marker(Seq.empty, removes))
        JsonCompact.rollForward(spark, dir)
        // the removal becomes HISTORY when the table keeps durable
        // meta (tombstone segment); a table that never saved is not
        // given one as a side effect
        if (JsonMeta.saves(spark, dir).nonEmpty)
          JsonMeta.saveWith(spark, dir, None, lease)
      }
      removes.size
    }
  }
}
