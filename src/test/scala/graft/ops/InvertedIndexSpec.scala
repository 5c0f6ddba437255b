package graft.ops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Stored inverted index: search results equal raw-corpus scans, and
  * the probe reads only the query terms' bucket partitions. */
class InvertedIndexSpec extends SparkTestBase {

  private lazy val docs = spark.read.parquet(s"$sfDir/documents.parquet")

  private lazy val idx = {
    val dir = graft.TempRoots.path("invidx_spec")
    InvertedIndex.build(docs, dir, nBuckets = 16)
    dir
  }

  test("searchAll equals the brute-force AND scan of the raw text") {
    val terms = Seq("window", "scan", "join")
    val got = InvertedIndex.searchAll(spark, idx, terms).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("total_tf")).toMap
    val ws = split(coalesce(col("text"), lit("")), " ")
    val want = docs
      .select(col("doc_id"),
        terms.map(t => size(filter(ws, w => w === t)).cast("bigint"))
          .reduce(_ + _).as("total_tf"),
        terms.map(t => array_contains(ws, t)).reduce(_ && _).as("all"))
      .where(col("all"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("total_tf"))
      .toMap
    assert(want.nonEmpty, "precondition: some docs match all terms")
    assert(got == want)
  }

  test("searchRanked equals the brute-force TF-IDF ranking") {
    val terms = Seq("spark", "merge")
    val got = InvertedIndex.searchRanked(spark, idx, terms, 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    // brute force: same smoothed formula, same decimal-sum discipline
    val n = docs.count()
    val tf = docs.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val want = tf.join(dfs, "w")
      .withColumn("contrib",
        round(col("tf") * log(lit(n + 1.0) / (col("df") + 1)), 8)
          .cast("decimal(18,8)"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")).cast("double"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(20)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .toSeq
    assert(got == want)
    assert(got.size == 20)
  }

  test("searchBm25 equals the brute-force BM25 ranking from raw text") {
    val terms = Seq("window", "scan", "join")
    val got = InvertedIndex.searchBm25(spark, idx, terms, 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    // brute force: same Lucene-variant formula, dl and avgdl from the
    // raw text, same decimal-sum discipline
    val (k1, b) = (1.5, 0.75)
    val lens = docs.select(col("doc_id"),
      size(split(coalesce(col("text"), lit("")), " ")).cast("long").as("dl"))
    val n = docs.count()
    val avgdl = lens.agg(sum(col("dl"))).collect()(0).getLong(0).toDouble / n
    val tf = docs.select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .where(col("w").isin(terms: _*))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
    val dfs = tf.groupBy(col("w")).agg(count(lit(1)).as("df"))
    val want = tf.join(dfs, "w").join(lens, "doc_id")
      .withColumn("idf",
        log(lit(1.0) + (lit(n.toDouble) - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("contrib",
        round(col("idf") * (col("tf") * lit(k1 + 1.0)) /
          (col("tf") + lit(k1) *
            (lit(1.0 - b) + (lit(b) * col("dl")) / lit(avgdl))), 8)
          .cast("decimal(18,8)"))
      .groupBy(col("doc_id"))
      .agg(round(sum(col("contrib")).cast("double"), 4).as("score"))
      .orderBy(col("score").desc, col("doc_id").asc).limit(20)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score")))
      .toSeq
    assert(got == want)
    assert(got.size == 20)
    // length normalization actually bites: scores are not the TF-IDF ones
    val tfidf = InvertedIndex.searchRanked(spark, idx, terms, 20).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSeq
    assert(got != tfidf)
  }

  test("segment append equals a from-scratch build, replays idempotently, never rewrites seg 0") {
    val dir = graft.TempRoots.path("invidx_seg")
    val oldSlice = docs.where(col("doc_id") % 3 =!= 0)
    val newSlice = docs.where(col("doc_id") % 3 === 0)
    InvertedIndex.build(oldSlice, dir, nBuckets = 16)
    def seg0Files(): Set[String] = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(s"$dir/postings/seg=0"))
        .map(f => s"${f.getPath}:${f.lastModified}").toSet
    }
    val seg0Before = seg0Files()
    InvertedIndex.appendSegment(newSlice, dir, segId = 1)
    assert(seg0Files() == seg0Before, "append rewrote segment 0")
    val terms = Seq("merge", "spark")
    def results(d: String) = InvertedIndex.searchAll(spark, d, terms)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("total_tf"))
      .toMap
    val appended = results(dir)
    val rebuilt = graft.TempRoots.path("invidx_seg_rebuilt")
    InvertedIndex.build(docs, rebuilt, nBuckets = 16)
    assert(appended == results(rebuilt))
    assert(appended.nonEmpty)
    // replay the same segment id: dynamic overwrite → identical results
    InvertedIndex.appendSegment(newSlice, dir, segId = 1)
    assert(results(dir) == appended)
    // ranked search sees the union too (df spans segments)
    val rankedAppended = InvertedIndex.searchRanked(spark, dir, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val rankedRebuilt = InvertedIndex.searchRanked(spark, rebuilt, terms, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(rankedAppended == rankedRebuilt)
  }

  test("build() is a REBUILD: stale segments, tombstones, and old bucket layouts are wiped") {
    val dir = graft.TempRoots.path("invidx_rebuild")
    InvertedIndex.build(docs, dir, nBuckets = 16)
    InvertedIndex.appendSegment(
      docs.where(col("doc_id") % 2 === 0), dir, segId = 1)
    InvertedIndex.deleteDocs(spark, dir,
      docs.where(col("doc_id") % 5 === 0).select(col("doc_id")), batchId = 3)
    // rebuild over a SLICE with a DIFFERENT bucket count: dynamic
    // per-partition writes alone would leave segment 1, the
    // tombstones, and 16-bucket partitions alive — every search would
    // serve deleted/out-of-corpus docs or probe the wrong modulus
    val slice = docs.where(col("doc_id") % 3 === 0)
    InvertedIndex.build(slice, dir, nBuckets = 32)
    assert(!new java.io.File(s"$dir/tombstones").exists)
    assert(!new java.io.File(s"$dir/postings/seg=1").exists,
      "rebuild must wipe stale segments")
    val fresh = graft.TempRoots.path("invidx_rebuild_fresh")
    InvertedIndex.build(slice, fresh, nBuckets = 32)
    val terms = Seq("merge", "spark")
    def res(d: String) = InvertedIndex.searchAll(spark, d, terms)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(res(dir) == res(fresh), "rebuilt store must equal a fresh build")
  }

  test("distinct delete batches never collide (explicit batchId contract)") {
    val dir = graft.TempRoots.path("invidx_two_deletes")
    InvertedIndex.build(docs, dir, nBuckets = 16)
    val a = docs.where(col("doc_id") % 7 === 1).select(col("doc_id"))
    val b = docs.where(col("doc_id") % 7 === 2).select(col("doc_id"))
    InvertedIndex.deleteDocs(spark, dir, a, batchId = 1)
    InvertedIndex.deleteDocs(spark, dir, b, batchId = 2)
    val deadA = a.collect().map(_.getLong(0)).toSet
    val deadB = b.collect().map(_.getLong(0)).toSet
    val got = InvertedIndex.searchAll(spark, dir, Seq("merge"))
      .collect().map(_.getLong(0)).toSet
    assert(got.intersect(deadA).isEmpty,
      "the second delete batch must not resurrect the first")
    assert(got.intersect(deadB).isEmpty)
  }

  test("a compaction crashed mid-swap rolls forward from staging; searches fail fast in the window") {
    val dir = graft.TempRoots.path("invidx_compact_crash")
    InvertedIndex.build(docs, dir, nBuckets = 16)
    val dead = docs.where(col("doc_id") % 5 === 1).select(col("doc_id"))
    InvertedIndex.deleteDocs(spark, dir, dead, batchId = 1)
    val wantLive = InvertedIndex.searchAll(spark, dir, Seq("merge"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // SIMULATE the crash: the staged live copy is complete and the
    // marker is up (what compactSegments guarantees before swapping),
    // but the live postings dir was wiped by the static overwrite's
    // delete-before-write and the process died
    val tomb = spark.read.parquet(s"$dir/tombstones")
      .select(col("doc_id")).distinct()
    val live = spark.read.parquet(s"$dir/postings")
      .join(tomb, Seq("doc_id"), "left_anti")
    live.withColumn("seg", lit(0))
      .write.partitionBy("seg", "bucket").parquet(s"$dir/_staging/postings")
    spark.read.parquet(s"$dir/meta").where(col("seg") === 0)
      .write.parquet(s"$dir/_staging/meta")
    graft.ops.Fs.touch(spark, s"$dir/_compact_pending")
    graft.ops.Fs.delete(spark, s"$dir/postings")
    // the window fails LOUDLY — no silent empty results
    val e = intercept[IllegalStateException] {
      InvertedIndex.searchAll(spark, dir, Seq("merge")).collect()
    }
    assert(e.getMessage.contains("compaction crashed"), e.getMessage)
    // rerunning compactSegments must swap FROM STAGING — re-staging
    // from the wiped live dir would destroy the only surviving copy
    InvertedIndex.compactSegments(spark, dir)
    val got = InvertedIndex.searchAll(spark, dir, Seq("merge"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == wantLive, "roll-forward lost or resurrected rows")
    assert(!new java.io.File(s"$dir/_compact_pending").exists)
    assert(!new java.io.File(s"$dir/_staging").exists)
    assert(!new java.io.File(s"$dir/tombstones").exists)
  }

  test("searchPhrase counts exact word sequences, including overlapping and repeated-term phrases") {
    // hand-built corpus where the expected counts are visible
    val d2 = spark.createDataFrame(Seq(
      (0L, "a b a b a", "x", "en"),   // "a b": 2, "a b a": 2 (overlap), "a a": 0
      (1L, "a a a", "x", "en"),       // "a a": 2 (overlapping)
      (2L, "b a b", "x", "en"),       // "a b": 1
      (3L, "c c c c", "x", "en")))
      .toDF("doc_id", "text", "source", "lang")
    val dir = graft.TempRoots.path("invidx_phrase")
    InvertedIndex.build(d2, dir, nBuckets = 4)
    def counts(ph: Seq[String]) =
      InvertedIndex.searchPhrase(spark, dir, ph).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occurrences"))
        .toMap
    assert(counts(Seq("a", "b")) == Map(0L -> 2L, 2L -> 1L))
    assert(counts(Seq("a", "b", "a")) == Map(0L -> 2L)) // overlapping hits
    assert(counts(Seq("a", "a")) == Map(1L -> 2L))      // repeated term
    assert(counts(Seq("c", "a")) == Map.empty)
    // and on the real corpus: equals a brute-force bigram count
    val ph = Seq("spark", "merge")
    val got = InvertedIndex.searchPhrase(spark, idx, ph).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_occurrences"))
      .toMap
    val want = docs.select(col("doc_id"),
        split(coalesce(col("text"), lit("")), " ").as("ws"))
      .collect().flatMap { r =>
        val ws = r.getAs[scala.collection.Seq[String]]("ws")
        val n = ws.sliding(2).count(s => s == Seq("spark", "merge"))
        if (n > 0) Some(r.getAs[Long]("doc_id") -> n.toLong) else None
      }.toMap
    assert(want.nonEmpty, "precondition: the phrase occurs in the corpus")
    assert(got == want)
  }

  test("a term absent from the corpus yields an empty AND result, not an error") {
    val got = InvertedIndex.searchAll(spark, idx,
      Seq("window", "zzzzz_not_a_word"))
    assert(got.count() == 0L)
  }

  test("the probe plan prunes to the query terms' bucket partitions") {
    val terms = Seq("window", "scan")
    val buckets = terms.map(InvertedIndex.termBucket(_, 16)).distinct.sorted
    val p = InvertedIndex.searchAll(spark, idx, terms)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters"), p)
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).get
    assert(buckets.forall(b => pf.contains(b.toString)), s"$buckets not in $pf")
    // the BM25 probe rides the identical pruned scan
    val pBm = InvertedIndex.searchBm25(spark, idx, terms, 10)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pfBm = pBm.linesIterator.find(_.contains("PartitionFilters")).get
    assert(buckets.forall(b => pfBm.contains(b.toString)), pfBm)
    // and the executed scan really is restricted: every row that
    // reaches the probe comes from a probed bucket dir (inputFiles
    // would list the whole relation — it ignores filters)
    val files = spark.read.parquet(s"$idx/postings")
      .where(col("bucket").isin(buckets.map(Int.box): _*) &&
        col("term").isin(terms: _*))
      .select(input_file_name()).distinct().collect().map(_.getString(0))
    assert(files.nonEmpty)
    assert(files.forall(f => buckets.exists(b => f.contains(s"bucket=$b"))),
      files.mkString("\n"))
  }

  test("tombstone delete == rebuild without the docs; replay is a no-op; phrase search respects it") {
    val dir = graft.TempRoots.path("invidx_tomb_spec")
    InvertedIndex.build(docs, dir, nBuckets = 16)
    val dead = docs.where(col("doc_id") % 5 === 1).select(col("doc_id"))
    InvertedIndex.deleteDocs(spark, dir, dead, batchId = 1)
    def results(idx: String) =
      InvertedIndex.searchAll(spark, idx, Seq("merge", "spark"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("total_tf")).toMap
    val got = results(dir)
    val rebuilt = graft.TempRoots.path("invidx_tomb_rebuild")
    InvertedIndex.build(docs.where(col("doc_id") % 5 =!= 1), rebuilt,
      nBuckets = 16)
    val want = results(rebuilt)
    assert(want.nonEmpty)
    assert(got == want)
    // replay the identical delete batch: dynamic overwrite, same store
    InvertedIndex.deleteDocs(spark, dir, dead, batchId = 1)
    assert(results(dir) == want)
    // phrase search routes through the same tombstone-aware probe
    val phraseGot = InvertedIndex.searchPhrase(spark, dir,
        Seq("spark", "merge")).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val phraseWant = InvertedIndex.searchPhrase(spark, rebuilt,
        Seq("spark", "merge")).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(phraseWant.nonEmpty)
    assert(phraseGot == phraseWant)
  }

  test("an EMPTY delete batch leaves the index fully searchable (fileless tombstone dir)") {
    val dir = graft.TempRoots.path("invidx_emptydel_spec")
    InvertedIndex.build(docs, dir, nBuckets = 16)
    val before = InvertedIndex.searchAll(spark, dir, Seq("merge", "spark"))
      .count()
    // a delete whose filter matches nothing writes only _SUCCESS —
    // searches and compaction must treat it as zero tombstones
    InvertedIndex.deleteDocs(spark, dir,
      docs.where(col("doc_id") < 0).select(col("doc_id")), batchId = 2)
    assert(InvertedIndex.searchAll(spark, dir, Seq("merge", "spark"))
      .count() == before)
    InvertedIndex.compactSegments(spark, dir)
    assert(InvertedIndex.searchAll(spark, dir, Seq("merge", "spark"))
      .count() == before)
  }

  test("compaction merges segments, drops tombstones, and refreshes BM25 stats") {
    val dir = graft.TempRoots.path("invidx_compact_spec")
    val twoThirds = docs.where(col("doc_id") % 3 =!= 0)
    InvertedIndex.build(twoThirds, dir, nBuckets = 16)
    InvertedIndex.appendSegment(docs.where(col("doc_id") % 3 === 0), dir,
      segId = 1)
    val dead = docs.where(col("doc_id") % 5 === 1).select(col("doc_id"))
    InvertedIndex.deleteDocs(spark, dir, dead, batchId = 1)
    InvertedIndex.compactSegments(spark, dir)
    // physical shape: one segment family, no tombstones, no staging
    val segs = new java.io.File(s"$dir/postings").listFiles()
      .map(_.getName).filter(_.startsWith("seg=")).toSeq
    assert(segs == Seq("seg=0"), segs.toString)
    assert(!new java.io.File(s"$dir/tombstones").exists())
    assert(!new java.io.File(s"$dir/_staging").exists())
    // results AND ranking stats equal a fresh build on the live docs
    val rebuilt = graft.TempRoots.path("invidx_compact_rebuild")
    InvertedIndex.build(docs.where(col("doc_id") % 5 =!= 1), rebuilt,
      nBuckets = 16)
    def bm(idx: String) =
      InvertedIndex.searchBm25(spark, idx, Seq("merge", "spark"), 20)
        .collect().map(r => (r.getAs[Long]("doc_id"),
          r.getAs[Double]("score"))).toSeq
    assert(bm(rebuilt).nonEmpty)
    assert(bm(dir) == bm(rebuilt))
    def all(idx: String) =
      InvertedIndex.searchAll(spark, idx, Seq("window", "scan"))
        .collect().map(r => r.getAs[Long]("doc_id") ->
          r.getAs[Long]("total_tf")).toMap
    assert(all(dir) == all(rebuilt))
  }

  private lazy val trgIdx = {
    val dir = graft.TempRoots.path("trgidx_spec")
    InvertedIndex.buildTrigramIndex(docs, dir, nBuckets = 16)
    dir
  }

  test("substring search equals the brute-force contains scan") {
    val pat = "slow merge"
    val got = InvertedIndex.searchSubstring(docs, trgIdx, pat).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("first_pos"),
        r.getAs[Long]("n_hits"))).toSet
    val want = docs.where(instr(col("text"), pat) > 0)
      .select(col("doc_id"), instr(col("text"), pat).cast("bigint"),
        ((length(col("text")) -
          length(expr(s"replace(text, '$pat', '')"))) / pat.length)
          .cast("bigint"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(want.nonEmpty, "precondition: the pattern occurs in the corpus")
    assert(got == want)
  }

  test("contains-verification removes coincidental gram co-occurrence") {
    // 'par' 'ark' both occur (inside 'spark') but never adjacently as
    // 'park' starting a word — craft a doc set where the candidate AND
    // fires yet the substring is absent
    val d = spark.createDataFrame(Seq(
      (1L, "park bench"),            // true hit
      (2L, "spar ark"),              // has 'par' and 'ark', no 'park'
      (3L, "nothing here"))).toDF("doc_id", "text")
    val dir = graft.TempRoots.path("trgidx_fp")
    InvertedIndex.buildTrigramIndex(d, dir, nBuckets = 8)
    val got = InvertedIndex.searchSubstring(d, dir, "park").collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("first_pos")))
    assert(got.toSeq == Seq((1L, 1L)))
    // and the candidate stage really did consider doc 2 (superset
    // property: all grams of the pattern occur in it)
    val grams = "park".sliding(3).toSeq
    val cand = spark.read.parquet(s"$dir/grams")
      .where(col("gram").isin(grams: _*))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      .where(col("n") === grams.size)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(cand == Set(1L, 2L))
  }

  test("the substring probe prunes to the pattern grams' buckets") {
    val pat = "slow merge"
    val grams = pat.sliding(3).toSeq.distinct
    val buckets =
      grams.map(InvertedIndex.termBucket(_, 16)).distinct.sorted
    val p = InvertedIndex.searchSubstring(docs, trgIdx, pat)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    val pf = p.linesIterator.find(_.contains("PartitionFilters")).get
    assert(buckets.forall(b => pf.contains(b.toString)), s"$buckets not in $pf")
  }
}
