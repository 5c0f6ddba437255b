package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary induction and
  * encoding — the tokenizer-training stage of an LLM data pipeline,
  * run as Spark jobs instead of a single-node script.
  *
  * The algorithm is the published one (Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016):
  * represent each distinct WORD as a symbol sequence (characters plus
  * a trailing end-of-word marker), repeatedly count adjacent symbol
  * pairs weighted by word frequency, merge the globally most frequent
  * pair, and record the merge order as the vocabulary.
  *
  * The Spark shaping is what makes it 100 TB-viable:
  *   - the corpus is scanned ONCE, into a (word, count) table — every
  *     subsequent iteration runs over the distinct-word table, whose
  *     size is the vocabulary (millions), not the corpus (trillions);
  *   - the merge recursion is two-path on vocabulary size (the
  *     ANN probe's driverProbeLimit discipline): a vocab within
  *     `driverVocabLimit` ships to the driver once and recurses
  *     locally — 30 rounds cost ~2 Spark jobs instead of ~60, since
  *     the sequential argmax loop has no parallelism to exploit at
  *     that size — while a larger vocab runs the identical algorithm
  *     distributed (pair-explode + groupBy per round, only the argmax
  *     row to the driver), BpeSpec-pinned equal;
  *   - the distributed round's pair merge runs in a typed
  *     mapPartitions (plain JVM — an expression form with the pair as
  *     literals would re-codegen every round), and its lineage is
  *     truncated by an eager localCheckpoint every few rounds. The
  *     checkpoint is a pure CACHE of a recomputable table (losing an
  *     executor just recomputes from the previous round), unlike the
  *     index-maintenance staging this repo replaced with durable
  *     parquet — nothing durable is being overwritten here.
  *
  * Encoding reuses the same distinct-word trick: encode each DISTINCT
  * word once under the broadcast merge list, then broadcast-join the
  * encodings back onto the token stream — the per-token work at
  * corpus scale is a dictionary lookup, not a BPE loop. */
object Bpe {

  /** End-of-word sentinel (a multi-char symbol no character equals). */
  val Eow = "</w>"

  /** The merged-pair fold: leftmost-first single-pass pair merge of
    * `syms` for pair (l, r) — `aaa` under (a,a) becomes `[aa, a]`,
    * matching the reference implementation's scan. Pure SQL HOF. */
  /** Leftmost-first single-pass pair merge (the reference scan):
    * `aaa` under (a,a) becomes `[aa, a]`. Runs inside the typed
    * vocabulary mapPartitions — plain JVM, so the 30-round loop never
    * re-generates code (an expression form with the pair as literals
    * recompiled the kernel every round and dominated training time;
    * measured, not guessed). */
  private def mergeOnce(syms: scala.collection.Seq[String], l: String,
                        r: String): scala.collection.Seq[String] = {
    val b = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == l && syms(i + 1) == r) {
        b += (l + r); i += 2
      } else { b += syms(i); i += 1 }
    }
    b.toSeq
  }

  /** One (rank, left, right, n_occurrences) row per learned merge. */
  case class Merge(rank: Long, left: String, right: String,
                   n_occurrences: Long)

  /** Train `nMerges` BPE merges over the whitespace token stream of
    * `docs.text`. Deterministic: the argmax pair breaks count ties on
    * (left, right) lexicographically, so two runs (and the spec's
    * single-node reference) produce the identical merge table. Stops
    * early when no pair occurs twice. */
  def train(docs: DataFrame, nMerges: Int,
            driverVocabLimit: Long = 65536L): Seq[Merge] = {
    // ONE corpus scan: token stream → (word, count); everything after
    // runs at vocabulary scale
    val vocab0 = docs
      .select(explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("cnt"))
      // filter the empties split("") can emit (trailing split artifact,
      // and the empty word from runs of separators) — the reference
      // symbolization of "" is [Eow] alone
      .select(concat(filter(split(col("w"), ""), s => s =!= lit("")),
          array(lit(Eow))).as("syms"),
        col("cnt"))
      // persist (recomputable one-scan lineage), not localCheckpoint:
      // consumed by the gate count plus exactly one of collect /
      // coalesce, and a lost block may recompute safely
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Two-path merge loop, same discipline as the ANN probe's
    // driverProbeLimit: the merge recursion is inherently sequential
    // and its working set is the VOCABULARY, not the corpus — when the
    // vocab fits the driver budget, ship the (syms, count) table once
    // and recurse locally (zero per-round job-scheduling floor: the 30
    // rounds cost ~2 Spark jobs total instead of ~60). Above the
    // budget, the identical algorithm runs distributed; BpeSpec pins
    // the two paths equal on the same corpus. The count runs over the
    // checkpointed blocks — it does not rescan the corpus.
    val vocabSize = vocab0.count()
    if (vocabSize <= driverVocabLimit) {
      val rows = vocab0.collect().map(r =>
        (r.getAs[scala.collection.Seq[String]]("syms").toVector,
          r.getAs[Long]("cnt")))
      vocab0.unpersist(false)
      return trainLocal(rows, nMerges)
    }
    // size the iteration parallelism to the vocabulary, not the
    // session default: the loop pays per-task scheduling every round,
    // and a thousand-word vocab on 32 shuffle partitions is all
    // overhead (same auto-sizing discipline as VectorOps autoCells)
    val vocabParts = math.max(1L, math.min(
      vocabSize / 100000L,
      vocab0.sparkSession.sessionState.conf.numShufflePartitions.toLong)).toInt
    // localCheckpoint REQUIRED from here down (iterative fixpoint):
    // the merge loop chains a typed map per round — see the CpEvery
    // note below; executor loss fails the train() call and the
    // job-level retry re-runs it (pure read path)
    var vocab = vocab0.coalesce(vocabParts).localCheckpoint(true)
    vocab0.unpersist(false)
    // lineage control without an action per round: the merge step is
    // lazy, and the chain is truncated every few rounds — each pairs
    // aggregation replays at most `CpEvery` vocabulary-sized typed
    // maps (cheap), while checkpointing EVERY round doubled the job
    // count of the whole loop (measured)
    val CpEvery = 6
    var lastCp = vocab
    var sinceCp = 0
    val merges = Seq.newBuilder[Merge]
    var rank = 0L
    var done = false
    while (rank < nMerges && !done) {
      val pairs = vocab
        .select(posexplode(slice(col("syms"), lit(1), size(col("syms")) - 1))
          .as(Seq("i", "l")), col("syms"), col("cnt"))
        .select(col("l"), element_at(col("syms"), col("i") + 2).as("r"),
          col("cnt"))
        .groupBy(col("l"), col("r")).agg(sum(col("cnt")).as("n"))
      // the single global merge decision — ONE row to the driver per
      // round, through a single min_by aggregation (no sort): minimal
      // (−n, l, r) IS maximal count with the lexicographic tiebreak
      val best = pairs
        .agg(min_by(struct(col("l"), col("r"), col("n")),
          struct((-col("n")).as("nn"), col("l"), col("r"))).as("b"))
        .select(col("b.l"), col("b.r"), col("b.n"))
        .collect()
      if (best.isEmpty || best(0).isNullAt(2) ||
          best(0).getAs[Long]("n") < 2L) done = true
      else {
        val (l, r, n) = (best(0).getAs[String]("l"),
          best(0).getAs[String]("r"), best(0).getAs[Long]("n"))
        merges += Merge(rank, l, r, n)
        val spark = docs.sparkSession
        import spark.implicits._
        vocab = vocab.as[(scala.collection.Seq[String], Long)]
          .mapPartitions { it =>
            it.map { case (syms, c) => (mergeOnce(syms, l, r), c) }
          }.toDF("syms", "cnt")
        sinceCp += 1
        if (sinceCp >= CpEvery) {
          val cp = vocab.localCheckpoint(true)
          lastCp.unpersist(false)
          lastCp = cp
          vocab = cp
          sinceCp = 0
        }
        rank += 1
      }
    }
    lastCp.unpersist(false)
    merges.result()
  }

  /** Driver-side merge recursion for a vocabulary that fits the
    * budget — identical decisions to the distributed loop (counts
    * summed over the same (syms, cnt) rows, argmax with the same
    * (−n, l, r) tiebreak), pinned equal by BpeSpec. */
  private def trainLocal(rows0: Array[(Vector[String], Long)],
                         nMerges: Int): Seq[Merge] = {
    // Interned-symbol rewrite (r17 optimization, guide §1.2 per-task
    // work): the tuple-keyed Map rebuilt per round allocated ~200k
    // boxed (String, String) keys × 30 rounds; interning symbols to
    // ints makes each round's pair count one LongMap pass and the
    // merge a primitive-array rewrite. The selected pair per round is
    // IDENTICAL: argmin by (-count, left, right) with the SAME string
    // comparisons (resolved through the intern table), so the merge
    // sequence — and everything downstream — is unchanged (BpeSpec
    // pins merge-for-merge parity against the reference).
    val symId = scala.collection.mutable.HashMap.empty[String, Int]
    val symsOf = scala.collection.mutable.ArrayBuffer.empty[String]
    def intern(s: String): Int =
      symId.getOrElseUpdate(s, { symsOf += s; symsOf.length - 1 })
    var rows: Array[Array[Int]] = rows0.map(_._1.map(intern).toArray)
    val cnts: Array[Long] = rows0.map(_._2)
    val merges = Seq.newBuilder[Merge]
    var rank = 0L
    var done = false
    while (rank < nMerges && !done) {
      val pairs = new scala.collection.mutable.LongMap[Long]()
      var ri = 0
      while (ri < rows.length) {
        val syms = rows(ri); val c = cnts(ri)
        var i = 0
        while (i < syms.length - 1) {
          val k = (syms(i).toLong << 32) | (syms(i + 1).toLong & 0xFFFFFFFFL)
          pairs(k) = pairs.getOrElse(k, 0L) + c
          i += 1
        }
        ri += 1
      }
      if (pairs.isEmpty) done = true
      else {
        // argmin by (-n, left, right) — string order via the intern
        // table, exactly the tuple minBy this replaces
        var bestK = -1L; var bestN = -1L
        pairs.foreach { case (k, n) =>
          if (bestK < 0L) { bestK = k; bestN = n }
          else if (n > bestN) { bestK = k; bestN = n }
          else if (n == bestN) {
            val bl = symsOf((bestK >>> 32).toInt)
            val br = symsOf((bestK & 0xFFFFFFFFL).toInt)
            val kl = symsOf((k >>> 32).toInt)
            val kr = symsOf((k & 0xFFFFFFFFL).toInt)
            val cl = kl.compareTo(bl)
            if (cl < 0 || (cl == 0 && kr.compareTo(br) < 0)) {
              bestK = k; bestN = n
            }
          }
        }
        if (bestN < 2L) done = true
        else {
          val li = (bestK >>> 32).toInt
          val riId = (bestK & 0xFFFFFFFFL).toInt
          val l = symsOf(li); val r = symsOf(riId)
          merges += Merge(rank, l, r, bestN)
          val mergedId = intern(l + r)
          rows = rows.map { syms =>
            // fast path: rows without the pair keep their array
            var i = 0; var hit = false
            while (!hit && i < syms.length - 1) {
              if (syms(i) == li && syms(i + 1) == riId) hit = true
              i += 1
            }
            if (!hit) syms
            else {
              val b = new scala.collection.mutable.ArrayBuffer[Int](syms.length)
              i = 0
              while (i < syms.length) {
                if (i < syms.length - 1 && syms(i) == li &&
                    syms(i + 1) == riId) { b += mergedId; i += 2 }
                else { b += syms(i); i += 1 }
              }
              b.toArray
            }
          }
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** Learned merge table as a DataFrame (the q126 surface). */
  def trainDF(spark: SparkSession, docs: DataFrame, nMerges: Int): DataFrame = {
    import spark.implicits._
    train(docs, nMerges).toDF()
  }

  /** Reference single-word encode under a rank-ordered merge list:
    * repeatedly apply the LOWEST-RANK merge present until none apply
    * (the standard BPE inference loop). */
  private[ops] def encodeWord(word: String,
                              ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Seq(Eow)
    var syms = word.map(_.toString) :+ Eow
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        val rk = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (rk < bestRank) { bestRank = rk; bestAt = i }
        i += 1
      }
      if (bestAt < 0) continue = false
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Per-document BPE statistics under a learned merge list: number of
    * BPE tokens and the mean symbol length — the compression signal a
    * tokenizer owner tracks per corpus slice. Encodes each DISTINCT
    * word once (mapPartitions over the vocabulary with the broadcast
    * ranks), then broadcast-joins the lengths back onto the per-doc
    * word counts: corpus-scale work is a join, never a BPE loop. */
  def encodeStats(docs: DataFrame, merges: Seq[Merge]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val ranks = merges.map(m => (m.left, m.right) -> m.rank.toInt).toMap
    val bRanks = spark.sparkContext.broadcast(ranks)
    val words = docs
      .select(col("doc_id"),
        explode(split(coalesce(col("text"), lit("")), " ")).as("w"))
    val encoded = words.select(col("w")).distinct().as[String]
      .mapPartitions { it =>
        val rk = bRanks.value
        it.map(w => (w, encodeWord(w, rk).length.toLong))
      }.toDF("w", "n_syms")
    words.join(broadcast(encoded), "w")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_words"), sum(col("n_syms")).as("n_bpe_tokens"),
        round(sum(col("n_syms")).cast("double") / count(lit(1)), 4)
          .as("tokens_per_word"))
  }
}
