package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Hot paths are pure Catalyst expressions: the dot product is
  * `aggregate(zip_with(a, b, *), 0.0, +)` — codegen'd, left-to-right
  * (deterministic) accumulation in double.
  *
  * Scale design: the brute-force path broadcasts the (small) query
  * set against the corpus — linear in corpus size, the right baseline
  * for exact top-k. The LSH path buckets the corpus by a
  * random-hyperplane signature so candidate generation is a keyed
  * join, not a cross join; at 100 TB only the bucketed path runs, and
  * the signature computation is a single embarrassing-parallel
  * projection. */
object VectorOps {

  /** Element-wise dot product of two double-array columns. Prefers the
    * native codegen'd [[graft.functions.DotProduct]] when
    * [[graft.GraftExtensions]] is installed on the active session;
    * falls back to the bit-identical (but CodegenFallback) composed
    * higher-order form otherwise. */
  def dot(a: Column, b: Column): Column =
    if (SparkSession.getActiveSession.exists(_.catalog.functionExists("graft_dot")))
      call_function("graft_dot", a, b)
    else
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  private def asDouble(c: Column): Column = transform(c, x => x.cast("double"))

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Corpus projected to (vec_id, v, n): double vector + its norm,
    * computed once. */
  private def prepared(embeddings: DataFrame): DataFrame =
    embeddings.select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))

  /** Exact brute-force cosine top-k: the query side (a handful of
    * vectors) is broadcast; every corpus partition scores its rows
    * locally and a per-query top-k window keeps k rows. Ranking uses
    * the score rounded to 4 decimals with a vec_id tiebreak so the
    * result set is stable across engines and partitionings. */
  def cosineTopK(embeddings: DataFrame, queries: DataFrame, k: Int): DataFrame = {
    val corpus = prepared(embeddings)
    val qs = prepared(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
    val scored = corpus.join(broadcast(qs), col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Fixed random hyperplanes (seeded — identical across executors and
    * runs). */
  private def hyperplanes(bits: Int, dim: Int): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(bits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Random-hyperplane (SimHash-for-vectors) signature: bit j is the
    * sign of ⟨v, h_j⟩. Vectors with small angle share signatures with
    * high probability. */
  def lshSignature(v: Column, bits: Int, dim: Int): Column =
    hyperplanes(bits, dim).zipWithIndex.map { case (h, j) =>
      when(dot(v, array(h.toIndexedSeq.map(lit): _*)) >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Approximate top-k: candidates share the query's LSH bucket; the
    * per-bucket join replaces the corpus × query cross join. Recall
    * trades off with `bits` (more bits → smaller buckets). */
  def annTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              bits: Int = 8, dim: Int = 64): DataFrame = {
    val corpus = prepared(embeddings)
      .withColumn("sig", lshSignature(col("v"), bits, dim))
    val qs = prepared(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
      .withColumn("qsig", lshSignature(col("qv"), bits, dim))
    val scored = corpus
      .join(broadcast(qs),
        col("sig") === col("qsig") && col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** IVF-style approximate top-k: a coarse quantizer (Spark ML KMeans,
    * seeded) partitions the corpus into cells; each query probes its
    * `nProbe` nearest cells and scores only those candidates. The
    * 100 TB shape: the quantizer trains on a sample, cell assignment
    * is one embarrassingly-parallel pass, and the probe join is keyed
    * by cell — candidate volume scales with corpus/nCells · nProbe,
    * not with the corpus. */
  def ivfTopK(embeddings: DataFrame, queries: DataFrame, k: Int,
              nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val corpus = prepared(embeddings)
      .withColumn("fv", array_to_vector(col("v")))
    // few coalesced partitions for the tiny iterative fit: each KMeans
    // iteration is a job, and task-scheduling overhead dominates at
    // sample scale (production would fit on a sampled subset anyway)
    val model = new KMeans().setK(nCells).setSeed(11).setMaxIter(3)
      .setFeaturesCol("fv").setPredictionCol("cell")
      .fit(corpus.select(col("fv")).coalesce(4))
    val celled = model.transform(corpus).drop("fv")
    // the query set is small by contract: compute probe cells driver-side
    val centers = model.clusterCenters.map(_.toArray)
    val qRows = prepared(queries)
      .select(col("vec_id").as("query_id"), col("v").as("qv"), col("n").as("qn"))
      .collect()
    val probes = qRows.flatMap { r =>
      val qv = r.getAs[scala.collection.Seq[Double]]("qv").toArray
      centers.zipWithIndex
        .map { case (c, i) =>
          var d = 0.0; var j = 0
          while (j < qv.length) { val t = qv(j) - c(j); d += t * t; j += 1 }
          (i, d)
        }
        .sortBy(_._2).take(nProbe)
        .map { case (cell, _) => (r.getAs[Long]("query_id"), cell,
          r.getAs[scala.collection.Seq[Double]]("qv"), r.getAs[Double]("qn")) }
    }
    val spark = embeddings.sparkSession
    import spark.implicits._
    val probeDf = spark.createDataset(probes.toSeq)
      .toDF("query_id", "cell", "qv", "qn")
    val scored = celled.join(broadcast(probeDf),
      celled("cell") === probeDf("cell") && col("query_id") =!= col("vec_id"))
      .withColumn("cos", round(dot(col("v"), col("qv")) / (col("n") * col("qn")), 4))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id"))
    scored
      .select(col("query_id"), col("vec_id"), col("cos"))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .orderBy(col("query_id"), col("rank"))
  }

  /** Embedding-cosine near-duplicate pairs above a similarity
    * threshold. Exact all-pairs within label blocks (the corpus ships
    * a cluster label; real pipelines block on a coarse quantizer cell
    * the same way) — never an unblocked cross join. */
  def embeddingNearDup(embeddings: DataFrame, threshold: Double): DataFrame = {
    val p = prepared(embeddings).join(
      embeddings.select(col("vec_id"), col("label")), "vec_id")
    val a = p.select(col("vec_id").as("vec_a"), col("label"),
      col("v").as("va"), col("n").as("na"))
    val b = p.select(col("vec_id").as("vec_b"), col("label").as("label_b"),
      col("v").as("vb"), col("n").as("nb"))
    a.join(b, col("label") === col("label_b") && col("vec_a") < col("vec_b"))
      .withColumn("cos", dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 4).as("cos"))
  }
}
