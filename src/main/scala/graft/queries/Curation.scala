package graft.queries

import graft.ops.{TextOps, VectorOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 curation operators: Bloom-filter contamination screening,
  * int8 embedding quantization audit, Zipf/head token statistics, and
  * quota-based stratified sampling. Same determinism conventions as
  * [[LlmQueries]]. */
object Curation {

  /** Bloom-filter contamination screen (rows-only: the flag set
    * includes the filter's false positives, which are hash-family-
    * specific — the exact semi-join q70 is the precision pass). */
  private def q85(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables(s, dir, "documents")
    TextOps.bloomContamination(
      docs.where(col("source") =!= "src0"),
      docs.where(col("source") === "src0"))
      .orderBy(col("doc_id"))
  }

  /** Int8 quantization audit: per-dimension scale + exact
    * reconstruction-error aggregates. */
  private def q86(s: SparkSession, dir: String): DataFrame =
    VectorOps.quantizeEmbeddings(Tables(s, dir, "embeddings"))

  private val q86Sql =
    """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS pos,
      |             CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
      |s AS (SELECT pos, max(abs(v)) AS max_abs, max(abs(v)) / 127.0 AS scale
      |      FROM e GROUP BY pos HAVING max(abs(v)) > 0),
      |j AS (SELECT e.pos, v, scale, max_abs, round(v / scale, 0) AS q
      |      FROM e JOIN s ON e.pos = s.pos),
      |c AS (SELECT pos, max_abs,
      |        CASE WHEN q < -127 OR q > 127 THEN 1 ELSE 0 END AS clipped,
      |        CAST(abs(least(greatest(q, -127), 127) * scale - v) AS DECIMAL(20,12)) AS abs_err
      |      FROM j)
      |SELECT CAST(pos AS BIGINT) AS pos, count(*) AS n_values,
      |  CAST(sum(clipped) AS BIGINT) AS n_clipped,
      |  CAST(round(max(max_abs), 4) AS DOUBLE) AS max_abs,
      |  CAST(round(sum(abs_err), 6) AS DOUBLE) AS sum_abs_err,
      |  CAST(round(max(abs_err), 6) AS DOUBLE) AS max_abs_err
      |FROM c GROUP BY pos ORDER BY pos""".stripMargin

  /** Zipf/head token statistics per document. */
  private def q87(s: SparkSession, dir: String): DataFrame =
    TextOps.zipfStats(Tables(s, dir, "documents"))
      .orderBy(col("doc_id"))

  private val q87Sql =
    """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
      |           FROM documents),
      |c AS (SELECT doc_id, word, count(*) AS c FROM w GROUP BY doc_id, word),
      |m AS (SELECT *, max(c) OVER (PARTITION BY doc_id) AS top_n FROM c)
      |SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words, count(*) AS n_distinct,
      |  CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  max(c) AS top_count,
      |  min(CASE WHEN c = top_n THEN word END) AS top_word,
      |  round(max(c)::DOUBLE / sum(c), 4) AS top_ratio
      |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin

  /** Quota-based stratified sample: 20 docs per source by md5 order. */
  private def q88(s: SparkSession, dir: String): DataFrame =
    TextOps.stratifiedSample(Tables(s, dir, "documents"), 20)
      .withColumn("sample_rank", col("sample_rank").cast("bigint"))
      .orderBy(col("source"), col("doc_id"))

  private val q88Sql =
    """WITH r AS (SELECT doc_id, source,
      |    row_number() OVER (PARTITION BY source
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS sample_rank
      |  FROM documents)
      |SELECT doc_id, source, CAST(sample_rank AS BIGINT) AS sample_rank
      |FROM r WHERE sample_rank <= 20 ORDER BY source, doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_bloom_contamination" -> (q85 _),
    "q86_embedding_quantize" -> (q86 _),
    "q87_zipf_stats" -> (q87 _),
    "q88_stratified_sample" -> (q88 _))

  val oracle: Map[String, String] = Map(
    // q85 rows-only: Bloom false positives are hash-family-specific
    "q86_embedding_quantize" -> q86Sql,
    "q87_zipf_stats" -> q87Sql,
    "q88_stratified_sample" -> q88Sql)
}
