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

  /** k-anonymity audit — the privacy gate a training-data release
    * runs before shipping records with quasi-identifiers (Sweeney
    * 2002): group customers by the QI tuple (nation, market segment,
    * account-balance bucket) and report, for each standard threshold
    * k ∈ {2,5,10,20}, how many equivalence classes and how many ROWS
    * sit in groups smaller than k — the rows re-identifiable at that
    * anonymity level. One corpus scan + one QI-keyed aggregation
    * (map-side combined); the per-threshold report folds out of the
    * tiny group table, so the shape is identical at 100 TB. Bucketing
    * the continuous QI is the standard generalization step —
    * floor(bal/500) in DOUBLE on both engines. */
  private def q216(s: SparkSession, dir: String): DataFrame = {
    val groups = Tables(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 500).cast("bigint").as("bal_bucket"))
      .groupBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))
      .agg(count(lit(1)).as("k"))
    def below(t: Int, what: org.apache.spark.sql.Column) =
      sum(when(col("k") < t, what).otherwise(lit(0L))).cast("bigint")
    groups.agg(
        sum(col("k")).as("n"),
        below(2, lit(1L)).as("g2"), below(2, col("k")).as("r2"),
        below(5, lit(1L)).as("g5"), below(5, col("k")).as("r5"),
        below(10, lit(1L)).as("g10"), below(10, col("k")).as("r10"),
        below(20, lit(1L)).as("g20"), below(20, col("k")).as("r20"))
      .select(expr(
        """stack(4,
          |  CAST(2 AS BIGINT), g2, r2, round(CAST(r2 AS DOUBLE) / n, 4),
          |  CAST(5 AS BIGINT), g5, r5, round(CAST(r5 AS DOUBLE) / n, 4),
          |  CAST(10 AS BIGINT), g10, r10, round(CAST(r10 AS DOUBLE) / n, 4),
          |  CAST(20 AS BIGINT), g20, r20, round(CAST(r20 AS DOUBLE) / n, 4))
          |AS (k_threshold, n_groups_below, n_rows_below, frac_rows_below)
          |""".stripMargin))
      .orderBy(col("k_threshold"))
  }

  private val q216Sql =
    """WITH q AS (SELECT c_nationkey, c_mktsegment,
      |    CAST(floor(c_acctbal / 500) AS BIGINT) AS bal_bucket
      |  FROM customer),
      |g AS (SELECT c_nationkey, c_mktsegment, bal_bucket, count(*) AS k
      |  FROM q GROUP BY 1, 2, 3),
      |s AS (SELECT CAST(sum(k) AS BIGINT) AS n,
      |  CAST(sum(CASE WHEN k < 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2,
      |  CAST(sum(CASE WHEN k < 2 THEN k ELSE 0 END) AS BIGINT) AS r2,
      |  CAST(sum(CASE WHEN k < 5 THEN 1 ELSE 0 END) AS BIGINT) AS g5,
      |  CAST(sum(CASE WHEN k < 5 THEN k ELSE 0 END) AS BIGINT) AS r5,
      |  CAST(sum(CASE WHEN k < 10 THEN 1 ELSE 0 END) AS BIGINT) AS g10,
      |  CAST(sum(CASE WHEN k < 10 THEN k ELSE 0 END) AS BIGINT) AS r10,
      |  CAST(sum(CASE WHEN k < 20 THEN 1 ELSE 0 END) AS BIGINT) AS g20,
      |  CAST(sum(CASE WHEN k < 20 THEN k ELSE 0 END) AS BIGINT) AS r20
      |  FROM g)
      |SELECT k_threshold, n_groups_below, n_rows_below, frac_rows_below
      |FROM (
      |  SELECT CAST(2 AS BIGINT) AS k_threshold, g2 AS n_groups_below,
      |    r2 AS n_rows_below,
      |    round(CAST(r2 AS DOUBLE) / n, 4) AS frac_rows_below FROM s
      |  UNION ALL SELECT 5, g5, r5, round(CAST(r5 AS DOUBLE) / n, 4) FROM s
      |  UNION ALL SELECT 10, g10, r10,
      |    round(CAST(r10 AS DOUBLE) / n, 4) FROM s
      |  UNION ALL SELECT 20, g20, r20,
      |    round(CAST(r20 AS DOUBLE) / n, 4) FROM s)
      |ORDER BY k_threshold""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_bloom_contamination" -> (q85 _),
    "q86_embedding_quantize" -> (q86 _),
    "q87_zipf_stats" -> (q87 _),
    "q88_stratified_sample" -> (q88 _),
    "q216_k_anonymity" -> (q216 _))

  val oracle: Map[String, String] = Map(
    // q85 rows-only: Bloom false positives are hash-family-specific
    "q86_embedding_quantize" -> q86Sql,
    "q87_zipf_stats" -> q87Sql,
    "q88_stratified_sample" -> q88Sql,
    "q216_k_anonymity" -> q216Sql)
}
