package graft

import graft.queries.{Analytic, Curation, JsonQueries, LlmQueries, Pipeline, Relational}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query inventory is assembled from three families:
  *   - [[graft.queries.Relational]] — the relational surface (SURVEY
  *     §2.2): scan/filter/project, joins (broadcast/shuffle/semi/anti/
  *     range), aggregation (hash, distinct, HLL, rollup/cube), window
  *     functions, top-k, set ops, scalar function families;
  *   - [[graft.queries.JsonQueries]] — the reference's own capability
  *     re-expressed (distributed schema inference, shredding,
  *     infer-then-apply) plus JSON scalars and event-time windows;
  *   - [[graft.queries.LlmQueries]] — training-data-pipeline operators
  *     (dedup exact/MinHash/SimHash/Jaccard, similarity search,
  *     text stats, language ID, multimodal metadata).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Analytic.queries ++ JsonQueries.queries ++
      LlmQueries.queries ++ Curation.queries ++ Pipeline.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose semantics are not
    * SQL-expressible (HLL sketches, LSH candidate generation, lattice
    * schema inference) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    Relational.oracle ++ Analytic.oracle ++ JsonQueries.oracle ++
      LlmQueries.oracle ++ Curation.oracle ++ Pipeline.oracle
}
