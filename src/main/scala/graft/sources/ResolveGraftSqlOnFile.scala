package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** SQL-on-file for the graftjson source:
  * `SELECT ... FROM graftjson.`/data/dir``.
  *
  * Spark's own `ResolveSQLOnFile` reserves the `format.`path`` syntax
  * for V1 `FileFormat` providers — a pure DSv2 `TableProvider` is
  * rejected with UNSUPPORTED_DATASOURCE_FOR_DIRECT_QUERY before any
  * extension resolution rule runs (extension rules sit AFTER it in the
  * same batch). This rule is therefore injected into the HINT
  * resolution batch (`injectHintResolutionRule`), which the analyzer
  * runs BEFORE the main resolution batch: the unresolved relation is
  * rewritten into the same [[DataSourceV2Relation]] that
  * `spark.read.format("graftjson").load(path)` produces — one read
  * path, zone maps / pushdown / splits included — and Spark's rule
  * never sees it.
  *
  * The match is deliberately narrow so no catalog name can be
  * shadowed: a two-part identifier whose head is exactly `graftjson`
  * (case-insensitive) and whose tail contains a `/` — a character no
  * catalog table name can carry; mirrors Spark's own gate otherwise
  * (`spark.sql.runSQLOnFile`, batch reads only). */
class ResolveGraftSqlOnFile(session: SparkSession)
    extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      case u: UnresolvedRelation
          if session.sessionState.conf.runSQLonFile && !u.isStreaming &&
            u.multipartIdentifier.size == 2 &&
            u.multipartIdentifier.head.equalsIgnoreCase("graftjson") &&
            u.multipartIdentifier.last.contains("/") =>
        val opts = new java.util.HashMap[String, String](u.options)
        opts.put("path", u.multipartIdentifier.last)
        val cis = new CaseInsensitiveStringMap(opts)
        val provider = new JsonDocSource
        val table = provider.getTable(provider.inferSchema(cis),
          Array.empty, cis)
        DataSourceV2Relation.create(table, None, None, cis, None)
    }
}
