package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in `graft.queries.*`, one registry object per family
  * (relational core / tpch / analytics / graph / sketch / llm text+dedup /
  * ann / curation / multimodal / streaming); each query has a DuckDB
  * oracle with identical column names and deterministic ordering. The
  * single queries map is assembled HERE (and only here) so the family
  * objects stay acyclic.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q16_join_multi(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ TpchQueries.defs ++ AnalyticsQueries.defs ++
      ForecastQueries.defs ++
      GraphQueries.defs ++ SketchQueries.defs ++ LlmQueries.defs ++
      TextMiningQueries.defs ++ LlmTextQueries.defs ++ AnnQueries.defs ++ CurationQueries.defs ++ CurationAuditQueries.defs ++
      MultimodalQueries.defs ++ InfoQueries.defs ++ EvalQueries.defs ++ AgreementTestQueries.defs ++ ResamplingQueries.defs ++ LexicalQueries.defs ++
      PrivacyQueries.defs ++ CalibrationQueries.defs ++ ClusterQualityQueries.defs ++
      ExperimentQueries.defs ++ HypothesisQueries.defs ++ HypothesisCompositionQueries.defs ++
      StreamingQueries.defs ++ StreamingCertQueries.defs ++ RecoveryCertQueries.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracles ++ TpchQueries.oracles ++
      AnalyticsQueries.oracles ++ ForecastQueries.oracles ++
      GraphQueries.oracles ++
      SketchQueries.oracles ++ LlmQueries.oracles ++
      TextMiningQueries.oracles ++ LlmTextQueries.oracles ++ AnnQueries.oracles ++
      CurationQueries.oracles ++ CurationAuditQueries.oracles ++
      MultimodalQueries.oracles ++
      InfoQueries.oracles ++ EvalQueries.oracles ++ AgreementTestQueries.oracles ++ ResamplingQueries.oracles ++ LexicalQueries.oracles ++
      PrivacyQueries.oracles ++ CalibrationQueries.oracles ++ ClusterQualityQueries.oracles ++
      ExperimentQueries.oracles ++ HypothesisQueries.oracles ++ HypothesisCompositionQueries.oracles ++
      StreamingQueries.oracles ++ StreamingCertQueries.oracles ++ RecoveryCertQueries.oracles
}
