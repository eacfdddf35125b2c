package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry split discipline (no non-test file over ~1500 lines) keeps
  * moving query families between objects; this spec makes the re-wiring
  * mechanical. It needs no Spark session — pure map algebra over the
  * driver contract.
  */
class RegistryParitySpec extends AnyFunSuite {

  test("every query has an oracle and every oracle has a query") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert((q -- o).isEmpty, s"queries without oracle: ${(q -- o).toSeq.sorted}")
    assert((o -- q).isEmpty, s"oracles without query: ${(o -- q).toSeq.sorted}")
  }

  test("the registry never shrinks (399 at end of round 13)") {
    assert(SparkEntry.queries.size >= 399,
      s"registry shrank to ${SparkEntry.queries.size} — a family split dropped entries")
  }

  test("no family silently shadows another's query name") {
    val families: Seq[(String, Map[String, _])] = Seq(
      "Relational" -> graft.queries.RelationalQueries.defs,
      "Tpch" -> graft.queries.TpchQueries.defs,
      "Analytics" -> graft.queries.AnalyticsQueries.defs,
      "Forecast" -> graft.queries.ForecastQueries.defs,
      "Graph" -> graft.queries.GraphQueries.defs,
      "Sketch" -> graft.queries.SketchQueries.defs,
      "Llm" -> graft.queries.LlmQueries.defs,
      "TextMining" -> graft.queries.TextMiningQueries.defs,
      "LlmText" -> graft.queries.LlmTextQueries.defs,
      "Ann" -> graft.queries.AnnQueries.defs,
      "Curation" -> graft.queries.CurationQueries.defs,
      "CurationAudit" -> graft.queries.CurationAuditQueries.defs,
      "Multimodal" -> graft.queries.MultimodalQueries.defs,
      "Info" -> graft.queries.InfoQueries.defs,
      "Eval" -> graft.queries.EvalQueries.defs,
      "AgreementTest" -> graft.queries.AgreementTestQueries.defs,
      "Resampling" -> graft.queries.ResamplingQueries.defs,
      "Lexical" -> graft.queries.LexicalQueries.defs,
      "Privacy" -> graft.queries.PrivacyQueries.defs,
      "Calibration" -> graft.queries.CalibrationQueries.defs,
      "ClusterQuality" -> graft.queries.ClusterQualityQueries.defs,
      "Experiment" -> graft.queries.ExperimentQueries.defs,
      "Hypothesis" -> graft.queries.HypothesisQueries.defs,
      "HypothesisComposition" -> graft.queries.HypothesisCompositionQueries.defs,
      "Streaming" -> graft.queries.StreamingQueries.defs,
      "StreamingCert" -> graft.queries.StreamingCertQueries.defs,
      "RecoveryCert" -> graft.queries.RecoveryCertQueries.defs)
    val dup = families.flatMap { case (f, m) => m.keys.map(_ -> f) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty, s"duplicate query names across families: " +
      dup.map { case (k, fs) => s"$k in ${fs.map(_._2).mkString("+")}" }.mkString("; "))
    // the union really is the sum — ++ can't have swallowed anything
    assert(families.map(_._2.size).sum == SparkEntry.queries.size)
  }
}
