package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** In-flight data-quality counters via `Dataset.observe` — the engine-side
  * version of the reference DAG's runtime assertions (`airflow.py:64-96`:
  * file-exists / non-empty / shape checks), but collected DURING the
  * already-running job instead of with a second counting pass: at 100 TB a
  * separate `count()` re-reads the table; observed metrics are free.
  */
object Quality {

  /** Attach row-count / null-count / min-max observation to a frame. Read
    * the result after an action via [[lastMetrics]] or a listener. */
  def observed(df: DataFrame, name: String, keyCol: String): DataFrame =
    df.observe(name,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"),
      min(col(keyCol)).as("min_key"),
      max(col(keyCol)).as("max_key"))

  /** Blocking convenience for batch jobs: run `action`, then return the
    * observation's metrics. */
  def runWithMetrics[T](df: DataFrame, keyCol: String)
                       (action: DataFrame => T): (T, Map[String, Any]) = {
    val obs = org.apache.spark.sql.Observation()
    val annotated = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    val result = action(annotated)
    (result, obs.get)
  }

  /** Assert-style gate: fail the job if observed nulls exceed a budget —
    * `airflow.py:95-96`'s "cleaned dataset non-empty" upgraded to a typed
    * threshold check with zero extra passes. */
  def requireQuality(df: DataFrame, keyCol: String, maxNullFraction: Double = 0.0): Unit = {
    val obs = org.apache.spark.sql.Observation()
    val annotated = df.observe(obs,
      count(lit(1)).as("n_rows"),
      sum(when(col(keyCol).isNull, 1L).otherwise(0L)).as("n_null_keys"))
    annotated.write.format("noop").mode("overwrite").save()
    val m = obs.get
    val n = m("n_rows").asInstanceOf[Long]
    val nulls = m("n_null_keys").asInstanceOf[Long]
    require(n > 0, "dataset is empty")
    require(nulls <= maxNullFraction * n,
      s"null fraction ${nulls.toDouble / n} exceeds budget $maxNullFraction for `$keyCol`")
  }
}
