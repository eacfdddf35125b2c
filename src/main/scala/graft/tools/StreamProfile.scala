package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Dev tool: run the streaming certification queries with a listener that
  * dumps each micro-batch's duration breakdown (queryPlanning, addBatch,
  * walCommit, stateStore commit …) — for finding where the cert wall-clock
  * actually goes. */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.map(_.split(",").toSeq)
      .getOrElse(Seq("q65_stream_sessions"))
    val d = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        import scala.jdk.CollectionConverters._
        val dur = p.durationMs.asScala.map { case (k, v) => s"$k=$v" }.mkString(" ")
        println(s"T=${System.currentTimeMillis()} BATCH ${p.batchId} rows=${p.numInputRows} $dur")
      }
    })
    names.foreach { n =>
      println(s"T=${System.currentTimeMillis()} START $n")
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, d)
      println(s"T=${System.currentTimeMillis()} BUILT $n (staging+stream done)")
      val rows = df.queryExecution.toRdd.count()
      println(f"T=${System.currentTimeMillis()} $n%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s   rows=$rows")
    }
    spark.stop()
  }
}
