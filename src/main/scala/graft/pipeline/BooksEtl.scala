package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.extract.Extract
import graft.io.BooksCsv
import graft.model.Model.{Summary, TransformResult}
import graft.transform.Transform

/** The end-to-end ETL the reference's Airflow DAG runs every 10 minutes
  * (`/root/reference/airflow.py:46-111`), as one Spark driver program:
  * extract → persist raw → transform → persist star schema → summary →
  * render report. Scheduling/retries stay out-of-engine (the DAG's cron,
  * `airflow.py:31,42-44`); an in-engine streaming variant lives in
  * `graft.streaming`.
  */
object BooksEtl {

  /** Extract stage (`airflow.py:52-72`): scrape via the injected fetch,
    * persist the raw frame as headered CSV, return it. */
  def extract(spark: SparkSession, nPages: Int, fetch: String => String,
              rawCsvPath: Option[String] = None): DataFrame = {
    val raw = Extract.scrape(spark, nPages, fetch)
    rawCsvPath.foreach(p => BooksCsv.write(raw, p, singleFile = true))
    raw
  }

  /** Transform stage (`airflow.py:74-111`): clean → derive → bin → star
    * schema; optionally persist all six tables as CSV like the reference
    * (`transformation_pipeline.py:66,74,80,86,92,117`). */
  def transform(raw: DataFrame, outDir: Option[String] = None): TransformResult = {
    val result = Transform.run(raw)
    outDir.foreach { dir =>
      BooksCsv.write(result.cleaned, s"$dir/books_cleaned", singleFile = true)
      BooksCsv.write(result.dimBook, s"$dir/dim_book", singleFile = true)
      BooksCsv.write(result.dimCategory, s"$dir/dim_category", singleFile = true)
      BooksCsv.write(result.dimPriceTier, s"$dir/dim_price_tier", singleFile = true)
      BooksCsv.write(result.dimStockTier, s"$dir/dim_stock_tier", singleFile = true)
      BooksCsv.write(result.fact, s"$dir/fact_book_inventory", singleFile = true)
    }
    result
  }

  /** Summary stage (`airflow.py:101-107`): the five stats, collected to a
    * typed case class at the driver boundary — the single place the
    * pipeline leaves the distributed plan. */
  def summarize(star: TransformResult): Summary = {
    val row = Transform.summary(star).collect().head
    Summary(
      totalBooks = row.getAs[Long]("total_books"),
      totalCategories = row.getAs[Long]("total_categories"),
      totalInventoryValue = row.getAs[Double]("total_inventory_value"),
      avgRating = row.getAs[Double]("avg_rating"),
      booksInStock = row.getAs[Long]("books_in_stock"))
  }

  /** Full run. Email delivery (`airflow.py:196-229`) is out-of-engine; the
    * rendered HTML from [[Report.render]] is what a mail sink would send. */
  def run(spark: SparkSession, nPages: Int, fetch: String => String,
          outDir: Option[String] = None): (TransformResult, Summary) = {
    val raw = extract(spark, nPages, fetch, outDir.map(d => s"$d/books_raw"))
    val star = transform(raw, outDir)
    (star, summarize(star))
  }
}

/** O21 — the HTML inventory report the DAG emails out
  * (`airflow.py:113-194`): pure driver-side templating over the summary. */
object Report {
  def render(s: Summary, generatedAt: String): String =
    s"""<html><body>
       |<h2>Books Inventory Report</h2>
       |<p>Generated: $generatedAt</p>
       |<table border="1" cellpadding="6">
       |  <tr><th>Metric</th><th>Value</th></tr>
       |  <tr><td>Total books</td><td>${s.totalBooks}</td></tr>
       |  <tr><td>Total categories</td><td>${s.totalCategories}</td></tr>
       |  <tr><td>Total inventory value</td><td>${f"£${s.totalInventoryValue}%.2f"}</td></tr>
       |  <tr><td>Average rating</td><td>${f"${s.avgRating}%.2f"}</td></tr>
       |  <tr><td>Books in stock</td><td>${s.booksInStock}</td></tr>
       |</table>
       |</body></html>""".stripMargin
}
