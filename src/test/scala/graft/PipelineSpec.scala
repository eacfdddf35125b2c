package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.io.BooksCsv
import graft.model.Model
import graft.pipeline.{BooksEtl, Report}

class BooksSourceSpec extends SparkSpec {

  test("DataSource V2 books source reads a fixture dir as a typed table") {
    val dir = Files.createTempDirectory("books_dsv2")
    (1 to 5).foreach { i =>
      val html = Fixtures.detailPage(s"Book$i", "Fiction", "Three", "£9.99",
        s"In stock ($i available)", withDescription = true)
      Files.write(dir.resolve(f"book_$i%03d.html"), html.getBytes(StandardCharsets.UTF_8))
    }
    val df = spark.read.format("graft.sources.BooksDataSource")
      .option("path", dir.toString).option("filesPerPartition", "2").load()
    assert(df.schema == graft.sources.BooksDataSource.schema)
    assert(df.rdd.getNumPartitions == 3) // 5 files / 2 per partition
    val rows = df.collect()
    assert(rows.length == 5)
    val b1 = rows.find(_.getAs[String]("Title") == "Book1").get
    assert(b1.getAs[Int]("No_of_books_in_Stock") == 1)
    assert(b1.getAs[Boolean]("Is_in_Stock"))
    assert(b1.getAs[Int]("Rating") == 3)
  }
}

class BooksCsvSpec extends SparkSpec {
  import spark.implicits._

  test("headered CSV round-trip preserves spaced/parenthesized column names") {
    val raw = Seq(Model.Book("T1", "d", "Cat", "img", true, 4, 5,
      "u1", "books", "£1.00", "£1.00", "£0.00", "0")).toDF()
    val dir = Files.createTempDirectory("books_csv").toString + "/books"
    BooksCsv.write(raw, dir, singleFile = true)
    val back = BooksCsv.readRaw(spark, dir)
    assert(back.schema == Model.rawBooksSchema)
    val r = back.collect().head
    assert(r.getAs[String]("Price (excl. tax)") == "£1.00")
    assert(r.getAs[Boolean]("Is_in_Stock"))
    assert(r.getAs[Int]("No_of_books_in_Stock") == 4)
  }
}

class PipelineSpec extends SparkSpec {

  test("full ETL: fixtures → star schema CSVs → summary → report") {
    val detail = Fixtures.detailPage("X", "Cat", "Two", "£5.00",
      "In stock (3 available)", withDescription = true)
    val fetch: String => String = url =>
      if (url.contains("page-")) Fixtures.listingPage(10) else detail
    val out = Files.createTempDirectory("etl_out").toString

    val (star, summary) = BooksEtl.run(spark, 2, fetch, Some(out))

    assert(summary.totalBooks == 20)          // 2 pages × 10 fixture books
    assert(summary.totalCategories == 1)
    assert(summary.booksInStock == 20)
    assert(math.abs(summary.totalInventoryValue - 20 * 5.0 * 3) < 1e-9)
    assert(star.fact.count() == 20)

    // the six reference output tables exist on disk
    Seq("books_raw", "books_cleaned", "dim_book", "dim_category",
      "dim_price_tier", "dim_stock_tier", "fact_book_inventory").foreach { t =>
      assert(Files.exists(Paths.get(s"$out/$t")), s"missing $t")
    }

    val html = Report.render(summary, "2026-01-01 00:00:00")
    assert(html.contains("<td>20</td>") && html.contains("£300.00"))
  }
}
