package graft

import graft.extract.{BookHtml, Extract}

/** Fixture-driven extraction (zero-egress: no live HTTP anywhere).
  * Fixtures are authored here in the shape of books.toscrape.com pages. */
object Fixtures {

  def listingPage(nBooks: Int): String = {
    val articles = (1 to nBooks).map { i =>
      s"""<article class="product_pod">
         |  <div class="image_container">
         |    <a href="../../../book-$i/index.html"><img src="../../img$i.jpg"/></a>
         |  </div>
         |  <p class="star-rating Three"></p>
         |  <h3><a href="../../../book-$i/index.html" title="Book $i">Book $i</a></h3>
         |  <div class="product_price"><p class="price_color">£10.00</p></div>
         |</article>""".stripMargin
    }.mkString("\n")
    s"<html><body><section>$articles</section></body></html>"
  }

  def detailPage(title: String, category: String, rating: String, price: String,
                 stock: String, withDescription: Boolean): String = {
    val desc =
      if (withDescription)
        s"""<div id="product_description" class="sub-header"><h2>Product Description</h2></div>
           |<p>A fine story about $title.</p>""".stripMargin
      else ""
    s"""<html><body>
       |<ul class="breadcrumb">
       |  <li><a href="/">Home</a></li>
       |  <li><a href="/books">Books</a></li>
       |  <li><a href="/books/$category">$category</a></li>
       |  <li class="active">$title</li>
       |</ul>
       |<div class="item active"><img src="../../media/cache/xx/$title.jpg"/></div>
       |<div class="product_main">
       |  <h1>$title</h1>
       |  <p class="star-rating $rating"></p>
       |</div>
       |$desc
       |<table class="table table-striped">
       |  <tr><th>UPC</th><td>upc-$title</td></tr>
       |  <tr><th>Product Type</th><td>Books</td></tr>
       |  <tr><th>Price (excl. tax)</th><td>$price</td></tr>
       |  <tr><th>Price (incl. tax)</th><td>$price</td></tr>
       |  <tr><th>Tax</th><td>£0.00</td></tr>
       |  <tr><th>Availability</th><td>$stock</td></tr>
       |  <tr><th>Number of reviews</th><td>0</td></tr>
       |</table>
       |</body></html>""".stripMargin
  }
}

class ExtractSpec extends SparkSpec {

  test("parseListing extracts up to 20 absolute detail URLs per page") {
    val links = BookHtml.parseListing(Fixtures.listingPage(25))
    assert(links.length == 20) // caps at 20 even with more articles
    assert(links.head == "http://books.toscrape.com/catalogue/book-1/index.html")
    assert(BookHtml.parseListing(Fixtures.listingPage(7)).length == 7)
  }

  test("parseBook extracts all 13 fields") {
    val html = Fixtures.detailPage("Dune", "SciFi", "Four", "£9.99",
      "In stock (17 available)", withDescription = true)
    val b = BookHtml.parseBook(html)
    assert(b.Title == "Dune")
    assert(b.Description == "A fine story about Dune.")
    assert(b.Category == "SciFi")
    assert(b.Image_link == "http://books.toscrape.com/media/cache/xx/Dune.jpg")
    assert(b.Is_in_Stock && b.No_of_books_in_Stock == 17)
    assert(b.Rating == 4)
    assert(b.UPC == "upc-Dune" && b.`Product Type` == "Books")
    assert(b.`Price (excl. tax)` == "£9.99" && b.Tax == "£0.00")
    assert(b.`Number of reviews` == "0")
  }

  test("parseBook defaults a missing description (extract_pipeline.py:10-11)") {
    val html = Fixtures.detailPage("Bare", "Poetry", "One", "£1.00",
      "Out of stock", withDescription = false)
    val b = BookHtml.parseBook(html)
    assert(b.Description == "No description available")
    assert(!b.Is_in_Stock && b.No_of_books_in_Stock == 0)
    assert(b.Rating == 1)
  }

  test("scrape: pages → explode(20) → parse runs as a distributed plan") {
    val detail = Fixtures.detailPage("X", "Cat", "Two", "£5.00",
      "In stock (3 available)", withDescription = true)
    val fetch: String => String = url =>
      if (url.contains("page-")) Fixtures.listingPage(20) else detail
    val books = Extract.scrape(spark, 2, fetch)
    assert(books.count() == 40) // 2 pages × 20 books — the reference's batch shape
    assert(books.columns.length == 13)
    val first = books.collect().head
    assert(first.getAs[String]("Title") == "X")
    assert(first.getAs[Int]("No_of_books_in_Stock") == 3)
  }
}
