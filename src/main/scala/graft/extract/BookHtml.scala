package graft.extract

import graft.model.Model.Book

/** Offline HTML parsers for the books.toscrape.com page shapes — the
  * analytical semantics of the reference's scraper
  * (`/root/reference/extract_pipeline.py:1-73`), re-implemented as pure
  * Scala over fixture HTML (zero-egress environment: no live HTTP; the
  * Spark wrapper in [[Extract]] feeds these from local files).
  *
  * jsoup is not on the classpath, so extraction is anchored-regex based;
  * the page shapes are stable fixtures, not adversarial HTML.
  */
object BookHtml {

  private val ListingLink =
    """(?s)<article class="product_pod">.*?<h3><a href="([^"]+)"""".r
  private val TitleRe = """(?s)<h1>(.*?)</h1>""".r
  private val BreadcrumbRe =
    """(?s)<ul class="breadcrumb">(.*?)</ul>""".r
  private val CrumbItemRe = """(?s)<li[^>]*>\s*<a[^>]*>(.*?)</a>""".r
  private val DescriptionRe =
    """(?s)<div id="product_description"[^>]*>.*?</div>\s*<p>(.*?)</p>""".r
  private val ImageRe = """(?s)<div[^>]*class="item active"[^>]*>\s*<img src="([^"]+)"""".r
  private val StarRe = """class="star-rating (\w+)"""".r
  private val TdRe = """(?s)<td>(.*?)</td>""".r
  private val AvailCountRe = """\((\d+) available\)""".r

  private val SitePrefix = "http://books.toscrape.com/"
  private val RatingWords = Map("One" -> 1, "Two" -> 2, "Three" -> 3, "Four" -> 4, "Five" -> 5)

  /** O3 — the listing-page link extractor: the first 20 product links
    * (`extract_pipeline.py:57-73` caps at 20 per page). Returned hrefs are
    * resolved against the catalogue root, as the reference's URL concat
    * does (`:69`). */
  def parseListing(html: String): Seq[String] =
    ListingLink.findAllMatchIn(html).map(_.group(1)).take(20)
      .map(href => SitePrefix + "catalogue/" + href.replace("../", ""))
      .toSeq

  /** O4/O20 — the detail-page parser: one 13-field [[Book]] per page.
    * Field-for-field semantics of `extract_pipeline.py:1-51`:
    * title `h1`, first description `<p>` (default "No description
    * available"), 3rd breadcrumb = category, carousel img (rewritten to an
    * absolute URL), star-rating class word → 1-5 (default 0), and the
    * 7-row product table → UPC / type / prices / tax / availability /
    * reviews. Availability splits into the boolean and the count
    * (`:28-33`). */
  def parseBook(html: String): Book = {
    val title = TitleRe.findFirstMatchIn(html).map(_.group(1).trim).getOrElse("")
    val description = DescriptionRe.findFirstMatchIn(html)
      .map(_.group(1).trim).getOrElse("No description available")
    val category = BreadcrumbRe.findFirstMatchIn(html).map(_.group(1)) match {
      case Some(crumb) =>
        val items = CrumbItemRe.findAllMatchIn(crumb).map(_.group(1).trim).toSeq
        if (items.length >= 3) items(2) else ""
      case None => ""
    }
    val image = ImageRe.findFirstMatchIn(html).map(_.group(1)) match {
      case Some(src) => SitePrefix + src.replace("../", "")
      case None => ""
    }
    val rating = StarRe.findFirstMatchIn(html)
      .flatMap(m => RatingWords.get(m.group(1))).getOrElse(0)
    val tds = TdRe.findAllMatchIn(html).map(_.group(1).trim).toSeq
    def td(i: Int) = if (i < tds.length) tds(i) else ""
    val availability = td(5)
    val inStock = availability.split("\\(").head.contains("In stock")
    val nStock = AvailCountRe.findFirstMatchIn(availability)
      .map(_.group(1).toInt).getOrElse(0)
    Book(
      Title = title,
      Description = description,
      Category = category,
      Image_link = image,
      Is_in_Stock = inStock,
      No_of_books_in_Stock = nStock,
      Rating = rating,
      UPC = td(0),
      `Product Type` = td(1),
      `Price (excl. tax)` = td(2),
      `Price (incl. tax)` = td(3),
      Tax = td(4),
      `Number of reviews` = td(6))
  }
}
