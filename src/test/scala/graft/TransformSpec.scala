package graft

import org.apache.spark.sql.functions._

import graft.model.Model.Book
import graft.transform.Transform

/** End-to-end transform: clean → derive → bin → star schema → summary over
  * an in-memory books frame with mojibake, £ prices, and an out-of-range
  * stock value (SURVEY.md §5-4's golden-fixture shape). */
class TransformSpec extends SparkSpec {
  import spark.implicits._

  private def book(t: String, cat: String, price: Double, stock: Int,
                   inStock: Boolean = true, desc: String = "d", rating: Int = 3) =
    Book(t, desc, cat, s"http://img/$t.jpg", inStock, stock, rating,
      s"upc-$t", "books", f"£$price%.2f", f"£$price%.2f", "£0.00", "0")

  private lazy val raw = Seq(
    book("a", "Fiction", 10.00, 5),
    book("b", "Fiction", 20.00, 12, desc = "descÂ£ ...more"),
    book("c", "Travel", 30.00, 20),
    book("d", "Travel", 40.00, 150000, inStock = false), // → null Stock_Bin
    book("e", "Poetry", 50.00, 19),
    book("f", "Poetry", 60.00, 3)).toDF()

  private lazy val star = Transform.run(raw)

  test("clean parses £ prices to doubles and fixes mojibake descriptions") {
    val cleaned = Transform.clean(raw)
    val b = cleaned.where($"Title" === "b").collect().head
    assert(b.getAs[Double]("Price (excl. tax)") == 20.00)
    assert(b.getAs[String]("Description") == "desc£") // mojibake fixed, suffix stripped
  }

  test("star schema: 4 dims with dense ids, fact row count = input count") {
    assert(star.dimBook.count() == 6)
    assert(star.dimCategory.count() == 3)
    assert(star.dimPriceTier.count() == 3)
    assert(star.dimStockTier.count() == 4) // Critical, Low, Healthy + null
    assert(star.fact.count() == 6)         // null-safe Stock_Bin join keeps book d
  }

  test("fact has the reference's 12 columns and fully-resolved FKs") {
    assert(star.fact.columns.toSeq == Seq(
      "book_id", "category_id", "price_tier_id", "stock_tier_id",
      "Rating", "Price (excl. tax)", "Price (incl. tax)", "Tax",
      "No_of_books_in_Stock", "Inventory Value", "Number of reviews", "In_Stock_Binary"))
    Seq("book_id", "category_id", "price_tier_id", "stock_tier_id").foreach { k =>
      assert(star.fact.where(col(k).isNull).count() == 0, s"$k has null FKs")
    }
  }

  test("summary matches the five email stats (airflow.py:101-107 semantics)") {
    val s = Transform.summary(star).collect().head
    assert(s.getAs[Long]("total_books") == 6)
    assert(s.getAs[Long]("total_categories") == 3)
    // 10*5 + 20*12 + 30*20 + 40*150000 + 50*19 + 60*3 = 6_002_020
    assert(math.abs(s.getAs[Double]("total_inventory_value") - 6002020.0) < 1e-6)
    assert(math.abs(s.getAs[Double]("avg_rating") - 3.0) < 1e-9)
    assert(s.getAs[Long]("books_in_stock") == 5)
  }

  test("price tiers are exact terciles of the cleaned price") {
    val tiers = star.cleaned.select($"Title", $"Price_Tier").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(tiers("a") == "Budget" && tiers("b") == "Budget")
    assert(tiers("c") == "Standard" && tiers("d") == "Standard")
    assert(tiers("e") == "Premium" && tiers("f") == "Premium")
  }
}
