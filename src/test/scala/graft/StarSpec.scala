package graft

import org.apache.spark.sql.functions._

import graft.transform.Star

class StarSpec extends SparkSpec {
  import spark.implicits._

  test("buildDim assigns dense 1..N surrogate ids over the distinct key") {
    val df = Seq("b", "a", "c", "a", "b", "a").toDF("k")
    val dim = Star.buildDim(df, Seq("k"), "id").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(dim == Map("a" -> 1, "b" -> 2, "c" -> 3))
  }

  test("buildDim puts a null key first (NULLS FIRST ordering)") {
    val df = Seq(Some("b"), None, Some("a")).toDF("k")
    val dim = Star.buildDim(df, Seq("k"), "id").collect()
      .map(r => Option(r.getString(0)) -> r.getInt(1)).toMap
    assert(dim == Map(None -> 1, Some("a") -> 2, Some("b") -> 3))
  }

  test("denseIdsScalable assigns the same ids as buildDim's window") {
    val df = Seq("d", "b", "a", "c", "e").toDF("k")
    val viaWindow = Star.buildDim(df, Seq("k"), "id").collect()
      .map(r => r.getString(0) -> r.getInt(1).toLong).toMap
    val viaZip = Star.denseIdsScalable(df.distinct(), Seq("k"), "id").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(viaWindow == viaZip)
  }

  test("joinDim nullSafe=true keeps null-key rows (pandas NaN==NaN merge)") {
    val fact = Seq(Some("x"), None, Some("x"), None).toDF("k")
    val dim = Star.buildDim(fact, Seq("k"), "id")
    val strict = Star.joinDim(fact, dim, Seq("k")).count()
    val nullSafe = Star.joinDim(fact, dim, Seq("k"), nullSafe = true).count()
    assert(strict == 2)   // plain `=` drops the null-key rows
    assert(nullSafe == 4) // `<=>` keeps them
  }

  test("star build: every fact row resolves every FK (referential integrity)") {
    val df = Seq(("t1", "catA"), ("t2", "catA"), ("t3", "catB")).toDF("t", "cat")
    val dim = Star.buildDim(df, Seq("cat"), "cat_id")
    val fact = Star.joinDim(df, dim, Seq("cat"))
    assert(fact.count() == 3)
    assert(fact.where(col("cat_id").isNull).count() == 0)
  }
}
