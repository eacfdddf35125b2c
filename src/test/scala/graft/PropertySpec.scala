package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.extract.BookHtml
import graft.functions.Functions
import graft.llm.TextAnalysis

/** Property-based coverage (SURVEY.md §5-3) for the pure driver-side
  * implementations — no Spark session needed, so thousands of cases run in
  * milliseconds. Generators are driven with deterministic seeds (no
  * scalatestplus bridge in the offline dependency cache). */
class PropertySpec extends AnyFunSuite {

  private def forAll[A](gen: Gen[A], cases: Int = 300)(f: A => Unit): Unit = {
    var run = 0
    var seed = Seed(42L)
    var attempts = 0
    while (run < cases && attempts < cases * 20) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); run += 1 }
      seed = seed.next
      attempts += 1
    }
    assert(run > cases / 2, s"generator too restrictive: only $run cases")
  }

  private val arbString: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.choose(Char.MinValue, Char.MaxValue)).map(_.mkString),
    Gen.listOf(Gen.oneOf('Â', '£', '€', '’', 'ü', ' ', 'a', '.')).map(_.mkString))

  test("fixMojibakeImpl never throws and never returns null") {
    forAll(arbString) { s =>
      val out = Functions.fixMojibakeImpl(s)
      assert(out != null)
    }
  }

  test("fixMojibakeImpl is a no-op on plain ASCII without the ...more suffix") {
    forAll(Gen.asciiPrintableStr.suchThat(!_.contains(" ...more"))) { s =>
      assert(Functions.fixMojibakeImpl(s) == s)
    }
  }

  test("fixMojibakeImpl is idempotent on its own output for ASCII input") {
    forAll(Gen.asciiPrintableStr) { s =>
      val once = Functions.fixMojibakeImpl(s)
      assert(Functions.fixMojibakeImpl(once) == once)
    }
  }

  test("rollingHashImpl stays in [0, 2^61-1) and matches the BigInt reference") {
    val mod = BigInt((1L << 61) - 1)
    def ref(s: String): Long =
      s.foldLeft(BigInt(0))((h, c) => (h * 257 + c.toInt) % mod).toLong
    forAll(arbString) { s =>
      val h = TextAnalysis.rollingHashImpl(s)
      assert(h >= 0 && h < mod.toLong)
      assert(h == ref(s))
    }
  }

  test("parseBook never throws on arbitrary non-page input") {
    forAll(arbString) { s =>
      val b = BookHtml.parseBook(s)
      assert(b.Description == "No description available") // default applies
      assert(b.Rating == 0 && !b.Is_in_Stock)
    }
  }

  test("parseListing caps at 20 and never throws") {
    forAll(arbString) { s =>
      assert(BookHtml.parseListing(s).length <= 20)
    }
    forAll(Gen.choose(0, 40)) { n =>
      assert(BookHtml.parseListing(Fixtures.listingPage(n)).length == math.min(n, 20))
    }
  }

  test("NearestCodeL2.impl returns a code in [0, ksub) and is stable on reconstructions") {
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val sub = 4
    val genVec = Gen.listOfN(sub * 2, Gen.choose(-100.0, 100.0)).map(_.toArray)
    val genFlat = Gen.listOfN(sub * 4, Gen.choose(-100.0, 100.0)).map(_.toArray)
    forAll(genVec.flatMap(v => genFlat.map(f => (v, f))), cases = 200) { case (v, f) =>
      // distinct-centroid corpus (duplicates would legally retarget ties
      // to the lower code); Gen.choose over doubles collides with
      // probability ~0 but guard anyway
      val cents = f.grouped(sub).toSeq
      if (cents.distinct.size == cents.size) {
        (0 to 1).foreach { s =>
          val code = graft.llm.NearestCodeL2.impl(
            new GenericArrayData(v), new GenericArrayData(f), s * sub, sub)
          assert(code >= 0 && code < 4)
          // re-encoding the selected centroid itself must return the same
          // code (its self-distance is exactly 0)
          val rec = cents(code)
          val again = graft.llm.NearestCodeL2.impl(
            new GenericArrayData(rec), new GenericArrayData(f), 0, sub)
          assert(again == code)
        }
      }
    }
  }

  test("ThresholdedLevenshtein rewrite is value-identical on random inputs") {
    // expression-level replay of the optimizer rule's claim:
    // (lev(a,b) <= k) == (lev(a,b,k) >= 0) for every input, nulls included
    import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThanOrEqual, Levenshtein, Literal}
    import org.apache.spark.sql.types.StringType
    def check(a: String, b: String, k: Int): Unit = {
      val la = Literal.create(a, StringType)
      val lb = Literal.create(b, StringType)
      val naive =
        LessThanOrEqual(Levenshtein(la, lb, None), Literal(k)).eval(null)
      val banded = GreaterThanOrEqual(
        Levenshtein(la, lb, Some(Literal(k))), Literal(0)).eval(null)
      assert(naive == banded,
        s"k=$k a=${Option(a).map(_.take(30))} b=${Option(b).map(_.take(30))}")
    }
    val gen = for {
      a <- arbString.map(_.take(120))
      b <- arbString.map(_.take(120))
      k <- Gen.choose(0, 20)
    } yield (a, b, k)
    forAll(gen) { case (a, b, k) => check(a, b, k) }
    check(null, "x", 3) // NULL propagation must match too
    check("x", null, 0)
  }

  test("ThresholdedLevenshtein Long-bound/casted form is value-identical") {
    // the round-10 generalization: Cast(lev, LongType) <= kL must equal
    // the banded Int-threshold form for every input, nulls included
    import org.apache.spark.sql.catalyst.expressions.{Cast, GreaterThanOrEqual, LessThanOrEqual, Levenshtein, Literal}
    import org.apache.spark.sql.types.{LongType, StringType}
    def check(a: String, b: String, k: Long): Unit = {
      val la = Literal.create(a, StringType)
      val lb = Literal.create(b, StringType)
      val naive = LessThanOrEqual(
        Cast(Levenshtein(la, lb, None), LongType), Literal(k)).eval(null)
      val banded = GreaterThanOrEqual(
        Levenshtein(la, lb, Some(Literal(k.toInt))), Literal(0)).eval(null)
      assert(naive == banded,
        s"k=$k a=${Option(a).map(_.take(30))} b=${Option(b).map(_.take(30))}")
    }
    val gen = for {
      a <- arbString.map(_.take(120))
      b <- arbString.map(_.take(120))
      k <- Gen.choose(0L, 20L)
    } yield (a, b, k)
    forAll(gen) { case (a, b, k) => check(a, b, k) }
    check(null, "x", 2L)
    check("x", null, 0L)
  }

  test("Isqrt contract: r*r <= x < (r+1)*(r+1) on the full long range") {
    import graft.functions.Isqrt
    def check(x: Long): Unit = {
      val r = Isqrt.impl(x)
      assert(r >= 0 && r * r <= x, s"x=$x r=$r undershoots")
      // guard the (r+1)^2 comparison against overflow via BigInt
      assert((BigInt(r) + 1) * (BigInt(r) + 1) > BigInt(x), s"x=$x r=$r overshoots")
    }
    // exact squares and their neighbors are the classic off-by-one traps
    (0L to 1000L).foreach { r => check(r * r); check(r * r + 1)
      if (r > 0) check(r * r - 1) }
    check(Long.MaxValue); check(Long.MaxValue - 1)
    check(3037000499L * 3037000499L) // largest exact square
    forAll(Gen.choose(0L, Long.MaxValue)) { x => check(x) }
  }

  test("reference currency-clean semantics: strip [^0-9.] then parse") {
    // model of transformation_pipeline.py:5-11 (re.sub + float, happy path)
    forAll(Gen.oneOf(Seq("£", "Â£", "$", "", "EUR "))
        .flatMap(p => Gen.choose(0, 999999).map(n => (p, n)))) { case (prefix, cents) =>
      val s = f"$prefix${cents / 100}%d.${cents % 100}%02d"
      val stripped = s.replaceAll("[^0-9.]", "")
      assert(math.abs(stripped.toDouble - cents / 100.0) < 1e-9)
    }
  }
}
