package graft.profile

import graft.TestSpark
import graft.io.{CryptoCsv, Tables}
import graft.operators.CleanHistorical
import org.scalatest.funsuite.AnyFunSuite

/** Profiler parity: computed statistics against values known from the
  * reference data (SURVEY.md §2.7 quirk census + §2.2 A2 fill values)
  * and structural invariants on the synthetic tables. */
class ProfilerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private lazy val cleaned = CleanHistorical(
    CryptoCsv.readRaw(spark, "/root/reference/CryptocurrencyData.csv"))
  private lazy val prof = Profiler.profile(cleaned)

  test("overview matches the reference dataset") {
    assert(prof.nRows === 4150)
    assert(prof.nCols === 12)
    assert(prof.nDuplicateRows === 0) // reference A7 result (C259)
    assert(prof.numeric.map(_.name).contains("current_price"))
    assert(prof.strings.map(_.name) === Seq("coin", "symbol"))
  }

  test("current_price stats reproduce the golden fill/quartile values") {
    val p = prof.numeric.find(_.name === "current_price").get
    assert(p.nMissing === 0) // post-fill
    // golden median = the imputed constant 0.11 (SURVEY §2.2 A2)
    assert(math.abs(p.median.get - 0.11) < 1e-9)
    assert(math.abs(p.q25.get - 0.07) < 1e-9)
    assert(math.abs(p.q75.get - 0.16) < 1e-9)
    assert(p.histogram.map(_._3).sum === 4150)
  }

  test("histogram bins partition [min, max] with no loss") {
    prof.numeric.filter(_.histogram.nonEmpty).foreach { p =>
      assert(p.histogram.map(_._3).sum === p.nNonNull,
        s"${p.name}: histogram loses rows")
      val (lo0, _, _) = p.histogram.head
      val (_, hiN, _) = p.histogram.last
      assert(math.abs(lo0 - p.min.get) < 1e-9)
      assert(math.abs(hiN - p.max.get) < 1e-6 * math.max(1, math.abs(p.max.get)))
    }
  }

  test("alerts fire on the expected reference quirks") {
    // 41.6% of prices are the imputed 0.11 → no missing alert, but the
    // 1h column (filled with 0.0) has >10% zeros
    assert(prof.alerts.exists(_.startsWith("ZEROS: 1h")), prof.alerts)
  }

  test("string profile: coin is (near-)unique, lengths sane") {
    val c = prof.strings.find(_.name === "coin").get
    assert(c.nDistinct > 4000)
    assert(c.minLen.get >= 1 && c.maxLen.get <= 60)
    assert(c.topValues.nonEmpty)
  }

  test("synthetic lineitem profile: correlations + approx mode agree") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_quantity", "l_extendedprice", "l_discount")
    val exact = Profiler.profile(li)
    val approx = Profiler.profile(li, approxQuantiles = true)
    val e = exact.numeric.find(_.name === "l_quantity").get
    val a = approx.numeric.find(_.name === "l_quantity").get
    assert(math.abs(e.median.get - a.median.get) <= 1.0) // quantities 1..50
    assert(exact.correlations.size === 3)
    exact.correlations.foreach { case (_, _, r) => assert(math.abs(r) <= 1.0) }
  }

  test("spearman matrix agrees with the q38 operator and bounds") {
    val li = Tables.load(spark, "/root/testdata/sf0.001", "lineitem")
    val m = Profiler.spearmanMatrix(li, Seq("l_quantity", "l_extendedprice", "l_discount"))
    assert(m.size === 3)
    m.foreach { case (_, _, r) => assert(math.abs(r) <= 1.0 + 1e-12) }
    val viaQ38 = graft.operators.RankStats
      .q38Spearman(li).head().getDouble(1)
    val qp = m.find(p => p._1 == "l_quantity" && p._2 == "l_extendedprice").get._3
    assert(math.abs(qp - viaQ38) < 1e-6, s"profiler $qp vs q38 $viaQ38")
  }

  test("HTML report renders all sections") {
    val html = HtmlReport.render("test report", prof)
    Seq("Overview", "Variables", "Correlations", "current_price",
        "coin", "Duplicate rows").foreach { s =>
      assert(html.contains(s), s"missing section: $s")
    }
    assert(!html.contains("<script"), "report should be static")
  }
}
