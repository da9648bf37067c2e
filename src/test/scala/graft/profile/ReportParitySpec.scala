package graft.profile

import graft.TestSpark
import graft.io.CryptoCsv
import graft.operators.CleanHistorical
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path}

/** S5 golden structure-and-value diff against the reference's OWN
  * profiling artifact (`cryptos_kaggle_report.html`, a ydata-profiling
  * render of the cleaned Kaggle table — crypto_etl_pipeline.py:261-287).
  *
  * Provenance probe: the kaggle report's stats reproduce the shipped
  * `cleaned_cryptocurrency_data_final.csv` exactly (e.g. current_price
  * mean 176.4457518, median 0.11, 4150 rows), so value-level parity is
  * checkable end-to-end: raw CSV → our CleanHistorical → our Profiler
  * must land on the numbers inside the reference artifact. The API
  * report (`cryptos_api_report.html`) was generated from an EARLIER
  * LIVE API pull, not the frozen fixture (its current_price mean is
  * 4237.50 vs the fixture's 5450.47, distinct 96 vs 97) — so for that
  * artifact only pandas-recomputed parity is possible (ProfilerSpec's
  * Fisher-moment and Spearman pins); this spec checks its section
  * structure only.
  */
class ReportParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def read(p: String): String = Files.readString(Path.of(p))

  /** ydata markup: `<tr><th>Label<td ...>value` (tags unclosed). */
  private val statRe = raw"<th>([^<]+)<td[^>]*>([^<]+)".r
  private def stats(seg: String): Map[String, String] =
    statRe.findAllMatchIn(seg)
      .map(m => m.group(1).trim -> m.group(2).trim).toMap

  /** Per-variable sections, in document order (anchors `id=pp_var_N`). */
  private def varSections(html: String): Seq[Map[String, String]] = {
    val starts = raw"id=pp_var_(-?\d+)".r.findAllMatchIn(html)
      .map(_.start).toSeq :+ html.length
    starts.sliding(2).collect { case Seq(a, b) =>
      stats(html.substring(a, b))
    }.toSeq
  }

  /** Plain decimal only — ydata renders large magnitudes as `m × 10^e`
    * with markup inside, which this regex capture truncates; those
    * values are skipped rather than compared wrong. */
  private def num(s: String): Option[Double] =
    if (s.nonEmpty && s.forall(c => c.isDigit || "+-.eE".contains(c)))
      scala.util.Try(s.toDouble).toOption
    else None

  private lazy val kaggle = read("/root/reference/cryptos_kaggle_report.html")
  private lazy val cleaned = CleanHistorical(
    CryptoCsv.readRaw(spark, "/root/reference/CryptocurrencyData.csv"))
  private lazy val prof = Profiler.profile(cleaned)

  test("overview: row/column counts match the reference artifact") {
    val ov = stats(kaggle)
    assert(ov("Number of observations") === prof.nRows.toString)
    assert(ov("Number of variables") === prof.nCols.toString)
  }

  test("section structure: every stats-bearing reference section has a counterpart") {
    // the kaggle artifact is a MINIMAL ydata render (Overview+Variables
    // tabs only); the API artifact is the full render — its tab set is
    // the reference's complete section structure
    val kaggleSections = raw"<h1[^>]*>([^<]+)</h1>".r
      .findAllMatchIn(kaggle).map(_.group(1).trim).toSet
    assert(kaggleSections === Set("Overview", "Variables"))
    val refSections = raw"<h1[^>]*>([^<]+)</h1>".r
      .findAllMatchIn(read("/root/reference/cryptos_api_report.html"))
      .map(_.group(1).trim).toSet
    assert(refSections.contains("Overview") && refSections.contains("Variables")
      && refSections.contains("Correlations")
      && refSections.contains("Missing values")
      && refSections.contains("Sample"), refSections.toString)
    val html = HtmlReport.render("kaggle parity", prof)
    // reference section → our rendered section ("Interactions" is a
    // scatter-plot-only tab with no computed statistics — excluded)
    Seq("Overview" -> "Overview", "Variables" -> "Variables",
        "Correlations" -> "Correlations (Pearson)",
        "Missing values" -> "Missing value patterns",
        "Sample" -> "Sample").foreach { case (ref, ours) =>
      assert(html.contains(s"<h2>$ours</h2>"), s"reference '$ref' → missing '$ours'")
    }
  }

  test("per-variable stats agree with the reference artifact's own numbers") {
    val sections = varSections(kaggle)
    assert(sections.length === 12, "12 variables profiled in the reference report")
    // report variables are in cleaned-table column order; numeric ones
    // are exactly the sections that carry a Mean
    val numericSections = sections.filter(_.contains("Mean"))
    val numericCols = cleaned.schema.fields
      .filter(Profiler.isNumeric).map(_.name).toSeq
    assert(numericSections.length === numericCols.length,
      s"report has ${numericSections.length} numeric variables, we profile ${numericCols.length}")

    // report label → our computed field
    val fields: Seq[(String, NumericProfile => Option[Double])] = Seq(
      "Distinct" -> (p => Some(p.nDistinct.toDouble)),
      "Missing" -> (p => Some(p.nMissing.toDouble)),
      "Zeros" -> (p => Some(p.nZeros.toDouble)),
      "Negative" -> (p => Some(p.nNegative.toDouble)),
      "Infinite" -> (p => Some(p.nInfinite.toDouble)),
      "Mean" -> (_.mean), "Minimum" -> (_.min), "Maximum" -> (_.max),
      "5-th percentile" -> (_.q05), "Q1" -> (_.q25), "median" -> (_.median),
      "Q3" -> (_.q75), "95-th percentile" -> (_.q95),
      "Standard deviation" -> (_.std),
      "Skewness" -> (_.skew), "Kurtosis" -> (_.kurt))

    var compared = 0
    numericCols.zip(numericSections).foreach { case (c, sec) =>
      val p = prof.numeric.find(_.name === c)
        .getOrElse(fail(s"no profile for $c"))
      fields.foreach { case (label, f) =>
        for {
          refStr <- sec.get(label)
          refV <- num(refStr)      // skip 'm × 10^e' renderings
          ourV <- f(p)
        } {
          val tol = math.max(1e-6, math.abs(refV) * 1e-6)
          assert(math.abs(ourV - refV) < tol ||
            // the report prints ≤10 significant digits — allow half-ulp
            // of the printed precision for wide-magnitude columns
            math.abs(ourV - refV) <= math.abs(refV) * 5e-10 + 0.5 * math.pow(10,
              math.floor(math.log10(math.abs(refV).max(1e-300))) - 9),
            s"$c.$label: ours $ourV vs reference artifact $refV")
          compared += 1
        }
      }
    }
    // don't let silent skipping hollow the test out: the plain-decimal
    // subset is known to cover well over a hundred values
    assert(compared >= 100, s"only $compared values compared — parsing regressed?")
  }

  test("API report: section structure only (different source pull, documented)") {
    val api = read("/root/reference/cryptos_api_report.html")
    val refSections = raw"<h1[^>]*>([^<]+)</h1>".r
      .findAllMatchIn(api).map(_.group(1).trim).toSet
    assert(refSections.contains("Variables") && refSections.contains("Correlations"))
    // provenance mismatch proof pinned: report's current_price distinct
    // count is 96; the frozen fixture's is 97
    val cp = varSections(api).find(s =>
      s.get("Mean").exists(_.startsWith("4237"))).get
    assert(cp("Distinct") === "96")
    import org.apache.spark.sql.functions.countDistinct
    val fixtureDistinct = CryptoCsv.readApiFixture(
      spark, "/root/reference/api_cryptocurrency_data_final.csv")
      .select(countDistinct("current_price")).head().getLong(0)
    assert(fixtureDistinct === 97L)
  }
}
