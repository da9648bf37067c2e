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

  test("Fisher-adjusted skew/kurt match pandas on the reference API fixture") {
    // pandas Series.skew()/kurt() on api_cryptocurrency_data_final.csv
    // (the stats ydata-profiling reports — bias-adjusted G1/G2, which
    // Spark's population skewness/kurtosis builtins do NOT match)
    val expected = Map(
      "current_price" -> (4.7371596, 20.956637),
      "price_change_percentage_24h" -> (3.3373305, 17.519117),
      "market_cap" -> (9.1777448, 87.896299),
      "total_volume" -> (6.8815005, 50.921324),
      "high_24h" -> (4.7368287, 20.954537),
      "low_24h" -> (4.7367661, 20.954111))
    val api = Profiler.profile(CryptoCsv.readApiFixture(
      spark, "/root/reference/api_cryptocurrency_data_final.csv"))
    expected.foreach { case (name, (skew, kurt)) =>
      val p = api.numeric.find(_.name === name).get
      assert(math.abs(p.skew.get - skew) < 1e-6, s"$name skew ${p.skew.get} != $skew")
      assert(math.abs(p.kurt.get - kurt) < 1e-5, s"$name kurt ${p.kurt.get} != $kurt")
    }
    // undefined-sample guard mirrors pandas: n=3 has skew but no kurt
    import spark.implicits._
    val tiny = Profiler.profile(Seq(1.0, 2.0, 4.0).toDF("x"))
    val t = tiny.numeric.head
    assert(t.skew.isDefined && t.kurt.isEmpty)
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

  test("full Spearman matrix matches pandas on the reference API fixture") {
    // pandas: df[numeric].corr(method='spearman') over
    // api_cryptocurrency_data_final.csv (ydata's correlation tab)
    val expected = Map(
      ("current_price", "price_change_percentage_24h") -> 0.2790663,
      ("current_price", "market_cap") -> 0.2489244,
      ("current_price", "total_volume") -> -0.0677008,
      ("current_price", "high_24h") -> 0.9975095,
      ("current_price", "low_24h") -> 0.9974647,
      ("price_change_percentage_24h", "market_cap") -> 0.0789679,
      ("price_change_percentage_24h", "total_volume") -> -0.0669187,
      ("price_change_percentage_24h", "high_24h") -> 0.2817399,
      ("price_change_percentage_24h", "low_24h") -> 0.2729861,
      ("market_cap", "total_volume") -> 0.5121872,
      ("market_cap", "high_24h") -> 0.2381488,
      ("market_cap", "low_24h") -> 0.2475975,
      ("total_volume", "high_24h") -> -0.0789009,
      ("total_volume", "low_24h") -> -0.0672849,
      ("high_24h", "low_24h") -> 0.9939990)
    val api = Profiler.profile(CryptoCsv.readApiFixture(
      spark, "/root/reference/api_cryptocurrency_data_final.csv"))
    assert(api.spearman.size === expected.size, "one entry per numeric pair")
    api.spearman.foreach { case (a, b, rho) =>
      val want = expected.getOrElse((a, b), expected((b, a)))
      assert(math.abs(rho - want) < 1e-6, s"$a~$b: got $rho want $want")
    }
  }

  test("spearman is listwise under STAGGERED nulls: rank after drop, like pandas") {
    // Nulls in different rows per column: ranks must be computed over the
    // listwise-surviving rows (pandas df[cols].dropna().corr('spearman')),
    // NOT per-column over each column's full non-null population.
    import spark.implicits._
    val df = Seq[(Option[Double], Option[Double])](
      (Some(1.0), Some(5.0)), (Some(2.0), None), (None, Some(3.0)),
      (Some(4.0), Some(1.0)), (Some(2.0), Some(2.0)), (Some(5.0), Some(4.0)),
      (Some(2.0), Some(6.0))).toDF("x", "y")
    // survivors: (1,5),(4,1),(2,2),(5,4),(2,6); ranks x=(1,4,2.5,5,2.5)
    // (tie-averaged over survivors only), y=(4,1,2,3,5); Pearson = -4.5/sqrt(95)
    val rho = Profiler.spearmanMatrix(df, Seq("x", "y")).head._3
    val want = -4.5 / math.sqrt(95.0)
    assert(math.abs(rho - want) < 1e-12, s"got $rho want $want")
  }

  test("A11 missing patterns partition the rows; all-present pattern dominates post-fill") {
    import spark.implicits._
    val df = Seq(
      (Some(1), Some("a")), (Some(2), None), (None, Some("c")),
      (Some(4), None), (None, None)).toDF("x", "s")
    val p = Profiler.profile(df)
    val pats = p.missingPatterns.toMap
    assert(pats === Map("00" -> 1L, "01" -> 2L, "10" -> 1L, "11" -> 1L))
    assert(p.missingPatterns.map(_._2).sum === 5L, "patterns must partition all rows")
    // cleaned reference data: every numeric filled → the only pattern is all-zeros
    assert(prof.missingPatterns.map(_._2).sum === 4150L)
    assert(prof.missingPatterns.head._1 === "0" * 12)
  }

  test("A12 head/tail samples reproduce the first and last rows in order") {
    assert(prof.headRows.length === 5 && prof.tailRows.length === 5)
    assert(prof.columnNames === cleaned.columns.toSeq)
    // reference CSV is market-cap rank order: row 1 is Bitcoin
    assert(prof.headRows.head.head === "Bitcoin")
    val lastCoin = cleaned.tail(1).head.getString(0)
    assert(prof.tailRows.last.head === lastCoin)
  }

  test("HTML report renders all sections") {
    val html = HtmlReport.render("test report", prof)
    Seq("Overview", "Variables", "Correlations (Pearson)",
        "Correlations (Spearman)", "current_price",
        "coin", "Duplicate rows", "Missing value patterns",
        "First rows", "Last rows", "Bitcoin").foreach { s =>
      assert(html.contains(s), s"missing section: $s")
    }
    assert(!html.contains("<script"), "report should be static")
  }

  test("top-k sketch path equals the exact path where heavy hitters exist") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    // real low-cardinality skew: every value fits in capacity, no eviction
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    assert(Profiler.topKSketch(docs, "source", 10) ===
      Profiler.topKExact(docs, "source", 10))
    // high-cardinality skew: ~16k unique cold values (count 1) + 10 hot
    // values at ~400 each. Per 4-partition split each hot value's
    // in-partition count (~100) far exceeds rows/capacity (~20), so the
    // Space-Saving bound guarantees all ten surface as candidates and
    // the exact recount ranks them identically to the full groupBy.
    val skewed = spark.range(20000)
      .select(when(col("id") % 5 === 0,
          concat(lit("hot"), org.apache.spark.sql.functions.expr("(id div 5) % 10")))
        .otherwise(concat(lit("cold"), col("id"))).as("v"))
      .repartition(4)
    val exact = Profiler.topKExact(skewed, "v", 10)
    assert(exact.forall(_._2 === 400L), "expected the 10 hot values on top")
    assert(Profiler.topKSketch(skewed, "v", 10) === exact,
      "sketch top-k diverged from exact on skewed high-cardinality data")
  }

  test("valve: high-cardinality columns take the sketch path above threshold, exact below") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val strCols = docs.schema.fields
      .count(_.dataType == org.apache.spark.sql.types.StringType)
    assert(strCols > 0)
    val before = Profiler.sketchTopKRuns.get()
    try {
      // threshold 0: every string column's distinct count exceeds it
      spark.conf.set(Profiler.TopkSketchThresholdKey, "0")
      val p1 = Profiler.profile(docs, withSpearman = false)
      assert(Profiler.sketchTopKRuns.get() === before + strCols,
        "every string column must take the sketch path at threshold 0")
      // threshold -1: valve disarmed, exact path only
      spark.conf.set(Profiler.TopkSketchThresholdKey, "-1")
      val p2 = Profiler.profile(docs, withSpearman = false)
      assert(Profiler.sketchTopKRuns.get() === before + strCols,
        "disarmed valve must never sketch")
      // the two paths agree wherever frequency carries signal; on the
      // all-unique text column only the (exact) counts are comparable —
      // count-1 tie-breaking is outside any frequency sketch's contract
      val t1 = p1.strings.map(s => s.name -> s.topValues).toMap
      val t2 = p2.strings.map(s => s.name -> s.topValues).toMap
      assert(t1.keySet === t2.keySet)
      t1.keySet.foreach { k =>
        if (k == "text") assert(t1(k).map(_._2) === t2(k).map(_._2))
        else assert(t1(k) === t2(k), s"paths diverged on '$k'")
      }
    } finally spark.conf.unset(Profiler.TopkSketchThresholdKey)
  }

  test("native one-pass top-k: parity with the two-phase path, exact and skewed") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val skewed = spark.range(20000)
      .select(when(col("id") % 5 === 0,
          concat(lit("hot"), org.apache.spark.sql.functions.expr("(id div 5) % 10")))
        .otherwise(concat(lit("cold"), col("id"))).as("v"))
      .repartition(4)
    assert(Profiler.topKNative(docs, "source", 10) ===
      Profiler.topKTwoPhase(docs, "source", 10))
    assert(Profiler.topKNative(docs, "source", 10) ===
      Profiler.topKExact(docs, "source", 10))
    assert(Profiler.topKNative(skewed, "v", 10) ===
      Profiler.topKExact(skewed, "v", 10),
      "native top-k diverged from exact on skewed high-cardinality data")
  }

  test("native top-k self-certification: one pass when nothing churned, recount only when it did") {
    import org.apache.spark.sql.functions.{col, concat, lit, when}
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val runs0 = Profiler.nativeTopKRuns.get()
    val rec0 = Profiler.nativeRecountRuns.get()
    // low-cardinality column: every value tracked, floor 0 — certified,
    // NO recount job
    Profiler.topKNative(docs, "source", 10)
    assert(Profiler.nativeTopKRuns.get() === runs0 + 1)
    assert(Profiler.nativeRecountRuns.get() === rec0,
      "certified result must not schedule a recount")
    // cardinality far beyond capacity: evictions happen, floor > 0 —
    // certificate fails, recount runs (and still lands exact: see the
    // parity test)
    val churny = spark.range(20000)
      .select(when(col("id") % 5 === 0,
          concat(lit("hot"), org.apache.spark.sql.functions.expr("(id div 5) % 10")))
        .otherwise(concat(lit("cold"), col("id"))).as("v"))
      .repartition(4)
    Profiler.topKNative(churny, "v", 10)
    assert(Profiler.nativeRecountRuns.get() === rec0 + 1,
      "churned summary must fail certification and recount")
  }

  test("native top-k plan shape: a single ObjectHashAggregate, no mapPartitions stage") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val agg = docs.filter(col("source").isNotNull)
      .agg(graft.catalyst.native.spaceSavingTopK(col("source"), 10, 256).as("ss"))
    val plan = agg.queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"),
      s"expected the TypedImperativeAggregate's ObjectHashAggregate, got:\n$plan")
    assert(plan.contains("partial_space_saving_topk"),
      "expected a map-side partial aggregation (per-partition summaries)")
    assert(!plan.contains("MapPartitions"),
      "the native path must not fall back to a mapPartitions stage")
  }
}
