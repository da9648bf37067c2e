package graft.functions

import graft.TestSpark
import graft.operators.CleanHistorical
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property-based suites (SURVEY §5.2.3) via scalacheck generators.
  * Each property evaluates one batched DataFrame pass over generated
  * inputs — not one job per case — so the whole suite stays fast. */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def parseAll(inputs: Seq[String]): Seq[Option[Long]] = {
    import spark.implicits._
    inputs.toDF("v").select(Parsers.parseMagnitude(col("v")).as("r"))
      .collect().toSeq.map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
  }

  test("magnitude parser: round-trips plain, comma'd, and suffixed numbers") {
    val ns = Gen.listOfN(60, Gen.chooseNum(0L, 8000000000L)).sample.get
    val plain = ns.map(_.toString)
    val commas = ns.map(n => f"$n%,d") // "1,234,567"
    val millions = ns.map(n => s"${n % 100000} Million")
    val got = parseAll(plain ++ commas ++ millions)
    val want = ns.map(n => Some(n)) ++ ns.map(n => Some(n)) ++
      ns.map(n => Some((n % 100000) * 1000000L))
    assert(got === want)
  }

  test("magnitude parser: junk and unhandled suffixes are null") {
    val junkGen = Gen.oneOf(
      Gen.alphaStr.map(_ + "x"),                     // non-numeric
      Gen.chooseNum(0L, 999999L).map(n => s"$n Thousand"), // reference quirk
      Gen.const("-"), Gen.const(""), Gen.const("NaN Billion%"))
    val junk = Gen.listOfN(50, junkGen).sample.get
    assert(parseAll(junk).forall(_.isEmpty))
  }

  test("classifier: total over ℝ∪null, labels partition by threshold order") {
    import spark.implicits._
    val pcts = Gen.listOfN(200, Gen.chooseNum(-50.0, 50.0)).sample.get
    val rows = pcts.toDF("pct")
      .select(col("pct"), Classify.classifyTrend(col("pct")).as("label"))
      .collect()
    rows.foreach { r =>
      val (p, l) = (r.getDouble(0), r.getString(1))
      val expected =
        if (p >= 5.0) "Tendencia fuerte alcista"
        else if (p > 1.0) "Tendencia moderada alcista"
        else if (p <= -5.0) "Tendencia fuerte bajista"
        else if (p < -1.0) "Tendencia moderada bajista"
        else "Tendencia estable"
      assert(l === expected, s"pct=$p")
    }
    // monotone label transition count: sorted pcts cross ≤ 4 boundaries
    val sortedLabels = rows.sortBy(_.getDouble(0)).map(_.getString(1))
    val transitions = sortedLabels.zip(sortedLabels.tail).count { case (a, b) => a != b }
    assert(transitions <= 4)
  }

  test("imputation is idempotent: fill twice = fill once") {
    import spark.implicits._
    val vals: Seq[Option[Double]] =
      Gen.listOfN(300, Gen.option(Gen.chooseNum(-100.0, 100.0))).sample.get
    val df = vals.toDF("current_price")
    val fills = CleanHistorical.medians(df, Seq("current_price"))
    val once = CleanHistorical.fillWith(df, fills)
    val twice = CleanHistorical.fillWith(once,
      CleanHistorical.medians(once, Seq("current_price")))
    assert(once.collect().map(_.toString).sorted ===
      twice.collect().map(_.toString).sorted)
    assert(once.filter(col("current_price").isNull).count() ===
      (if (vals.forall(_.isEmpty)) vals.size.toLong else 0L))
  }

  test("bucketed avgRanks equals brute-force average ranks on random multisets") {
    import spark.implicits._
    // heavy ties + skew + negatives: the shapes that break rank code
    val gens = Seq(
      Gen.listOfN(400, Gen.chooseNum(0, 8).map(_.toDouble)),        // 9 values, huge ties
      Gen.listOfN(400, Gen.chooseNum(-1e6, 1e6)),                    // near-unique
      Gen.listOfN(400, Gen.oneOf(Gen.const(0.0), Gen.chooseNum(0.0, 1e-3))), // skewed at 0
      Gen.listOfN(3, Gen.chooseNum(-5.0, 5.0)))                      // < bucket count
    gens.zipWithIndex.foreach { case (g, gi) =>
      val vals = g.sample.get
      val df = vals.toDF("v0")
      val got = graft.operators.RankStats.avgRanks(df, "v0").collect()
        .map(r => r.getDouble(0) -> r.getDouble(1)).toMap
      // brute force: average rank of each distinct value (1-based,
      // pandas rank(method="average") convention)
      val sorted = vals.sorted
      val want = vals.distinct.map { v =>
        val first = sorted.indexOf(v) + 1
        val last = sorted.lastIndexOf(v) + 1
        v -> (first + last) / 2.0
      }.toMap
      assert(got.keySet === want.keySet, s"gen $gi distinct values")
      want.foreach { case (v, r) =>
        assert(math.abs(got(v) - r) < 1e-9, s"gen $gi value $v: got ${got(v)} want $r")
      }
    }
  }

  test("outlier flag is invariant under row permutation") {
    import spark.implicits._
    val vals = Gen.listOfN(500, Gen.chooseNum(0.0, 1000.0)).sample.get
      .zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = vals.toDF("id", "current_price")
    val shuffled = vals.reverse.sortBy(_._1.hashCode()).toDF("id", "current_price")
    def flags(d: org.apache.spark.sql.DataFrame) =
      CleanHistorical.withOutlierFlag(d, nullIsOutlier = false)
        .select("id", "is_outlier").collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(flags(df) === flags(shuffled))
  }
}
