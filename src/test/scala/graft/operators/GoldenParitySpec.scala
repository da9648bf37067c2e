package graft.operators

import graft.TestSpark
import graft.io.CryptoCsv
import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Golden-file parity (SURVEY.md §5.2.1): run the engine on the raw
  * reference CSV and compare value-by-value (1e-9 tolerance on doubles)
  * against the reference's shipped golden outputs. Row order must match
  * input order (SURVEY.md §1.1 — order is the ranking carrier). */
class GoldenParitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ref = "/root/reference"

  private def assertRowsMatch(got: Array[Row], want: Array[Row],
                              cols: Seq[String]): Unit = {
    assert(got.length === want.length, "row count")
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      cols.indices.foreach { j =>
        val (gv, wv) = (g.get(j), w.get(j))
        (gv, wv) match {
          case (a: Double, b: Double) =>
            assert(math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b)),
              s"row $i col ${cols(j)}: $a != $b")
          case _ =>
            assert(gv === wv, s"row $i col ${cols(j)}: $gv != $wv")
        }
      }
    }
  }

  test("historical clean (colab order) reproduces the golden CSV exactly") {
    val raw = CryptoCsv.readRaw(spark, s"$ref/CryptocurrencyData.csv")
    val got = CleanHistorical(raw).collect()
    val want = CryptoCsv.readGoldenClean(spark,
      s"$ref/cleaned_cryptocurrency_data_final.csv").collect()
    assertRowsMatch(got, want, CryptoCsv.cleanSchema.fieldNames.toSeq)
    assert(got.count(_.getBoolean(11)) === 861, "golden outlier count")
  }

  test("golden parity survives a shuffled multi-partition read via RowOrder") {
    // the at-scale path (SURVEY §7.4.2): stamp _row_id on the ordered
    // read, shuffle the rows across partitions (what a cluster read +
    // AQE will do), clean, then restore order at the output edge —
    // byte-for-byte the same golden rows in the same golden order
    val raw = graft.io.RowOrder.stamp(
      CryptoCsv.readRaw(spark, s"$ref/CryptocurrencyData.csv"))
      .repartition(8) // round-robin shuffle: destroys physical order
    val cleaned = CleanHistorical(raw)
    assert(graft.io.RowOrder.isStamped(cleaned), "stamp must survive the pipeline")
    val got = graft.io.RowOrder.restore(cleaned).collect()
    val want = CryptoCsv.readGoldenClean(spark,
      s"$ref/cleaned_cryptocurrency_data_final.csv").collect()
    assertRowsMatch(got, want, CryptoCsv.cleanSchema.fieldNames.toSeq)
  }

  test("airflow ordering diverges to 2,094 outliers (SURVEY §2.6.1)") {
    val raw = CryptoCsv.readRaw(spark, s"$ref/CryptocurrencyData.csv")
    val flagged = CleanHistorical(raw, CleanHistorical.AirflowOrder).collect()
    assert(flagged.count(_.getBoolean(11)) === 2094)
  }

  test("API classification reproduces golden tendencia labels") {
    val fixture = CryptoCsv.readApiFixture(spark,
      s"$ref/api_cryptocurrency_data_final.csv", withGolden = true)
    val got = ClassifyApi(fixture.drop("tendencia")).collect()
    val want = fixture.collect()
    assert(got.length === 100)
    got.zip(want).zipWithIndex.foreach { case ((g, w), i) =>
      assert(g.getString(g.length - 1) === w.getString(w.length - 1),
        s"row $i (${w.getString(0)})")
    }
  }
}
