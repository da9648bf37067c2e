package graft

import graft.operators.CleanHistorical
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** End-to-end DAG run in fixture mode against the reference data:
  * t1 (fixture ingest) ∥ t2 (clean) → t3 (classify) → t4 (reports) ∥
  * t5 (publish), then checks outputs, report files, and publish
  * naming — the full S1–S5 surface in one pass. */
class PipelineSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val ref = "/root/reference"

  test("full pipeline run produces outputs, reports, and published files") {
    val out = Files.createTempDirectory("graft-pipeline").toString
    val result = Pipeline.run(spark, Pipeline.Config(
      rawCsvPath = s"$ref/CryptocurrencyData.csv",
      apiFixturePath = Some(s"$ref/api_cryptocurrency_data_final.csv"),
      outDir = out))

    assert(result.cleaned.count() === 4150)
    assert(result.classified.count() === 100)
    assert(result.classified.columns.contains("tendencia"))

    // t4: both reports exist and are non-trivial HTML
    assert(result.reportPaths.size === 2)
    result.reportPaths.foreach { p =>
      val html = Files.readString(Paths.get(p))
      assert(html.startsWith("<!DOCTYPE html"))
      assert(html.length > 5000, s"$p suspiciously small")
    }

    // t5: timestamped copies with engine-verified stats
    assert(result.published.size === 2)
    result.published.foreach { f =>
      assert(Files.exists(Paths.get(f.target)))
      assert(f.target.matches(""".*_\d{8}_\d{6}\.csv"""), f.target)
      assert(f.bytes > 0)
    }
    val cleanedPub = result.published.head
    assert(cleanedPub.rows === 4150 && cleanedPub.cols === 12)

    // outputs land only under outDir
    val stray = Files.list(Paths.get(out)).iterator().asScala.map(_.getFileName.toString).toSet
    assert(stray.contains("published"))
  }

  test("airflow-order config flag flows through the pipeline") {
    val out = Files.createTempDirectory("graft-pipeline2").toString
    val result = Pipeline.run(spark, Pipeline.Config(
      rawCsvPath = s"$ref/CryptocurrencyData.csv",
      apiFixturePath = Some(s"$ref/api_cryptocurrency_data_final.csv"),
      outDir = out,
      order = CleanHistorical.AirflowOrder,
      reports = false, publish = false, materialize = false))
    val outliers = result.cleaned.filter("is_outlier").count()
    assert(outliers === 2094) // SURVEY §2.6.1 divergence pinned
  }

  test("atScale mode (stamp → repartition → restore) equals parity output") {
    val out = Files.createTempDirectory("graft-pipeline3").toString
    val cfg = Pipeline.Config(
      rawCsvPath = s"$ref/CryptocurrencyData.csv",
      apiFixturePath = Some(s"$ref/api_cryptocurrency_data_final.csv"),
      outDir = out, reports = false, publish = false, materialize = false)
    val parity = Pipeline.run(spark, cfg).cleaned.collect()
    val scaled = Pipeline.run(spark, cfg.copy(atScale = true)).cleaned.collect()
    assert(scaled.length === parity.length)
    assert(scaled.head.schema.fieldNames.toSeq === parity.head.schema.fieldNames.toSeq,
      "no _row_id may leak into the output")
    scaled.zip(parity).zipWithIndex.foreach { case ((s, p), i) =>
      assert(s === p, s"row $i differs between atScale and parity mode")
    }
  }

  test("missing pipeline output fails publish loudly (reference P305-313)") {
    intercept[java.io.FileNotFoundException] {
      graft.io.Publish.publishCsv(spark, "/nonexistent/file.csv",
        Files.createTempDirectory("graft-pub").toString, "x")
    }
  }
}
