package graft

import graft.functions.Classify
import graft.io.{CoinGecko, CryptoCsv, Publish}
import graft.operators.{ClassifyApi, CleanHistorical}
import graft.profile.{HtmlReport, Profiler}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** §2.5 orchestrator: the reference DAG `[t1, t2] >> t3 >> [t4, t5]`
  * (crypto_etl_pipeline.py:367-392) re-expressed as lazy DataFrame
  * stages. Where the reference materializes every task boundary to CSV
  * (P33-35), stages here hand off in-memory Catalyst plans; the
  * `materialize` flag restores file handoffs for parity debugging.
  *
  * Scheduling (the 6-hour cron, P370) stays external — the engine
  * exposes one `run` per invocation.
  */
object Pipeline {

  case class Config(
      rawCsvPath: String,
      apiFixturePath: Option[String], // None → live CoinGecko fetch
      outDir: String,
      order: CleanHistorical.FillOrder = CleanHistorical.ColabOrder,
      labels: Classify.TrendLabels = Classify.ColabLabels,
      approxQuantiles: Boolean = false,
      materialize: Boolean = true,
      publish: Boolean = true,
      reports: Boolean = true,
      /** Multi-partition processing with the explicit row-order contract
        * (SURVEY §7.4.2): stamp `_row_id` on the ordered read, spread the
        * work across `scalePartitions`, restore order at the output edge.
        * Same golden output as parity mode (PipelineSpec). */
      atScale: Boolean = false,
      scalePartitions: Int = 8)

  case class Result(
      cleaned: DataFrame, classified: DataFrame,
      published: Seq[Publish.PublishedFile], reportPaths: Seq[String])

  def run(spark: SparkSession, cfg: Config): Result = {
    // t1: ingest API data (fixture mode in zero-egress environments)
    val api = cfg.apiFixturePath match {
      case Some(p) => CryptoCsv.readApiFixture(spark, p)
      case None => CoinGecko.ingest(spark)
    }
    // t2: clean historical data (independent of t1 — two lazy plans)
    val cleaned = if (cfg.atScale) {
      val stamped = graft.io.RowOrder.stamp(CryptoCsv.readRaw(spark, cfg.rawCsvPath))
        .repartition(cfg.scalePartitions)
      graft.io.RowOrder.restore(
        CleanHistorical(stamped, cfg.order, cfg.approxQuantiles))
    } else CleanHistorical(
      CryptoCsv.readRaw(spark, cfg.rawCsvPath), cfg.order, cfg.approxQuantiles)
    // t3: classify API data (depends on t1)
    val classified = ClassifyApi(api, labels = cfg.labels)

    val cleanedOut = s"${cfg.outDir}/cleaned_cryptocurrency_data"
    val classifiedOut = s"${cfg.outDir}/api_cryptocurrency_data"
    if (cfg.materialize || cfg.publish) {
      CryptoCsv.write(cleaned, cleanedOut)
      CryptoCsv.write(classified, classifiedOut)
    }

    // t4: profiling reports (full over API data, minimal-ish over
    // historical — reference P261-287, implemented per the working
    // colab variant, SURVEY §2.1 note on the BASE_PATH bug)
    val reportPaths = if (cfg.reports) {
      val apiReport = s"${cfg.outDir}/cryptos_api_report.html"
      val histReport = s"${cfg.outDir}/cryptos_kaggle_report.html"
      HtmlReport.toFile("Cryptos API report",
        Profiler.profile(classified), apiReport)
      HtmlReport.toFile("Cryptos historical report",
        Profiler.profile(cleaned, approxQuantiles = cfg.approxQuantiles), histReport)
      Seq(apiReport, histReport)
    } else Seq.empty

    // t5: publish with timestamped names (depends on t3's output)
    val published = if (cfg.publish) {
      val ts = Publish.timestampSuffix()
      Seq(
        Publish.publishCsv(spark, cleanedOut, s"${cfg.outDir}/published",
          "cleaned_cryptocurrency_data_final", ts),
        Publish.publishCsv(spark, classifiedOut, s"${cfg.outDir}/published",
          "api_cryptocurrency_data_final", ts))
    } else Seq.empty

    Result(cleaned, classified, published, reportPaths)
  }
}
