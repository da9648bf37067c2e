package graft.tools

import graft.GraftSession
import graft.io.{ArtifactStore, Tables}

/** JOBS-SCALE rehearsal of the consumption ledger (r15 verdict item
  * 5): [[ArtifactStore.ConsumptionStore.record]] rewrites the WHOLE
  * manifest per job — read prior + union + distinct + one revisioned
  * overwrite. The rows are tiny (O(jobs × epochs) job rows + O(epochs)
  * member/cert rows), but the ledger is the store designed to live for
  * years and nothing had measured the per-record cost as the manifest
  * grows past a handful of jobs. This main drives 100+ records against
  * a dozens-of-epochs export and prints the per-record wall-clock
  * curve (per-decile means) plus the manifest's final row count and
  * byte size — the receipt NOTES_r16 quotes. A flat curve certifies
  * the rewrite is Spark-overhead-bound (constant per record); a
  * superlinear curve would demand splitting the append-heavy
  * certrow/member index from the hot jobrow tail.
  *
  * Usage: runMain graft.tools.LedgerRehearsal <sfDir> <outRoot>
  *        [nEpochs=24] [nJobs=120]
  */
object LedgerRehearsal {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: LedgerRehearsal <sfDir> <outRoot> [nEpochs] [nJobs]")
    val (sfDir, outRoot) = (args(0), args(1))
    val nEpochs = if (args.length > 2) args(2).toInt else 24
    val nJobs = if (args.length > 3) args(3).toInt else 120
    val spark = GraftSession.local(appName = "graft-ledger-rehearsal")
    import org.apache.spark.sql.functions._

    val docs = Tables.load(spark, sfDir, "documents").localCheckpoint()
    val ms = graft.operators.Bpe.merges(docs)
    val ex = ArtifactStore.packedExport(spark, outRoot, "lr_ex")
    // one epoch per doc_id residue class — dozens of epochs, each a
    // realistic tick-sized pack
    (1 to nEpochs).foreach { t =>
      ex.appendDocsAt(t,
        docs.filter(pmod(col("doc_id"), lit(nEpochs)) === (t - 1)), ms)
    }
    ex.seal(docs.select("doc_id", "source"),
      docs.select("doc_id").limit(0), minFillMicro = 0L,
      mixTolMicros = 1000000L)
    val cs = ArtifactStore.consumption(spark, outRoot, "lr_ex")

    val secs = (1 to nJobs).map { j =>
      val t0 = System.nanoTime()
      cs.record(f"job_$j%04d", ex)
      val s = (System.nanoTime() - t0) / 1e9
      if (j % 10 == 0) println(f"  job $j%4d: $s%.3f s")
      s
    }
    val decile = secs.grouped(math.max(1, nJobs / 10)).map(g =>
      BigDecimal(g.sum / g.size).setScale(3,
        BigDecimal.RoundingMode.HALF_UP).toDouble).toSeq
    val mdir = new org.apache.hadoop.fs.Path(
      s"$outRoot/consumption/lr_ex/manifest_v")
    val f = mdir.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifestBytes = f.getContentSummary(mdir).getLength
    println(
      s"""{"rehearsal":"ledger_jobs_scale","n_epochs":$nEpochs,""" +
      s""""n_jobs":$nJobs,"per_record_decile_secs":[${decile.mkString(",")}],""" +
      s""""first10_mean":${BigDecimal(secs.take(10).sum / 10)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""last10_mean":${BigDecimal(secs.takeRight(10).sum / 10)
        .setScale(3, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""total_secs":${BigDecimal(secs.sum)
        .setScale(1, BigDecimal.RoundingMode.HALF_UP)},""" +
      s""""manifest_bytes":$manifestBytes,""" +
      s""""job_rows":${cs.jobs().count()}}""")
    spark.stop()
  }
}
