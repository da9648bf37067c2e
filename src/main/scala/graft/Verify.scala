package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    // Canonical session (extensions on): verify gates the engine exactly
    // as shipped. ApproxAboveThreshold stays exact below its 1 GiB
    // threshold, so every oracle comparison at sf0.01/sf0.1/sf1 is
    // unaffected by the rewrite.
    val spark = GraftSession.local(cpus = cpus, shufflePartitions = cpus,
      appName = "graft-verify")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated filter (SPARK_GRAFT_QUERIES), same
    // contract as Bench: targeted re-checks during development. Driver
    // runs leave it unset and dump everything.
    val filter = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    SparkEntry.queries
      .filter { case (name, _) => filter.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (name, _) => filter.forall(_.contains(name)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    // Filtered dev runs must not clobber the canonical full dump the
    // driver compares against (same clobber class Bench fixed with
    // BENCH_partial.json) — a targeted re-check would otherwise shrink
    // oracle_sql.json to its subset and zero every other query's check.
    val jsonName =
      if (filter.isDefined) "oracle_sql_partial.json" else "oracle_sql.json"
    Files.writeString(Paths.get(s"$outDir/$jsonName"), json)
    spark.stop()
  }
}
