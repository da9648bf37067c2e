package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Random-hyperplane LSH (Charikar, STOC 2002 — "Similarity estimation
  * techniques from rounding algorithms") over the `embeddings` table:
  * the TRAINING-FREE sublinear near-dup path for vectors, next to the
  * learned IVF bucketing of q54.
  *
  * Why both exist: IVF needs a trained coarse quantizer (k-means over a
  * sample) and buckets by nearest centroid — best recall per probe when
  * the data is clusterable and the centroids are fresh. RP-LSH needs no
  * training at all: `nTables · bits` fixed random hyperplanes split the
  * sphere; a vector's b-bit sign pattern per table is its bucket. Under
  * distribution drift (a new crawl snapshot, a new embedding model) the
  * hyperplanes stay valid while centroids go stale — which is why
  * streaming/incremental dedup pipelines default to LSH and batch
  * pipelines to IVF. Collision probability per table for angle θ is
  * (1 − θ/π)^bits, so high-similarity pairs collide with near-certainty
  * in at least one of the OR-ed tables while random pairs (θ ≈ π/2)
  * collide at ~2^-bits — the same AND/OR band construction as the text
  * MinHash-LSH in q27.
  *
  * Scale shape (the point of the operator): candidates come from an
  * EQUI-join on (table, code) — hash-partitioned both sides, no
  * BroadcastNestedLoopJoin, no all-pairs anything. The big shuffle moves
  * (vec_id, tbl, code) = 3 longs per vector per table, never the
  * vectors; only the verified candidate pairs rejoin the vector table
  * for the exact cosine rerank (q34's kernel). Expected per-bucket
  * occupancy at N vectors is N/2^bits per table, so per-table pair work
  * is N²/2^bits — bits is the knob that trades candidate recall against
  * join fan-out, tuned per deployment exactly like q27's band count.
  *
  * Engine-portable randomness: hyperplane component (p, d) derives from
  * the shared md5-60bit hash of "p-d", mapped to [−1, 1] — deterministic
  * and identical in DuckDB, so the oracle re-derives the same planes,
  * the same sign bits, and the same buckets. A sign-symmetric component
  * distribution is all the Charikar bound needs; uniform [−1, 1] is
  * sign-symmetric. The sign test compares the same sequential double
  * fold in both engines (DotProductExpr ≡ list_dot_product), so the
  * bit is exact, not approximately, portable.
  */
object RpLsh {

  private def dot(a: Column, b: Column): Column =
    graft.catalyst.native.dotProduct(a, b)
  private def norm2(a: Column): Column = dot(a, a)

  /** Hyperplane components in [-1, 1]: md5-60bit("p-d") % 2000001 maps
    * to {0..2e6}, /1e6 - 1 centers it. Integer-exact until the final
    * divide, which is the same IEEE op in both engines. */
  private def planeComponentSql(p: String, d: String): String =
    s"(CAST(conv(substring(md5(concat($p, '-', $d)), 1, 15), 16, 10) AS BIGINT)" +
      s" % 2000001) / 1000000.0D - 1.0D"

  /** (tbl, code) LSH signature rows for every vector: `nTables` rows of
    * (vec_id, tbl, code) where code packs `bits` sign bits. One
    * broadcast of the (nTables·bits)-row plane table, one narrow scan,
    * one partial-aggregating groupBy — no shuffle carries a vector. */
  def signatures(embeddings: DataFrame, nTables: Int, bits: Int,
                 dim: Int): DataFrame = {
    val spark = embeddings.sparkSession
    val planes = spark.range((nTables * bits).toLong).select(
      col("id").cast("int").as("p"),
      expr(s"transform(sequence(0, ${dim - 1}), " +
        s"d -> ${planeComponentSql("id", "d")})").as("pv"))
    embeddings.select(col("vec_id"), col("embedding").as("ed"))
      .join(broadcast(planes))
      .select(col("vec_id"), col("p"),
        floor(col("p") / bits).cast("int").as("tbl"),
        dot(col("ed"), col("pv")).as("_dot"))
      .select(col("vec_id"), col("tbl"),
        expr(s"CASE WHEN _dot >= 0D THEN shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(p % $bits AS INT)) ELSE CAST(0 AS BIGINT) END").as("bit"))
      .groupBy("vec_id", "tbl")
      .agg(sum("bit").as("code"))
  }

  /** Bucket-occupancy diagnostics for tuning `bits`: (max bucket size,
    * total candidate pairs Σ k·(k−1)/2 across buckets). Eager — one
    * action — and logged, mirroring [[TextOps.droppedShingleStats]]:
    * a deployment checks occupancy BEFORE launching the verify join
    * and widens `bits` (target ≈ log₂N per table) when the projected
    * pair count crosses its budget, instead of discovering a hot
    * bucket as a straggler task at hour three. */
  def bucketStats(embeddings: DataFrame, nTables: Int = 4, bits: Int = 8,
                  dim: Int = 64): (Long, Long) = {
    val r = signatures(embeddings, nTables, bits, dim)
      .groupBy("tbl", "code").agg(count(lit(1)).as("k"))
      .agg(coalesce(max("k"), lit(0L)).as("max_bucket"),
        // integer div: `/` on longs is double division — inexact past 2^53
        coalesce(sum(expr("(k * (k - 1)) div 2")), lit(0L))
          .cast("long").as("n_cand_pairs"))
      .head()
    val stats = (r.getLong(0), r.getLong(1))
    org.slf4j.LoggerFactory.getLogger(getClass)
      .info(s"rp-lsh ${nTables}x${bits}bit: max bucket ${stats._1}, " +
            s"candidate pairs ${stats._2} (pre-dedup across tables)")
    stats
  }

  /** q72: RP-LSH near-duplicate pairs — bucket-collision candidates
    * (OR over tables, deduplicated), then the exact cosine verify with
    * the threshold inside the join output filter. Same output contract
    * as q34/q54 (ida < idb, rounded sim), so the three near-dup paths
    * are directly comparable. */
  def q72RplshDedup(embeddings: DataFrame, nTables: Int = 4, bits: Int = 8,
                    threshold: Double = 0.4, dim: Int = 64): DataFrame = {
    val sig = signatures(embeddings, nTables, bits, dim)
    val cand = sig.as("a")
      .join(sig.as("b"),
        col("a.tbl") === col("b.tbl") && col("a.code") === col("b.code") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"))
      .distinct()
    val n = embeddings.select(col("vec_id"), col("embedding").as("ed"))
      .withColumn("nrm", sqrt(norm2(col("ed"))))
    val sim = round(dot(col("na.ed"), col("nb.ed")) / (col("na.nrm") * col("nb.nrm")), 6)
    cand
      .join(n.as("na"), col("ida") === col("na.vec_id"))
      .join(n.as("nb"), col("idb") === col("nb.vec_id"))
      .filter(sim >= threshold)
      .select(col("ida"), col("idb"), sim.as("sim"))
      .orderBy("ida", "idb")
  }

  def q72Sql(nTables: Int = 4, bits: Int = 8, threshold: Double = 0.4,
             dim: Int = 64): String = {
    // Explicit ::DOUBLE pins the oracle to IEEE double division/subtract,
    // matching Spark's `1000000.0D` literals — without it DuckDB would be
    // free to run DECIMAL arithmetic here, and a future change to its
    // decimal→double promotion could flip the sign bit of a near-zero
    // plane component on the oracle side only.
    val comp = s"(CAST(concat('0x', substr(md5(p || '-' || d), 1, 15)) AS BIGINT)" +
      s" % 2000001) / 1000000.0::DOUBLE - 1.0::DOUBLE"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |planes AS (SELECT p,
       |             [$comp FOR d IN range(0, $dim)] AS pv
       |           FROM range(0, ${nTables * bits}) t(p)),
       |sig AS (SELECT e.vec_id, CAST(pl.p // $bits AS INT) AS tbl,
       |          CAST(sum(CASE WHEN list_dot_product(e.ed, pl.pv) >= 0
       |                        THEN 1 << CAST(pl.p % $bits AS INT)
       |                        ELSE 0 END) AS BIGINT) AS code
       |        FROM e, planes pl GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
       |         FROM sig a JOIN sig b
       |           ON a.tbl = b.tbl AND a.code = b.code AND a.vec_id < b.vec_id),
       |n AS (SELECT vec_id, ed, sqrt(list_dot_product(ed, ed)) AS nrm FROM e)
       |SELECT c.ida, c.idb,
       |  round(list_dot_product(na.ed, nb.ed) / (na.nrm * nb.nrm), 6) AS sim
       |FROM cand c
       |JOIN n na ON c.ida = na.vec_id
       |JOIN n nb ON c.idb = nb.vec_id
       |WHERE round(list_dot_product(na.ed, nb.ed) / (na.nrm * nb.nrm), 6) >= $threshold
       |ORDER BY ida, idb""".stripMargin
  }
}
