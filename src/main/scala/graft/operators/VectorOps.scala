package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (64-dim float vectors).
  *
  * Brute-force cosine top-k is the exact baseline: broadcast the query
  * set, stream the corpus once, per-partition top-k heaps via window
  * rank. All arithmetic is a sequential float64 fold (zip_with +
  * aggregate), which is bit-identical to DuckDB's list_cosine_similarity
  * loop — verified, so the oracle compares on exact doubles (rounded to
  * 6 only to absorb any future engine drift).
  *
  * The 100 TB path is IVF/LSH bucketing (restrict candidates to a
  * cluster/bucket before the exact rerank) — the exact kernel here is
  * the rerank primitive either way.
  */
object VectorOps {

  /** Fused codegen'd dot product ([[graft.catalyst.DotProductExpr]]):
    * the same sequential double fold as the declarative
    * `aggregate(zip_with(...))` form — float elements widen exactly —
    * but one loop per pair, inside whole-stage codegen. */
  private def dot(a: Column, b: Column): Column =
    graft.catalyst.native.dotProduct(a, b)
  private def norm2(a: Column): Column = dot(a, a)

  /** Exact cosine top-k: queries = vec_id < nQueries, k best neighbors
    * each (self excluded), ranked by (rounded sim desc, vec_id). */
  def q24CosineTopk(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").as("ed"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("ed").as("qe"))
    val sim = dot(col("qe"), col("ed")) /
      (sqrt(norm2(col("qe"))) * sqrt(norm2(col("ed"))))
    val pairs = broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), round(sim, 6).as("sim"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  def q24Sql(nQueries: Int = 8, k: Int = 5): String =
    s"""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qe
       |           FROM embeddings WHERE vec_id < $nQueries),
       |s AS (SELECT qid, vec_id,
       |        round(list_cosine_similarity(qe, embedding::DOUBLE[]), 6) AS sim
       |      FROM q, embeddings WHERE vec_id != qid),
       |r AS (SELECT qid, vec_id, sim,
       |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
       |      FROM s)
       |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= $k ORDER BY qid, rn""".stripMargin

  /** Centroid table for the IVF family: `"kmeans"` (default) = the
    * LEARNED coarse quantizer ([[Kmeans]]; broadcast literal, so query
    * plan shapes are unchanged), `"seeded"` = the round-3 first-N
    * placeholder, kept as the comparison baseline q62's recall-lift
    * spec pins against. */
  private def centroidSource(embeddings: DataFrame, e: DataFrame,
                             nCentroids: Int, mode: String): DataFrame = mode match {
    case "kmeans" => Kmeans.centroidTable(embeddings, nCentroids)
    case "seeded" => e.filter(col("vec_id") < nCentroids)
      .select(col("vec_id").as("cid"), col("ed").as("ce"))
    case other => throw new IllegalArgumentException(
      s"centroids must be 'kmeans' or 'seeded', got '$other'")
  }

  /** Ranked IVF assignment: every vector × its `maxRank` nearest
    * centroids (rank 1 = the assignment bucket; ranks 2..p = the extra
    * probe buckets a multi-probe query searches). One broadcast join +
    * a per-vector window — no all-pairs shuffle. */
  private def ivfAssignRanked(embeddings: DataFrame, nCentroids: Int,
                              maxRank: Int, centroids: String): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").as("ed"))
    val cents = centroidSource(embeddings, e, nCentroids, centroids)
    val simToCent = dot(col("ed"), col("ce")) / (sqrt(norm2(col("ed"))) * sqrt(norm2(col("ce"))))
    val wAssign = Window.partitionBy("vec_id")
      .orderBy(desc("csim"), asc("cid"))
    e.join(broadcast(cents))
      .select(col("vec_id"), col("ed"), col("cid"), round(simToCent, 6).as("csim"))
      .withColumn("arn", row_number().over(wAssign))
      .filter(col("arn") <= maxRank)
      .select(col("vec_id"), col("ed"), col("cid"), col("arn"))
  }

  def ivfAssign(embeddings: DataFrame, nCentroids: Int,
                centroids: String = "kmeans"): DataFrame =
    ivfAssignRanked(embeddings, nCentroids, 1, centroids).drop("arn")

  /** q30: IVF ANN search with multi-probe. The corpus is bucketed by its
    * single nearest centroid; a query probes its `nprobe` nearest
    * centroids and reranks exactly inside those buckets only — the
    * standard IVF recall knob (nprobe→nlist degrades to brute force).
    * Work per query is ~nprobe·N/nlist; each candidate appears at most
    * once (corpus vectors live in exactly one bucket), so no dedup pass
    * is needed. */
  def q30IvfTopk(embeddings: DataFrame, nCentroids: Int = 8, k: Int = 3,
                 nprobe: Int = 2, centroids: String = "kmeans"): DataFrame = {
    val assigned = ivfAssign(embeddings, nCentroids, centroids)
    val queries = ivfAssignRanked(embeddings, nCentroids, nprobe, centroids)
      .filter(col("vec_id") >= nCentroids && col("vec_id") < nCentroids + 8)
      .select(col("vec_id").as("qid"), col("ed").as("qe"), col("cid").as("qcid"))
    val sim = dot(col("qe"), col("ed")) / (sqrt(norm2(col("qe"))) * sqrt(norm2(col("ed"))))
    val wRank = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    broadcast(queries)
      .join(assigned, col("cid") === col("qcid") && col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), round(sim, 6).as("sim"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .orderBy("qid", "rn")
  }

  def q30Sql(nCentroids: Int = 8, k: Int = 3, nprobe: Int = 2): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |${Kmeans.sqlCtes(nCentroids)},
       |ranked AS (
       |  SELECT e.vec_id, e.ed, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.ed, c.ce), 6) DESC, c.cid) AS arn
       |  FROM e, c),
       |asg AS (SELECT vec_id, ed, cid FROM ranked WHERE arn = 1),
       |q AS (SELECT vec_id AS qid, ed AS qe, cid AS qcid FROM ranked
       |      WHERE arn <= $nprobe
       |        AND vec_id >= $nCentroids AND vec_id < ${nCentroids + 8}),
       |s AS (SELECT qid, a.vec_id,
       |        round(list_cosine_similarity(qe, a.ed), 6) AS sim
       |      FROM q JOIN asg a ON a.cid = q.qcid AND a.vec_id != q.qid),
       |r AS (SELECT qid, vec_id, sim,
       |        row_number() OVER (PARTITION BY qid ORDER BY sim DESC, vec_id) AS rn
       |      FROM s)
       |SELECT qid, vec_id, sim, rn FROM r WHERE rn <= $k ORDER BY qid, rn""".stripMargin

  /** Ceiling on q34's all-pairs input. ~25k 64-dim vectors ≈ 3·10⁸
    * pairs is where the quadratic stops being interactive on one node;
    * beyond it the caller must either use [[q54BucketedEmbDedup]] (the
    * scale default) or raise the cap deliberately. */
  val DefaultMaxVectors = 25000L

  /** q34: embedding-cosine near-duplicate pairs — the vector-space
    * analogue of q22's text Jaccard: all pairs above a high similarity
    * threshold. Norms are precomputed per vector BEFORE the self-join
    * (N norm computations + N²/2 dot products, instead of 3·N²/2 fold
    * passes); at 100 TB the all-pairs join is replaced by LSH/IVF
    * bucketing (q30) with this as the in-bucket verifier.
    *
    * GUARDED quadratic: this operator is O(N²) by construction (its
    * role is exact ground truth / in-bucket verification), so — like
    * q22's `maxDf` and q45's `maxBlock` — it refuses to run past
    * `maxVectors` rather than silently launching an unbounded all-pairs
    * join. The count is a parquet-metadata-only job; the guard does not
    * change any result below the cap, so the oracle needs no mirror. */
  def q34EmbeddingDedup(embeddings: DataFrame, threshold: Double = 0.4,
                        maxVectors: Long = DefaultMaxVectors): DataFrame = {
    val n = embeddings.count()
    require(n <= maxVectors,
      s"q34EmbeddingDedup is an all-pairs O(N²) verifier: got $n vectors > " +
      s"maxVectors=$maxVectors. Use q54BucketedEmbDedup (IVF equi-join, the " +
      "scale default) or raise maxVectors explicitly to run all-pairs anyway.")
    val e = embeddings.select(col("vec_id"), col("embedding").as("ed"))
      .withColumn("nrm", sqrt(norm2(col("ed"))))
    val sim = round(dot(col("a.ed"), col("b.ed")) / (col("a.nrm") * col("b.nrm")), 6)
    // The threshold lives IN the join condition, not a post-filter: a
    // BroadcastNestedLoopJoin evaluates its condition against the two
    // input rows and only materializes matches — a post-join filter
    // would first copy all N²/2 joined rows (~80 GB at sf0.1) to
    // discard all but the handful of near-dups.
    e.as("a")
      .join(e.as("b"), col("a.vec_id") < col("b.vec_id") && sim >= threshold)
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"), sim.as("sim"))
      .orderBy("ida", "idb")
  }

  def q34Sql(threshold: Double = 0.4): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed,
       |             sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
       |           FROM embeddings)
       |SELECT a.vec_id AS ida, b.vec_id AS idb,
       |  round(list_dot_product(a.ed, b.ed) / (a.nrm * b.nrm), 6) AS sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.ed, b.ed) / (a.nrm * b.nrm), 6) >= $threshold
       |ORDER BY ida, idb""".stripMargin

  /** q54: BUCKETED embedding dedup — the default near-dup path at
    * scale, with q34 demoted to exact in-bucket verifier. Vectors are
    * IVF-assigned to their nearest centroid (q30's coarse quantizer),
    * then the exact cosine verify runs only on same-bucket pairs: the
    * join is an EQUI-join on the cluster id (hash-partitioned both
    * sides, the i<j and threshold predicates ride along as join
    * filters), so no BroadcastNestedLoopJoin / cartesian product ever
    * crosses buckets. Per-bucket work is (N/nlist)² — at a deployment's
    * nlist ≈ √N this is O(N^1.5) total vs q34's O(N²), and each bucket
    * is an independent shuffle partition. The recall tradeoff is the
    * standard IVF one: a pair split across clusters is missed (q34
    * remains the exact baseline / in-bucket verifier). */
  def q54BucketedEmbDedup(embeddings: DataFrame, nCentroids: Int = 8,
                          threshold: Double = 0.4,
                          centroids: String = "kmeans"): DataFrame = {
    val assigned = ivfAssign(embeddings, nCentroids, centroids)
      .withColumn("nrm", sqrt(norm2(col("ed"))))
    val sim = round(dot(col("a.ed"), col("b.ed")) / (col("a.nrm") * col("b.nrm")), 6)
    assigned.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid")
          && col("a.vec_id") < col("b.vec_id") && sim >= threshold)
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"), sim.as("sim"))
      .orderBy("ida", "idb")
  }

  /** q54's in-bucket pair relation restricted to a survivor id set —
    * the composed-pipeline (q84) embedding-dedup stage. Centroids are
    * trained on the FULL embeddings frame (the artifact shape: one
    * trained quantizer per corpus, applied to any batch), then the
    * semi-join to `ids` happens BEFORE the pair equi-join, so per-bucket
    * work is (survivors/nlist)² — nothing outside the survivor set ever
    * enters the quadratic. `ids` is a one-column (doc_id) frame with
    * vec_id ≡ doc_id (GenData alignment). */
  def bucketedPairsAmong(embeddings: DataFrame, ids: DataFrame,
                         nCentroids: Int = 8, threshold: Double = 0.4,
                         centroids: String = "kmeans"): DataFrame = {
    val assigned = ivfAssign(embeddings, nCentroids, centroids)
      .join(ids.select(col(ids.columns.head).as("vec_id")), Seq("vec_id"), "left_semi")
      .withColumn("nrm", sqrt(norm2(col("ed"))))
    val sim = round(dot(col("a.ed"), col("b.ed")) / (col("a.nrm") * col("b.nrm")), 6)
    assigned.as("a")
      .join(assigned.as("b"),
        col("a.cid") === col("b.cid")
          && col("a.vec_id") < col("b.vec_id") && sim >= threshold)
      .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"), sim.as("sim"))
  }

  def q54Sql(nCentroids: Int = 8, threshold: Double = 0.4): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |${Kmeans.sqlCtes(nCentroids)},
       |asg AS (SELECT vec_id, ed, cid FROM (
       |  SELECT e.vec_id, e.ed, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.ed, c.ce), 6) DESC, c.cid) AS arn
       |  FROM e, c) t WHERE arn = 1),
       |n AS (SELECT vec_id, ed, cid, sqrt(list_dot_product(ed, ed)) AS nrm FROM asg)
       |SELECT a.vec_id AS ida, b.vec_id AS idb,
       |  round(list_dot_product(a.ed, b.ed) / (a.nrm * b.nrm), 6) AS sim
       |FROM n a JOIN n b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |WHERE round(list_dot_product(a.ed, b.ed) / (a.nrm * b.nrm), 6) >= $threshold
       |ORDER BY ida, idb""".stripMargin

  /** q62: ANN quality measurement — recall@k of the IVF path (q30)
    * against brute-force ground truth over the SAME query set, at
    * nprobe=1 AND nprobe=2 side by side: the recall/cost tradeoff every
    * ANN deployment tunes, measured as a query. nprobe=2's candidate
    * set is a superset of nprobe=1's, so recall_p2 ≥ recall_p1 holds
    * structurally (pinned by spec). Deterministic (both rankings use
    * the rounded-sim + vec_id total order), so the oracle re-derives
    * identical recall numbers. Per-query hits let a user see WHICH
    * queries lose neighbors to cluster boundaries, not just the mean. */
  def q62IvfRecall(embeddings: DataFrame, nCentroids: Int = 8, k: Int = 3,
                   centroids: String = "kmeans"): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding").as("ed"))
    val q = e.filter(col("vec_id") >= nCentroids && col("vec_id") < nCentroids + 8)
      .select(col("vec_id").as("qid"), col("ed").as("qe"))
    val sim = dot(col("qe"), col("ed")) /
      (sqrt(norm2(col("qe"))) * sqrt(norm2(col("ed"))))
    val wRank = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    val exact = broadcast(q).join(e, col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id"), round(sim, 6).as("sim"))
      .withColumn("rn", row_number().over(wRank))
      .filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    def approx(nprobe: Int) = q30IvfTopk(embeddings, nCentroids, k, nprobe, centroids)
      .select(col("qid").as(s"aqid$nprobe"), col("vec_id").as(s"avid$nprobe"))
    exact
      .join(approx(1), col("qid") === col("aqid1") && col("vec_id") === col("avid1"),
        "left")
      .join(approx(2), col("qid") === col("aqid2") && col("vec_id") === col("avid2"),
        "left")
      .groupBy("qid")
      .agg(count(col("aqid1")).as("n_hits_p1"), count(col("aqid2")).as("n_hits_p2"))
      .select(col("qid"),
        col("n_hits_p1"), round(col("n_hits_p1").cast("double") / k, 6).as("recall_p1"),
        col("n_hits_p2"), round(col("n_hits_p2").cast("double") / k, 6).as("recall_p2"))
      .orderBy("qid")
  }

  def q62Sql(nCentroids: Int = 8, k: Int = 3): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |${Kmeans.sqlCtes(nCentroids)},
       |q AS (SELECT vec_id AS qid, ed AS qe FROM e
       |      WHERE vec_id >= $nCentroids AND vec_id < ${nCentroids + 8}),
       |exact AS (SELECT qid, vec_id FROM (
       |  SELECT qid, e.vec_id,
       |    row_number() OVER (PARTITION BY qid
       |      ORDER BY round(list_cosine_similarity(qe, e.ed), 6) DESC, e.vec_id) AS rn
       |  FROM q JOIN e ON e.vec_id != q.qid) t WHERE rn <= $k),
       |ranked AS (
       |  SELECT e.vec_id, e.ed, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.ed, c.ce), 6) DESC, c.cid) AS arn
       |  FROM e, c),
       |asg AS (SELECT vec_id, ed, cid FROM ranked WHERE arn = 1),
       |ap AS (SELECT nprobe, qid, vec_id FROM (
       |  SELECT p.nprobe, qa.vec_id AS qid, a.vec_id,
       |    row_number() OVER (PARTITION BY p.nprobe, qa.vec_id
       |      ORDER BY round(list_cosine_similarity(qa.ed, a.ed), 6) DESC, a.vec_id) AS rn
       |  FROM (VALUES (1), (2)) p(nprobe)
       |  JOIN ranked qa ON qa.arn <= p.nprobe
       |    AND qa.vec_id >= $nCentroids AND qa.vec_id < ${nCentroids + 8}
       |  JOIN asg a ON a.cid = qa.cid AND a.vec_id != qa.vec_id) t
       |  WHERE rn <= $k)
       |SELECT x.qid,
       |  count(a1.qid) AS n_hits_p1,
       |  round(cast(count(a1.qid) AS double) / $k, 6) AS recall_p1,
       |  count(a2.qid) AS n_hits_p2,
       |  round(cast(count(a2.qid) AS double) / $k, 6) AS recall_p2
       |FROM exact x
       |LEFT JOIN ap a1 ON a1.nprobe = 1 AND x.qid = a1.qid AND x.vec_id = a1.vec_id
       |LEFT JOIN ap a2 ON a2.nprobe = 2 AND x.qid = a2.qid AND x.vec_id = a2.vec_id
       |GROUP BY x.qid ORDER BY x.qid""".stripMargin

  /** q68: int8 quantization quality — recall@k of brute-force search
    * over SYMMETRICALLY QUANTIZED vectors (per-vector scale =
    * max|x|/127, the faiss/ScaNN SQ8 default) against the float ground
    * truth on the same query set. At 100 TB the embedding column is the
    * bandwidth bottleneck — SQ8 cuts scan bytes 4× and the integer dot
    * product is exact arithmetic — and this query measures exactly what
    * that buys/costs, like q62 does for IVF.
    *
    * Cross-engine determinism: everything is exact — vectors widen to
    * double, the quantized codes are integers (`floor(x/s + 0.5)`, a
    * deterministic half-up round in any engine), the int dot products
    * (≤ 64·127² ≈ 1e6) are exact in doubles — so the oracle re-derives
    * identical rankings; scale factors cancel out of the quantized
    * cosine entirely. */
  def q68QuantizedRecall(embeddings: DataFrame, nQueries: Int = 8, k: Int = 5): DataFrame = {
    val qv = embeddings
      .select(col("vec_id"), col("embedding").cast("array<double>").as("ed"))
      .withColumn("_s",
        greatest(array_max(expr("transform(ed, x -> abs(x))")), lit(1e-30)) / 127d)
      .withColumn("qe", expr("transform(ed, x -> CAST(floor(x / _s + 0.5d) AS BIGINT))"))
      .drop("_s")
      .withColumn("nrm", sqrt(norm2(col("ed"))))
      .withColumn("qnrm", sqrt(aggregate(zip_with(col("qe"), col("qe"),
        (x, y) => x * y), lit(0L), (acc, x) => acc + x).cast("double")))
    val q = qv.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), col("ed").as("qed"), col("nrm").as("qfn"),
              col("qe").as("qqe"), col("qnrm").as("qqn"))
    val cand = broadcast(q).join(qv, col("vec_id") =!= col("qid"))
    val w = Window.partitionBy("qid").orderBy(desc("sim"), asc("vec_id"))
    val exact = cand
      .select(col("qid"), col("vec_id"),
        round(dot(col("qed"), col("ed")) / (col("qfn") * col("nrm")), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("vec_id"))
    val qdotC = aggregate(zip_with(col("qqe"), col("qe"), (x, y) => x * y),
      lit(0L), (acc, x) => acc + x).cast("double")
    val quant = cand
      .select(col("qid"), col("vec_id"),
        round(qdotC / (col("qqn") * col("qnrm")), 6).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid").as("zqid"), col("vec_id").as("zvid"))
    exact
      .join(quant, col("qid") === col("zqid") && col("vec_id") === col("zvid"), "left")
      .groupBy("qid")
      .agg(count(col("zqid")).as("n_hits"))
      .select(col("qid"), col("n_hits"),
        round(col("n_hits").cast("double") / k, 6).as("recall_q"))
      .orderBy("qid")
  }

  def q68Sql(nQueries: Int = 8, k: Int = 5): String =
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |qv AS (SELECT vec_id, ed,
       |         list_transform(ed, x -> CAST(floor(
       |           x / (greatest(list_max(list_transform(ed, y -> abs(y))), 1e-30) / 127)
       |           + 0.5) AS BIGINT)) AS qe
       |       FROM e),
       |qvd AS (SELECT vec_id, ed,
       |          list_transform(qe, x -> CAST(x AS DOUBLE)) AS qed FROM qv),
       |q AS (SELECT vec_id AS qid, ed AS q_ed, qed AS q_qed FROM qvd
       |      WHERE vec_id < $nQueries),
       |exact AS (SELECT qid, vec_id FROM (
       |  SELECT qid, v.vec_id, row_number() OVER (PARTITION BY qid
       |    ORDER BY round(list_cosine_similarity(q_ed, v.ed), 6) DESC, v.vec_id) AS rn
       |  FROM q JOIN qvd v ON v.vec_id != q.qid) t WHERE rn <= $k),
       |quant AS (SELECT qid, vec_id FROM (
       |  SELECT qid, v.vec_id, row_number() OVER (PARTITION BY qid
       |    ORDER BY round(list_cosine_similarity(q_qed, v.qed), 6) DESC, v.vec_id) AS rn
       |  FROM q JOIN qvd v ON v.vec_id != q.qid) t WHERE rn <= $k)
       |SELECT x.qid, count(z.qid) AS n_hits,
       |  round(cast(count(z.qid) AS DOUBLE) / $k, 6) AS recall_q
       |FROM exact x
       |LEFT JOIN quant z ON x.qid = z.qid AND x.vec_id = z.vec_id
       |GROUP BY x.qid ORDER BY x.qid""".stripMargin

  /** q76: embedding-dedup recall accounting — the q74-for-vectors,
    * closing the measurement triangle: q62 measures IVF *search*
    * recall@k; this measures *dedup pair* recall of BOTH sublinear
    * paths (q54 learned-IVF buckets, q72 RP-LSH sign buckets) against
    * the exact q34 all-pairs ground truth, per similarity decile.
    * Neither path can produce a false pair (both rerank candidates
    * with the identical rounded exact cosine), so the only quantity to
    * measure is which true pairs each bucketing loses — and at which
    * similarity: IVF loses pairs split across centroid boundaries,
    * LSH loses pairs that collide on no table, both concentrated in
    * the weak-similarity tail (measured at sf0.01: recall 1.0 for
    * every pair at sim ≥ 0.6, see bench_history/NOTES_r7.md).
    *
    * Like q34 it carries the all-pairs guard implicitly (it CALLS q34):
    * this is a measurement/tuning query run on samples, not a corpus
    * pass — at 100 TB you measure on a slice, then run only q54/q72. */
  def q76EmbDedupRecall(embeddings: DataFrame, threshold: Double = 0.4,
                        nCentroids: Int = 8, nTables: Int = 4,
                        bits: Int = 8): DataFrame = {
    val exact = q34EmbeddingDedup(embeddings, threshold)
    val ivf = q54BucketedEmbDedup(embeddings, nCentroids, threshold)
      .select(col("ida").as("va"), col("idb").as("vb"))
    val lsh = RpLsh.q72RplshDedup(embeddings, nTables, bits, threshold)
      .select(col("ida").as("la"), col("idb").as("lb"))
    exact
      .join(lsh, col("ida") === col("la") && col("idb") === col("lb"), "left")
      .join(ivf, col("ida") === col("va") && col("idb") === col("vb"), "left")
      .groupBy(floor(col("sim") * 10).cast("int").as("sim_decile"))
      .agg(count(lit(1)).as("n_truth"),
        count(col("la")).as("n_lsh"), count(col("va")).as("n_ivf"))
      .select(col("sim_decile"), col("n_truth"), col("n_lsh"), col("n_ivf"),
        round(col("n_lsh").cast("double") / col("n_truth"), 6).as("recall_lsh"),
        round(col("n_ivf").cast("double") / col("n_truth"), 6).as("recall_ivf"))
      .orderBy("sim_decile")
  }

  def q76Sql(threshold: Double = 0.4, nCentroids: Int = 8, nTables: Int = 4,
             bits: Int = 8, dim: Int = 64): String = {
    val simAB = "round(list_dot_product(a.ed, b.ed) / (a.nrm * b.nrm), 6)"
    val comp = s"(CAST(concat('0x', substr(md5(p || '-' || d), 1, 15)) AS BIGINT)" +
      s" % 2000001) / 1000000.0 - 1.0"
    s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS ed FROM embeddings),
       |n AS (SELECT vec_id, ed, sqrt(list_dot_product(ed, ed)) AS nrm FROM e),
       |exact AS (SELECT a.vec_id AS ida, b.vec_id AS idb, $simAB AS sim
       |          FROM n a JOIN n b ON a.vec_id < b.vec_id
       |          WHERE $simAB >= $threshold),
       |${Kmeans.sqlCtes(nCentroids)},
       |asg AS (SELECT vec_id, ed, cid FROM (
       |  SELECT e.vec_id, e.ed, c.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round(list_cosine_similarity(e.ed, c.ce), 6) DESC, c.cid) AS arn
       |  FROM e, c) t WHERE arn = 1),
       |nasg AS (SELECT vec_id, ed, cid, sqrt(list_dot_product(ed, ed)) AS nrm FROM asg),
       |ivf AS (SELECT a.vec_id AS va, b.vec_id AS vb
       |        FROM nasg a JOIN nasg b ON a.cid = b.cid AND a.vec_id < b.vec_id
       |        WHERE $simAB >= $threshold),
       |planes AS (SELECT p, [$comp FOR d IN range(0, $dim)] AS pv
       |           FROM range(0, ${nTables * bits}) t(p)),
       |sig AS (SELECT e.vec_id, CAST(pl.p // $bits AS INT) AS tbl,
       |          CAST(sum(CASE WHEN list_dot_product(e.ed, pl.pv) >= 0
       |                        THEN 1 << CAST(pl.p % $bits AS INT)
       |                        ELSE 0 END) AS BIGINT) AS code
       |        FROM e, planes pl GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT a.vec_id AS ida, b.vec_id AS idb
       |         FROM sig a JOIN sig b
       |           ON a.tbl = b.tbl AND a.code = b.code AND a.vec_id < b.vec_id),
       |lsh AS (SELECT c.ida AS la, c.idb AS lb
       |        FROM cand c
       |        JOIN n a ON c.ida = a.vec_id
       |        JOIN n b ON c.idb = b.vec_id
       |        WHERE $simAB >= $threshold)
       |SELECT CAST(floor(sim * 10) AS INT) AS sim_decile,
       |  count(*) AS n_truth, count(l.la) AS n_lsh, count(v.va) AS n_ivf,
       |  round(CAST(count(l.la) AS DOUBLE) / count(*), 6) AS recall_lsh,
       |  round(CAST(count(v.va) AS DOUBLE) / count(*), 6) AS recall_ivf
       |FROM exact x
       |LEFT JOIN lsh l ON x.ida = l.la AND x.idb = l.lb
       |LEFT JOIN ivf v ON x.ida = v.va AND x.idb = v.vb
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Per-label embedding profile: count + exact-ish centroid norm stats.
    * Norms are rounded (order-independent within one vector: the fold is
    * sequential over the array, not over rows). */
  def q25EmbeddingStats(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("norm", sqrt(norm2(col("embedding"))))
      .groupBy("label")
      .agg(count(lit(1)).as("n"),
           round(min("norm"), 6).as("min_norm"),
           round(max("norm"), 6).as("max_norm"))
      .orderBy("label")

  def q25Sql: String =
    """SELECT label, count(*) AS n,
      |  round(min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS min_norm,
      |  round(max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 6) AS max_norm
      |FROM embeddings GROUP BY label ORDER BY label""".stripMargin

  /** q83: per-label centroid drift — angular distance between each
    * label's embedding centroid and the whole corpus's, the
    * embedding-space twin of q79's token-space JS: "this slice of the
    * corpus sits somewhere else in representation space" (an encoder
    * change, a domain shift, a poisoned shard). q25 deliberately avoids
    * cross-row vector sums (float accumulation is partition-order-
    * dependent); this query is the engine's first true cross-row
    * centroid, made order-free by the micro-integer discipline:
    * components are rounded ONCE to nano-units (×1e9 longs — exact up
    * to ~3e10 rows at this value range), per-(label, pos) sums are
    * exact long arithmetic, and the cosine is taken on DECIMAL(38,0)
    * products of those sums (HUGEINT in the oracle) — exact integers
    * until one final correctly-rounded double conversion in both
    * engines. Cosine is scale-invariant, so the sums ARE the centroids
    * (no division by counts anywhere).
    *
    * Scale shape: explode is map-side; everything shuffles as (label,
    * pos) or (pos) keyed longs — dim × labels rows, independent of
    * corpus size; map-side partial sums absorb the row count. */
  def q83LabelDrift(embeddings: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(38, 0)
    val comp = embeddings
      .select(col("label"), col("embedding").cast("array<double>").as("a"))
      .withColumn("pos", explode(expr("sequence(1, size(a))")))
      .select(col("label"), col("pos"),
        round(element_at(col("a"), col("pos")) * lit(1e9)).cast("long").as("v"))
    val byLabel = comp.groupBy("label", "pos").agg(sum("v").as("sl"))
    val corpus = byLabel.groupBy("pos").agg(sum("sl").as("sc"))
    val n = embeddings.groupBy("label").agg(count(lit(1)).as("n_vecs"))
    // Overflow guard — the two engines fail DIFFERENTLY past the exact
    // range: DuckDB's HUGEINT (int128) stays exact to ~1.7e38 while
    // Spark's non-ANSI DECIMAL(38,0) sum silently nulls on overflow, so
    // an overflowing corpus would produce a silent divergence, not an
    // error. Σ_pos s·s ≤ dim·max² with dim ≤ 4096, so |sums| < 1.5e17
    // keeps every aggregate below 9.2e37 < 10^38. assert_true is
    // row-local on the dim×labels intermediate (returns null → filter
    // keeps all rows; throws loudly on the first violating sum).
    val sumBound = lit(1.5e17)
    val guarded = byLabel.join(corpus, "pos")
      .filter(assert_true(
        abs(col("sl")).cast("double") < sumBound &&
          abs(col("sc")).cast("double") < sumBound,
        lit("q83: component sum >= 1.5e17 would overflow DECIMAL(38,0) " +
          "silently (oracle HUGEINT stays exact); re-scale nano-units " +
          "or shard labels")).isNull)
    guarded
      .select(col("label"),
        (col("sl").cast(dec) * col("sc").cast(dec)).as("dp"),
        (col("sl").cast(dec) * col("sl").cast(dec)).as("ll"),
        (col("sc").cast(dec) * col("sc").cast(dec)).as("cc"))
      .groupBy("label")
      .agg(sum("dp").as("dot"), sum("ll").as("nl"), sum("cc").as("nc"))
      .join(n, "label")
      .select(col("label"), col("n_vecs"),
        round(lit(1.0) - col("dot").cast("double")
          / (sqrt(col("nl").cast("double")) * sqrt(col("nc").cast("double"))), 6)
          .as("drift"))
      .orderBy("label")
  }

  def q83Sql: String =
    """WITH comp AS (
      |  SELECT label, i AS pos,
      |    CAST(round(embedding[i]::DOUBLE * 1e9) AS BIGINT) AS v
      |  FROM embeddings, unnest(generate_series(1, len(embedding))) t(i)),
      |by_label AS (SELECT label, pos, sum(v)::BIGINT AS sl
      |             FROM comp GROUP BY 1, 2),
      |corpus AS (SELECT pos, sum(sl)::BIGINT AS sc FROM by_label GROUP BY 1),
      |agg AS (
      |  SELECT label,
      |    sum(sl::HUGEINT * sc) AS dot,
      |    sum(sl::HUGEINT * sl) AS nl,
      |    sum(sc::HUGEINT * sc) AS nc
      |  FROM by_label JOIN corpus USING (pos) GROUP BY 1),
      |n AS (SELECT label, count(*) AS n_vecs FROM embeddings GROUP BY 1)
      |SELECT label, n_vecs,
      |  round(1.0 - dot::DOUBLE / (sqrt(nl::DOUBLE) * sqrt(nc::DOUBLE)), 6)
      |    AS drift
      |FROM agg JOIN n USING (label) ORDER BY label""".stripMargin
}
