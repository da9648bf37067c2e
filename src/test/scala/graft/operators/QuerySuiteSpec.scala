package graft.operators

import graft.{SparkEntry, TestSpark}
import org.scalatest.funsuite.AnyFunSuite

/** Smoke + invariants for every SparkEntry query on sf0.001.
  *
  * The DuckDB hash-match (driver-run, replicated locally during
  * development) is the value-level gate; this suite pins cheap
  * structural invariants so `sbt test` alone catches breakage:
  * schema column names, non-emptiness, and per-query semantic checks.
  */
class QuerySuiteSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("every query has an oracle and runs non-empty on sf0.001") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle SQL without query: $orphans")
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty, name)
      assert(df.count() > 0, s"$name returned 0 rows")
    }
  }

  test("entry() returns the flagship aggregate with rows") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.contains("sum_qty"))
  }

  test("q07 outlier bounds bracket the quartiles") {
    val r = Relational.q07QuartilesOutliers(
      graft.io.Tables.load(spark, sf, "orders")).head()
    val (q1, q3, lo, hi) = (r.getDouble(0), r.getDouble(1),
      r.getDouble(3), r.getDouble(4))
    assert(lo < q1 && q1 <= q3 && q3 < hi)
    assert(r.getLong(5) >= 0)
  }

  test("q21 exact dedup partitions the documents exactly") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val total = docs.count()
    val sum = TextOps.q21ExactDedup(docs)
      .agg(org.apache.spark.sql.functions.sum("n_copies")).head().getLong(0)
    assert(sum === total)
  }

  test("q22 jaccard pairs are symmetric-free and within (0, 1]") {
    val rows = TextOps.q22NgramJaccard(
      graft.io.Tables.load(spark, sf, "documents")).collect()
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(3)
      assert(j >= 0.2 && j <= 1.0)
    }
  }

  test("q22 DF cap: inactive at default, drops hot shingles when tight") {
    import spark.implicits._
    val docs = graft.io.Tables.load(spark, sf, "documents")
    // default cap sits above this corpus's max DF: zero drops, and the
    // capped plan returns exactly the uncapped pairs
    assert(TextOps.droppedShingleStats(docs) === ((0L, 0L)))
    val capped = TextOps.q22NgramJaccard(docs).collect().toSet
    val uncapped = TextOps.q22NgramJaccard(docs, maxDf = Int.MaxValue).collect().toSet
    assert(capped === uncapped)
    // constructed corpus: "hot hot hot" shingle lives in all 3 docs, the
    // near-dup signal only in docs 1 & 2; maxDf = 2 kills the hot
    // shingle's pairs but keeps the genuine near-dup pair
    val tiny = Seq(
      (1L, "a b c d e f hot hot hot hot hot"),
      (2L, "a b c d e f g hot hot hot hot hot"),
      (3L, "x y z w v u hot hot hot hot hot")).toDF("doc_id", "text")
    val (nSh, nPost) = TextOps.droppedShingleStats(tiny, maxDf = 2)
    assert(nSh > 0 && nPost >= nSh * 3, "hot shingles must be accounted as dropped")
    val pairs = TextOps.q22NgramJaccard(tiny, threshold = 0.1, maxDf = 2)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), "genuine near-dup pair survives the cap")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
      "doc 3 only shares hot shingles — capped out")
  }

  test("q56 clusters = union-find over q22 pairs; labels are component minima") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val pairs = TextOps.q22NgramJaccard(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // reference union-find on the driver
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val want = parent.keys.map(k => k -> find(k)).toMap
    val got = TextOps.q56DedupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, "min-label propagation must match union-find")
    assert(got.nonEmpty)
    // every cluster label is its own cluster's minimum member
    got.groupBy(_._2).foreach { case (lab, members) =>
      assert(members.keys.min === lab)
    }
    // a transitive chain: a~b, b~c with a,c NOT direct near-dups must
    // still collapse into one cluster
    import spark.implicits._
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val mid = (11 to 40).map(i => s"tok$i").mkString(" ")
    val far = (21 to 50).map(i => s"tok$i").mkString(" ")
    val chain = Seq((1L, base), (2L, mid), (3L, far)).toDF("doc_id", "text")
    val cl = TextOps.q56DedupClusters(chain, threshold = 0.2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cl === Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"chain must unify: $cl")
  }

  test("q60 normalized dedup: catches case/punct/whitespace re-encodings") {
    import spark.implicits._
    val docs = Seq(
      (1L, "Hello, World! This  is a TEST."),
      (2L, "hello world this is a test"),   // same after normalization
      (3L, "entirely different content here"),
      (4L, "Hello world... this is a test")) // also same
      .toDF("doc_id", "text")
    val rows = TextOps.q60NormalizedDedup(docs).collect()
    assert(rows.length === 2)
    val byKeeper = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(byKeeper === Map(1L -> 3L, 3L -> 1L),
      "docs 1/2/4 must collapse to keeper 1; doc 3 stands alone")
    // corpus sanity: partitions all docs
    val corpus = graft.io.Tables.load(spark, sf, "documents")
    val total = TextOps.q60NormalizedDedup(corpus)
      .agg(org.apache.spark.sql.functions.sum("n_copies")).head().getLong(0)
    assert(total === corpus.count())
  }

  test("q61 repetition: zero for all-distinct, 1-1/n for constant docs") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b c d e"),          // all distinct: both fracs 0
      (2L, "x x x x"),            // constant: dup_token 3/4, dup_bigram 2/3
      (3L, "solo"))               // single token: bigram frac defined as 0
      .toDF("doc_id", "text")
    val m = TextOps.q61Repetition(docs).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(1L) === ((0.0, 0.0)))
    assert(math.abs(m(2L)._1 - 0.75) < 1e-9)
    assert(math.abs(m(2L)._2 - (1.0 - 1.0 / 3)) < 1e-6)
    assert(m(3L) === ((0.0, 0.0)))
  }

  test("q23 minhash: identical docs would share signatures; slots in range") {
    val rows = TextOps.q23Minhash(
      graft.io.Tables.load(spark, sf, "documents")).collect()
    rows.foreach { r =>
      (1 to 8).foreach { i =>
        val v = r.getLong(i)
        assert(v >= 0 && v < TextOps.MinhashP)
      }
    }
  }

  test("q24 cosine top-k: k neighbors per query, sims descending") {
    val rows = VectorOps.q24CosineTopk(
      graft.io.Tables.load(spark, sf, "embeddings")).collect()
    assert(rows.length === 8 * 5)
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val sims = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
  }

  test("q54 bucketed dedup ⊆ q34 exact pairs; sims agree; high recall here") {
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    val exact = VectorOps.q34EmbeddingDedup(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bucketed = VectorOps.q54BucketedEmbDedup(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(bucketed.nonEmpty)
    bucketed.foreach { case (pair, sim) =>
      assert(exact.contains(pair), s"bucketed pair $pair not in exact set")
      assert(math.abs(exact(pair) - sim) < 1e-9, s"sim mismatch for $pair")
    }
  }

  test("q34 guard refuses to launch all-pairs beyond maxVectors") {
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    // over the cap: fails FAST at plan time (metadata count), pointing
    // at the bucketed scale path — never launches the O(N²) join
    val ex = intercept[IllegalArgumentException] {
      VectorOps.q34EmbeddingDedup(emb, maxVectors = 10)
    }
    assert(ex.getMessage.contains("q54BucketedEmbDedup"))
    // at-or-below the cap: behavior unchanged (same schema, same rows)
    assert(VectorOps.q34EmbeddingDedup(emb).columns.toSeq
      === Seq("ida", "idb", "sim"))
  }

  test("q36 as-of join: one row per purchase, signup at-or-before it") {
    val events = graft.io.Tables.load(spark, sf, "events")
    val rows = TemporalJoins.q36AsofJoin(events).collect()
    val nPurchases = events.filter("event_type = 'purchase'").count()
    assert(rows.length.toLong === nPurchases) // left as-of keeps every purchase
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.filter(!_.isNullAt(3)).foreach { r =>
      assert(r.getLong(3) <= r.getLong(2), "as-of signup must not postdate purchase")
    }
  }

  test("q38 spearman is in [-1, 1] and counts every row") {
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    val r = RankStats.q38Spearman(li).head()
    assert(r.getLong(0) === li.count())
    val rho = r.getDouble(1)
    assert(rho >= -1.0 && rho <= 1.0)
  }

  test("q39 winnowing guarantee: a doc sharing a long run with another shares a fingerprint") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val fps = Fuzzy.q39Winnow(docs).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    // every doc yields at least one fingerprint, bounded by its window count
    val lens = docs.selectExpr("doc_id", "size(split(text, ' ')) AS m").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    fps.foreach { case (d, s) =>
      assert(s.nonEmpty, s"doc $d has no fingerprints")
      assert(s.size <= math.max(lens(d) - 2 - Fuzzy.WinnowW + 1, 1))
    }
    // the winnowing guarantee proper: any shared run of >= W + k - 1 = 6
    // tokens forces a shared fingerprint — check on a constructed pair
    // whose only overlap is that run
    import spark.implicits._
    val shared = "alpha beta gamma delta epsilon zeta"
    val pair = Seq(
      (1L, s"one two three $shared four five six"),
      (2L, s"seven eight $shared nine ten eleven twelve")).toDF("doc_id", "text")
    val pfps = Fuzzy.q39Winnow(pair).collect()
      .groupBy(_.getLong(0)).map { case (d, rs) => d -> rs.map(_.getLong(1)).toSet }
    assert((pfps(1L) intersect pfps(2L)).nonEmpty,
      "docs sharing a 6-token run must share a winnowing fingerprint")
  }

  test("q40 curation: kept docs = quality-gated minus dedup losers") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val out = Curate.q40CorpusCurate(docs).collect()
    val kept = out.map(_.getLong(1)).sum
    val gated = LangQuality.q29LangQuality(docs).filter("quality >= 0.4")
    val losers = TextOps.q22NgramJaccard(docs).select("idb").distinct()
    val expected = gated.join(losers, gated("doc_id") === losers("idb"), "left_anti").count()
    assert(kept === expected)
    assert(kept > 0)
  }

  test("q41 cube: grand-total row counts every customer; leaves sum to it") {
    val cust = graft.io.Tables.load(spark, sf, "customer")
    val rows = Relational3.q41Cube(cust).collect()
    val grand = rows.filter(r => r.getString(0) == "ALL" && r.getInt(1) == -1)
    assert(grand.length === 1)
    assert(grand.head.getLong(2) === cust.count())
    val leaves = rows.filter(r => r.getString(0) != "ALL" && r.getInt(1) != -1)
    assert(leaves.map(_.getLong(2)).sum === cust.count())
  }

  test("q42 hash sample: deterministic and near a 1-in-10 rate") {
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    val n1 = Relational3.q42HashSample(li).collect().map(_.getLong(1)).sum
    val n2 = Relational3.q42HashSample(li).collect().map(_.getLong(1)).sum
    assert(n1 === n2, "sample must be reproducible")
    val rate = n1.toDouble / li.count()
    assert(rate > 0.05 && rate < 0.15, s"rate $rate")
  }

  test("q43 pivot: cells partition the event count") {
    val ev = graft.io.Tables.load(spark, sf, "events")
    val rows = Relational3.q43Pivot(ev).collect()
    val total = rows.map(r => (1 to Relational3.EventTypes.length).map(r.getLong).sum).sum
    assert(total === ev.count())
  }

  test("q44 moving avg: first order (by date) per customer averages to itself") {
    val orders = graft.io.Tables.load(spark, sf, "orders")
    val mavg = Relational3.q44MovingAvg(orders).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // the window's "first" is by (o_orderdate, o_orderkey), not o_orderkey
    val first = orders.select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      .groupBy(_.getLong(0)).values
      .map(_.minBy(r => (r.getAs[java.time.LocalDateTime](2)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli, r.getLong(1))))
    first.foreach { r =>
      assert(math.abs(mavg(r.getLong(1)) - r.getDouble(3)) < 1e-9)
    }
  }

  test("q45 edit distance: pairs ordered, within bound, block-local") {
    val part = graft.io.Tables.load(spark, sf, "part")
    val rows = Relational3.q45EditDistance(part).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getInt(2) >= 0 && r.getInt(2) <= 4)
    }
  }

  test("q45 block guard: inactive at default cap, skips oversized blocks when tight") {
    val part = graft.io.Tables.load(spark, sf, "part")
    // default cap sits above this corpus's max block: zero drops and
    // identical pairs vs an unbounded run
    assert(Relational3.oversizedBlockStats(part) === ((0L, 0L)))
    val guarded = Relational3.q45EditDistance(part).collect().toSet
    val unbounded = Relational3.q45EditDistance(part, maxBlock = Int.MaxValue).collect().toSet
    assert(guarded === unbounded)
    // tight cap: blocks above it are skipped and accounted for
    val cap = 3
    val (nBlocks, nRows) = Relational3.oversizedBlockStats(part, cap)
    assert(nBlocks > 0 && nRows > nBlocks * cap)
    val capped = Relational3.q45EditDistance(part, maxBlock = cap)
    val blockOf = part.groupBy("p_type", "p_size").count().collect()
      .map(r => (r.getString(0), r.getInt(1)) -> r.getLong(2)).toMap
    val keyOf = part.select("p_partkey", "p_type", "p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    capped.collect().foreach { r =>
      assert(blockOf(keyOf(r.getLong(0))) <= cap,
        s"pair from an oversized block survived the guard: $r")
    }
  }

  test("q46 KMV sketch: estimate within ~4 standard errors of exact") {
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    val r = Sketches.q46KmvDistinct(li).head()
    assert(r.getLong(0) === Sketches.KmvK)
    val est = r.getDouble(2); val exact = r.getLong(3).toDouble
    val se = 1.0 / math.sqrt(Sketches.KmvK) // ~6.25 % relative
    assert(math.abs(est / exact - 1.0) < 4 * se, s"est=$est exact=$exact")
  }

  test("q47 tf-idf: top-3 per doc, scores non-increasing, idf sane") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rows = TfIdf.q47Tfidf(docs).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.size.toLong === docs.count())
    byDoc.values.foreach { g =>
      assert(g.length === TfIdf.TopK)
      val scores = g.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
      assert(scores.forall(_ >= 0.0)) // df <= N ⇒ idf >= 0
    }
  }

  test("q48 chunking: chunks tile every doc with the configured overlap") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val lens = docs.selectExpr("doc_id", "size(split(text, ' ')) AS m").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = Chunking.q48Chunk(docs).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.keySet === lens.keySet, "every doc must chunk")
    byDoc.foreach { case (d, g) =>
      val m = lens(d)
      val sorted = g.sortBy(_.getInt(1))
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getInt(1) === i, "chunk ids contiguous from 0")
        assert(r.getInt(2) === i * Chunking.ChunkStep)
        val expectLen = math.min(Chunking.ChunkSize, m - i * Chunking.ChunkStep)
        assert(r.getInt(3) === expectLen, s"doc $d chunk $i token count")
      }
      // coverage: last chunk reaches the end of the doc
      val last = sorted.last
      assert(last.getInt(2) + last.getInt(3) >= m, s"doc $d tail uncovered")
    }
  }

  test("q49 funnel: conversions bounded by signups, non-negative latency") {
    val ev = graft.io.Tables.load(spark, sf, "events")
    val r = Funnels.q49Funnel(ev).head()
    val (signups, converted) = (r.getLong(0), r.getLong(1))
    assert(signups === ev.filter("event_type = 'signup'")
      .select("user_id").distinct().count())
    assert(converted <= signups && converted > 0)
    assert(r.getDouble(2) >= 0.0)
  }

  test("q50 cohort: week-0 cells cover every user exactly once") {
    val ev = graft.io.Tables.load(spark, sf, "events")
    val rows = Funnels.q50Cohort(ev).collect()
    val week0 = rows.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(week0 === ev.select("user_id").distinct().count(),
      "every user appears in their own cohort's week 0")
    rows.foreach(r => assert(r.getLong(2) > 0 && r.getLong(1) >= 0))
  }

  test("q51 split: partitions all docs, stable, near 80/10/10") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rows = Curate.q51Split(docs).collect()
    assert(rows.map(_.getString(0)).sorted.toSeq === Seq("test", "train", "val"))
    assert(rows.map(_.getLong(1)).sum === docs.count())
    val train = rows.find(_.getString(0) == "train").get.getLong(1).toDouble
    val frac = train / docs.count()
    assert(frac > 0.6 && frac < 0.95, s"train fraction $frac")
    val again = Curate.q51Split(docs).collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach(r => assert(again(r.getString(0)) === r.getLong(1), "split must be stable"))
  }

  test("q52 stratified sample: per-stratum rates land near target") {
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    val sampled = Relational3.q52StratifiedSample(li).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val full = li.groupBy("l_returnflag").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Relational3.StrataRates.foreach { case (flag, k) =>
      val rate = sampled(flag).toDouble / full(flag)
      assert(math.abs(rate - 1.0 / k) < 0.6 / k,
        s"stratum $flag rate $rate, target ${1.0 / k}")
    }
  }

  test("q53 pmi: ranked, ordered pairs, support threshold respected") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rows = TfIdf.q53Pmi(docs).collect()
    assert(rows.nonEmpty && rows.length <= TfIdf.PmiTopK)
    val pmis = rows.map(_.getDouble(3))
    assert(pmis.zip(pmis.tail).forall { case (a, b) => a >= b }, "pmi must be non-increasing")
    rows.foreach { r =>
      assert(r.getString(0) < r.getString(1), "pairs must be ordered x < y")
      assert(r.getLong(2) >= TfIdf.PmiMinPairs)
    }
  }

  test("q57 grouped KMV: unfilled sketch is exact; filled estimates within error") {
    val ev = graft.io.Tables.load(spark, sf, "events")
    // sf0.001 has 15 users/group < k=64: every sketch is unfilled and
    // the estimate must equal the exact distinct count
    val rows = Sketches.q57GroupedKmv(ev).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < Sketches.GroupKmvK, "sketch should be unfilled at sf0.001")
      assert(r.getDouble(3) === r.getLong(4).toDouble, s"unfilled est must be exact: $r")
    }
    // filled branch: synthetic group with > k distinct users
    import spark.implicits._
    val big = (1 to 1000).map(u => ("view", u.toLong)).toDF("event_type", "user_id")
    val r = Sketches.q57GroupedKmv(big).head()
    assert(r.getLong(1) === Sketches.GroupKmvK.toLong)
    val (est, exact) = (r.getDouble(3), r.getLong(4).toDouble)
    val se = 1.0 / math.sqrt(Sketches.GroupKmvK) // ~12.5% relative
    assert(math.abs(est / exact - 1.0) < 4 * se, s"est=$est exact=$exact")
    // scale shape: the rank filter must compile to WindowGroupLimit
    // (per-group top-k heaps), not a full per-group sort pipeline
    val plan = Sketches.q57GroupedKmv(ev).queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan)
  }

  test("q58 weighted sample: deterministic, rate tracks quality, subset of corpus") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val r1 = Curate.q58WeightedSample(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val r2 = Curate.q58WeightedSample(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(r1 === r2, "weighted sample must be reproducible")
    val total = graft.operators.LangQuality.q29LangQuality(docs)
      .groupBy("lang_pred").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    r1.foreach { case (lang, kept) => assert(kept <= total(lang)) }
    // factor=0 keeps nothing; a huge factor keeps everything
    assert(Curate.q58WeightedSample(docs, factor = 0.0).count() === 0L)
    val all = Curate.q58WeightedSample(docs, factor = 1e9).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(all === total, "factor→∞ must keep the whole corpus")
  }

  test("q59 sampled quantiles: estimates bracket exact within sampling error") {
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    val r = Sketches.q59SampledQuantiles(li).head()
    val n = li.count()
    val rate = r.getLong(3).toDouble / n
    assert(rate > 0.02 && rate < 0.10, s"sample rate $rate vs 1/${Sketches.SampleRate}")
    // median estimate within ~15% of exact for a 5% sample of 6k rows
    Seq((0, 4), (1, 5)).foreach { case (est, exact) =>
      val (e, x) = (r.getDouble(est), r.getDouble(exact))
      assert(math.abs(e / x - 1.0) < 0.15, s"col $est: est $e vs exact $x")
    }
    // determinism: identical on re-run
    val r2 = Sketches.q59SampledQuantiles(li).head()
    (0 to 6).foreach(i => assert(r.get(i) === r2.get(i)))
  }

  test("q62 recall@k: nprobe=2 ≥ nprobe=1 per query; hits consistent with q30") {
    val emb = graft.io.Tables.load(spark, sf, "embeddings")
    val rows = VectorOps.q62IvfRecall(emb).collect()
    assert(rows.length === 8, "one recall row per query")
    // q30's default is nprobe=2 — its pairs are the p2 candidate pool
    val ivf2 = VectorOps.q30IvfTopk(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    rows.foreach { r =>
      val (h1, r1, h2, r2) =
        (r.getLong(1), r.getDouble(2), r.getLong(3), r.getDouble(4))
      assert(h1 >= 0 && h1 <= 3 && h2 >= 0 && h2 <= 3)
      assert(math.abs(r1 - h1 / 3.0) < 5e-7) // recall columns round to 6 dp
      assert(math.abs(r2 - h2 / 3.0) < 5e-7)
      // superset candidates ⇒ recall is monotone in nprobe
      assert(h2 >= h1, s"qid ${r.getLong(0)}: nprobe=2 hits $h2 < nprobe=1 hits $h1")
    }
    // hits can't beat ground truth: total p2 hits <= q30(p2) result size
    assert(rows.map(_.getLong(3)).sum <= ivf2.size)
    // IVF over this data still finds most neighbors, and probing 2
    // centroids recovers strictly more than probing 1 in aggregate
    val mean1 = rows.map(_.getDouble(2)).sum / rows.length
    val mean2 = rows.map(_.getDouble(4)).sum / rows.length
    assert(mean1 > 0.3, s"suspiciously low mean recall@p1 $mean1")
    assert(mean2 >= mean1, s"mean recall p2 $mean2 < p1 $mean1")
  }

  test("q63 best-per-lang: k rows per language, quality non-increasing, WindowGroupLimit") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val df = Curate.q63BestPerLang(docs)
    val rows = df.collect()
    rows.groupBy(_.getString(1)).foreach { case (lang, g) =>
      assert(g.length <= 3, s"$lang has ${g.length} rows")
      val qs = g.sortBy(_.getInt(3)).map(_.getDouble(2))
      assert(qs.zip(qs.tail).forall { case (a, b) => a >= b },
        s"$lang quality not non-increasing")
    }
    // the global best doc appears as rank 1 of its language
    val best = graft.operators.LangQuality.q29LangQuality(docs)
      .orderBy(org.apache.spark.sql.functions.desc("quality"),
        org.apache.spark.sql.functions.asc("doc_id")).head()
    assert(rows.exists(r => r.getLong(0) == best.getLong(0) && r.getInt(3) == 1))
    assert(df.queryExecution.executedPlan.toString.contains("WindowGroupLimit"))
  }

  test("q64 winnow pairs: guarantee makes a long shared run a candidate pair") {
    import spark.implicits._
    // docs 1 & 2 share a 12-token run (≫ W+k−1 = 6): the winnowing
    // guarantee forces shared fingerprints → must surface as a pair;
    // doc 3 shares nothing
    val shared = (1 to 12).map(i => s"run$i").mkString(" ")
    val docs = Seq(
      (1L, s"alpha beta gamma $shared delta"),
      (2L, s"zeta eta theta iota $shared kappa lambda"),
      (3L, "completely unrelated words only here nothing common at all")
    ).toDF("doc_id", "text")
    val pairs = Fuzzy.q64WinnowPairs(docs)
      .select("ida", "idb").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)), s"got $pairs")
    // corpus run: pairs are ordered and meet the minShared floor
    val corpus = graft.io.Tables.load(spark, sf, "documents")
    val rows = Fuzzy.q64WinnowPairs(corpus).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getLong(2) >= 2)
    }
  }

  test("q65 MAD outliers: robust fence ignores a planted extreme; counts bounded") {
    import spark.implicits._
    // 50 tight values + one wild outlier per group: median/MAD barely
    // move (50% breakdown), the outlier is flagged; a stddev fence
    // would have been dragged by the very point it hunts
    val rows = (1 to 50).map(i => ("1-URGENT", 100.0 + (i % 7))) :+ (("1-URGENT", 1e9))
    val df = rows.toDF("o_orderpriority", "o_totalprice")
    val r = Relational2.q65MadOutliers(df).head()
    assert(math.abs(r.getDouble(1) - 103.0) < 1.0, s"median dragged: ${r.getDouble(1)}")
    assert(r.getLong(3) >= 1, "the planted extreme must be flagged")
    assert(r.getLong(3) <= 20, "robust fence must not flag the bulk")
    // corpus: per-group counts bounded by group size, MAD >= 0
    val orders = graft.io.Tables.load(spark, sf, "orders")
    val sizes = orders.groupBy("o_orderpriority").count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    Relational2.q65MadOutliers(orders).collect().foreach { x =>
      assert(x.getDouble(2) >= 0.0)
      assert(x.getLong(3) >= 0 && x.getLong(3) <= sizes(x.getString(0)))
    }
  }

  test("q37 range join: brackets partition lineitem exactly") {
    val li = graft.io.Tables.load(spark, sf, "lineitem")
    val rows = TemporalJoins.q37RangeJoin(li).collect()
    assert(rows.map(_.getString(0)).toSet.subsetOf(
      TemporalJoins.Brackets.map(_._1).toSet))
    assert(rows.map(_.getLong(1)).sum === li.count(), "every lineitem in exactly one bracket")
  }

  test("q96 bm25: sides are disjoint, ranks contiguous, scores non-increasing") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rows = Retrieval.q96Bm25Topk(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) % 50 === 7, "query side must be the bench slice")
      assert(r.getLong(2) % 50 !== 7, "retrieved docs must be train-side")
      assert(r.getDouble(3) > 0.0, "BM25 with the +1 idf is strictly positive")
    }
    rows.groupBy(_.getLong(0)).foreach { case (q, rs) =>
      val sorted = rs.sortBy(_.getInt(1))
      assert(sorted.map(_.getInt(1)).toSeq === (1 to rs.length), s"ranks of $q")
      val scores = sorted.map(_.getDouble(3)).toSeq
      assert(scores === scores.sorted.reverse, s"scores of $q not non-increasing")
    }
  }

  test("q97 temperature mix: weights sum to 1, alpha<1 flattens toward the tail") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rows = Curate.q97TemperatureMix(docs).collect()
    val wsum = rows.map(_.getDouble(2)).sum
    assert(math.abs(wsum - 1.0) < 1e-4, s"weights sum to $wsum")
    rows.foreach { r =>
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getLong(4) <= r.getLong(1), "cannot sample more than exists")
    }
    // temperature property: acceptance rate is non-increasing in source
    // size (smaller sources get upweighted)
    val bySize = rows.sortBy(_.getLong(1))
    bySize.sliding(2).foreach { case Array(a, b) =>
      assert(a.getDouble(3) >= b.getDouble(3) - 1e-9,
        s"rate must not grow with size: ${a.getLong(1)}->${b.getLong(1)}")
    }
    // realized sample tracks the planned rate at hash granularity
    rows.foreach { r =>
      val planned = r.getDouble(3) * r.getLong(1)
      assert(math.abs(r.getLong(4) - planned) <= math.max(5.0, planned * 0.5),
        s"${r.getString(0)}: sampled ${r.getLong(4)} vs planned $planned")
    }
  }

  test("q99 length stats: percentiles ordered, truncation accounting consistent") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rows = Packing.q99SeqLengthStats(docs, seqLen = 64).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getLong(1)).sum
    assert(total === docs.count())
    rows.foreach { r =>
      assert(r.getDouble(2) <= r.getDouble(3), "p50 <= p95")
      assert(r.getLong(4) <= r.getLong(1), "truncated <= docs")
      assert(r.getDouble(6) >= 0.0 && r.getDouble(6) < 1.0)
      // losing tokens requires truncated docs and vice versa
      assert((r.getLong(5) > 0) === (r.getLong(4) > 0))
    }
  }

  test("q100 diversity: ratios in (0,1], bigram counts consistent with token counts") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rows = TextOps.q100DistinctNgrams(docs).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "distinct unigrams <= tokens")
      assert(r.getLong(5) <= r.getLong(4), "distinct bigrams <= bigrams")
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(6) > 0.0 && r.getDouble(6) <= 1.0)
      // n_bigrams = n_tokens - n_docs (each doc contributes len-1)
      assert(r.getLong(4) < r.getLong(1))
      // bigrams are more diverse than unigrams on natural-ish text
      assert(r.getDouble(6) >= r.getDouble(3),
        s"${r.getString(0)}: distinct2 should dominate distinct1")
    }
  }

  test("q98 cluster canon: members reconcile with q56, keeper has max quality") {
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val clusters = TextOps.q56DedupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val canon = TextOps.q98ClusterCanon(docs).collect()
    assert(canon.map(_.getLong(3)).sum === clusters.length,
      "cluster member counts must partition q56's membership")
    val qual = LangQuality.withLangQuality(docs)
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.round(
          org.apache.spark.sql.functions.col("quality"), 6).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val members = clusters.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    canon.foreach { r =>
      val (cl, keeper, kq) = (r.getLong(0), r.getLong(1), r.getDouble(2))
      val mem = members(cl)
      assert(mem.contains(keeper), s"canon of $cl not a member")
      assert(r.getLong(3) === mem.length.toLong)
      assert(r.getLong(4) === mem.length.toLong - 1)
      assert(mem.forall(m => qual(m) <= kq), s"cluster $cl keeper not max-quality")
      // tie policy: among max-quality members, the keeper is min id
      val best = mem.filter(m => qual(m) == kq)
      assert(keeper === best.min, s"cluster $cl tie not broken by min id")
    }
  }
}
