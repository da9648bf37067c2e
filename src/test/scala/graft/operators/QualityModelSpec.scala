package graft.operators

import graft.TestSpark
import graft.io.{ArtifactStore, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Learned logistic-regression document filter ([[QualityModel]]):
  * trainer determinism, an actual learning-signal pin (the model must
  * separate its target class, not just converge), artifact train-or-load
  * round trip, and the empty-corpus guard. */
class QualityModelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("training is deterministic and bounded") {
    val docs = Tables.load(spark, sf, "documents")
    val a = QualityModel.train(docs, iters = 6, trainN = 2048)
    val b = QualityModel.train(docs, iters = 6, trainN = 2048)
    assert(a === b)
    assert(a.length === QualityModel.NumW)
    a.foreach(v => assert(!v.isNaN && !v.isInfinite && v.abs < 10.0))
    // gradient steps moved at least one weight off the zero init
    assert(a.exists(_.abs > 1e-6))
  }

  test("the model separates its target class (en scores above every other lang)") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = QualityModel.q101LearnedFilter(docs).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    val en = rows("en")
    (rows - "en").foreach { case (lang, m) =>
      assert(en > m, s"mean_score: en $en !> $lang $m")
    }
  }

  test("artifact store round trip: second call loads, bit-identical, no retrain") {
    val docs = Tables.load(spark, sf, "documents")
    val root = java.nio.file.Files.createTempDirectory("graft_logreg_art").toString
    // iters=3 is unmemoized in this JVM -> the first call must train
    val before = QualityModel.trainRuns.get()
    val w1 = ArtifactStore.logregOrTrain(root, docs, iters = 3)
    assert(QualityModel.trainRuns.get() === before + 1)
    assert(ArtifactStore.listArtifacts(spark, root).exists(_._1 == "logreg_weights"))
    val w2 = ArtifactStore.logregOrTrain(root, docs, iters = 3)
    assert(QualityModel.trainRuns.get() === before + 1, "load must not retrain")
    assert(w1 === w2)
  }

  test("q103 admission gate reconciles with q92 and partitions the batch") {
    val docs = Tables.load(spark, sf, "documents")
    val g = Provenance.q103AdmissionGate(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    val q92 = Provenance.q92FuzzyAdmission(docs).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(g.keySet === q92.keySet)
    g.foreach { case (src, r) =>
      val (nb, ne, nf, nlq, nn) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      // verdicts partition the batch
      assert(ne + nf + nlq + nn === nb, src)
      // dedup legs identical to q92; q92's n_new splits into
      // low_quality + new under the learned gate
      val q = q92(src)
      assert(ne === q.getLong(2) && nf === q.getLong(3), src)
      assert(nlq + nn === q.getLong(4), src)
    }
    // budget gating is non-degenerate by construction: the bottom
    // quartile of novel docs drops, the rest admit
    val (nlq, nn) = (g.values.map(_.getLong(4)).sum, g.values.map(_.getLong(5)).sum)
    assert(nlq > 0, "no doc was gated low_quality")
    assert(nn > 0, "every doc was gated low_quality")
    // ~25% of the novel docs drop (floor boundary via cume_dist)
    assert(nlq <= (nlq + nn) / 2, s"budget gate dropped too much: $nlq of ${nlq + nn}")
  }

  test("q104 score drift: fractions sum to 1 on each side, deltas sum to 0") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = QualityModel.q104ScoreDrift(docs).collect()
    assert(rows.nonEmpty)
    val (nb, nt) = (rows.map(_.getLong(1)).sum, rows.map(_.getLong(2)).sum)
    assert(nt === docs.count(), "tick side must cover the full table")
    assert(nb === docs.filter("doc_id % 17 != 0").count())
    assert(math.abs(rows.map(_.getDouble(3)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(4)).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_.getDouble(5)).sum) < 1e-4)
  }

  test("q109 retrain canary: budgets exact, flip columns consistent, weight delta and rank overlap well-defined") {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val docs = graft.io.Tables.load(spark, sf, "documents")
    val rep = QualityModel.q109RetrainCanary(docs).collect()
    assert(rep.nonEmpty)
    val n = rep.map(_.getLong(1)).sum
    val lowB = rep.map(_.getLong(2)).sum
    val lowF = rep.map(_.getLong(3)).sum
    val flipIn = rep.map(_.getLong(4)).sum
    val flipOut = rep.map(_.getLong(5)).sum
    assert(n === math.min(docs.count(), QualityModel.DefaultTrainN),
      "canary sample is the bounded hash-ranked population")
    // cume_dist ≤ 0.25 admits exactly floor semantics on distinct keys:
    // both budgets hold the same operating point
    assert(lowB === lowF, "same lowFrac budget under both models")
    assert(lowB > 0 && lowB <= n / 4 + 1)
    // set identity: |B\F| = flip_out, |F\B| = flip_in, so the two
    // overlap computations must agree
    assert(lowB - flipOut === lowF - flipIn,
      "bottom-set intersection must be consistent from either side")
    val overlap = (lowB - flipOut).toDouble / lowB
    assert(overlap >= 0.0 && overlap <= 1.0)
    // the scalar companions: the two models genuinely differ (the tick
    // moved the corpus, so the fresh weights moved)
    val wBase = QualityModel.weights(
      docs.filter(pmod(col("doc_id"), lit(Provenance.BatchMod)) =!= 0),
      scope = s"admission${Provenance.BatchMod}")
    val wFresh = QualityModel.weights(docs)
    val delta = math.sqrt(wBase.zip(wFresh).map { case (a, b) =>
      (a - b) * (a - b) }.sum)
    assert(delta > 0.0, "post-tick retrain must move the weights")
    // and the flips the report counts are exactly the decisions that
    // delta changes at the operating point — non-vacuous on this corpus
    assert(flipIn + flipOut > 0,
      "the canary must detect decision flips on the drifted corpus")
  }

  test("gradient descent strictly decreases training log-loss") {
    val docs = Tables.load(spark, sf, "documents")
    val w0 = Seq.fill(QualityModel.NumW)(0.0)
    val w2 = QualityModel.train(docs, iters = 2, trainN = 2048)
    val w6 = QualityModel.train(docs, iters = 6, trainN = 2048)
    val (l0, l2, l6) = (QualityModel.trainLoss(docs, w0),
      QualityModel.trainLoss(docs, w2), QualityModel.trainLoss(docs, w6))
    assert(math.abs(l0 - math.log(2.0)) < 1e-12) // zero model = coin flip
    assert(l2 < l0, s"2-step loss $l2 !< init $l0")
    assert(l6 < l2, s"6-step loss $l6 !< 2-step $l2")
  }

  test("empty corpus: zero model, empty report, no crash") {
    val docs = Tables.load(spark, sf, "documents").filter("1 = 0")
    assert(QualityModel.train(docs, iters = 2, trainN = 10) === Seq.fill(7)(0.0))
    assert(QualityModel.q101LearnedFilter(docs).count() === 0)
  }

  test("q128 both branches: training-sample hit unlearns (decisive); a miss provably stands, flip-free") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val base = docs.filter(pmod(col("doc_id"), lit(Provenance.BatchMod)) =!= 0)

    // UNLEARN branch (default takedown class): the class intersects the
    // hv-prefix manifest, so the choice must be 'unlearn' with moved
    // weights and a consistent gate
    val un = QualityModel.q128ModelUnlearning(docs).collect()
    assert(un.nonEmpty)
    un.foreach { r =>
      assert(r.getAs[String]("decision") === "unlearn")
      assert(r.getAs[Long]("n_hit_train") > 0)
      assert(r.getAs[Double]("w_l2_delta") > 0.0,
        "retraining without a third of the sample must move the weights")
      assert(r.getAs[Long]("n_low_quality") + r.getAs[Long]("n_admitted")
        === r.getAs[Long]("n_batch"))
    }

    // STAND branch: retract exactly one doc OUTSIDE the trainN-prefix
    // manifest (id picked via the same hv the trainer orders by) — the
    // model provably never trained on it: decision 'stand', zero flips,
    // zero weight delta
    val trainN = 64
    val ranked = QualityModel.labeledReservoir(base, 1 << 20)
      .orderBy("hv", "doc_id").select("doc_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ranked.length > trainN)
    val outside = ranked.last
    val mod = ranked.max + 1 // doc_id % mod == outside ⇔ doc_id == outside
    val st = QualityModel.q128ModelUnlearning(docs, trainN = trainN,
      evalN = trainN, retractMod = mod, retractRem = outside).collect()
    assert(st.nonEmpty)
    st.foreach { r =>
      assert(r.getAs[String]("decision") === "stand")
      assert(r.getAs[Long]("n_hit_train") === 0L)
      assert(r.getAs[Long]("n_flips") === 0L)
      assert(r.getAs[Double]("w_l2_delta") === 0.0)
    }
  }
}
