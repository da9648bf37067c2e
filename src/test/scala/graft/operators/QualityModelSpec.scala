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

  test("empty corpus: zero model, empty report, no crash") {
    val docs = Tables.load(spark, sf, "documents").filter("1 = 0")
    assert(QualityModel.train(docs, iters = 2, trainN = 10) === Seq.fill(7)(0.0))
    assert(QualityModel.q101LearnedFilter(docs).count() === 0)
  }
}
