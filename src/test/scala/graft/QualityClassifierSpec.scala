package graft

import graft.text.QualityClassifier
import org.apache.spark.sql.functions._

/** Hashed-feature logistic quality classifier: perfect separation on a
  * separable fixture, a floor on the real corpus labels, determinism on
  * identical input, and the save/load round-trip.
  */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = {
    val good = (0 until 40).map(i => (i.toLong, s"good clean prose number $i", 1))
    val bad = (100 until 140).map(i => (i.toLong, s"spam junk noise item $i", 0))
    (good ++ bad).toDF("doc_id", "text", "label")
  }

  test("separable corpus: holdout predictions are perfect") {
    val model = QualityClassifier.train(
      fixture.filter(col("doc_id") % 5 =!= 0), "label", dim = 1 << 12)
    val held = fixture.filter(col("doc_id") % 5 === 0)
    val got = QualityClassifier.score(held, model)
      .join(held.select("doc_id", "label"), "doc_id").collect()
    assert(got.nonEmpty)
    assert(got.forall(r => r.getAs[Long]("pred") === r.getAs[Int]("label").toLong),
      "separable classes must classify perfectly")
  }

  test("rule distillation on the real corpus: holdout accuracy clears the floor; deterministic re-run") {
    // sf0.01 deliberately: it is the driver's gate scale and the smallest
    // sf whose corpus has a non-degenerate keep/drop split
    val all = spark.read.parquet(s"$sf001/documents.parquet")
    val labeled = all.join(
      graft.text.CorpusClean.filterCorpus(all)
        .select(col("doc_id"), col("keep").cast("int").as("label")), "doc_id")
    val model = QualityClassifier.train(
      labeled.filter(col("doc_id") % 20 =!= 7), "label", dim = 1 << 15)
    val held = labeled.filter(col("doc_id") % 20 === 7)
    def run() = QualityClassifier.score(held, model)
      .collect().map(r => r.getLong(0) -> ((r.getDouble(1), r.getLong(2)))).toMap
    val a = run()
    val acc = {
      val truth = held.select("doc_id", "label").collect()
        .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
      a.count { case (id, (_, p)) => p == truth(id) }.toDouble / a.size
    }
    assert(acc >= 0.8, s"holdout accuracy $acc below floor")
    assert(run() === a, "same model + same input must score identically")
  }

  test("save/load round-trip scores identically; null text scores as empty doc") {
    val model = QualityClassifier.train(fixture, "label", dim = 1 << 12)
    val dir = java.nio.file.Files.createTempDirectory("graft-qc").toString
    model.save(dir)
    val loaded = QualityClassifier.QcModel.load(spark, dir)
    assert(loaded.dim === model.dim)
    val probe = Seq((1L, "good clean prose"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val a = QualityClassifier.score(probe, model).collect().map(_.toSeq)
    val b = QualityClassifier.score(probe, loaded).collect().map(_.toSeq)
    assert(a === b)
    assert(a.length === 2, "null text must still produce a score row")
  }

  test("rejects a non-power-of-two dim") {
    intercept[IllegalArgumentException] {
      QualityClassifier.train(fixture, "label", dim = 1000)
    }
  }
}
