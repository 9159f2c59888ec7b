package graft

import graft.dedup.SemDedup
import org.apache.spark.sql.functions._

/** SemDeDup semantics on controlled geometry: three well-separated
  * directions, exact duplicates within each — clustering must group them,
  * the exemplar must be the member least similar to its centroid, and
  * pruning must keep exactly one per group plus every non-duplicate.
  */
class SemDedupSpec extends SparkSpec {
  import spark.implicits._

  // three orthogonal directions in R^4; per direction: two identical unit
  // vectors (dup pair) + per-direction singletons elsewhere in space
  private def corpus() = Seq(
    (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),   // dup of 1
    (3L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),
    (4L, Seq(0.0f, 1.0f, 0.0f, 0.0f)),   // dup of 3
    (5L, Seq(0.0f, 0.0f, 1.0f, 0.0f)),
    (6L, Seq(0.0f, 0.0f, 0.97f, 0.2f)),  // near-dup of 5 (cos ≈ 0.979)
    (7L, Seq(0.5f, 0.5f, 0.0f, 0.7f))    // lone vector, no dup
  ).toDF("vec_id", "embedding")

  test("duplicate pairs group; exactly one exemplar kept per group") {
    val v = SemDedup.semanticDedup(corpus(), "vec_id", "embedding",
      nClusters = 3, threshold = 0.95)
    val rows = v.collect().map(r => (r.getLong(0), r.getLong(2), r.getBoolean(4)))
    val byComp = rows.groupBy(_._2)
    assert(byComp.forall(_._2.count(_._3) == 1),
      s"exactly one keeper per duplicate group: ${rows.mkString(",")}")
    val grouped = rows.map(_._1).toSet
    assert(grouped.contains(1L) && grouped.contains(2L), "identical pair 1-2 grouped")
    assert(grouped.contains(3L) && grouped.contains(4L), "identical pair 3-4 grouped")
    assert(grouped.contains(5L) && grouped.contains(6L), "near-dup pair 5-6 grouped")
    assert(!grouped.contains(7L), "non-duplicates are absent from the verdicts")
  }

  test("prune keeps one per group and every non-duplicate") {
    val c = corpus()
    val v = SemDedup.semanticDedup(c, "vec_id", "embedding",
      nClusters = 3, threshold = 0.95)
    val kept = SemDedup.prune(c, v, "vec_id").select("vec_id")
      .collect().map(_.getLong(0)).toSet
    assert(kept.contains(7L), "lone vector survives")
    assert(kept.size === 4, s"3 groups -> 3 exemplars + 1 lone, got $kept")
    // exactly one of each identical pair survives
    assert(kept.intersect(Set(1L, 2L)).size === 1)
    assert(kept.intersect(Set(3L, 4L)).size === 1)
    assert(kept.intersect(Set(5L, 6L)).size === 1)
  }

  test("exemplar is the group member least similar to its centroid") {
    // one direction, three members: two interior (identical to the axis)
    // and one tilted member — with one cluster the centroid sits near the
    // interior mass, so the tilted member has the LOWEST centroid cosine
    // and must be the keeper
    val df = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Seq(0.97f, 0.2f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val v = SemDedup.semanticDedup(df, "vec_id", "embedding",
      nClusters = 1, threshold = 0.95)
    val keeper = v.where(col("keep")).select("id").collect().map(_.getLong(0))
    assert(keeper.toSeq === Seq(3L),
      s"tilted member (lowest centroid cos) must be kept, got ${keeper.toSeq}")
    // and among equal centroid-cos members the tie breaks by min id:
    val interior = v.where(!col("keep")).select("id")
      .collect().map(_.getLong(0)).toSet
    assert(interior === Set(1L, 2L))
  }

  test("zero and NaN vectors are excluded, never grouped") {
    val df = Seq(
      (1L, Seq(0.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(Float.NaN, 1.0f, 0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val v = SemDedup.semanticDedup(df, "vec_id", "embedding",
      nClusters = 1, threshold = 0.9)
    val ids = v.select("id").collect().map(_.getLong(0)).toSet
    assert(ids === Set(3L, 4L), s"only the real dup pair appears, got $ids")
  }

  test("staging dir variant produces identical verdicts") {
    val c = corpus()
    val base = SemDedup.semanticDedup(c, "vec_id", "embedding",
      nClusters = 3, threshold = 0.95)
      .collect().map(r => (r.getLong(0), r.getBoolean(4))).toSet
    val dir = java.nio.file.Files.createTempDirectory("semdedup-stage").toString
    try {
      val staged = SemDedup.semanticDedup(c, "vec_id", "embedding",
        nClusters = 3, threshold = 0.95, staging = Some(dir))
        .collect().map(r => (r.getLong(0), r.getBoolean(4))).toSet
      assert(staged === base)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("parameter validation") {
    val c = corpus()
    intercept[IllegalArgumentException] {
      SemDedup.semanticDedup(c, "vec_id", "embedding", nClusters = 0, threshold = 0.9)
    }
    intercept[IllegalArgumentException] {
      SemDedup.semanticDedup(c, "vec_id", "embedding", nClusters = 2, threshold = 1.5)
    }
  }
}
