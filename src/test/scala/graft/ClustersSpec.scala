package graft

import graft.dedup.Clusters
import org.apache.spark.sql.functions._

/** Connected-components dedup clustering: transitive closure of near-dup
  * pairs, canonical-winner selection, convergence on adversarial shapes.
  */
class ClustersSpec extends SparkSpec {
  import spark.implicits._

  private def pairsDF(ps: (Long, Long)*) = ps.toDF("id_a", "id_b")

  test("chained pairs form one component labeled by the min id") {
    // A~B, B~C without A~C — the case pair-dropping gets wrong
    val cc = Clusters.connectedComponents(pairsDF((2L, 3L), (3L, 7L), (7L, 5L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc == Map(2L -> 2L, 3L -> 2L, 5L -> 2L, 7L -> 2L))
  }

  test("independent cliques keep independent components") {
    val clique = for {
      g <- Seq(10L, 20L, 30L); i <- 0 until 3; j <- (i + 1) until 3
    } yield (g + i, g + j)
    val cc = Clusters.connectedComponents(pairsDF(clique: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 9)
    for (g <- Seq(10L, 20L, 30L); i <- 0 until 3) assert(cc(g + i) == g)
  }

  test("a 64-node path converges (the worst case for label propagation)") {
    val path = (0L until 63L).map(i => (i, i + 1))
    val cc = Clusters.connectedComponents(pairsDF(path: _*))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cc.size == 64 && cc.values.forall(_ == 0L))
  }

  test("pair order and direction don't matter; self-pairs are ignored") {
    val a = Clusters.connectedComponents(pairsDF((5L, 1L), (1L, 5L), (3L, 3L), (5L, 9L)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == Map(1L -> 1L, 5L -> 1L, 9L -> 1L))
  }

  test("assignComponents labels singletons with their own id; drop keeps one per group") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e"))
      .toDF("doc_id", "text")
    val pairs = pairsDF((2L, 3L), (4L, 5L))
    val assigned = Clusters.assignComponents(docs, "doc_id", pairs)
      .select("doc_id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(1L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 4L, 5L -> 4L))
    val kept = Clusters.dropDuplicateGroups(docs, "doc_id", pairs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L, 2L, 4L))
  }

  test("exhausting maxRounds throws instead of returning a wrong grouping") {
    val path = (0L until 63L).map(i => (i, i + 1))
    intercept[IllegalArgumentException] {
      // driverMaxEdges = 0 forces the distributed loop (the driver path
      // converges in one pass and has no rounds to exhaust)
      Clusters.connectedComponents(pairsDF(path: _*), maxRounds = 1,
        driverMaxEdges = 0L)
    }
  }

  test("assignComponents works when the caller's id column is literally \"id\"") {
    val docs = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "text")
    val assigned = Clusters.assignComponents(docs, "id", pairsDF((2L, 3L)))
      .select("id", "component")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned == Map(1L -> 1L, 2L -> 2L, 3L -> 2L))
  }

  test("assignComponents preserves an unrelated column named \"id\"") {
    val docs = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("doc_id", "id")
    val out = Clusters.assignComponents(docs, "doc_id", pairsDF((2L, 3L)))
    assert(out.columns.contains("id"), "caller's own 'id' column must survive")
    assert(out.select("doc_id", "id", "component").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet ===
      Set((1L, 100L, 1L), (2L, 200L, 2L), (3L, 300L, 2L)))
  }

  test("non-long id types skip the driver path and still converge") {
    val pairs = Seq(("b", "c"), ("c", "a")).toDF("id_a", "id_b")
    val cc = Clusters.connectedComponents(pairs)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc == Map("a" -> "a", "b" -> "a", "c" -> "a"))
  }

  test("driver union-find and the distributed loop produce identical groupings") {
    // the hybrid gate decides on the measured edge count; both sides of it
    // must be the same function. Shapes: chain, cliques, path, star overlap.
    val shapes = Seq(
      Seq((2L, 3L), (3L, 7L), (7L, 5L)),
      (for { g <- Seq(10L, 20L); i <- 0 until 4; j <- (i + 1) until 4 }
        yield (g + i, g + j)),
      (0L until 31L).map(i => (i, i + 1)),
      Seq((100L, 1L), (100L, 2L), (100L, 3L), (3L, 200L)))
    for (edges <- shapes) {
      val viaDriver = Clusters.connectedComponents(pairsDF(edges: _*))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val viaLoop = Clusters.connectedComponents(pairsDF(edges: _*),
          driverMaxEdges = 0L)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(viaDriver == viaLoop, s"paths disagree on $edges")
    }
  }

  test("reliable checkpointing produces the identical grouping") {
    // the restartable-state path for long closure jobs on real clusters —
    // same algorithm, per-round state on the (here: local-fs) checkpoint dir
    val dir = java.nio.file.Files.createTempDirectory("graft-cc-ckpt").toString
    val edges = Seq((2L, 3L), (3L, 7L), (10L, 11L), (20L, 21L), (21L, 22L))
    val local = Clusters.connectedComponents(pairsDF(edges: _*))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val reliable = Clusters.connectedComponents(pairsDF(edges: _*),
        checkpointDir = Some(dir))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(reliable == local)
    // round state actually landed on the checkpoint dir
    assert(new java.io.File(dir).listFiles().nonEmpty)
  }

  test("empty pair list: everything is a singleton") {
    val docs = Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
    val kept = Clusters.dropDuplicateGroups(docs, "doc_id",
      pairsDF().limit(0))
    assert(kept.count() == 2)
  }

  test("keepBestPerGroup: highest quality wins, null quality last, id tiebreak, singletons self-keep") {
    val docs = Seq(
      (1L, Some(10L)),  // group {1,2,3}: 2 has the best quality
      (2L, Some(30L)),
      (3L, None),       // null quality: never the winner while 1/2 exist
      (7L, Some(5L)),   // singleton
      (8L, None),       // singleton with null quality keeps itself
      (10L, Some(4L)),  // group {10,11}: equal quality → lower id wins
      (11L, Some(4L))
    ).toDF("doc_id", "q")
    val out = Clusters.keepBestPerGroup(docs, "doc_id",
        pairsDF((1L, 2L), (2L, 3L), (10L, 11L)), "q")
      .select("doc_id", "kept_id", "is_kept").orderBy("doc_id")
      .as[(Long, Long, Boolean)].collect()
    assert(out.toSeq == Seq((1L, 2L, false), (2L, 2L, true), (3L, 2L, false),
      (7L, 7L, true), (8L, 8L, true), (10L, 10L, true), (11L, 10L, false)),
      out.mkString(", "))
  }

  test("keepBestPerGroup: winner reduction is a partial aggregate, never a window") {
    val docs = Seq((1L, 1L), (2L, 2L)).toDF("doc_id", "q")
    val p = Clusters.keepBestPerGroup(docs, "doc_id", pairsDF((1L, 2L)), "q")
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("WindowExec") && p.contains("partial_min"),
      s"a mega-cluster must collapse map-side:\n$p")
  }
}
