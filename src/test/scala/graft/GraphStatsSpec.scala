package graft

import graft.operators.GraphStats

/** Exact crawl-graph profile: hand-counted fixture (degrees, weights,
  * reciprocity, once-per-triangle counting, self-loop exclusion).
  */
class GraphStatsSpec extends SparkSpec {
  import spark.implicits._

  test("profile: degrees, weights, reciprocity, triangles, self-loops out") {
    val edges = Seq(
      ("a", "b", 2L), ("b", "a", 1L), // reciprocal pair
      ("b", "c", 1L), ("c", "a", 3L), // closes the a-b-c triangle
      ("a", "a", 5L),                 // self loop: excluded everywhere
      ("d", "a", 1L)).toDF("src", "dst", "w")
    val out = GraphStats.profile(edges)
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("a") == ("a", 1L, 3L, 2L, 5L, 1L, 1L))
    assert(out("b") == ("b", 2L, 1L, 2L, 2L, 1L, 1L))
    assert(out("c") == ("c", 1L, 1L, 3L, 1L, 0L, 1L))
    assert(out("d") == ("d", 1L, 0L, 1L, 0L, 0L, 0L))
  }

  test("profile: each triangle counts once per member, duplicates collapse") {
    // two triangles sharing the edge x-y; parallel duplicate edges and
    // both directions of x-y must not double-count
    val edges = Seq(
      ("x", "y", 1L), ("y", "x", 1L), ("x", "y", 1L),
      ("y", "z", 1L), ("z", "x", 1L),
      ("y", "q", 1L), ("q", "x", 1L)).toDF("src", "dst", "w")
    val out = GraphStats.profile(edges)
      .select("node", "triangles").as[(String, Long)].collect().toMap
    assert(out == Map("x" -> 2L, "y" -> 2L, "z" -> 1L, "q" -> 1L))
  }
}
