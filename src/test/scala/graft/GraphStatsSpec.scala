package graft

import graft.operators.GraphStats
import org.apache.spark.sql.functions._

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

  test("profile: degree-ordered orientation equals the lexicographic " +
    "baseline on a dense pseudo-random graph") {
    // triangle counts are orientation-invariant — pin the two orders
    // row-identical on a circulant graph (offsets 1,2,3,5 close many
    // triangles) with a hub grafted on for degree spread and ties
    val edges = ((for {
      i <- 0 until 40; d <- Seq(1, 2, 3, 5)
    } yield (s"n$i", s"n${(i + d) % 40}", ((i + d) % 3 + 1).toLong)) ++
      (1 until 25).map(j => ("n0", s"n$j", 1L))).toDF("src", "dst", "w")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Long, Long, Long, Long, Long, Long)]
        .collect().toSeq.sorted
    val deg = key(GraphStats.profile(edges, degreeOrdered = true))
    val lex = key(GraphStats.profile(edges, degreeOrdered = false))
    assert(deg.nonEmpty && deg == lex)
    assert(deg.exists(_._7 > 0), "fixture must actually contain triangles")
  }

  test("triangles: on a hub graph the degree order bounds wedge volume " +
    "where the lexicographic order explodes") {
    // adversarial power-law shape: one hub that SORTS LOW touching 200
    // leaves, plus a few closing edges. Lexicographic orientation anchors
    // every leaf pair at the hub — O(deg²) = C(200,2) wedge candidates;
    // degree orientation points every spoke AT the hub, so wedges only
    // form at the (degree ≤ 3) leaves.
    val star = (0 until 200).map(i => ("a_hub", f"leaf$i%03d", 1L))
    val closes = (0 until 10).map(i => (f"leaf$i%03d", f"leaf${i + 1}%03d", 1L))
    val edges = (star ++ closes).toDF("src", "dst", "w")
    val und = edges.where(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
    val wLex = GraphStats.wedges(GraphStats.oriented(und, degreeOrdered = false)).count()
    val wDeg = GraphStats.wedges(GraphStats.oriented(und, degreeOrdered = true)).count()
    assert(wLex >= 19900L, s"lexicographic hub anchor should explode: $wLex")
    assert(wDeg <= 30L, s"degree orientation must bound the hub: $wDeg")
    // and the counts the two orientations produce are identical: the 10
    // closing edges each close one triangle with the hub
    val tri = GraphStats.profile(edges)
      .select("node", "triangles").as[(String, Long)].collect().toMap
    assert(tri("a_hub") == 10L)
    assert(GraphStats.profile(edges, degreeOrdered = false)
      .select("node", "triangles").as[(String, Long)].collect().toMap == tri)
  }

  test("graph family: three consecutive invocations leave no " +
    "block-manager state once node-sized results are freed") {
    val edges = (0 until 300).flatMap { i =>
      val a = s"n${(i * 7919) % 30}"
      val b = s"n${(i * 104729 + 13) % 30}"
      if (a == b) Nil else Seq((a, b, 1L))
    }.toDF("src", "dst", "w")
    // id-set subset, not size equality: Spark's ContextCleaner may reap
    // PRE-EXISTING unreferenced entries mid-test, but anything these
    // calls leak appears as a NEW persistent RDD id
    val before = spark.sparkContext.getPersistentRDDs.keySet
    for (_ <- 1 to 3) {
      val p = GraphStats.profile(edges)
      val r = graft.operators.PageRank.ranks(edges, iterations = 2,
        driverGateEdges = 0L) // force the distributed (persisting) path
      val h = graft.operators.Hits.ranks(edges, iterations = 2,
        driverGateEdges = 0L)
      assert(p.count() > 0 && r.count() > 0 && h.count() > 0)
      Seq(p, r, h).foreach(graft.util.Checkpoints.free)
    }
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert((after -- before).isEmpty,
      s"intermediate edge/pair/vector tables leaked: ${after -- before}")
  }
}
