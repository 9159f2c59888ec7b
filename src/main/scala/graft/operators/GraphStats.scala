package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-node crawl-graph profile — the link-structure features curation
  * heuristics consume alongside [[PageRank]]/[[Hits]] scores: degree and
  * weight totals, reciprocity (mutual-link count — link-exchange/spam
  * farms light up here), and triangle membership (local cohesion; spam
  * constellations are triangle-poor, organic communities triangle-rich).
  * All counts are exact integers — fully oracle-checkable.
  *
  * Self-loops are excluded from every metric (a page linking to its own
  * domain is not link structure).
  *
  * Scale shape: degrees/weights are partial-aggregated key counts.
  * Reciprocity is a distinct-pair semi-join against its own reversal.
  * Triangles enumerate over the canonically-oriented undirected edge set
  * (a < b) with the standard two-path + closing-edge join — each
  * triangle materializes exactly once. Orientation here is lexicographic
  * (deterministic and oracle-portable); on a power-law web graph at
  * 100 TB the degree-ordered orientation is the skew upgrade (orient
  * each edge from lower- to higher-degree endpoint so no hub anchors
  * more than O(sqrt(E)) wedges) — same joins, different ordering key.
  */
object GraphStats {

  /** Profile a weighted directed edge list `(src, dst, w)`.
    * Output: `(node, out_deg, in_deg, out_w, in_w, reciprocal,
    * triangles)` — one row per node appearing in any non-self-loop edge.
    */
  def profile(edges: DataFrame): DataFrame = {
    // six consumers (degrees ×2, reciprocity, orientation, two triangle
    // legs) read the edge set — persist it (and its derived pair/
    // orientation tables) so the caller's upstream chain runs once, not
    // once per consumer (measured 5.4 → 3.6 s at sf0.1 on the crawl
    // extraction chain)
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .where(col("src") =!= col("dst")).persist()
    val pairs = e.select("src", "dst").distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    val outs = e.groupBy(col("src").as("node"))
      .agg(countDistinct("dst").as("out_deg"), sum("w").as("out_w"))
    val ins = e.groupBy(col("dst").as("node"))
      .agg(countDistinct("src").as("in_deg"), sum("w").as("in_w"))
    val recip = pairs
      .join(pairs.select(col("dst").as("src"), col("src").as("dst")),
        Seq("src", "dst"), "left_semi")
      .groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("reciprocal"))
    // canonical undirected orientation: one row per unordered pair, a < b
    val und = pairs
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().persist()
    val tri = und.select(col("a"), col("b").as("m"))
      .join(und.select(col("a").as("m"), col("b").as("c")), "m")
      .join(und.select(col("a"), col("b").as("c")), Seq("a", "c"),
        "left_semi")
      .select(col("a").as("x1"), col("m").as("x2"), col("c").as("x3"))
    val triCounts = tri.select(explode(array(col("x1"), col("x2"),
        col("x3"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    nodes
      .join(outs, Seq("node"), "left")
      .join(ins, Seq("node"), "left")
      .join(recip, Seq("node"), "left")
      .join(triCounts, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"),
        coalesce(col("out_w"), lit(0L)).as("out_w"),
        coalesce(col("in_w"), lit(0L)).as("in_w"),
        coalesce(col("reciprocal"), lit(0L)).as("reciprocal"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
