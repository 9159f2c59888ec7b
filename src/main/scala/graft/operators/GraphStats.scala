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
  * Triangles enumerate with the standard wedge + closing-edge join over
  * an ACYCLICALLY ORIENTED undirected edge set — every edge points from
  * its lower to its higher endpoint under a strict total order, so each
  * triangle has exactly one node with two out-edges and materializes
  * exactly once. The order is degree-then-id by default: a power-law hub
  * then sits at the HIGH end of almost every edge it touches, so no node
  * anchors more than ~O(√E) wedges (the classic skew bound) — under the
  * id-only lexicographic order a hub that happens to sort low anchors
  * O(deg²) wedge candidates. Counts are orientation-invariant
  * (spec-pinned equal across both orders); only the intermediate wedge
  * volume differs.
  */
object GraphStats {

  /** Acyclically orient an undirected pair set (`a`, `b`, a < b):
    * one row `(lo, hi, dhi)` per pair, pointing from the lower to the
    * higher endpoint under the strict total order (degree, id) — or
    * plain id order when `degreeOrdered` is false, encoded as degree 0
    * so one comparison key (`struct(dhi, hi)`) serves both modes.
    */
  private[graft] def oriented(und: DataFrame,
                              degreeOrdered: Boolean): DataFrame =
    if (!degreeOrdered)
      und.select(col("a").as("lo"), col("b").as("hi"), lit(0L).as("dhi"))
    else {
      val deg = und.select(col("a").as("node"))
        .union(und.select(col("b").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      und
        .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
        .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
        .select(
          when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
            struct(col("a").as("lo"), col("b").as("hi"),
              col("db").as("dhi")))
            .otherwise(struct(col("b").as("lo"), col("a").as("hi"),
              col("da").as("dhi"))).as("e"))
        .select(col("e.lo").as("lo"), col("e.hi").as("hi"),
          col("e.dhi").as("dhi"))
    }

  /** Wedge candidates of an oriented edge set: `(lo, b, c)` pairs of
    * out-neighbors of `lo` with b before c in the orientation's total
    * order — each triangle contributes exactly one wedge whose closing
    * edge (b → c, orientation-consistent by transitivity of the total
    * order) exists. Exposed for the skew audit: this is the volume the
    * orientation bounds.
    */
  private[graft] def wedges(o: DataFrame): DataFrame =
    o.select(col("lo"), col("hi").as("b"), col("dhi").as("db2"))
      .join(o.select(col("lo"), col("hi").as("c"), col("dhi").as("dc2")),
        "lo")
      .where(struct(col("db2"), col("b")) < struct(col("dc2"), col("c")))
      .select("lo", "b", "c")

  /** Profile a weighted directed edge list `(src, dst, w)`.
    * Output: `(node, out_deg, in_deg, out_w, in_w, reciprocal,
    * triangles)` — one row per node appearing in any non-self-loop edge.
    *
    * The edge set and its derived pair/orientation tables feed six
    * consumers (degrees ×2, reciprocity, orientation, two wedge legs +
    * the closing-edge probe), so they are persisted for the call, the
    * node-sized result is materialized eagerly, and every intermediate
    * is released in `finally` — repeated invocations leave nothing
    * corpus-sized in the block manager (the result checkpoint itself is
    * node-sized; callers can release it with
    * [[graft.util.Checkpoints.free]] when done).
    *
    * @param degreeOrdered triangle orientation: degree-then-id (default,
    *   the power-law-safe order) or id-only lexicographic (the audit
    *   baseline). Counts are identical; only wedge volume differs.
    */
  def profile(edges: DataFrame, degreeOrdered: Boolean = true): DataFrame = {
    // EAGER materialization (localCheckpoint, not a lazy persist): the
    // result plan holds 4+ broadcast-exchange subqueries (outs/ins/recip/
    // triCounts) that execute as CONCURRENT jobs — with a lazy persist they
    // all race to compute the not-yet-cached upstream and the corpus-sized
    // edge derivation runs ~4x in parallel (measured 63 CPU-s for a 57-edge
    // domain graph at sf0.1; 14 CPU-s after). The checkpoint is edge-sized.
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .where(col("src") =!= col("dst")).localCheckpoint(true)
    val pairs = e.select("src", "dst").distinct().persist()
    // canonical undirected pair set: one row per unordered pair, a < b
    val und = pairs
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct().persist()
    val o = oriented(und, degreeOrdered).persist()
    try {
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
      val tri = wedges(o)
        .join(o.select(col("lo").as("b"), col("hi").as("c")),
          Seq("b", "c"), "left_semi")
        .select(col("lo").as("x1"), col("b").as("x2"), col("c").as("x3"))
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
        .localCheckpoint(true)
    } finally {
      o.unpersist(false)
      und.unpersist(false)
      pairs.unpersist(false)
      graft.util.Checkpoints.free(e)
    }
  }
}
