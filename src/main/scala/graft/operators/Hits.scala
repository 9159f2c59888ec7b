package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration HITS (Kleinberg hubs & authorities) over an edge list —
  * the complement of [[PageRank]] for crawl curation: authority scores
  * surface the quality targets (the domains good pages point AT), hub
  * scores surface the aggregators/directories (the domains that point at
  * quality). Per the build brief this is training-data machinery (link-
  * structure features for curation priors); the reference has no graph
  * surface.
  *
  * INTEGER-EXACT, same discipline as [[PageRank]]: both vectors live in
  * 64-bit micro-units. Each half-step is an exact integer matrix-vector
  * product (`Σ w·h` / `Σ w·a` — longs, order-insensitive), followed by an
  * L1 re-normalization to total mass 1e9 whose one double division is
  * identically ordered in Spark, the driver loop, and the SQL oracle
  * (`round(raw · 1e9 / total)`). L1 (not the classical L2) keeps the
  * fixed point integer-exact — a monotone rescale per step, so rankings
  * are unaffected. Fixed iteration count; a(v) updates from h_t, h(u)
  * then updates from the NEW a — the standard ordering.
  *
  * Scale shape: each half-step is one edge ⋈ vector join (shuffle on the
  * joined key) + a node-sized aggregate + a scalar total; vectors are
  * node-sized, never edge-sized. Same lineage rules as PageRank: every
  * iterate cuts lineage eagerly (the vector is referenced by both the
  * next half-step and the normalization), and a graph at or under
  * `driverGateEdges` (measured count) iterates on the driver — domain
  * graphs are metadata-sized however big the corpus.
  */
object Hits {

  /** Hub + authority scores for a weighted directed edge list
    * `(src, dst, w)`. Output: `(node, hub_micro, auth_micro)` — exact
    * long micro-unit scores, total mass 1e9 per vector (up to per-node
    * rounding); a node with no out-edges holds hub 0, no in-edges
    * authority 0.
    */
  def ranks(edges: DataFrame, iterations: Int = 5,
            driverGateEdges: Long = 1000000L): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    // one upstream materialization for gate-count AND collect/iteration —
    // same derived-edge-list economics as [[PageRank.ranks]]
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .persist()
    val nEdges = e.count()
    require(nEdges > 0, "edge list is empty")
    if (nEdges <= driverGateEdges)
      try return ranksDriver(e, iterations)
      finally e.unpersist(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    // iteration-invariant tables released in finally; each superseded
    // half-step checkpoint freed as soon as its successor materializes;
    // the result is checkpointed eagerly so even the FINAL hub/auth
    // vectors can be freed — a long-lived session accumulates only the
    // node-sized result (free it with Checkpoints.free when done)
    var hub: DataFrame = null
    var auth: DataFrame = null
    try {
      val n = nodes.count()
      val h0 = math.round(1.0e9 / n)
      hub = nodes.withColumn("hub", lit(h0)).localCheckpoint()
      for (_ <- 1 to iterations) {
        val rawA = e.join(hub.withColumnRenamed("node", "src"), "src")
          .select(col("dst").as("node"), (col("w") * col("hub")).as("x"))
          .groupBy("node").agg(sum("x").as("raw"))
        val ta = rawA.agg(sum("raw").as("t"))
        val prevA = auth
        auth = nodes.join(rawA, Seq("node"), "left").crossJoin(ta)
          .select(col("node"),
            coalesce(round(col("raw") * lit(1.0e9) / col("t")).cast("long"),
              lit(0L)).as("auth"))
          .localCheckpoint()
        if (prevA != null) graft.util.Checkpoints.free(prevA)
        val rawH = e.join(auth.withColumnRenamed("node", "dst"), "dst")
          .select(col("src").as("node"), (col("w") * col("auth")).as("x"))
          .groupBy("node").agg(sum("x").as("raw"))
        val th = rawH.agg(sum("raw").as("t"))
        val prevH = hub
        hub = nodes.join(rawH, Seq("node"), "left").crossJoin(th)
          .select(col("node"),
            coalesce(round(col("raw") * lit(1.0e9) / col("t")).cast("long"),
              lit(0L)).as("hub"))
          .localCheckpoint()
        graft.util.Checkpoints.free(prevH)
      }
      nodes.join(hub, "node").join(auth, "node")
        .select(col("node"), col("hub").as("hub_micro"),
          col("auth").as("auth_micro"))
        .localCheckpoint(true)
    } finally {
      if (hub != null) graft.util.Checkpoints.free(hub)
      if (auth != null) graft.util.Checkpoints.free(auth)
      nodes.unpersist(false)
      e.unpersist(false)
    }
  }

  /** The under-gate path: identical micro-unit arithmetic on the driver. */
  private def ranksDriver(edges: DataFrame, iterations: Int): DataFrame = {
    val spark = edges.sparkSession
    // caller passes the already-projected, persisted edge table; this
    // collect reads the cache the gate count just filled
    val es = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (es.map(_._1) ++ es.map(_._2)).distinct.sorted
    val n = nodes.length.toLong
    var hub: Map[String, Long] = nodes.map(_ -> math.round(1.0e9 / n)).toMap
    var auth: Map[String, Long] = nodes.map(_ -> 0L).toMap
    def normalize(raw: scala.collection.Map[String, Long]): Map[String, Long] = {
      val t = raw.valuesIterator.sum
      nodes.map(v => v -> (raw.get(v) match {
        case Some(x) => math.round(x * 1.0e9 / t)
        case None => 0L
      })).toMap
    }
    for (_ <- 1 to iterations) {
      val rawA = new scala.collection.mutable.HashMap[String, Long]()
      es.foreach { case (s, d, w) =>
        rawA.update(d, rawA.getOrElse(d, 0L) + w * hub(s))
      }
      auth = normalize(rawA)
      val rawH = new scala.collection.mutable.HashMap[String, Long]()
      es.foreach { case (s, d, w) =>
        rawH.update(s, rawH.getOrElse(s, 0L) + w * auth(d))
      }
      hub = normalize(rawH)
    }
    import spark.implicits._
    nodes.map(v => (v, hub(v), auth(v))).toSeq
      .toDF("node", "hub_micro", "auth_micro")
  }
}
