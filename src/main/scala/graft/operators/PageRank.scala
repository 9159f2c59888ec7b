package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank over an edge list — the crawl-curation
  * authority score (Common-Crawl-style domain ranking: rank hosts by link
  * structure, feed the rank into seed selection / per-domain quotas /
  * quality priors). The reference engine has no graph surface; this is
  * training-data-pipeline machinery per the build brief.
  *
  * INTEGER-EXACT iteration, the house cross-engine discipline: ranks live
  * in 64-bit micro-units (total mass ≈ 1e9), every per-edge contribution
  * is rounded to a long immediately (`round(d · r_u · w / outw_u)`), and
  * each node's new rank is an exact long SUM of those plus the teleport
  * and dangling shares — order-insensitive, so Spark's unordered partial
  * aggregation and a SQL oracle's scan order produce bit-identical ranks
  * at every iteration. A fixed iteration count (not a convergence test)
  * keeps the computation a pure function of the input.
  *
  * Semantics per iteration (damping d, n = |nodes|):
  *   r'(v) = round((1−d)·1e9/n) + round(d·danglingMass/n)
  *           + Σ_{u→v} round(d · r(u) · w(u,v) / outw(u))
  * where danglingMass is the summed rank of nodes with no out-edges
  * (their mass teleports uniformly — the standard stochastic fix, so
  * total mass stays ≈ 1e9 up to per-node rounding).
  *
  * Node set = src ∪ dst of the edge list; a fully isolated node is the
  * caller's job to represent (e.g. a self-loop) if it should hold mass.
  *
  * Scale shape: each iteration is two key shuffles (edges ⋈ ranks on src,
  * contribution agg on dst) plus a scalar dangling agg — the irreducible
  * PageRank dataflow. The rank table is node-sized, never edge-sized, and
  * contributions partial-aggregate map-side before the dst exchange. For
  * big graphs pass `stagingDir`: each iteration materializes to parquet
  * and re-reads, cutting the 10-deep lineage (and letting a production
  * run restart mid-computation); edge storage bucketed by src is the
  * natural co-location win on a real cluster.
  */
object PageRank {

  /** Rank nodes of a weighted directed edge list `(src, dst, w)`.
    * Output: `(node, rank_micro)` — exact long micro-unit ranks.
    *
    * A graph at or under `driverGateEdges` (measured count — the same
    * gate discipline as the connected-components union-find) iterates on
    * the driver instead: a domain graph is metadata-sized however big the
    * corpus that produced it, and ten distributed rounds of tiny shuffles
    * are pure scheduler overhead (measured 19 s → the extraction-bound
    * ~4 s at sf0.1). The driver loop runs the IDENTICAL micro-unit
    * arithmetic, so the two paths are bit-identical (spec-pinned); the
    * distributed loop remains the path for edge lists past the gate
    * (doc-level citation graphs).
    */
  def ranks(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85,
            stagingDir: Option[String] = None,
            driverGateEdges: Long = 1000000L,
            seeds: Option[Seq[String]] = None): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
    require(seeds.forall(_.nonEmpty), "seeds must be non-empty when given")
    // One upstream materialization for gate-count AND iteration/collect:
    // edge lists are DERIVED (a corpus-sized extraction pipeline sits
    // above them), so `count()` here followed by `collect()` in the
    // driver path — or the first iteration's scan in the distributed
    // path — would run that extraction twice (measured: the whole second
    // half of d_domain_rank's CPU at sf0.1). The projected edge table is
    // persisted BEFORE the count so every later consumer reads the cache;
    // released in the paths' own finally blocks.
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .persist()
    val nEdges = e.count()
    if (nEdges <= driverGateEdges)
      try return ranksDriver(e, iterations, damping, seeds)
      finally e.unpersist(false)
    // Each iteration references the previous rank vector twice
    // (contribution join + dangling anti-join), so an unbroken lineage
    // DOUBLES the logical plan per iteration — 2^T copies of the upstream
    // chain for Catalyst to analyze before a single task runs (cache
    // replacement happens after analysis, so persist() alone does not
    // save the driver). Every iterate therefore cuts lineage eagerly:
    // durable parquet under stagingDir (restartable, fault-tolerant —
    // the production shape for cluster-sized graphs), localCheckpoint
    // otherwise (exact longs, so the pinned result is deterministic).
    // The iteration-invariant edge/out-weight/node tables are persisted —
    // they are re-read every iteration, never re-derived.
    val spark = edges.sparkSession
    import spark.implicits._
    val edgeNodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // Personalization: the teleport (and dangling) mass goes ONLY to the
    // seed set — the crawl-frontier scoring form (rank the graph around
    // known-good seed domains; nodes unreachable from the seeds hold
    // exactly 0). Standard PageRank IS the seeds-everywhere special case,
    // so one arithmetic path serves both: seed rows get the teleport and
    // dangling shares (denominator = |seeds|), non-seed rows get 0. The
    // seed list is caller-provided metadata (a seed table, not a corpus).
    val nodes = (seeds match {
      case Some(ss) => edgeNodes.union(ss.distinct.toDF("node")).distinct()
      case None => edgeNodes
    }).persist()
    val n = nodes.count()
    require(n > 0, "edge list is empty")
    val isSeed = seeds match {
      case Some(ss) => col("node").isInCollection(ss.distinct)
      case None => lit(true)
    }
    val denom = seeds.map(_.distinct.size.toLong).getOrElse(n)
    val outw = e.groupBy("src").agg(sum("w").as("outw")).persist()
    // driver-side scalars: same IEEE ops the SQL oracle spells out
    val r0 = math.round(1.0e9 / denom)
    val teleport = math.round((1.0 - damping) * 1.0e9 / denom)
    var r = nodes.withColumn("rank_micro",
      when(isSeed, lit(r0)).otherwise(lit(0L)))
    // the iteration-invariant tables are released in finally, and each
    // superseded iterate's checkpoint is freed as soon as its successor
    // materializes — a long-lived session accumulates only the final
    // node-sized result (free it with Checkpoints.free when done; the
    // stagingDir form leaves no block-manager state at all)
    try {
      for (it <- 1 to iterations) {
        val contribs = e.join(outw, "src")
          .join(r.withColumnRenamed("node", "src")
            .withColumnRenamed("rank_micro", "r_src"), "src")
          .select(col("dst").as("node"),
            round(lit(damping) * col("r_src") * col("w") / col("outw"))
              .cast("long").as("c"))
          .groupBy("node").agg(sum("c").as("cin"))
        val dangling = r
          .join(outw.withColumnRenamed("src", "node"), Seq("node"),
            "left_anti")
          .agg(coalesce(sum("rank_micro"), lit(0L)).as("dm"))
        val next = nodes.join(contribs, Seq("node"), "left")
          .crossJoin(dangling)
          .select(col("node"),
            (when(isSeed, lit(teleport) +
                round(lit(damping) * col("dm") / lit(denom.toDouble))
                  .cast("long"))
              .otherwise(lit(0L)) +
              coalesce(col("cin"), lit(0L))).as("rank_micro"))
        val prev = r
        r = stagingDir match {
          case Some(dir) =>
            val p = s"$dir/pagerank_iter_$it"
            next.write.mode("overwrite").parquet(p)
            edges.sparkSession.read.parquet(p)
          case None => next.localCheckpoint()
        }
        graft.util.Checkpoints.free(prev)
      }
      r
    } finally {
      outw.unpersist(false)
      nodes.unpersist(false)
      e.unpersist(false)
    }
  }

  /** The under-gate path: identical micro-unit arithmetic, iterated on
    * the driver over the collected (metadata-sized) edge list.
    */
  private def ranksDriver(edges: DataFrame, iterations: Int,
                          damping: Double,
                          seeds: Option[Seq[String]]): DataFrame = {
    val spark = edges.sparkSession
    // caller passes the already-projected, persisted edge table; this
    // collect reads the cache the gate count just filled
    val es = edges.collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val nodes = (es.map(_._1) ++ es.map(_._2) ++ seeds.getOrElse(Nil))
      .distinct.sorted
    val n = nodes.length.toLong
    require(n > 0, "edge list is empty")
    val seedSet: Set[String] = seeds.map(_.toSet).getOrElse(nodes.toSet)
    val denom = seedSet.size.toLong
    val outw = es.groupBy(_._1).map { case (s, g) => (s, g.map(_._3).sum) }
    val r0 = math.round(1.0e9 / denom)
    val teleport = math.round((1.0 - damping) * 1.0e9 / denom)
    var r: Map[String, Long] =
      nodes.map(v => v -> (if (seedSet(v)) r0 else 0L)).toMap
    for (_ <- 1 to iterations) {
      val dm = nodes.iterator
        .filterNot(outw.contains).map(r).sum
      val dShare = math.round(damping * dm / denom.toDouble)
      val cin = new scala.collection.mutable.HashMap[String, Long]()
      es.foreach { case (s, d, w) =>
        val c = math.round(damping * r(s) * w / outw(s))
        cin.update(d, cin.getOrElse(d, 0L) + c)
      }
      r = nodes.map(v =>
        v -> ((if (seedSet(v)) teleport + dShare else 0L) +
          cin.getOrElse(v, 0L))).toMap
    }
    import spark.implicits._
    nodes.map(v => (v, r(v))).toSeq.toDF("node", "rank_micro")
  }
}
