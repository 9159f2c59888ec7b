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
    */
  def ranks(edges: DataFrame, iterations: Int = 10, damping: Double = 0.85,
            stagingDir: Option[String] = None): DataFrame = {
    require(iterations >= 0, "iterations must be >= 0")
    require(damping > 0 && damping < 1, "damping must be in (0, 1)")
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
    val e = edges.select(col("src"), col("dst"), col("w").cast("long"))
      .persist()
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct().persist()
    val n = nodes.count()
    require(n > 0, "edge list is empty")
    val outw = e.groupBy("src").agg(sum("w").as("outw")).persist()
    // driver-side scalars: same IEEE ops the SQL oracle spells out
    val r0 = math.round(1.0e9 / n)
    val teleport = math.round((1.0 - damping) * 1.0e9 / n)
    var r = nodes.withColumn("rank_micro", lit(r0))
    for (it <- 1 to iterations) {
      val contribs = e.join(outw, "src")
        .join(r.withColumnRenamed("node", "src")
          .withColumnRenamed("rank_micro", "r_src"), "src")
        .select(col("dst").as("node"),
          round(lit(damping) * col("r_src") * col("w") / col("outw"))
            .cast("long").as("c"))
        .groupBy("node").agg(sum("c").as("cin"))
      val dangling = r
        .join(outw.withColumnRenamed("src", "node"), Seq("node"), "left_anti")
        .agg(coalesce(sum("rank_micro"), lit(0L)).as("dm"))
      val next = nodes.join(contribs, Seq("node"), "left")
        .crossJoin(dangling)
        .select(col("node"),
          (lit(teleport) +
            round(lit(damping) * col("dm") / lit(n.toDouble)).cast("long") +
            coalesce(col("cin"), lit(0L))).as("rank_micro"))
      r = stagingDir match {
        case Some(dir) =>
          val p = s"$dir/pagerank_iter_$it"
          next.write.mode("overwrite").parquet(p)
          edges.sparkSession.read.parquet(p)
        case None => next.localCheckpoint()
      }
    }
    r
  }
}
