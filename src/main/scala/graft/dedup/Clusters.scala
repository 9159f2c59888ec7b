package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-duplicate pair lists, and the
  * canonical-document selection built on it — the stage that turns the pair
  * families ([[Dedup.minhashPairs]], [[Dedup.simhashPairs]],
  * [[Dedup.ngramJaccardPairs]], [[Dedup.embeddingPairs]]) into "keep one doc
  * per duplicate group". Pairs are not enough at corpus scale: near-dup
  * relations chain (A~B, B~C but not A~C), and dropping `id_b` of every pair
  * over-deletes — the correct grouping is the transitive closure.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014). Each round is
  * a groupBy-min plus a key-partitioned join — no driver-side state, state
  * size O(edges) throughout, worst-case O(log² n) rounds on path-shaped
  * graphs and 2–3 rounds on the near-clique graphs LSH families emit. Every
  * round ends in an eager `localCheckpoint` so round k's plan does not
  * replay rounds 1..k-1 and the lineage stays constant-size — the standard
  * requirement for iterative DataFrame algorithms at scale.
  */
object Clusters {

  /** Component id (= the minimum member id) for every id that appears in
    * `pairs`. Output columns: `id`, `component`. Ids not mentioned in any
    * pair are absent (they are their own singleton component — see
    * [[assignComponents]] for the corpus-complete form).
    *
    * @param maxRounds safety bound; the algorithm converges (edge set reaches
    *   its star-graph fixed point) long before this on real graphs. Throws if
    *   the bound is hit un-converged rather than returning a wrong grouping.
    */
  def connectedComponents(pairs: DataFrame, idA: String = "id_a",
                          idB: String = "id_b", maxRounds: Int = 30): DataFrame = {
    val spark = pairs.sparkSession
    // canonical direction (big, small); self-pairs carry no information
    var edges = pairs.select(
        greatest(col(idA), col(idB)).as("u"), least(col(idA), col(idB)).as("v"))
      .where(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(true)
    var round = 0
    var converged = edges.isEmpty
    while (!converged && round < maxRounds) {
      // large-star: every neighbor v > u links to min(Γ⁺(u))
      val symm = edges.union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMin = symm.groupBy("u")
        .agg(least(min("v"), first("u")).as("m"))
      val ls = symm.join(lsMin, "u").where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
      // small-star: every neighbor v < u (and u itself) links to min(N≤(u))
      val lsSymm = ls.union(ls.select(col("v").as("u"), col("u").as("v")))
      val down = lsSymm.where(col("v") < col("u"))
      val ssMin = down.groupBy("u").agg(min("v").as("m"))
      val next = down.join(ssMin, "u").where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .union(ssMin.select(col("u"), col("m").as("v")))
        .distinct()
        .localCheckpoint(true)
      // convergence: the canonical edge multiset is stable. Two scalars —
      // count + an order-independent hash sum — not an except() diff, so the
      // check costs one aggregation at any scale.
      def sig(e: DataFrame): (Long, java.math.BigDecimal) = {
        // decimal sum: an ANSI-mode long sum of 64-bit hashes overflows
        val r = e.agg(count(lit(1)), coalesce(
            sum(xxhash64(col("u"), col("v")).cast("decimal(38,0)")),
            lit(0).cast("decimal(38,0)")))
          .head()
        (r.getLong(0), r.getDecimal(1))
      }
      converged = sig(next) == sig(edges)
      edges = next
      round += 1
    }
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    // fixed point is a star graph: u -> root, roots implicit
    edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")).distinct())
  }

  /** Every row of `df` labeled with its duplicate-group component: the min
    * member id for ids in some pair, the id itself for singletons. One
    * broadcast-or-shuffle left join against the (small) component map.
    */
  def assignComponents(df: DataFrame, idCol: String, pairs: DataFrame,
                       idA: String = "id_a", idB: String = "id_b",
                       maxRounds: Int = 30): DataFrame = {
    val cc = connectedComponents(pairs, idA, idB, maxRounds)
    df.join(cc, df(idCol) === cc("id"), "left")
      .drop("id")
      .withColumn("component", coalesce(col("component"), col(idCol)))
  }

  /** Keep exactly one document per duplicate group (the minimum id — the
    * same canonical-winner rule as [[Dedup.exact]]); singletons survive.
    */
  def dropDuplicateGroups(df: DataFrame, idCol: String, pairs: DataFrame,
                          idA: String = "id_a", idB: String = "id_b"): DataFrame =
    assignComponents(df, idCol, pairs, idA, idB)
      .where(col(idCol) === col("component"))
      .drop("component")
}
