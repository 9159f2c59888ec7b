package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic corpus sampling for training-data pipelines: hash-based
  * train/val/test splits, per-source weighted mixing (epoch up/down-sampling,
  * the Pile/Dolma recipe), and benchmark decontamination (n-gram overlap
  * against an eval set, the GPT-3 appendix-C recipe).
  *
  * All assignment decisions key on `md5(id ":" salt)` truncated to 16 bits —
  * portable integer arithmetic that any engine (and any future re-run)
  * reproduces exactly, so a document's split/sample fate never depends on
  * partitioning, row order, or RNG state. A 100 TB corpus re-sharded five
  * ways still sends each doc to the same split.
  */
object Sampling {

  /** 16-bit hash bucket in [0, 65536) keyed on (id, salt) — `md5` is
    * available and bit-identical everywhere (Spark, DuckDB, Python), unlike
    * engine-private hashes. 16 bits keeps threshold comparisons exact while
    * giving 0.0015% split granularity.
    */
  def hashBucket16(id: Column, salt: String): Column =
    conv(substring(md5(concat(id.cast("string"), lit(":" + salt))), 1, 4),
      16, 10).cast("long")

  /** Integer threshold for a cumulative weight — the exact cut used by both
    * [[assignSplits]] and [[sampleWeighted]].
    */
  private def cut(cumWeight: Double): Long = math.round(cumWeight * 65536.0)

  /** Deterministic split assignment: `splits` is an ordered list of
    * (name, weight) with weights summing to ~1; a document lands in the
    * first split whose cumulative hash-bucket cut exceeds its bucket. The
    * LAST split absorbs any rounding remainder (so every doc is assigned).
    * A null id hashes to null, so it falls through every cut and lands —
    * deterministically — in the last split (spec-pinned).
    * Output: input columns + `split`. Pure narrow map, zero shuffle —
    * at any corpus size this costs one md5 per row on top of the scan.
    */
  def assignSplits(docs: DataFrame, splits: Seq[(String, Double)],
                   salt: String = "split", idCol: String = "doc_id"): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "split weights must be non-negative")
    val total = splits.map(_._2).sum
    require(math.abs(total - 1.0) < 1e-9, s"split weights must sum to 1, got $total")
    val b = hashBucket16(col(idCol), salt)
    val cuts = splits.scanLeft(0.0)(_ + _._2).tail.map(cut)
    // last split takes everything left of 65536 regardless of rounding
    val assigned = splits.init.zip(cuts).foldRight(lit(splits.last._1)) {
      case (((name, _), c), acc) => when(b < c, lit(name)).otherwise(acc)
    }
    docs.withColumn("split", assigned)
  }

  /** Deterministic weighted mixing: each source's weight w is the expected
    * number of copies of each of its documents in the output — w = 2.5 means
    * every doc appears twice and a hash-chosen half appear a third time;
    * w = 0.25 keeps a hash-chosen quarter. `weights` overrides per source,
    * `defaultWeight` covers the rest. Output: input columns + `copy`
    * (0-based). The hash decision is per (id, salt), independent of the
    * split salt, so mixing and splitting never correlate.
    *
    * Scale shape: narrow map + generator (explode of an at-most-⌈w⌉-element
    * sequence) — zero shuffle, and output size is exactly Σ w_s·|s| rows. No
    * RNG: retried tasks regenerate identical copies, so speculative
    * execution and stage replay can't duplicate or drop a document.
    */
  /** Temperature-based source mixing (the XLM-R / mT5 recipe): source `s`
    * with `n_s` documents is sampled toward proportion `p_s ∝ n_s^alpha`,
    * i.e. each of its documents gets expected-copy weight
    * `w_s = targetFactor * N * n_s^(alpha-1) / Σ_k n_k^alpha` — `alpha = 1`
    * is natural proportions, `alpha = 0` equal-per-source, between the two
    * the standard low-resource upsampling curve. `targetFactor` scales the
    * expected output size relative to the corpus (1.0 ≈ same total docs).
    *
    * The per-source counts are a metadata-sized aggregate (one row per
    * source) collected to the driver; the copies themselves reuse
    * [[sampleWeighted]]'s hash-deterministic mechanics, so the output
    * multiset is partition- and retry-invariant. Documents whose `keyCol`
    * is null (no source to weight by) pass through with weight 1.
    */
  def temperatureMix(docs: DataFrame, alpha: Double, targetFactor: Double = 1.0,
                     salt: String = "temp", idCol: String = "doc_id",
                     keyCol: String = "source"): DataFrame = {
    require(alpha >= 0.0 && alpha <= 1.0, s"alpha must be in [0,1], got $alpha")
    require(targetFactor > 0.0, "targetFactor must be positive")
    // sorted by source so the two fp summations below have ONE canonical
    // order — collect() partition order must not be able to shift n/z by an
    // ulp and flip a copy-count cut on a .5 boundary
    val counts = docs.groupBy(keyCol).count().collect()
      .filter(!_.isNullAt(0))
      .map(r => r.getString(0) -> r.getLong(1).toDouble)
      .sortBy(_._1)
    require(counts.nonEmpty, "no non-null sources to mix")
    val n = counts.map(_._2).sum
    val z = counts.map(c => math.pow(c._2, alpha)).sum
    val weights = counts.map { case (k, ns) =>
      k -> (targetFactor * n * math.pow(ns, alpha) / ns / z)
    }.toMap
    sampleWeighted(docs, weights, defaultWeight = 1.0, salt, idCol, keyCol)
  }

  /** Deterministic global training-order shuffle: every document gets a
    * (shard, pos) coordinate where `shard` is an md5-derived bucket mod
    * `nShards` and `pos` is the document's rank within its shard under the
    * md5 order — i.e. the corpus read back shard-by-shard, position-by-
    * position is a pseudo-random permutation that is identical for any
    * partitioning, any retry, any engine (the training-data requirement:
    * shuffle once, reproduce forever; RNG-free like every assignment in
    * this file). Ties under the hex key break by id; documents with a null
    * id share a null shard and have no defined order among themselves.
    *
    * Scale shape: one exchange on `shard` plus a per-shard sort — exactly
    * the repartition+sortWithinPartitions shape a shard writer runs; size
    * `nShards` to O(output files), keeping each shard's sort
    * executor-sized.
    */
  def shuffleOrder(docs: DataFrame, nShards: Int, salt: String = "shuffle",
                   idCol: String = "doc_id"): DataFrame = {
    require(nShards >= 1, "nShards must be >= 1")
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col(idCol).cast("string"), lit(":" + salt)))
    val shard = (hashBucket16(col(idCol), salt + ":shard") % nShards).cast("int")
    docs
      .withColumn("shard", shard)
      .withColumn("shuffle_key", key)
      .withColumn("pos",
        (row_number().over(
          Window.partitionBy("shard").orderBy(col("shuffle_key"), col(idCol)))
          - 1).cast("long"))
      .drop("shuffle_key")
  }

  def sampleWeighted(docs: DataFrame, weights: Map[String, Double],
                     defaultWeight: Double = 1.0, salt: String = "mix",
                     idCol: String = "doc_id", keyCol: String = "source"): DataFrame = {
    require((weights.values ++ Seq(defaultWeight)).forall(_ >= 0),
      "weights must be non-negative")
    val w = weights.foldRight(lit(defaultWeight)) { case ((k, v), acc) =>
      when(col(keyCol) === k, lit(v)).otherwise(acc)
    }
    val whole = floor(w).cast("long")
    val frac = w - whole
    val b = hashBucket16(col(idCol), salt)
    // copies = floor(w) + (bucket < round(frac * 65536) ? 1 : 0); the frac
    // cut is computed per row because w is a column — round() matches cut()
    val copies = (whole +
      when(b < round(frac * 65536.0).cast("long"), 1L).otherwise(0L)).as("n_copies")
    docs.withColumn("n_copies", copies)
      .where(col("n_copies") > 0)
      .withColumn("copy", explode(sequence(lit(0L), col("n_copies") - 1L)))
      .drop("n_copies")
  }

  /** Deterministic stratified take: EXACTLY min(k, |stratum|) documents per
    * stratum, chosen by hash order (bucket, then id as tiebreak) — "give me
    * 1000 docs per language, the same 1000 every run, on any cluster".
    * Output: input columns, filtered.
    *
    * Scale shape: rank-over-window with the `rn <= k` filter directly on the
    * window, which Spark rewrites into WindowGroupLimit — each map task
    * pre-truncates its partition to k rows per stratum BEFORE the shuffle,
    * so a billion-row stratum ships ~k×tasks rows, not the stratum. The
    * plan-lock in SamplingSpec fails if a refactor loses that rewrite.
    */
  def stratifiedTake(docs: DataFrame, k: Int, strataCols: Seq[String],
                     salt: String = "strat", idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    require(strataCols.nonEmpty, "at least one stratum column required")
    import org.apache.spark.sql.expressions.Window
    // null ids hash to null, which would sort FIRST (and tie among
    // themselves with no further key) — push them last so the selected k is
    // stable whenever real ids fill the quota. Multiple null-id rows are
    // mutually indistinguishable; determinism for them needs a real id.
    val w = Window.partitionBy(strataCols.map(col): _*)
      .orderBy(coalesce(hashBucket16(col(idCol), salt), lit(65536L)),
        col(idCol).asc_nulls_last)
    docs.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
      .drop("__rn")
  }

  /** Benchmark decontamination: flag corpus documents sharing ≥ `minMatches`
    * distinct word `shingleN`-grams with the benchmark set (13-grams is the
    * published GPT-3/PaLM overlap rule). Returns `(idCol, n_matched)` for
    * flagged docs only — anti-join it back to drop them.
    *
    * Scale shape: the benchmark side (eval sets — thousands of docs, not
    * billions) collapses to DISTINCT n-grams and is explicitly broadcast, so
    * the 100 TB corpus side never shuffles: each task streams its scan
    * partition, explodes per-doc distinct shingles, probes the broadcast
    * hash set, and emits only hits into the tiny per-doc count aggregation.
    * The corpus-side groupBy shuffles hits only (≈ contaminated docs ×
    * matched grams), not the corpus.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, shingleN: Int = 13,
                    minMatches: Int = 1, idCol: String = "doc_id",
                    textCol: String = "text",
                    broadcastMaxGrams: Long = 20000000L): DataFrame = {
    require(shingleN >= 1, "shingleN must be >= 1")
    require(minMatches >= 1, "minMatches must be >= 1")
    val benchGrams = benchmark
      .select(explode(array_distinct(
        TextFunctions.shingles(col(textCol), shingleN))).as("gram"))
      .distinct()
    val corpusGrams = corpus.select(col(idCol),
      explode(array_distinct(
        TextFunctions.shingles(col(textCol), shingleN))).as("gram"))
    // broadcast is the right plan exactly when the gram set is actually
    // small — gate on the MEASURED count, because an unconditional broadcast
    // hint of an unexpectedly huge eval set is a driver OOM, and a shuffle
    // join of a huge corpus against a tiny set wastes the whole corpus's
    // worth of exchange. The count is a second evaluation of the benchmark
    // pipeline (benchmarks are eval-set sized by contract, so that's cheap);
    // deliberately NOT a localCheckpoint — the checkpoint would have to stay
    // pinned in the block manager for the life of the returned (lazy)
    // DataFrame with no handle for the caller to free it.
    val joined =
      if (benchGrams.count() <= broadcastMaxGrams)
        corpusGrams.join(broadcast(benchGrams), Seq("gram"))
      else corpusGrams.join(benchGrams, Seq("gram"))
    joined.groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_matched"))
      .where(col("n_matched") >= minMatches)
  }

  /** Contamination PROVENANCE: which benchmark documents leak into which
    * corpus documents, and by how many distinct shared shingles —
    * `(idCol, benchmark_id, n_shared_grams)`, one row per contaminated
    * (corpus doc, benchmark doc) pair. [[decontaminate]] answers "is this
    * doc contaminated"; this answers the follow-up every eval owner asks —
    * "by WHICH benchmark item" — which decides whether to drop the doc or
    * retire the leaked item.
    *
    * Two-stage scale shape: [[decontaminate]]'s gated annotate narrows the
    * corpus to FLAGGED docs first (at 100 TB contamination is a tiny
    * fraction by construction), so the gram-granular inverted join — the
    * only stage paying per-(doc, gram) pair rows — runs at contamination
    * scale, never corpus scale. Both sides dedup shingles per doc, so
    * `n_shared_grams` counts DISTINCT shared shingles; a gram appearing in
    * several benchmark docs yields one row per benchmark doc (that is the
    * provenance).
    */
  def decontaminateReport(corpus: DataFrame, benchmark: DataFrame,
                          shingleN: Int = 13, minMatches: Int = 1,
                          idCol: String = "doc_id", textCol: String = "text",
                          benchIdCol: String = "doc_id",
                          broadcastMaxGrams: Long = 20000000L): DataFrame = {
    require(idCol != "benchmark_id",
      "idCol 'benchmark_id' collides with the output's benchmark side")
    val flaggedIds = decontaminate(corpus, benchmark, shingleN, minMatches,
      idCol, textCol, broadcastMaxGrams).select(idCol)
    val flagged = corpus.join(flaggedIds, Seq(idCol), "left_semi")
    val corpusGrams = flagged.select(col(idCol),
      explode(array_distinct(
        TextFunctions.shingles(col(textCol), shingleN))).as("gram"))
    val benchGrams = benchmark.select(col(benchIdCol).as("benchmark_id"),
      explode(array_distinct(
        TextFunctions.shingles(col(textCol), shingleN))).as("gram"))
    corpusGrams.join(benchGrams, Seq("gram"))
      .groupBy(col(idCol), col("benchmark_id"))
      .agg(count(lit(1)).cast("long").as("n_shared_grams"))
  }

  /** Bloom-pruned decontamination — the 100 TB shape for a benchmark gram
    * set too large to broadcast. [[decontaminate]]'s fallback above shuffles
    * EVERY corpus gram into a sort-merge join when the gram set exceeds the
    * broadcast gate; here the corpus grams are first probed map-side against
    * a compact bloom filter of the benchmark grams (built distributed, one
    * `stat.bloomFilter` tree-aggregation; carried as a broadcast; probed by
    * a native codegen expression), so only true hits plus an `fpp` fraction
    * of the corpus ever reach the shuffle. The survivors then confirm
    * against the exact gram set, which kills every false positive — the
    * OUTPUT IS EXACT, identical contract (and oracle) as [[decontaminate]];
    * the bloom only prunes.
    *
    * Both sides hash grams with xxhash64 and the bloom stores the LONG
    * hashes — the same value inserted is the same value probed, so a true
    * benchmark gram can never be missed (no string-encoding ambiguity
    * between put and probe paths; a 64-bit collision is just one more false
    * positive for the confirm join).
    *
    * @param fpp false-positive probability to size the filter for; the cost
    *   knob between filter size (broadcast bytes) and wasted shuffle.
    * @param knownGramCount skip the sizing count when the caller already
    *   knows the benchmark gram cardinality.
    */
  def decontaminateBloom(corpus: DataFrame, benchmark: DataFrame,
                         shingleN: Int = 13, minMatches: Int = 1,
                         idCol: String = "doc_id", textCol: String = "text",
                         fpp: Double = 0.01,
                         knownGramCount: Option[Long] = None): DataFrame = {
    require(shingleN >= 1, "shingleN must be >= 1")
    require(minMatches >= 1, "minMatches must be >= 1")
    val spark = corpus.sparkSession
    val benchGrams = benchmark
      .select(explode(array_distinct(
        TextFunctions.shingles(col(textCol), shingleN))).as("gram"))
      .distinct()
    val n = knownGramCount.getOrElse(benchGrams.count())
    if (n == 0L)
      // no benchmark grams → nothing can be contaminated; keep the schema
      return corpus.select(col(idCol), lit(0L).as("n_matched")).where(lit(false))
    val bloom = benchGrams.select(xxhash64(col("gram")).as("h"))
      .stat.bloomFilter("h", n, fpp)
    val bc = spark.sparkContext.broadcast(bloom)
    val corpusGrams = corpus.select(col(idCol),
      explode(array_distinct(
        TextFunctions.shingles(col(textCol), shingleN))).as("gram"))
    val candidates = corpusGrams.where(
      graft.functions.KFunctions.bloom_might_contain(xxhash64(col("gram")), bc))
    candidates.join(benchGrams, Seq("gram"))
      .groupBy(idCol)
      .agg(count(lit(1)).cast("long").as("n_matched"))
      .where(col("n_matched") >= minMatches)
  }
}
