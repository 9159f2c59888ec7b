package graft.text

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.functions._

/** Data Selection via Importance Resampling (DSIR) — Xie et al., NeurIPS
  * 2023 ("Data Selection for Language Models via Importance Resampling"):
  * pick raw-corpus documents that look like a small target corpus by
  * modeling both as bags of hashed n-gram features, scoring each raw doc
  * with the log importance ratio of the two bucket distributions, and
  * drawing a Gumbel top-k sample proportional to the importance weights.
  *
  * Everything here is deterministic and RNG-free, like the rest of the
  * sampling family: buckets come from [[Sampling.hashBucket16]]'s md5 fold
  * and the Gumbel noise is derived from the same hash — a retried task, a
  * re-sharded corpus, or a different engine reproduces the identical
  * selection (the oracle reproduces the whole pipeline in SQL).
  *
  * Scale shape (the reason DSIR fits a 100 TB corpus):
  *  - fitting is one pass over each side that collapses to `nBuckets` rows
  *    in the map-side partial agg — the shuffle carries at most
  *    `nBuckets × tasks` rows regardless of corpus size;
  *  - the ratio table is metadata-sized (≤ 65536 rows, two doubles) and is
  *    broadcast into the scoring join, so the corpus never shuffles to be
  *    scored: explode grams → probe broadcast → per-doc partial sum. The
  *    only corpus-keyed exchange is the per-doc sum aggregation, which the
  *    partial agg collapses to ~one row per doc per task;
  *  - selection is a global top-k (`TakeOrderedAndProject`), k rows per
  *    task then k at the driver — never a full sort.
  */
object Dsir {

  /** The paper's feature map: unigram + bigram bag (WITH multiplicity —
    * counts matter, so no distinct) of whitespace tokens.
    */
  def gramBag(text: Column): Column =
    concat(TextFunctions.tokens(text), TextFunctions.shingles(text, 2))

  /** Hashed feature bucket in [0, nBuckets). `nBuckets` must divide 65536
    * (power of two ≤ 65536) so the md5 16-bit fold stays uniform.
    */
  def gramBucket(gram: Column, nBuckets: Int, salt: String): Column =
    Sampling.hashBucket16(gram, salt) % nBuckets

  private def requireBuckets(nBuckets: Int): Unit =
    require(nBuckets >= 2 && 65536 % nBuckets == 0,
      s"nBuckets must divide 65536, got $nBuckets")

  private def bucketCounts(docs: DataFrame, textCol: String, nBuckets: Int,
                           salt: String): DataFrame =
    docs.select(explode(gramBag(col(textCol))).as("gram"))
      .groupBy(gramBucket(col("gram"), nBuckets, salt).as("bucket"))
      .agg(count(lit(1)).as("n"))

  /** Fit the per-bucket log importance ratios
    * `log((n_target[b] + λ) / (T_target + λB)) − log((n_raw[b] + λ) / (T_raw + λB))`
    * (add-λ smoothing, λ = 1 by default — the paper's add-one) from a
    * target sample and the raw corpus. Returns the metadata-sized table
    * `(bucket, log_ratio)` with exactly `nBuckets` rows (absent buckets get
    * the pure-smoothing ratio, so scoring never needs an outer join).
    *
    * Both inputs are aggregated independently (each one pass, collapsing to
    * `nBuckets` groups map-side); the totals are exact integer sums, so the
    * only floating-point in the table is the final two `log` calls.
    */
  def fitLogRatios(target: DataFrame, raw: DataFrame, textCol: String = "text",
                   nBuckets: Int = 8192, salt: String = "dsir",
                   lambda: Double = 1.0): DataFrame = {
    requireBuckets(nBuckets)
    require(lambda > 0, s"lambda must be positive, got $lambda")
    val spark = target.sparkSession
    val t = bucketCounts(target, textCol, nBuckets, salt)
      .withColumnRenamed("n", "n_t")
    val r = bucketCounts(raw, textCol, nBuckets, salt)
      .withColumnRenamed("n", "n_r")
    // dense bucket spine: scoring probes this table by bucket, and a bucket
    // unseen on either side still has a well-defined smoothed ratio
    val spine = spark.range(nBuckets).select(col("id").as("bucket"))
    val joined = spine
      .join(broadcast(t), Seq("bucket"), "left")
      .join(broadcast(r), Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_t"), lit(0L)).as("n_t"),
        coalesce(col("n_r"), lit(0L)).as("n_r"))
    // integer totals over ≤ 65536 rows — exact, and computed once via a
    // window-free cross of the 1-row totals (broadcast nested loop of 1×B)
    val totals = joined.agg(sum("n_t").as("tt"), sum("n_r").as("tr"))
    joined.crossJoin(broadcast(totals))
      .select(col("bucket"), col("n_t"), col("n_r"),
        (log((col("n_t") + lambda) / (col("tt") + lambda * nBuckets))
          - log((col("n_r") + lambda) / (col("tr") + lambda * nBuckets)))
          .as("log_ratio"))
  }

  /** Score every document with its log importance weight
    * `Σ_grams log_ratio[bucket(gram)]` (bag semantics — a gram counts as
    * many times as it occurs). Documents with no grams (empty/null text)
    * score 0. Output: `(idCol, log_weight)` — deliberately METADATA-SHAPED,
    * one row per doc, NOT the corpus re-joined: gluing the weight back onto
    * the full corpus would be a corpus-sized id shuffle, while the winners
    * of the downstream top-k are k rows that semi-join back for free.
    *
    * The ratio table is broadcast (≤ 65536 rows by construction); the
    * corpus side stays narrow until the per-doc sum, whose shuffle carries
    * one partial row per (doc × task). `explode_outer` keeps gram-less docs
    * as a null-bucket row that matches no ratio, so they surface with
    * weight 0 instead of vanishing.
    */
  def scoreLogWeights(corpus: DataFrame, ratios: DataFrame,
                      textCol: String = "text", nBuckets: Int = 8192,
                      salt: String = "dsir",
                      idCol: String = "doc_id"): DataFrame = {
    requireBuckets(nBuckets)
    corpus
      .select(col(idCol), explode_outer(gramBag(col(textCol))).as("gram"))
      .select(col(idCol), gramBucket(col("gram"), nBuckets, salt).as("bucket"))
      .join(broadcast(ratios.select(col("bucket"), col("log_ratio"))),
        Seq("bucket"), "left")
      .groupBy(idCol)
      .agg(coalesce(sum("log_ratio"), lit(0.0)).as("log_weight"))
  }

  /** Deterministic Gumbel top-k resampling: draw `k` documents without
    * replacement with probability proportional to the importance weights —
    * `key = log_weight − log(−log(u))` with `u` derived from the doc-id
    * hash, take the k largest keys. The Gumbel-key construction is the
    * standard exponential-race argument (Efraimidis–Spirakis / Gumbel
    * top-k); deriving `u` from [[Sampling.hashBucket16]] instead of an RNG
    * makes the draw retry- and partition-invariant like every other
    * assignment in this family.
    *
    * The selection key is ROUNDED to 6 decimals before ranking (ties break
    * by id): two engines that agree on the rounded key — the same contract
    * every float oracle in this repo uses — then agree on the selected set,
    * so the draw itself is oracle-checkable. Output: input columns +
    * `gumbel_key` (the rounded key).
    */
  def resampleTopK(scored: DataFrame, k: Int, salt: String = "dsir:g",
                   idCol: String = "doc_id"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // u in (0,1): (bucket16 + 1) / 65537 — never 0 or 1, so the double log
    // is always finite
    val u = (Sampling.hashBucket16(col(idCol), salt) + lit(1.0)) / lit(65537.0)
    scored
      .withColumn("gumbel_key",
        round(col("log_weight") - log(-log(u)), 6))
      .orderBy(col("gumbel_key").desc, col(idCol).asc_nulls_last)
      .limit(k)
  }

  /** The composed selection: fit on (target, raw), score raw, keep top-k.
    * Output: `(idCol, log_weight, gumbel_key)` for the k winners — semi-join
    * back to the corpus to materialize the selected documents (k rows, a
    * free broadcast). See the stage functions for per-stage scale shapes.
    */
  def select(target: DataFrame, raw: DataFrame, k: Int,
             textCol: String = "text", nBuckets: Int = 8192,
             salt: String = "dsir", idCol: String = "doc_id"): DataFrame = {
    val ratios = fitLogRatios(target, raw, textCol, nBuckets, salt)
    resampleTopK(
      scoreLogWeights(raw, ratios, textCol, nBuckets, salt, idCol),
      k, salt + ":g", idCol)
  }
}
