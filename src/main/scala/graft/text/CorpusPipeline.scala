package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The end-to-end training-data prep pipeline as ONE library operator:
  * normalize → quality filter → exact dedup (min-id winner) → benchmark
  * decontamination → deterministic split assignment. Every stage is one of
  * the standalone operators in this package; composing them here pins the
  * stage ORDER and the one materialization point the composition needs.
  *
  * Materialization: five downstream branches (filter ids, dedup winners, two
  * semi-joins, the split rollup) consume the normalized corpus — without a
  * materialization each would recompute the scan+normalize chain. Two modes:
  *
  *  - `staging = None` (default): `localCheckpoint` — executor-local blocks,
  *    fastest, right for interactive/small-scale runs. The blocks die with
  *    an executor and never spill past local storage, so a multi-hour run
  *    has no restart path and the corpus must fit cluster-local storage.
  *  - `staging = Some(dir)`: the normalized corpus is written ONCE as
  *    parquet under `dir` and every branch reads the staged copy — durable
  *    on any Hadoop filesystem (object store included), restartable, and
  *    the single-writer analog of [[graft.dedup.Clusters.connectedComponents]]'s
  *    `checkpointDir` option. The caller owns the directory's lifecycle.
  */
object CorpusPipeline {

  /** Pipeline configuration; defaults match the library capstone query
    * (`d_corpus_pipeline`) so the oracle pins this exact composition.
    *
    * @param dedupKey    exact-dup grouping key given the normalized text
    *                    column (default: md5 of the lowercased first 40
    *                    chars — the cheap prefix key the battery uses)
    * @param benchmarkPred rows satisfying it are the held-out benchmark set:
    *                    excluded from training AND any training doc sharing
    *                    a `shingleN`-gram with them is dropped (GPT-3
    *                    appendix-C style decontamination)
    */
  final case class Config(
      filter: CorpusClean.FilterConfig = CorpusClean.FilterConfig(
        minTokens = Some(30L), maxTokens = None, minStopwordRatio = None,
        maxDupLineCharFrac = Some(0.2), maxTop2gramCharFrac = Some(0.15),
        keepLangs = None),
      dedupKey: Column => Column = t => md5(lower(substring(t, 1, 40))),
      benchmarkPred: Column = col("doc_id") % 20 === 7,
      shingleN: Int = 13,
      splits: Seq[(String, Double)] =
        Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1),
      splitSalt: String = "split",
      // URL curation (both need a URL column in the input, carried through
      // to the output): urlCol turns on URL-level dedup immediately after
      // normalization — the cheapest stage, so it runs FIRST (RefinedWeb
      // order: a page fetched under N cosmetic URL variants dies before any
      // text-level work pays for it). maxDocsPerDomain applies the
      // per-domain quota to the FINAL clean corpus (after content dedup and
      // decontamination), right before splits — a quota taken earlier would
      // count docs that later stages delete.
      urlCol: Option[String] = None,
      maxDocsPerDomain: Option[Int] = None,
      // raw crawl input: extract text from HTML markup BEFORE normalization
      // (the C4/RefinedWeb stage order — every downstream line-granular
      // rule assumes prose lines, not tag soup)
      htmlInput: Boolean = false,
      // UT1/Dolma-style (kind, pattern) blocklist — needs urlCol; applied
      // FIRST, on a narrow (id, url) projection of the raw input, so a
      // blocked page never pays for extraction, normalization, or any
      // text-level stage (the order real curation pipelines use: the list
      // gates the crawl, not the cleaned corpus)
      blocklist: Option[DataFrame] = None)

  /** Materialize a stage consumed by several downstream branches: local
    * checkpoint by default, a write-once/read-many parquet staging dir when
    * `staging` is set (durable + restartable — see the class doc). Exposed
    * so other multi-branch compositions can make the same choice.
    */
  def materializeStage(df: DataFrame, staging: Option[String],
                       name: String): DataFrame =
    staging match {
      case None => df.localCheckpoint(true)
      case Some(dir) =>
        val path = s"$dir/$name"
        df.write.mode("overwrite").parquet(path)
        df.sparkSession.read.parquet(path)
    }

  /** Clean-corpus rows (doc_id, source, text, split) after the whole chain.
    * Input needs `doc_id`, `source`, `text`.
    */
  def prepare(raw: DataFrame, cfg: Config = Config(),
              staging: Option[String] = None): DataFrame = {
    require(cfg.maxDocsPerDomain.isEmpty || cfg.urlCol.isDefined,
      "maxDocsPerDomain needs urlCol")
    require(cfg.blocklist.isEmpty || cfg.urlCol.isDefined,
      "blocklist needs urlCol")
    // blocklist gate on (id, url) only — blocked ids anti-join the raw
    // input before any text column is even read
    val gated = (cfg.urlCol, cfg.blocklist) match {
      case (Some(u), Some(bl)) =>
        val blockedIds = CorpusClean.urlBlocklist(
            raw.select(col("doc_id"), col(u)), u, bl)
          .where(col("blocked_by").isNotNull)
          .select("doc_id")
        raw.join(blockedIds, Seq("doc_id"), "left_anti")
      case _ => raw
    }
    val textIn =
      if (cfg.htmlInput) CorpusClean.extractHtmlText(col("text")) else col("text")
    val norm0 = materializeStage(
      gated.select(col("doc_id") +: col("source") +:
        CorpusClean.normalizeText(textIn).as("text") +:
        cfg.urlCol.toSeq.map(col): _*),
      staging, "normalized")
    // URL-level dedup first: length(text) is the winner criterion — the
    // scratch column never survives into the pipeline schema
    val norm = cfg.urlCol match {
      case Some(u) => CorpusClean.urlDedup(
          norm0.withColumn("__len", length(col("text"))), u, lenCol = "__len")
        .drop("__len", "url_norm")
      case None => norm0
    }
    val keptIds = CorpusClean.filterCorpus(norm, cfg.filter)
      .where(col("keep")).select("doc_id")
    val kept = norm.join(keptIds, Seq("doc_id"), "left_semi")
    // exact dedup within the survivors: keep the min doc_id per key
    val dupWinners = kept
      .groupBy(cfg.dedupKey(col("text")).as("k"))
      .agg(min("doc_id").as("doc_id"))
      .select("doc_id")
    val deduped = kept.join(dupWinners, Seq("doc_id"), "left_semi")
    // benchmark docs never train; survivors sharing an n-gram with the RAW
    // benchmark text are dropped too
    val train = deduped.filter(!cfg.benchmarkPred)
    val contaminated = Sampling.decontaminate(
      train, raw.filter(cfg.benchmarkPred), shingleN = cfg.shingleN)
    val clean = train.join(contaminated.select("doc_id"), Seq("doc_id"), "left_anti")
    // the per-domain quota counts only docs that made it through every
    // deletion stage — a capped domain's slots must not be spent on rows
    // dedup or decontamination would have removed anyway
    val capped = (cfg.urlCol, cfg.maxDocsPerDomain) match {
      case (Some(u), Some(capN)) => CorpusClean.domainCap(
          clean.withColumn("__len", length(col("text"))), u, capN,
          lenCol = "__len")
        .drop("__len", "domain")
      case _ => clean
    }
    Sampling.assignSplits(capped, cfg.splits, salt = cfg.splitSalt)
  }

  /** Per-split doc/token rollup of [[prepare]] — the capstone query shape. */
  def summary(raw: DataFrame, cfg: Config = Config(),
              staging: Option[String] = None): DataFrame =
    prepare(raw, cfg, staging)
      .groupBy("split")
      .agg(count(lit(1)).as("n_docs"),
        sum(TextFunctions.tokenCount(col("text")).cast("long")).as("n_tokens"))
      .orderBy("split")
}
