package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed BPE (byte-pair-encoding) vocabulary training — the
  * tokenizer-building step of a training-data pipeline, Spark-first.
  *
  * Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units" — public method): start from characters,
  * repeatedly merge the most frequent adjacent symbol pair.
  *
  * Scale shape — the part that matters at 100 TB:
  *   - the CORPUS is touched exactly once, by [[wordHistogram]] (a
  *     map-side-combined count over tokens). Everything after runs on the
  *     distinct-word histogram, which is vocabulary-bounded (Zipf: millions
  *     of rows for a 100 TB corpus, i.e. executor-trivial) and carries
  *     frequencies, so merge decisions weigh the full corpus without
  *     rescanning it;
  *   - each merge round is one narrow rewrite of the symbol arrays (an
  *     `aggregate` HOF fold — no UDF) plus one small pair-count aggregation;
  *     only the single argmax row reaches the driver per round;
  *   - per-round results are materialized (local checkpoint by default, a
  *     RELIABLE checkpoint when `checkpointDir` is set — same durability
  *     option as `Clusters.connectedComponents`) so N rounds hold one
  *     round of state and the fold's expression depth never compounds.
  *
  * Determinism: ties on pair frequency break lexicographically on (a, b),
  * so a re-run (or a retry after executor loss) learns the identical merge
  * sequence.
  */
object BpeTrainer {

  /** One learned merge: `a`+`b` → `a+b`, with its rank (0-based order) and
    * the weighted pair frequency that won the round.
    */
  case class Merge(rank: Int, a: String, b: String, freq: Long)

  /** End-of-word marker (Sennrich's `</w>`): appended as a final symbol so
    * merges can distinguish word-final from word-internal contexts.
    */
  val EndMarker = "</w>"

  /** The single corpus pass: lowercased whitespace-token histogram.
    * Output: (word, freq). Map-side partial aggregation collapses the
    * shuffle to distinct-word size.
    */
  def wordHistogram(docs: DataFrame, textCol: String): DataFrame =
    docs.where(col(textCol).isNotNull)
      .select(explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))

  /** Character-split symbol arrays over the histogram: (word, freq, syms).
    * `endMarker=true` appends [[EndMarker]] as one extra symbol.
    */
  def initialSymbols(words: DataFrame, endMarker: Boolean = false): DataFrame = {
    val chars = filter(split(col("word"), ""), c => c =!= "")
    words.withColumn("syms",
      if (endMarker) concat(chars, array(lit(EndMarker))) else chars)
  }

  /** Adjacent-pair weighted counts over symbol arrays: (a, b, pair_freq).
    * zip of two slices — native, codegen-friendly, no UDF.
    */
  def pairCounts(symWords: DataFrame): DataFrame =
    symWords.where(size(col("syms")) >= 2)
      .select(col("freq"), explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (x, y) => struct(x.as("a"), y.as("b")))).as("pr"))
      .groupBy(col("pr.a").as("a"), col("pr.b").as("b"))
      .agg(sum("freq").as("pair_freq"))

  /** One BPE merge applied to a symbol array: replace non-overlapping
    * adjacent (a, b) occurrences left-to-right with a+b. A pure `aggregate`
    * fold; the merged symbol can never equal `a` (b is non-empty), so the
    * plain fold is exactly the left-to-right non-overlapping semantics.
    */
  def mergeSyms(syms: Column, a: String, b: String): Column =
    aggregate(syms, array().cast("array<string>"),
      (acc, x) => when(
        size(acc) > 0 && element_at(acc, -1) === lit(a) && x === lit(b),
        concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
        .otherwise(concat(acc, array(x))))

  /** Training result: the ordered merge table plus the final per-word
    * symbolization (for vocab extraction / inspection).
    */
  case class TrainResult(merges: Seq[Merge], symWords: DataFrame) {
    /** Learned vocabulary: every surviving symbol with its corpus weight. */
    def vocab: DataFrame =
      symWords.select(col("freq"), explode(col("syms")).as("symbol"))
        .groupBy("symbol").agg(sum("freq").as("weight"))
  }

  /** Learn `numMerges` merges over `docs(textCol)`.
    *
    * @param minFreq stop early when the best pair's weighted frequency
    *   drops below this floor (vocabulary saturated).
    * @param endMarker Sennrich end-of-word symbol on/off.
    * @param checkpointDir when set, per-round state checkpoints RELIABLY to
    *   this path (survives executor loss on a long run); default is fast
    *   executor-local checkpoints. Caller owns the directory lifecycle.
    *   The session's checkpoint dir is redirected for the duration and
    *   restored in `finally` (same contract as Clusters.connectedComponents;
    *   single-threaded-session assumption documented there).
    */
  def train(docs: DataFrame, textCol: String, numMerges: Int,
            minFreq: Long = 2L, endMarker: Boolean = false,
            checkpointDir: Option[String] = None): TrainResult = {
    val spark = docs.sparkSession
    val priorCheckpointDir = spark.sparkContext.getCheckpointDir
    checkpointDir.foreach(spark.sparkContext.setCheckpointDir)
    try {
      def materialize(df: DataFrame): DataFrame =
        if (checkpointDir.isDefined) df.checkpoint(true)
        else df.localCheckpoint(true)
      def free(df: DataFrame): Unit = df.queryExecution.logical match {
        case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
        case _ => ()
      }

      var sym = materialize(initialSymbols(wordHistogram(docs, textCol), endMarker))
      val merges = Seq.newBuilder[Merge]
      var rank = 0
      var done = false
      while (rank < numMerges && !done) {
        val best = pairCounts(sym)
          .orderBy(col("pair_freq").desc, col("a"), col("b"))
          .limit(1).collect()
        best.headOption match {
          case Some(r) if r.getLong(2) >= minFreq =>
            val (a, b) = (r.getString(0), r.getString(1))
            merges += Merge(rank, a, b, r.getLong(2))
            val next = materialize(
              sym.withColumn("syms", mergeSyms(col("syms"), a, b)))
            free(sym)
            sym = next
            rank += 1
          case _ => done = true
        }
      }
      TrainResult(merges.result(), sym)
    } finally {
      // restore even on mid-loop failure so the session's checkpoint dir
      // never stays redirected to the scratch path
      if (checkpointDir.isDefined)
        spark.sparkContext.setCheckpointDir(priorCheckpointDir.orNull)
    }
  }

  /** Apply a learned merge table to new text — the encode side.
    *
    * The merge fold runs over the batch's DISTINCT words (vocabulary-sized,
    * the same shape [[train]] exploits), NOT over every token occurrence:
    * per `mergesPerStep` merges the word table is materialized eagerly and
    * the previous step freed — bounded expression depth AND exactly one
    * vocabulary-sized block alive at a time (a fold over the exploded
    * corpus would persist corpus-scale intermediates with no way to free
    * them mid-action). Occurrences then pick up their symbolization with
    * one broadcast-sized join on `word`.
    *
    * Output: input columns + `word` + `syms`, one row per token occurrence.
    */
  def encodedSymbols(docs: DataFrame, textCol: String, merges: Seq[Merge],
                     endMarker: Boolean = false,
                     mergesPerStep: Int = 16): DataFrame = {
    require(!docs.columns.contains("word") && !docs.columns.contains("syms"),
      "input already has a word/syms column — rename it first")
    def free(df: DataFrame): Unit = df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }
    val occurrences = docs.where(col(textCol).isNotNull)
      .select(col("*"), explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val chars0 = filter(split(col("word"), ""), c => c =!= "")
    val chars = if (endMarker) concat(chars0, array(lit(EndMarker))) else chars0
    val base = occurrences.select("word").distinct().withColumn("syms", chars)
    val encodedWords = merges.sortBy(_.rank).grouped(mergesPerStep)
      .foldLeft(base.localCheckpoint(true)) { (df, batch) =>
        val stepped = batch.foldLeft(df)((d, m) =>
          d.withColumn("syms", mergeSyms(col("syms"), m.a, m.b)))
          .localCheckpoint(true)
        free(df)
        stepped
      }
    occurrences.join(encodedWords, Seq("word"))
  }
}
