package graft.text

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Distributed unigram-LM tokenizer training — the OTHER real-world
  * subword family beside [[BpeTrainer]]'s BPE (Kudo 2018, "Subword
  * Regularization", the SentencePiece unigram model — public method),
  * in its deterministic hard-EM form: E-steps assign each word its single
  * Viterbi-best segmentation (not expected fractional counts), so every
  * piece count stays an exact INTEGER and training is bit-reproducible
  * and re-shard-invariant — the property every oracle in this repo
  * leans on. The classic soft-EM refinement is a drop-in change to
  * [[viterbiPieces]] (forward–backward instead of max), deliberately not
  * taken: fractional expected counts would make cross-run hashes
  * float-fragile for a quality difference the original paper reports as
  * marginal.
  *
  * Scale shape (same discipline as [[BpeTrainer]]):
  *   - the CORPUS is touched exactly once, by [[BpeTrainer.wordHistogram]];
  *     seeding and every EM round run on the distinct-word histogram
  *     (vocabulary-bounded — Zipf keeps it executor-trivial at 100 TB);
  *   - each E-step is a narrow `mapPartitions` over the word histogram with
  *     the piece table BROADCAST (piece table ≤ `seedSize` rows — model-
  *     sized, the same class as [[LmScore]]'s broadcast model), followed by
  *     one piece-vocab-sized count aggregation;
  *   - only vocab-sized tables are ever collected to the driver (the same
  *     bounded-collect class as BPE's argmax rows).
  *
  * Determinism contract (shared with the spec's independent reference):
  * Viterbi ties break on higher score, then FEWER pieces, then the LONGER
  * last piece, then the lexicographically smaller last piece — all locally
  * decomposable, so the DP needs no sequence materialization. Prune ties
  * break on (count desc, piece asc). Single-character pieces are never
  * pruned (total coverage: every word stays segmentable).
  */
object UnigramTrainer {

  /** Substring seed counts over the word histogram: every substring of
    * length 1..`maxPieceLen` of every distinct word, weighted by word
    * frequency (a word contributes freq × occurrences-in-word per piece).
    * Pure native enumeration — two nested generators over the histogram,
    * no UDF; output is piece-vocabulary-sized. This is the integer-exact,
    * SQL-expressible stage (the battery oracles it); EM refines from here.
    */
  def seedCounts(words: DataFrame, maxPieceLen: Int): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    words
      .select(col("word"), col("freq"), length(col("word")).as("wl"))
      .where(col("wl") >= 1)
      .select(col("word"), col("freq"), col("wl"),
        explode(sequence(lit(1), col("wl"))).as("start"))
      .select(col("word"), col("freq"),
        explode(sequence(lit(1),
          least(lit(maxPieceLen), col("wl") - col("start") + 1))).as("len"),
        col("start"))
      .select(col("word").substr(col("start"), col("len")).as("piece"),
        col("freq"))
      .groupBy("piece").agg(sum("freq").as("count"))
  }

  /** Unicode code-point count — piece lengths are COUNTED IN CODE POINTS
    * throughout (matching Spark/DuckDB `length`/`substr` semantics), so a
    * supplementary character (emoji, rare CJK) is one "character"
    * everywhere, never two UTF-16 units.
    */
  def cpLen(s: String): Int = s.codePointCount(0, s.length)

  /** Viterbi-best segmentation of one word under piece log-scores.
    * Unknown single CODE POINTS score `unkScore` (so coverage never fails
    * mid-training when a char piece was floor-scored, and apply-time
    * unseen characters segment rather than fail). Tie order per the
    * object contract; piece lengths in code points, lexicographic ties by
    * plain UTF-16 string order (both sides of the spec reference use the
    * same rule). Pure JVM — shared verbatim by train and apply.
    */
  def viterbiPieces(word: String, scores: collection.Map[String, Double],
                    maxPieceLen: Int, unkScore: Double): List[String] = {
    // code-point boundaries: bounds(k) = UTF-16 offset of code point k
    val bounds = {
      val buf = new scala.collection.mutable.ArrayBuffer[Int](word.length + 1)
      var o = 0
      buf += 0
      while (o < word.length) {
        o += Character.charCount(word.codePointAt(o)); buf += o
      }
      buf.toArray
    }
    val n = bounds.length - 1 // length in code points
    if (n == 0) return Nil
    // dp(i): best (score, pieces, last piece) for the first i code points
    val dpScore = new Array[Double](n + 1)
    val dpCount = new Array[Int](n + 1)
    val dpLast = new Array[String](n + 1)
    val dpLastLen = new Array[Int](n + 1) // code points, not UTF-16 units
    val dpPrev = new Array[Int](n + 1)
    java.util.Arrays.fill(dpScore, Double.NegativeInfinity)
    dpScore(0) = 0.0
    var i = 1
    while (i <= n) {
      var l = 1
      val maxL = math.min(maxPieceLen, i)
      while (l <= maxL) {
        val j = i - l
        if (dpScore(j) > Double.NegativeInfinity) {
          val piece = word.substring(bounds(j), bounds(i))
          val s = scores.get(piece) match {
            case Some(v) => dpScore(j) + v
            case None if l == 1 => dpScore(j) + unkScore
            case None => Double.NegativeInfinity
          }
          if (s > Double.NegativeInfinity) {
            val better =
              s > dpScore(i) ||
                (s == dpScore(i) && (dpLast(i) == null ||
                  dpCount(j) + 1 < dpCount(i) ||
                  (dpCount(j) + 1 == dpCount(i) &&
                    (l > dpLastLen(i) ||
                      (l == dpLastLen(i) && piece < dpLast(i))))))
            if (better) {
              dpScore(i) = s; dpCount(i) = dpCount(j) + 1
              dpLast(i) = piece; dpLastLen(i) = l; dpPrev(i) = j
            }
          }
        }
        l += 1
      }
      i += 1
    }
    var out = List.empty[String]
    var k = n
    while (k > 0) { out = dpLast(k) :: out; k = dpPrev(k) }
    out
  }

  /** Trained model: surviving pieces with their final hard-EM counts
    * (integer, deterministic) in (count desc, piece asc) order, plus the
    * `maxPieceLen` it was trained with — [[segmented]] reads it from here,
    * so apply-time segmentation can never silently cap below a learned
    * piece's length.
    */
  case class UnigramResult(pieces: Seq[(String, Long)], maxPieceLen: Int) {
    def scores: Map[String, Double] = {
      val total = math.max(pieces.map(_._2).sum, 1L).toDouble
      pieces.map { case (p, c) =>
        p -> (if (c > 0) math.log(c / total) else FloorScore)
      }.toMap
    }
  }

  /** Score assigned to retained-but-unused single-char pieces (and unknown
    * chars at apply time): effectively -∞ against any real piece, finite so
    * coverage segmentation always exists.
    */
  val FloorScore: Double = -1e9

  /** One hard-EM count pass: Viterbi-segment every distinct word under
    * `scores`, return integer piece counts (word freq × occurrences).
    * Narrow map over the histogram + one vocab-sized aggregation.
    */
  def emCounts(words: DataFrame, scores: Map[String, Double],
               maxPieceLen: Int): DataFrame = {
    val spark = words.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(scores)
    words.select(col("word"), col("freq")).as[(String, Long)]
      .mapPartitions { it =>
        val sc = bc.value
        it.flatMap { case (w, f) =>
          viterbiPieces(w, sc, maxPieceLen, FloorScore).map(p => (p, f))
        }
      }
      .toDF("piece", "freq")
      .groupBy("piece").agg(sum("freq").as("count"))
  }

  /** Learn a unigram piece vocabulary of at most
    * `max(vocabSize, alphabet size)` pieces — single CODE-POINT pieces are
    * never pruned (total coverage), so an alphabet larger than `vocabSize`
    * wins; multi-char pieces are budgeted to `vocabSize − |alphabet|`.
    *
    * Rounds: seed from [[seedCounts]] (top `seedSize` by count, all single
    * chars always included), then repeat { E-step counts → M-step scores →
    * prune multi-char pieces to `shrinkFactor` of the survivors } until at
    * most the budget remains, then one final E/M pass so the reported
    * counts describe the FINAL vocabulary. Pieces that win zero Viterbi
    * assignments are dropped at each prune (single chars instead floor to
    * [[FloorScore]] — retained for coverage, outscored by everything).
    */
  def train(docs: DataFrame, textCol: String, vocabSize: Int,
            seedSize: Int = 4000, maxPieceLen: Int = 8,
            shrinkFactor: Double = 0.75): UnigramResult = {
    require(vocabSize >= 1 && seedSize >= vocabSize,
      "need seedSize >= vocabSize >= 1")
    require(shrinkFactor > 0 && shrinkFactor < 1,
      "shrinkFactor must be in (0, 1)")
    val words = BpeTrainer.wordHistogram(docs, textCol).localCheckpoint(true)
    val seeds = seedCounts(words, maxPieceLen)
      .orderBy(col("count").desc, col("piece"))
      .limit(math.max(seedSize, 1))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val chars = seeds.filter(p => cpLen(p._1) == 1).map(_._1).toSet
    // single chars outside the top-N still enter (coverage) at count 0;
    // Spark's split("") yields code points, same unit as cpLen
    val missingChars = words.select(
        explode(filter(split(col("word"), ""), c => c =!= "")).as("c"))
      .distinct().collect().map(_.getString(0)).filterNot(chars)
      .sorted.map(c => (c, 0L))
    var vocab: Seq[(String, Long)] = (seeds ++ missingChars).toSeq
    def toScores(v: Seq[(String, Long)]): Map[String, Double] =
      UnigramResult(v, maxPieceLen).scores
    def emRound(v: Seq[(String, Long)]): Map[String, Long] =
      emCounts(words, toScores(v), maxPieceLen)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    var guard = 0
    while (vocab.count(p => cpLen(p._1) > 1) >
        math.max(0, vocabSize - vocab.count(p => cpLen(p._1) == 1)) &&
        guard < 64) {
      val counts = emRound(vocab)
      val singles = vocab.filter(p => cpLen(p._1) == 1)
        .map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
      val multis = vocab.filter(p => cpLen(p._1) > 1)
        .map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
        .filter(_._2 > 0L)
        .sortBy { case (p, c) => (-c, p) }
      val target = math.max(vocabSize - singles.size,
        math.min(multis.size - 1, (multis.size * shrinkFactor).toInt))
      vocab = singles ++ multis.take(math.max(target, 0))
      guard += 1
    }
    val finalCounts = emRound(vocab)
    UnigramResult(vocab.map { case (p, _) =>
        (p, finalCounts.getOrElse(p, 0L)) }
      .sortBy { case (p, c) => (-c, p) }, maxPieceLen)
  }

  /** Apply a trained model to new text: one row per token occurrence with
    * its Viterbi segmentation — the unigram analog of
    * [[BpeTrainer.encodedSymbols]], same distinct-word discipline (segment
    * the vocabulary once, join occurrences back by word).
    */
  def segmented(docs: DataFrame, textCol: String,
                model: UnigramResult): DataFrame = {
    require(!docs.columns.contains("word") && !docs.columns.contains("pieces"),
      "input already has a word/pieces column — rename it first")
    val spark = docs.sparkSession
    import spark.implicits._
    val occurrences = docs.where(col(textCol).isNotNull)
      .select(col("*"),
        explode(TextFunctions.tokens(lower(col(textCol)))).as("word"))
    val bc = spark.sparkContext.broadcast(model.scores)
    val maxLen = model.maxPieceLen // the TRAINED cap — never drifts
    val segWords = occurrences.select("word").distinct()
      .as[String]
      .mapPartitions { it =>
        val sc = bc.value
        it.map(w => (w, viterbiPieces(w, sc, maxLen, FloorScore)))
      }
      .toDF("word", "pieces")
    occurrences.join(segWords, Seq("word"))
  }
}
