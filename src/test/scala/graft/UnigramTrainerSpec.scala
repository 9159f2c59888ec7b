package graft

import graft.text.UnigramTrainer
import org.apache.spark.sql.functions.col

/** Unigram-LM tokenizer training vs an INDEPENDENT reference
  * implementation (plain collections, clean-room from the documented
  * contract in [[UnigramTrainer]]'s scaladoc) — the same basis as
  * BpeTrainerSpec's merge-for-merge check: EM/Viterbi has no faithful
  * DuckDB form, so piece-for-piece equality against a second from-scratch
  * implementation is the correctness story for `d_unigram_train`.
  */
class UnigramTrainerSpec extends SparkSpec {

  /** Reference: hard-EM unigram training over an in-memory word histogram.
    * Deliberately different code shape (immutable maps, fold-built DP
    * tables) from the Spark implementation.
    */
  object Ref {
    val Floor = -1e9

    def hist(texts: Seq[String]): Map[String, Long] =
      texts.filter(_ != null)
        .flatMap(_.toLowerCase.trim.split("\\s+")).filter(_.nonEmpty)
        .groupBy(identity).map { case (w, g) => w -> g.size.toLong }

    def seeds(h: Map[String, Long], maxLen: Int): Map[String, Long] = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- h; s <- 0 until w.length;
           l <- 1 to math.min(maxLen, w.length - s)) {
        val p = w.substring(s, s + l)
        acc(p) = acc.getOrElse(p, 0L) + f
      }
      acc.toMap
    }

    def scores(v: Seq[(String, Long)]): Map[String, Double] = {
      val total = math.max(v.map(_._2).sum, 1L).toDouble
      v.map { case (p, c) =>
        p -> (if (c > 0) math.log(c / total) else Floor)
      }.toMap
    }

    /** Viterbi with the contract's tie order: score desc, fewer pieces,
      * longer last piece, lexicographically smaller last piece.
      */
    def viterbi(word: String, sc: Map[String, Double],
                maxLen: Int): List[String] = {
      case class St(score: Double, n: Int, pieces: List[String])
      val init = Map(0 -> St(0.0, 0, Nil))
      val dp = (1 to word.length).foldLeft(init) { (dp, i) =>
        val cands = for {
          l <- 1 to math.min(maxLen, i)
          j = i - l
          prev <- dp.get(j).toList
          p = word.substring(j, i)
          s <- (sc.get(p) match {
            case Some(v) => Some(prev.score + v)
            case None if l == 1 => Some(prev.score + Floor)
            case None => None
          }).toList
        } yield St(s, prev.n + 1, p :: prev.pieces)
        if (cands.isEmpty) dp
        else dp + (i -> cands.reduceLeft { (a, b) =>
          if (b.score > a.score) b
          else if (b.score < a.score) a
          else if (b.n < a.n) b
          else if (b.n > a.n) a
          else if (b.pieces.head.length > a.pieces.head.length) b
          else if (b.pieces.head.length < a.pieces.head.length) a
          else if (b.pieces.head < a.pieces.head) b else a
        })
      }
      dp(word.length).pieces.reverse
    }

    def emCounts(h: Map[String, Long], sc: Map[String, Double],
                 maxLen: Int): Map[String, Long] = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- h; p <- viterbi(w, sc, maxLen))
        acc(p) = acc.getOrElse(p, 0L) + f
      acc.toMap
    }

    def train(texts: Seq[String], vocabSize: Int, seedSize: Int,
              maxLen: Int, shrink: Double): Seq[(String, Long)] = {
      val h = hist(texts)
      val seeded = seeds(h, maxLen).toSeq
        .sortBy { case (p, c) => (-c, p) }.take(seedSize)
      val have = seeded.collect { case (p, _) if p.length == 1 => p }.toSet
      val missing = h.keys.flatMap(_.toSeq).map(_.toString).toSet
        .diff(have).toSeq.sorted.map(c => (c, 0L))
      var vocab: Seq[(String, Long)] = seeded ++ missing
      var guard = 0
      while (vocab.count(_._1.length > 1) >
          math.max(0, vocabSize - vocab.count(_._1.length == 1)) &&
          guard < 64) {
        val counts = emCounts(h, scores(vocab), maxLen)
        val singles = vocab.filter(_._1.length == 1)
          .map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
        val multis = vocab.filter(_._1.length > 1)
          .map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
          .filter(_._2 > 0L).sortBy { case (p, c) => (-c, p) }
        val target = math.max(vocabSize - singles.size,
          math.min(multis.size - 1, (multis.size * shrink).toInt))
        vocab = singles ++ multis.take(math.max(target, 0))
        guard += 1
      }
      val fin = emCounts(h, scores(vocab), maxLen)
      vocab.map { case (p, _) => (p, fin.getOrElse(p, 0L)) }
        .sortBy { case (p, c) => (-c, p) }
    }
  }

  private val corpus = Seq(
    "the model trains the tokenizer",
    "the tokenizer tokenizes the corpus",
    "training data trains the model",
    "low rank tokens token tokens",
    "the the the model model corpus")

  test("unigram train equals the independent reference piece for piece") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = UnigramTrainer.train(docs, "text",
      vocabSize = 30, seedSize = 60, maxPieceLen = 5, shrinkFactor = 0.6)
    val want = Ref.train(corpus, vocabSize = 30, seedSize = 60,
      maxLen = 5, shrink = 0.6)
    assert(got.pieces == want,
      s"vocab drift:\n got=${got.pieces}\nwant=$want")
    // re-shard invariance: the histogram is exact, EM is deterministic
    val again = UnigramTrainer.train(docs.repartition(7), "text",
      vocabSize = 30, seedSize = 60, maxPieceLen = 5, shrinkFactor = 0.6)
    assert(again.pieces == got.pieces)
    assert(got.pieces.nonEmpty &&
      got.pieces.count(_._1.length > 1) >= 1,
      "a corpus with heavy repetition must learn multi-char pieces")
  }

  test("segmented: pieces concatenate back to every word; unseen chars survive as singles") {
    import spark.implicits._
    val docs = corpus.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val model = UnigramTrainer.train(docs, "text",
      vocabSize = 30, seedSize = 60, maxPieceLen = 5)
    val applied = Seq((100L, "the tokenizer trains qqq zzz"), (101L, null: String))
      .toDF("doc_id", "text")
    val rows = UnigramTrainer.segmented(applied, "text", model, maxPieceLen = 5)
      .select("word", "pieces").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
    assert(rows.nonEmpty)
    rows.foreach { case (w, ps) =>
      assert(ps.mkString == w, s"pieces must tile the word: $w -> $ps")
    }
    // q/z never occur in training text: coverage falls back to char pieces
    assert(rows.toMap.apply("qqq") == List("q", "q", "q"))
    // null text contributes no occurrence rows
    assert(rows.forall(_._1.nonEmpty))
  }

  test("seedCounts known answer on a two-word histogram") {
    import spark.implicits._
    val words = Seq(("ab", 3L), ("b", 2L)).toDF("word", "freq")
    val got = UnigramTrainer.seedCounts(words, maxPieceLen = 2)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // ab: substrings a, b, ab (freq 3 each); b: substring b (freq 2)
    assert(got == Map("a" -> 3L, "b" -> 5L, "ab" -> 3L))
  }

  test("degenerate corpora: empty and all-null train to an empty vocabulary") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(UnigramTrainer.train(empty, "text", vocabSize = 5,
      seedSize = 10).pieces.isEmpty)
    val nulls = Seq((1L, null: String)).toDF("doc_id", "text")
    assert(UnigramTrainer.train(nulls, "text", vocabSize = 5,
      seedSize = 10).pieces.isEmpty)
  }
}
