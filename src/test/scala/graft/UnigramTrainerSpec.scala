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

    /** Code-point split of a word — the reference's unit of "character"
      * (mirroring Spark/DuckDB length/substr semantics). */
    def cps(w: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var o = 0
      while (o < w.length) {
        val n = Character.charCount(w.codePointAt(o))
        b += w.substring(o, o + n); o += n
      }
      b.result()
    }

    def seeds(h: Map[String, Long], maxLen: Int): Map[String, Long] = {
      val acc = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- h; c = cps(w); s <- c.indices;
           l <- 1 to math.min(maxLen, c.length - s)) {
        val p = c.slice(s, s + l).mkString
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
      val c = cps(word)
      val init = Map(0 -> St(0.0, 0, Nil))
      val dp = (1 to c.length).foldLeft(init) { (dp, i) =>
        val cands = for {
          l <- 1 to math.min(maxLen, i)
          j = i - l
          prev <- dp.get(j).toList
          p = c.slice(j, i).mkString
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
          else if (cps(b.pieces.head).length > cps(a.pieces.head).length) b
          else if (cps(b.pieces.head).length < cps(a.pieces.head).length) a
          else if (b.pieces.head < a.pieces.head) b else a
        })
      }
      dp(c.length).pieces.reverse
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
      val have = seeded.collect {
        case (p, _) if cps(p).length == 1 => p }.toSet
      val missing = h.keys.flatMap(cps).toSet
        .diff(have).toSeq.sorted.map(c => (c, 0L))
      var vocab: Seq[(String, Long)] = seeded ++ missing
      var guard = 0
      while (vocab.count(v => cps(v._1).length > 1) >
          math.max(0, vocabSize - vocab.count(v => cps(v._1).length == 1)) &&
          guard < 64) {
        val counts = emCounts(h, scores(vocab), maxLen)
        val singles = vocab.filter(v => cps(v._1).length == 1)
          .map { case (p, _) => (p, counts.getOrElse(p, 0L)) }
        val multis = vocab.filter(v => cps(v._1).length > 1)
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
    val rows = UnigramTrainer.segmented(applied, "text", model)
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

  test("non-BMP corpus: supplementary chars are single pieces everywhere; reference agrees") {
    import spark.implicits._
    // U+1F600 (surrogate pair in UTF-16) must count as ONE character in
    // seeding, the single-char coverage set, prune classification, and
    // Viterbi addressing — the code-unit/code-point mix this pins down
    val emoji = new String(Character.toChars(0x1F600))
    val texts = Seq(s"$emoji$emoji ab$emoji ab", s"$emoji$emoji ab$emoji")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = UnigramTrainer.train(docs, "text",
      vocabSize = 8, seedSize = 30, maxPieceLen = 3, shrinkFactor = 0.5)
    val want = Ref.train(texts, vocabSize = 8, seedSize = 30,
      maxLen = 3, shrink = 0.5)
    assert(got.pieces == want,
      s"non-BMP drift: got=${got.pieces} want=$want")
    assert(got.pieces.exists(_._1 == emoji),
      "the supplementary char must survive as a single piece")
    val segs = UnigramTrainer.segmented(docs, "text", got)
      .select("word", "pieces").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1).toList)
    segs.foreach { case (w, ps) =>
      assert(ps.mkString == w, s"pieces must tile: $w -> $ps")
      assert(ps.forall(p => !p.exists(Character.isSurrogate) ||
        p.codePointCount(0, p.length) * 2 >= p.length),
        s"no lone-surrogate piece may ever appear: $w -> $ps")
    }
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
