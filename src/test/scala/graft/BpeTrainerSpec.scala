package graft

import graft.text.BpeTrainer
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {
  import scala.collection.mutable

  /** Independent single-node reference BPE (plain Scala collections) — the
    * distributed trainer must reproduce this merge-for-merge, including
    * frequency tie-breaks.
    */
  private def referenceBpe(wordFreq: Map[String, Long], numMerges: Int,
                           minFreq: Long, endMarker: Boolean)
      : Seq[(String, String, Long)] = {
    def mergeVec(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = mutable.ArrayBuffer.empty[String]
      var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += v(i); i += 1 }
      }
      out.toVector
    }
    var syms: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (w.map(_.toString).toVector ++
        (if (endMarker) Vector(BpeTrainer.EndMarker) else Vector.empty)) -> f
    }
    val out = Seq.newBuilder[(String, String, Long)]
    var done = false
    for (_ <- 0 until numMerges if !done) {
      val counts = mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      syms.foreach { case (v, f) =>
        v.iterator.sliding(2).withPartial(false).foreach(p =>
          counts((p.head, p(1))) += f)
      }
      if (counts.isEmpty) done = true
      else {
        val ((a, b), c) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        if (c < minFreq) done = true
        else {
          out += ((a, b, c))
          syms = syms.groupMapReduce { case (v, _) => mergeVec(v, a, b) }(_._2)(_ + _)
        }
      }
    }
    out.result()
  }

  test("mergeSyms: left-to-right non-overlapping merge semantics") {
    import spark.implicits._
    val df = Seq(Seq("a", "a", "a"), Seq("a", "a", "a", "a"),
      Seq("a", "b", "a", "b"), Seq("x")).toDF("syms")
    val got = df.select(BpeTrainer.mergeSyms(col("syms"), "a", "a").as("m"))
      .as[Seq[String]].collect().toSeq
    assert(got(0) == Seq("aa", "a"))
    assert(got(1) == Seq("aa", "aa"))
    assert(got(2) == Seq("a", "b", "a", "b"))
    assert(got(3) == Seq("x"))
  }

  test("Sennrich fixture: distributed trainer matches the reference merges") {
    import spark.implicits._
    val docs = Seq.fill(5)("low").mkString(" ") + " " +
      Seq.fill(2)("lower").mkString(" ") + " " +
      Seq.fill(6)("newest").mkString(" ") + " " +
      Seq.fill(3)("widest").mkString(" ")
    val df = Seq(docs).toDF("text")
    val result = BpeTrainer.train(df, "text", numMerges = 8,
      minFreq = 1L, endMarker = true)
    val want = referenceBpe(
      Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L),
      numMerges = 8, minFreq = 1L, endMarker = true)
    assert(result.merges.map(m => (m.a, m.b, m.freq)) == want,
      s"got=${result.merges}\nwant=$want")
    // classic result: ("e","s") then ("es","t") dominate via newest+widest
    assert(result.merges.head.a == "e" && result.merges.head.b == "s")
  }

  test("sf0.001 documents: distributed merges == reference on the histogram") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val result = BpeTrainer.train(docs, "text", numMerges = 10, minFreq = 2L)
    val hist = BpeTrainer.wordHistogram(docs, "text").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = referenceBpe(hist, numMerges = 10, minFreq = 2L, endMarker = false)
    assert(result.merges.map(m => (m.a, m.b, m.freq)) == want)
    assert(result.merges.size == 10)
    // ranks are dense and ordered
    assert(result.merges.map(_.rank) == (0 until 10))
    // vocab: every learned multi-char symbol appears with positive weight
    val vocab = result.vocab.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    result.merges.foreach(m =>
      assert(!vocab.get(m.a + m.b).exists(_ <= 0)))
  }

  test("encode reproduces the trained symbolization for in-corpus words") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet").limit(50)
    val result = BpeTrainer.train(docs, "text", numMerges = 12, minFreq = 2L)
    val trained = result.symWords.select(col("word"), col("syms").as("trained"))
    val encoded = BpeTrainer.encodedSymbols(docs, "text", result.merges)
      .select(col("word"), col("syms").as("encoded")).dropDuplicates("word")
    val joined = trained.join(encoded, "word")
    assert(joined.where(col("trained") =!= col("encoded")).count() == 0)
    assert(joined.count() == trained.count())
  }

  test("train is a no-op on an empty/degenerate corpus") {
    import spark.implicits._
    val empty = Seq.empty[String].toDF("text")
    assert(BpeTrainer.train(empty, "text", 5).merges.isEmpty)
    val single = Seq("a b c").toDF("text") // all words length 1: no pairs
    assert(BpeTrainer.train(single, "text", 5, minFreq = 1L,
      endMarker = false).merges.isEmpty)
  }
}
