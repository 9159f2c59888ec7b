package graft

import graft.dedup.Dedup

/** Span-level duplication: hand-computed interval-union coverage, the
  * cross-doc (not intra-doc) duplication criterion, and short-doc edges.
  */
class DupSpansSpec extends SparkSpec {
  import spark.implicits._

  private def stats(rows: Seq[(Long, String)], w: Int = 3) =
    Dedup.dupSpans(rows.toDF("doc_id", "text"), windowN = w)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap

  test("shared window flags both docs; coverage = window length") {
    val got = stats(Seq(1L -> "x a b c y", 2L -> "z a b c w"))
    // one shared 3-gram "a b c" at position 1 of each 5-token doc
    assert(got(1L) === ((5, 1L, 3L, 0.6)))
    assert(got(2L) === ((5, 1L, 3L, 0.6)))
  }

  test("overlapping windows union, not double-count") {
    val got = stats(Seq(3L -> "a b c d a b c d", 4L -> "a b c d"))
    // d4: both its windows ("a b c","b c d") also in d3 -> positions 0,1
    // covered = 3 + min(3, 1) = 4 of 4 tokens
    assert(got(4L) === ((4, 2L, 4L, 1.0)))
    // d3: dup positions 0,1,4,5 -> covered = 3 + 1 + min(3,3) + 1 = 8 of 8
    assert(got(3L) === ((8, 4L, 8L, 1.0)))
  }

  test("intra-doc repetition alone is not duplication (distinct-doc frequency)") {
    val got = stats(Seq(5L -> "p q r s p q r s", 6L -> "u v w"))
    assert(got(5L) === ((8, 0L, 0L, 0.0)))
    assert(got(6L) === ((3, 0L, 0L, 0.0)))
  }

  test("docs shorter than the window, empty and null text produce zero rows") {
    val got = stats(Seq(7L -> "a b", 8L -> "", 9L -> null.asInstanceOf[String]))
    assert(got(7L) === ((2, 0L, 0L, 0.0)))
    assert(got(8L) === ((0, 0L, 0L, 0.0)))
    assert(got(9L) === ((0, 0L, 0L, 0.0)))
  }

  test("trimDupSpans keeps the canonical occurrence, trims the rest") {
    val got = Dedup.trimDupSpans(
      Seq(1L -> "x a b c y", 2L -> "z a b c w", 3L -> "a b").toDF("doc_id", "text"),
      windowN = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // "a b c" duplicated; canonical = (doc 1, pos 1) -> doc 1 untouched,
    // doc 2 loses tokens 1-3
    assert(got(1L) === (("x a b c y", 5, 0)))
    assert(got(2L) === (("z w", 5, 3)))
    assert(got(3L) === (("a b", 2, 0)))
  }

  test("trimDupSpans: overlapping non-canonical windows trim their union") {
    val got = Dedup.trimDupSpans(
      Seq(4L -> "a b c d", 5L -> "q a b c d r").toDF("doc_id", "text"),
      windowN = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // grams "a b c" and "b c d" both duplicated, both canonical in doc 4
    // (pos 0 and 1); doc 5's copies at pos 1,2 cover tokens 1..4 (union)
    assert(got(4L) === (("a b c d", 4, 0)))
    assert(got(5L) === (("q r", 6, 4)))
  }

  test("trimDupSpans: canonical windows are exempt from cross-gram trimming — duplicated content never vanishes entirely") {
    val got = Dedup.trimDupSpans(
      Seq(1L -> "a b c d", 2L -> "b c d e", 3L -> "c d e").toDF("doc_id", "text"),
      windowN = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap
    // "b c d" canonical at (1,1); "c d e" canonical at (2,1).
    // doc2's non-canonical "b c d" covers 0-2, but its canonical "c d e"
    // covers 1-3 -> only token 0 drops; doc3's copy is fully trimmed.
    assert(got(1L) === (("a b c d", 4, 0)))
    assert(got(2L) === (("c d e", 4, 1)))
    assert(got(3L) === (("", 3, 3)))
  }

  test("trimDupSpans: empty and null text survive the rebuild") {
    val got = Dedup.trimDupSpans(
      Seq(6L -> "", 7L -> null.asInstanceOf[String]).toDF("doc_id", "text"),
      windowN = 3)
      .collect().map(r => r.getLong(0) ->
        ((Option(r.getString(1)), r.getInt(2), r.getInt(3)))).toMap
    assert(got(6L) === ((Some(""), 0, 0)))
    assert(got(7L) === ((None, 0, 0)))
  }

  test("keep-one property on the real corpus: every duplicated gram survives in some trimmed doc") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val w = 13
    val dupGrams = docs
      .select(col("doc_id"), explode(array_distinct(
        graft.text.TextFunctions.shingles(col("text"), w))).as("g"))
      .groupBy("g").agg(countDistinct("doc_id").as("df"))
      .where(col("df") >= 2).select("g")
    val trimmedTexts = graft.dedup.Dedup.trimDupSpans(docs, windowN = w)
      .where(col("text").isNotNull)
      .select(col("text"))
    // canonical windows are exempt from cross-gram trimming and their
    // tokens stay contiguous in the rebuilt text, so the gram string must
    // appear verbatim in at least one survivor
    val survivors = trimmedTexts
      .crossJoin(broadcast(dupGrams))
      .where(col("text").contains(col("g")))
      .select("g").distinct()
    val missing = dupGrams.join(survivors, Seq("g"), "left_anti").count()
    assert(dupGrams.count() > 0, "fixture must contain duplicated grams")
    assert(missing === 0L, s"$missing duplicated grams vanished from the corpus")
  }

  test("empty corpus flows through both span operators") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(Dedup.dupSpans(empty, windowN = 3).collect().isEmpty)
    assert(Dedup.trimDupSpans(empty, windowN = 3).collect().isEmpty)
  }

  test("result is partition-independent") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Dedup.dupSpans(docs, windowN = 13).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    val b = Dedup.dupSpans(docs.repartition(7), windowN = 13).collect()
      .map(r => r.getLong(0) -> r.toSeq).toMap
    assert(a === b)
    assert(a.values.exists(_(2).asInstanceOf[Long] > 0L),
      "synthetic near-dup families should produce real covered spans")
  }
}
