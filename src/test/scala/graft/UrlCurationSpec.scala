package graft

import org.apache.spark.sql.functions._
import graft.text.{CorpusClean, CorpusDiff}

/** URL-keyed curation (urlDedup / domainCap) and snapshot diff — known-answer
  * fixtures plus the plan shapes that make them safe at crawl scale.
  */
class UrlCurationSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    // three cosmetic variants of ONE canonical URL — different lengths
    (1L, "HTTPS://WWW.A.com:443/x?utm_source=t", 10L),
    (2L, "https://www.a.com/x/", 30L),
    (3L, "https://www.a.com/x#frag", 20L),
    // a second URL, single doc
    (4L, "http://b.com/y?q=1", 5L),
    // not URL-shaped: dedups under the literal string
    (5L, "not a url", 7L),
    (6L, "not a url", 9L),
    // null url: always survives
    (7L, null.asInstanceOf[String], 1L)
  ).toDF("doc_id", "url", "n_chars")

  test("urlDedup: cosmetic variants collapse, longest wins, null bypasses") {
    val out = CorpusClean.urlDedup(fixture, "url").orderBy("doc_id")
    val rows = out.select("doc_id", "url_norm").as[(Long, String)].collect()
    // doc 2 wins the a.com group (longest); doc 6 wins the literal group
    assert(rows.map(_._1).toSeq == Seq(2L, 4L, 6L, 7L), rows.mkString(", "))
    assert(rows.find(_._1 == 2L).get._2 == "https://www.a.com/x")
    assert(rows.find(_._1 == 7L).get._2 == null)
    // plan: the winner reduction is an aggregate, never a window (a hot URL
    // must collapse map-side, not buffer inside one WindowExec task)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("WindowExec") && p.contains("partial_min"),
      s"urlDedup must reduce via partial agg, not a window:\n$p")
  }

  test("urlDedup: equal lengths tiebreak on the lower id") {
    val df = Seq((9L, "https://t.com/p", 5L), (3L, "https://t.com/p", 5L))
      .toDF("doc_id", "url", "n_chars")
    val kept = CorpusClean.urlDedup(df, "url").select("doc_id").as[Long].collect()
    assert(kept.toSeq == Seq(3L))
  }

  test("domainCap: per-domain quota, longest kept, null domain bypasses") {
    val docs = (1L to 9L).map(i =>
        (i, s"https://www.shard${i % 2}.com/p$i", i * 10L))
      .toDF("doc_id", "url", "n_chars")
      .union(Seq((10L, "nonsense", 1L)).toDF("doc_id", "url", "n_chars"))
    val out = CorpusClean.domainCap(docs, "url", cap = 2)
    val byDomain = out.groupBy("domain").count().as[(String, Long)].collect().toMap
    assert(byDomain(("shard0.com")) == 2L && byDomain(("shard1.com")) == 2L)
    assert(byDomain(null) == 1L, "non-URL rows must bypass the cap")
    // within shard1.com the two longest are 9 (90) and 7 (70)
    val kept1 = out.where(col("domain") === "shard1.com")
      .select("doc_id").as[Long].collect().sorted
    assert(kept1.toSeq == Seq(7L, 9L))
    // plan: the rank filter must be a map-side WindowGroupLimit — a
    // mega-domain contributes at most cap rows per input partition
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("WindowGroupLimit"), s"cap not pushed map-side:\n$p")
  }

  test("corpus diff: all four statuses, null-text equality, carry from new side") {
    val old = Seq(
      (1L, "same", "s0"), (2L, "edited", "s0"), (3L, "gone", "s1"),
      (5L, null.asInstanceOf[String], "s1")
    ).toDF("doc_id", "text", "source")
    val neu = Seq(
      (1L, "same", "s0"), (2L, "edited!!", "s9"), (4L, "new", "s1"),
      (5L, null.asInstanceOf[String], "s1")
    ).toDF("doc_id", "text", "source")
    val d = CorpusDiff.diff(old, neu).orderBy("doc_id")
      .select("doc_id", "status", "source").as[(Long, String, String)].collect()
    assert(d.toSeq == Seq(
      (1L, "unchanged", "s0"),
      (2L, "changed", "s9"), // carry col comes from the NEW snapshot
      (3L, "removed", "s1"),
      (4L, "added", "s1"),
      (5L, "unchanged", "s1") // null text on both sides = unchanged, not added
    ), d.mkString(", "))
    val report = CorpusDiff.diffReport(old, neu)
      .orderBy("source", "status")
      .as[(String, String, Long)].collect()
    assert(report.toSeq == Seq(
      ("s0", "unchanged", 1L), ("s1", "added", 1L), ("s1", "removed", 1L),
      ("s1", "unchanged", 1L), ("s9", "changed", 1L)))
  }

  test("corpus diff: digest compare ignores case/whitespace cosmetics (dupKey semantics)") {
    val old = Seq((1L, "Hello World ", "s")).toDF("doc_id", "text", "source")
    val neu = Seq((1L, "hello world", "s")).toDF("doc_id", "text", "source")
    val d = CorpusDiff.diff(old, neu).select("status").as[String].collect()
    assert(d.toSeq == Seq("unchanged"))
  }
}
