package graft

import org.apache.spark.sql.functions._
import java.nio.file.Files

class PrepareCorpusSpec extends SparkSpec {

  private def capture(body: => Unit): String = {
    val bos = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bos, true, "UTF-8"))(body)
    bos.toString("UTF-8")
  }

  test("prepare-corpus: jsonl release matches the library pipeline, report is read-back truth") {
    val out = Files.createTempDirectory("graft-prep").toString
    try {
      val stdout = capture {
        Cli.run(spark, Array("prepare-corpus",
          s"$sf0001/documents.parquet", out))
      }
      val line = stdout.linesIterator.filter(_.startsWith("{")).toSeq.last
      assert(line.contains("\"splits\":["), s"no report in: $stdout")
      // the written corpus IS the pipeline's answer
      val expect = graft.text.CorpusPipeline.summary(
          spark.read.parquet(s"$sf0001/documents.parquet"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      val got = graft.sources.CorpusIO.readJsonl(spark, out,
          org.apache.spark.sql.types.StructType(
            spark.read.parquet(s"$sf0001/documents.parquet")
              .select("doc_id", "source", "text").schema))
        .groupBy("split")
        .agg(count(lit(1)).as("n"),
          sum(graft.text.TextFunctions.tokenCount(col("text")).cast("long")).as("t"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expect, s"written splits $got != pipeline $expect")
      expect.foreach { case (split, n, _) =>
        assert(line.contains(s"\"split\":\"$split\"") && n > 0) }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("prepare with URL curation equals the manual stage composition") {
    import graft.text.{CorpusClean, CorpusPipeline, Sampling}
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("url",
        concat(lit("https://www."), col("source"), lit(".site.org/p"),
          (col("doc_id") % 7).cast("string"),
          when(col("doc_id") % 2 === 0, lit("/")).otherwise(lit("#f"))))
    val cfg = CorpusPipeline.Config(urlCol = Some("url"),
      maxDocsPerDomain = Some(3))
    val got = CorpusPipeline.prepare(raw, cfg)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    // the same stages composed by hand from the standalone operators
    val baseCfg = CorpusPipeline.Config()
    val norm = raw.select(col("doc_id"), col("source"),
      CorpusClean.normalizeText(col("text")).as("text"), col("url"))
    val urlDeduped = CorpusClean.urlDedup(
        norm.withColumn("__len", length(col("text"))), "url", lenCol = "__len")
      .drop("__len", "url_norm")
    val kept = urlDeduped.join(
      CorpusClean.filterCorpus(urlDeduped, baseCfg.filter)
        .where(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
    val deduped = kept.join(
      kept.groupBy(baseCfg.dedupKey(col("text")).as("k"))
        .agg(min("doc_id").as("doc_id")).select("doc_id"),
      Seq("doc_id"), "left_semi")
    val train = deduped.filter(!baseCfg.benchmarkPred)
    val clean = train.join(
      Sampling.decontaminate(train, raw.filter(baseCfg.benchmarkPred),
        shingleN = baseCfg.shingleN).select("doc_id"),
      Seq("doc_id"), "left_anti")
    val capped = CorpusClean.domainCap(
        clean.withColumn("__len", length(col("text"))), "url", 3,
        lenCol = "__len").drop("__len", "domain")
    val want = Sampling.assignSplits(capped, baseCfg.splits, salt = "split")
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet

    assert(got == want && got.nonEmpty, s"got ${got.size}, want ${want.size}")
    // the quota really bites: no domain above the cap in the output
    val overCap = CorpusPipeline.prepare(raw, cfg)
      .groupBy(CorpusClean.urlDomain(col("url"))).count()
      .where(col("count") > 3).count()
    assert(overCap == 0L)
  }

  test("prepare with htmlInput extracts markup first — equal to preparing pre-extracted text") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("doc_id", "source", "text")
    // wrap every doc in deterministic tag soup (with script noise)
    val asHtml = docs.withColumn("text", concat(
      lit("<html><body><script>drop(me < now);</script><p>"),
      col("text"), lit("</p></body></html>")))
    val viaHtml = graft.text.CorpusPipeline.prepare(asHtml,
        graft.text.CorpusPipeline.Config(htmlInput = true))
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val viaText = graft.text.CorpusPipeline.prepare(
        docs.withColumn("text",
          graft.text.CorpusClean.extractHtmlText(concat(
            lit("<html><body><script>drop(me < now);</script><p>"),
            col("text"), lit("</p></body></html>")))),
        graft.text.CorpusPipeline.Config())
      .select("doc_id", "split").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(viaHtml == viaText,
      "htmlInput must equal manual pre-extraction stage for stage order")
    assert(viaHtml.nonEmpty)
  }

  test("prepare-corpus: parquet format and unknown format") {
    val out = Files.createTempDirectory("graft-prep-pq").toString
    try {
      capture { Cli.run(spark, Array("prepare-corpus",
        s"$sf0001/documents.parquet", out, "-", "parquet")) }
      val splits = spark.read.parquet(out).select("split").distinct()
        .collect().map(_.getString(0)).toSet
      assert(splits.subsetOf(Set("train", "val", "test")) && splits.contains("train"))
      intercept[IllegalArgumentException] {
        Cli.run(spark, Array("prepare-corpus",
          s"$sf0001/documents.parquet", out, "-", "orc"))
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
  }

  test("prepare with blocklist gates the raw input before any text stage") {
    import graft.text.CorpusPipeline
    import spark.implicits._
    val raw = spark.read.parquet(s"$sf0001/documents.parquet")
      .withColumn("url", concat(lit("https://www."), col("source"),
        lit(".site.org/p"), (col("doc_id") % 7).cast("string")))
    val bl = Seq(("domain", "src1.site.org")).toDF("kind", "pattern")
    val cfg = CorpusPipeline.Config(urlCol = Some("url"))
    val got = CorpusPipeline.prepare(raw, cfg.copy(blocklist = Some(bl)))
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    // equal to running the un-gated pipeline on the pre-filtered input
    val want = CorpusPipeline.prepare(
        raw.filter(col("source") =!= "src1"), cfg)
      .select("doc_id", "split").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == want && got.nonEmpty)
    // the gate really removed that domain's docs
    val srcs = CorpusPipeline.prepare(raw, cfg.copy(blocklist = Some(bl)))
      .select("source").distinct().collect().map(_.getString(0)).toSet
    assert(!srcs.contains("src1"), srcs.mkString(","))
    // contract: blocklist without urlCol fails loudly
    intercept[IllegalArgumentException] {
      CorpusPipeline.prepare(raw, CorpusPipeline.Config(blocklist = Some(bl)))
    }
  }

  test("prepare-corpus CLI: blocklist CSV leg; malformed CSV fails loudly") {
    val out = Files.createTempDirectory("graft-prep-bl").toString
    val in = Files.createTempDirectory("graft-prep-bl-in").toString
    try {
      spark.read.parquet(s"$sf0001/documents.parquet")
        .withColumn("url", concat(lit("https://www."), col("source"),
          lit(".site.org/p"), (col("doc_id") % 7).cast("string")))
        .write.mode("overwrite").parquet(s"$in/docs")
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/bl.csv"),
        "kind,pattern\ndomain,src1.site.org\n")
      capture { Cli.run(spark, Array("prepare-corpus", s"$in/docs", out,
        "-", "parquet", "url", "-", "-", s"$in/bl.csv")) }
      val srcs = spark.read.parquet(out).select("source").distinct()
        .collect().map(_.getString(0)).toSet
      assert(srcs.nonEmpty && !srcs.contains("src1"), srcs.mkString(","))
      java.nio.file.Files.writeString(java.nio.file.Path.of(s"$in/bad.csv"),
        "who,what\nx,y\n")
      intercept[IllegalArgumentException] {
        Cli.run(spark, Array("prepare-corpus", s"$in/docs", out,
          "-", "parquet", "url", "-", "-", s"$in/bad.csv"))
      }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(out))
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(in))
    }
  }
}
