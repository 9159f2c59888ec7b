package graft

import graft.sources.CorpusIO
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class CorpusIOSpec extends SparkSpec {

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-corpusio").toString

  private val schema = new StructType()
    .add("doc_id", LongType).add("text", StringType).add("n_chars", LongType)

  test("jsonl round-trip is lossless, including nulls and JSON-hostile text") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val in = Seq(
        (1L, "plain", 5L),
        (2L, "quotes \" and \\ and\nnewline\ttab", 29L),
        (3L, null.asInstanceOf[String], 0L),
        (4L, "unicode: é中😀", 10L)
      ).toDF("doc_id", "text", "n_chars")
      CorpusIO.writeJsonl(in, dir)
      val back = CorpusIO.readJsonl(spark, dir, schema)
      // Spark refuses corrupt-only projections (pruning would skip parsing)
      // — collect whole rows, then inspect
      val all = back.collect()
      assert(all.forall(_.getAs[String]("_corrupt_record") == null))
      val got = back.select("doc_id", "text", "n_chars")
        .as[(Long, Option[String], Long)].collect().sortBy(_._1)
      val want = in.as[(Long, Option[String], Long)].collect().sortBy(_._1)
      assert(got.toSeq == want.toSeq)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("malformed lines land in _corrupt_record, clean rows still parse") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      CorpusIO.writeJsonl(Seq((1L, "ok", 2L)).toDF("doc_id", "text", "n_chars"),
        dir, compression = "none")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(dir, "part-bad.json"),
        "{\"doc_id\": 2, \"text\": \"fine\", \"n_chars\": 4}\nnot json at all\n")
      val back = CorpusIO.readJsonl(spark, dir, schema)
      val all = back.collect()
      assert(all.length == 3)
      assert(all.count(_.getAs[String]("_corrupt_record") != null) == 1)
      assert(all.count(r => !r.isNullAt(0) && r.getLong(0) == 2L) == 1,
        "clean rows of a dirty shard still parse")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("WARC parse: response bodies stripped of HTTP headers, resource raw, junk types skipped, corrupt tail counted") {
    def rec(wtype: String, uri: String, payload: Array[Byte],
            extra: String = ""): Array[Byte] = {
      val h = (s"WARC/1.1\r\nWARC-Type: $wtype\r\n" +
        (if (uri != null) s"WARC-Target-URI: $uri\r\n" else "") + extra +
        s"Content-Length: ${payload.length}\r\n\r\n").getBytes("UTF-8")
      h ++ payload ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val httpBody = "<html>hello</html>".getBytes("UTF-8")
    val httpPayload =
      "HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n".getBytes("UTF-8") ++ httpBody
    val archive =
      rec("warcinfo", null, "software: test\r\n".getBytes("UTF-8")) ++
      rec("response", "http://a.io/x", httpPayload) ++
      rec("request", "http://a.io/x", "GET /x HTTP/1.1\r\n\r\n".getBytes("UTF-8")) ++
      rec("resource", "http://a.io/raw", "raw bytes \u00ff here".getBytes("ISO-8859-1")) ++
      "GARBAGE that is not a WARC header at all".getBytes("UTF-8")
    val recs = graft.sources.WarcIO.parse("f.warc", archive).toSeq
    assert(recs.map(_.warc_type) == Seq("response", "resource", "corrupt"),
      s"got ${recs.map(_.warc_type)}")
    assert(recs(0).target_uri == "http://a.io/x")
    assert(recs(0).content.sameElements(httpBody),
      "HTTP response headers must be stripped to the body")
    assert(recs(1).content.sameElements("raw bytes \u00ff here".getBytes("ISO-8859-1")))
    assert(recs(2).corrupt && recs.count(_.corrupt) == 1)
    // member-per-record gzip (the Common Crawl layout): two separately
    // gzipped records concatenated read as one stream
    def gz(b: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b); g.close(); bos.toByteArray
    }
    val multi = gz(rec("resource", "http://m/1", "one".getBytes)) ++
      gz(rec("resource", "http://m/2", "two".getBytes))
    val mr = graft.sources.WarcIO.parse("m.warc.gz", multi).toSeq
    assert(mr.map(_.target_uri) == Seq("http://m/1", "http://m/2"))
    assert(mr.forall(!_.corrupt))
    // empty file: no records, no crash
    assert(graft.sources.WarcIO.parse("e.warc", Array.emptyByteArray).isEmpty)
    // negative Content-Length: counted corrupt, never an allocator crash
    val neg = ("WARC/1.1\r\nWARC-Type: resource\r\n" +
      "Content-Length: -1\r\n\r\n").getBytes("UTF-8")
    val nr = graft.sources.WarcIO.parse("n.warc", neg).toSeq
    assert(nr.map(_.corrupt) == Seq(true))
    // truncated gzip member (crawler died mid-write): corrupt, not fatal
    val cut = gz(rec("resource", "http://t/1", "payload".getBytes))
    val tr = graft.sources.WarcIO.parse("t.warc.gz",
      cut.take(cut.length / 2)).toSeq
    assert(tr.nonEmpty && tr.last.corrupt)
    // thousands of consecutive non-payload records: iterative skip, no
    // stack overflow
    val junk = Array.fill(20000)(
      rec("metadata", null, "k: v\r\n".getBytes("UTF-8"))).flatten ++
      rec("resource", "http://j/1", "end".getBytes)
    val jr = graft.sources.WarcIO.parse("j.warc", junk).toSeq
    assert(jr.map(_.target_uri) == Seq("http://j/1"))
    // bare-LF HTTP header separators (non-compliant servers): body parsed
    val lfBody = "lf body".getBytes("UTF-8")
    val lfResp = rec("response", "http://lf/1",
      "HTTP/1.1 200 OK\nContent-Type: text/plain\n\n".getBytes("UTF-8") ++ lfBody)
    val lr = graft.sources.WarcIO.parse("lf.warc", lfResp).toSeq
    assert(lr.head.content.sameElements(lfBody) && !lr.head.corrupt)
    // a response with NO header/body boundary at all: counted corrupt, not
    // a silent empty document
    val noB = rec("response", "http://nb/1",
      "HTTP/1.1 200 OK\r\nContent-Type: text/plain".getBytes("UTF-8"))
    val nb = graft.sources.WarcIO.parse("nb.warc", noB).toSeq
    assert(nb.head.corrupt && nb.head.content.isEmpty)
  }

  test("WARC round-trip through Spark: write archives, read back byte-identical payloads") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val in = (0L until 40L).map(i =>
        (s"http://ex.com/$i", s"payload $i é".getBytes("UTF-8")))
        .toDF("url", "content")
      val nFiles = graft.sources.WarcIO.writeWarc(in, dir, "url", "content")
      assert(nFiles >= 1)
      val back = graft.sources.WarcIO.readWarc(spark, dir)
        .collect().map(r => r.getString(3) -> r.getAs[Array[Byte]]("content")).toMap
      assert(back.size == 40)
      (0L until 40L).foreach { i =>
        assert(back(s"http://ex.com/$i").sameElements(
          s"payload $i é".getBytes("UTF-8")))
      }
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("import-warc CLI: crawl archives land as documents parquet, html mode extracts") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val in = Seq(
        ("http://s/1", "<html><body><p>one two</p><script>x<y</script></body></html>"),
        ("http://s/2", "<p>three</p>"))
        .toDF("url", "html")
        .select(col("url"), encode(col("html"), "UTF-8").as("content"))
      graft.sources.WarcIO.writeWarc(in, s"$dir/warc", "url", "content", gzip = true)
      val bos = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        Cli.run(spark, Array("import-warc", s"$dir/warc", s"$dir/docs", "html"))
      }
      val line = bos.toString("UTF-8").linesIterator
        .filter(_.startsWith("{")).toSeq.last
      assert(line.contains("\"n_docs\":2") && line.contains("\"n_corrupt\":0"), line)
      val docs = spark.read.parquet(s"$dir/docs")
        .collect().map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
      assert(docs("http://s/1") == "one two", s"html must extract: ${docs}")
      assert(docs("http://s/2") == "three")
      // without html mode the raw markup lands as text
      Console.withOut(new java.io.PrintStream(bos, true, "UTF-8")) {
        Cli.run(spark, Array("import-warc", s"$dir/warc", s"$dir/docs2"))
      }
      val raw = spark.read.parquet(s"$dir/docs2")
        .collect().map(r => r.getAs[String]("url") -> r.getAs[String]("text")).toMap
      assert(raw("http://s/2") == "<p>three</p>")
      // doc ids are deterministic provenance hashes (stable across runs)
      val ids1 = spark.read.parquet(s"$dir/docs").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val ids2 = spark.read.parquet(s"$dir/docs2").select("doc_id")
        .collect().map(_.getLong(0)).toSet
      assert(ids1 == ids2 && ids1.size == 2)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("partitionBy(source) writes prune at the directory level on read") {
    import spark.implicits._
    val dir = tmpDir()
    try {
      val in = (0 until 100).map(i => (i.toLong, s"doc $i", s"src${i % 4}"))
        .toDF("doc_id", "text", "source")
      CorpusIO.writeJsonl(in, dir, partitionBy = Seq("source"))
      val schema2 = new StructType().add("doc_id", LongType).add("text", StringType)
      val pruned = CorpusIO.readJsonl(spark, dir, schema2)
        .filter(col("source") === "src1")
      assert(pruned.count() == 25)
      val plan = pruned.queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [isnotnull(source"),
        s"source filter must prune directories, not scan+filter:\n${plan.take(1200)}")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }
}
