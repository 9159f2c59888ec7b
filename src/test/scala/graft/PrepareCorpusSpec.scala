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
}
