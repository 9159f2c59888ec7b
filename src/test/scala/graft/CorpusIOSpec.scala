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
