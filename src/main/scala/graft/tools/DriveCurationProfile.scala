package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup

/** Stage-level profile of the d_curation_pipeline capstone (r10 verdict
  * task 5: it is the top sf10 battery cost at 75.4 s) — runs the entry's
  * exact plan with a timer around each materialization boundary, so the
  * composition cost decomposes into its five stages.
  *
  * Usage: DriveCurationProfile <sfDir>
  */
object DriveCurationProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val all = spark.read.parquet(s"$sfDir/documents.parquet")
    all.count()   // scan warm, like the bench warmup
    def timed[T](name: String)(body: => T): T = {
      val t0 = System.nanoTime()
      val r = body
      println(f"""{"stage":"$name","secs":${(System.nanoTime() - t0) / 1e9}%.2f}""")
      r
    }
    val staging = sys.env.get("GRAFT_PIPELINE_STAGING")
      .map(base => graft.util.TempDirs.createUnder(base, "graft-curp-"))
    val trimmed = timed("trim_dup_spans+materialize") {
      graft.text.CorpusPipeline.materializeStage(
        Dedup.trimDupSpans(all, windowN = 13)
          .where(col("text").isNotNull && length(col("text")) > 0)
          .select("doc_id", "text"),
        staging, "trimmed")
    }
    val model = timed("lm_train") {
      val m = graft.text.LmScore.train(trimmed).cache()
      // force the cached count tables so scoring doesn't retrain
      m.uni.count(); m.bi.count(); m.tri.count()
      m
    }
    val scored = timed("lm_score+checkpoint") {
      graft.text.LmScore.score(trimmed, model).localCheckpoint(true)
    }
    val cut = timed("mean_cut") {
      scored.agg(round(
        sum(col("avg_logprob").cast("decimal(15,5)")).cast("double") /
          count(lit(1)), 3)).head().getDouble(0)
    }
    timed("filter+mix+rollup") {
      val kept = scored.where(col("avg_logprob") >= cut)
        .join(all.select("doc_id", "source"), "doc_id")
      graft.text.Sampling.temperatureMix(kept, alpha = 0.5, salt = "cur")
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_copies"),
          round(sum(col("avg_logprob").cast("decimal(15,5)")).cast("double") /
            count(lit(1)), 5).as("avg_lp"))
        .orderBy("source")
        .write.mode("overwrite").format("noop").save()
    }
    graft.util.TempDirs.cleanAll()
    spark.stop()
  }
}
