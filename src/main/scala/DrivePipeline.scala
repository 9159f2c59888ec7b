import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** TEMP probe: decompose d_curation_pipeline + exactCosinePairs cost. */
object DrivePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    def timed[T](label: String)(f: => T): T = {
      val c0 = osBean.getProcessCpuTime; val t0 = System.nanoTime()
      val r = f
      println(f"$label%-28s wall=${(System.nanoTime()-t0)/1e9}%7.2f cpu=${(osBean.getProcessCpuTime-c0)/1e9}%7.2f")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    docs.count(); emb.count()

    // exactCosinePairs replica
    val vd = col("embedding").cast("array<double>")
    val unit = emb.select(col("vec_id").as("id"), vd.as("vec"))
      .withColumn("norm", sqrt(
        graft.functions.KFunctions.array_dot(col("vec"), col("vec"))))
      .filter(col("norm") =!= 0.0d && !isnan(col("norm")))
      .withColumn("unit", transform(col("vec"), x => x / col("norm")))
      .select("id", "unit")
    val exact = unit.select(col("id").as("id_a"), col("unit").as("unit_a"))
      .join(unit.select(col("id").as("id_b"), col("unit").as("unit_b")),
        col("id_a") < col("id_b"))
      .filter(round(graft.functions.KFunctions.array_dot(
        col("unit_a"), col("unit_b")), 6) >= 0.3)
      .select("id_a", "id_b")
    timed("exactCosinePairs")(noop(exact))
    timed("exactCosinePairs 2")(noop(exact))

    // curation pipeline stages
    val all = docs
    val trimmed0 = graft.dedup.Dedup.trimDupSpans(all, windowN = 13)
      .where(col("text").isNotNull && length(col("text")) > 0)
      .select("doc_id", "text")
    val trimmed = timed("trim+materialize")(
      graft.text.CorpusPipeline.materializeStage(trimmed0, None, "trimmed"))
    val model = timed("train+cache")(
      graft.text.LmScore.train(trimmed).cache())
    val scored = timed("score+ckpt")(
      graft.text.LmScore.score(trimmed, model).localCheckpoint(true))
    val cut = timed("cut agg")(scored.agg(round(
      sum(col("avg_logprob").cast("decimal(15,5)")).cast("double") /
        count(lit(1)), 3)).head().getDouble(0))
    val kept = scored
      .where(col("avg_logprob") >= cut)
      .join(all.select("doc_id", "source"), "doc_id")
    timed("mix+rollup")(noop(
      graft.text.Sampling.temperatureMix(kept, alpha = 0.5, salt = "cur")
        .groupBy("source")
        .agg(countDistinct("doc_id").as("n_docs"),
          count(lit(1)).as("n_copies"),
          round(sum(col("avg_logprob").cast("decimal(15,5)")).cast("double") /
            count(lit(1)), 5).as("avg_lp"))))
    spark.stop()
  }
}
