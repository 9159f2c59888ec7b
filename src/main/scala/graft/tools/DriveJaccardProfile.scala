package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextFunctions

/** Stage-level profile of ngramJaccardPairs (r15: it dominates four sf10
  * battery entries — d_ngram_jaccard and the dedup-clustering trio, ~3.6k
  * CPU-s combined). Decomposes into: shingle scan, inverted-index exchange
  * (buckets), in-bucket pair expansion + pair aggregate, size joins +
  * threshold. Each stage materializes through the noop sink with its own
  * wall + process-CPU stamp.
  *
  * Usage: DriveJaccardProfile <sfDir> [shingleN=3] [maxDocFreq=50]
  */
object DriveJaccardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val shingleN = if (args.length > 1) args(1).toInt else 3
    val maxDocFreq = if (args.length > 2) args(2).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean = java.lang.management.ManagementFactory
      .getPlatformMXBean(classOf[com.sun.management.OperatingSystemMXBean])
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
    df.count() // scan warm, like the bench warmup
    def timed[T](name: String)(body: => T): T = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      val r = body
      println(f"""{"stage":"$name","secs":${(System.nanoTime() - t0) / 1e9}%.2f,"cpu":${(osBean.getProcessCpuTime - c0) / 1e9}%.2f}""")
      r
    }
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.mode("overwrite").format("noop").save()

    val idCol = "doc_id"
    val inv = df.select(col(idCol).as("id"),
      explode(array_distinct(TextFunctions.shingles(col("text"), shingleN)))
        .as("shingle"))
    val sizes = df.select(col(idCol).as("id"),
      size(array_distinct(TextFunctions.shingles(col("text"), shingleN))).as("n"))
    val buckets = inv.groupBy("shingle")
      .agg(sort_array(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2 && size(col("ids")) <= maxDocFreq)
    val pairs = buckets
      .select(explode(graft.functions.KFunctions.sorted_id_pairs(col("ids"))).as("p"))
      .groupBy(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .agg(count(lit(1)).as("inter"))

    timed("1_shingle_scan_only")(noop(inv))
    timed("2_buckets (index exchange + collect_list + cap)")(noop(buckets))
    timed("3_pairs (in-bucket expand + pair agg)")(noop(pairs))
    timed("4_sizes_pass")(noop(sizes))
    timed("5_full_ngramJaccardPairs")(noop(
      graft.dedup.Dedup.ngramJaccardPairs(df, idCol, "text", shingleN,
        threshold = 0.12, maxDocFreq = maxDocFreq)))
    timed("6_cc_closure_on_pairs")(noop(
      graft.dedup.Clusters.connectedComponents(
        graft.dedup.Dedup.ngramJaccardPairs(df, idCol, "text", shingleN,
          threshold = 0.12, maxDocFreq = maxDocFreq))))
    spark.stop()
  }
}
