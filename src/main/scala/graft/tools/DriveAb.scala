package graft.tools

import org.apache.spark.sql.SparkSession

/** Temporary A/B harness for the d_embedding_dups band-exchange shapes
  * (payload-carrying vs id-only band) — see SCALING.md for the recorded
  * numbers. Usage: DriveAb <sfDir> <idOnlyBand: true|false> [countPairs]
  */
object DriveAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val idOnly = args(1).toBoolean
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count() // also warms the scan
    def onePass(): Double = {
      val t0 = System.nanoTime()
      graft.dedup.Dedup.embeddingPairs(e, "vec_id", "embedding", dim = 64,
          bits = 5, threshold = 0.3, knownCount = Some(n), tables = 8,
          idOnlyBand = idOnly)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val s1 = onePass()
    val s2 = onePass()
    val pairs =
      if (args.length > 2)
        graft.dedup.Dedup.embeddingPairs(e, "vec_id", "embedding", dim = 64,
          bits = 5, threshold = 0.3, knownCount = Some(n), tables = 8,
          idOnlyBand = idOnly).count()
      else -1L
    println(f"AB idOnly=$idOnly sf=$sfDir n=$n best=${math.min(s1, s2)}%.2f " +
      f"runs=[$s1%.2f,$s2%.2f] pairs=$pairs")
    spark.stop()
  }
}
