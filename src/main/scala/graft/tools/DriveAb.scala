package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for the d_embedding_dups mining shapes — band-exchange
  * payload (id-only vs payload-carrying), staged-mining batch geometry,
  * and the quantized-prefilter rung (see SCALING.md for recorded numbers).
  *
  * Usage: DriveAb <sfDir> <idOnlyBand: true|false>
  *   [passes=2] [count=0|1] [batch=0] [ranges=0] [spp=SPARK_GRAFT_CPUS]
  *
  * batch/ranges forward to stagedTableBatch/stagedBucketRanges (0 = the
  * one-shot plan); spp overrides spark.sql.shuffle.partitions for band-join
  * parallelism A/Bs. Legacy positional `countPairs` as arg 3 still works.
  */
object DriveAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val idOnly = args(1).toBoolean
    val kv = args.drop(2).flatMap { a =>
      if (a == "countPairs") Some(("count", "1"))
      else a.split("=", 2) match {
        case Array(k, v) => Some((k, v))
        case _ => sys.error(s"bad argument '$a' — expected key=value " +
          "(passes/count/batch/ranges/spp) or countPairs")
      }
    }.toMap
    val passes = kv.getOrElse("passes", "2").toInt
    val doCount = kv.getOrElse("count", "0") == "1"
    val batch = kv.getOrElse("batch", "0").toInt
    val ranges = kv.getOrElse("ranges", "0").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spp = kv.getOrElse("spp", cpus)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", spp)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = e.count() // also warms the scan
    def mine() =
      graft.dedup.Dedup.embeddingPairs(e, "vec_id", "embedding", dim = 64,
        bits = 5, threshold = 0.3, knownCount = Some(n), tables = 8,
        idOnlyBand = idOnly, stagedTableBatch = batch,
        stagedBucketRanges = ranges)
    def onePass(): Double = {
      val t0 = System.nanoTime()
      val out = mine()
      out.write.mode("overwrite").format("noop").save()
      // staged mining returns an eager localCheckpoint handle — drop it so
      // back-to-back passes don't stack block-manager state
      graft.util.Checkpoints.free(out)
      (System.nanoTime() - t0) / 1e9
    }
    val runs = (1 to passes).map(_ => onePass())
    val pairs = if (doCount) { val o = mine(); val c = o.count();
      graft.util.Checkpoints.free(o); c } else -1L
    println(f"AB idOnly=$idOnly batch=$batch ranges=$ranges spp=$spp " +
      f"sf=$sfDir n=$n best=${runs.min}%.2f " +
      runs.map(r => f"$r%.2f").mkString("runs=[", ",", "]") +
      s" pairs=$pairs")
    spark.stop()
  }
}
