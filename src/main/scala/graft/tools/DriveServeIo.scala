package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold/warm IO measurement for the persisted retrieval-serve layouts
  * (r10 verdict tasks 1/3/4): times one serve mode three ways in one JVM —
  * an untimed touch pass (JIT + index-build warm), a warm pass (page
  * cache hot), and a cold pass (page cache dropped via
  * /proc/sys/vm/drop_caches when writable — requires root; skipped
  * otherwise). Every timed region also records its task-input bytes from
  * the listener bus, so the layout's scan volume is measured, not
  * asserted. Queries are COLLECTED into a local relation before timing, so
  * the timed read surface is index files only.
  *
  * Usage: DriveServeIo <sfDir> <adc|rerank|flat> [nQueries=0 → the
  *   25-query bench slice] [collectGate=0 → the serve default]
  */
object DriveServeIo {

  private def dropCaches(): Boolean = try {
    Runtime.getRuntime.exec(Array("sync")).waitFor()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/proc/sys/vm/drop_caches"), "3\n")
    true
  } catch { case _: Throwable => false }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val nQueries = if (args.length > 2) args(2).toInt else 0
    val gate = if (args.length > 3) args(3).toLong else 0L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val metrics = graft.metrics.GraftMetrics.install(spark)

    val pqPath = graft.QueriesData.ensureChunkIndexPq(spark, sfDir)
    val flatPath = graft.QueriesData.ensureChunkIndex(spark, sfDir)

    // query set → local relation (driver-resident), so timed serves read
    // ONLY index files; nQueries > 0 picks an eval-sized slice that can
    // push the exact re-rank past its collect gate
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)
    val qRows =
      (if (nQueries > 0)
        docs.filter(col("doc_id") % 7 === 3).orderBy("doc_id")
          .limit(nQueries)
      else
        docs.filter(col("doc_id") % 101 === 7 && col("doc_id") < 2525))
        .select(col("doc_id").as("query_id"), col("text")).collect()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("query_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("text",
        org.apache.spark.sql.types.StringType)))
    def qs: DataFrame = spark.createDataFrame(
      java.util.Arrays.asList(qRows: _*), schema)

    def serve(): DataFrame = mode match {
      case "adc" => graft.ann.Retrieval.retrieveFromChunkIndexPq(spark,
        pqPath, qs, k = 5, nProbe = 3, exactRerank = false)
      case "rerank" =>
        if (gate > 0)
          graft.ann.Retrieval.retrieveFromChunkIndexPq(spark, pqPath, qs,
            k = 5, nProbe = 3, collectGate = gate)
        else graft.ann.Retrieval.retrieveFromChunkIndexPq(spark, pqPath,
          qs, k = 5, nProbe = 3)
      case "flat" => graft.ann.Retrieval.retrieveFromChunkIndex(spark,
        flatPath, qs, k = 5, nProbe = 3)
      case other => sys.error(s"unknown mode $other")
    }

    // listener bus is async: poll until the byte counter stops moving
    def drainedBytes(): Long = {
      var prev = -1L
      var cur = metrics.bytesRead.sum()
      while (cur != prev) { prev = cur; Thread.sleep(300); cur = metrics.bytesRead.sum() }
      cur
    }
    def timed(region: String): Unit = {
      val b0 = drainedBytes()
      val t0 = System.nanoTime()
      serve().write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val bytes = drainedBytes() - b0
      println(f"""{"mode":"$mode","region":"$region","secs":$secs%.2f,""" +
        s""""bytes_read":$bytes,"nq":${qRows.length},"sf":"$sfDir"""" +
        (if (gate > 0) s""","collect_gate":$gate}""" else "}"))
    }

    serve().write.mode("overwrite").format("noop").save()   // touch pass
    timed("warm")
    if (dropCaches()) timed("cold")
    else println(s"""{"mode":"$mode","region":"cold","skipped":"drop_caches not writable"}""")
    spark.stop()
  }
}
