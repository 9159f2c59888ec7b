package graft
import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // JVM/codegen warm-up: touch the scan + shuffle + agg paths once so the
    // first measured query doesn't pay JIT and classloading (~5 s).
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count().collect()
      spark.read.parquet(s"$sfDir/events.parquet").count()
      // touch the data-ops inputs too: d_*/a_* entries should measure their
      // operators, not whichever of them pays the first page-cache miss
      spark.read.parquet(s"$sfDir/documents.parquet").count()
      spark.read.parquet(s"$sfDir/embeddings.parquet").count()
      // one-time ANN index builds belong to warmup, not the timed
      // a_ann_lsh_bucketed / a_ann_ivf entries (which bench the pruned probe)
      QueriesData.ensureBucketedAnn(spark, sfDir)
      QueriesData.ensureIvf(spark, sfDir)
    } catch { case _: Throwable => }

    // deterministic order, heavyweight pipeline workloads (p_*) last so their
    // GC/page-cache footprint doesn't pollute the cheap queries' timings;
    // positional args (if any) restrict the run to the named queries — an
    // unknown name fails loudly instead of benchmarking nothing
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    val ordered = SparkEntry.queries.toSeq
      .filter { case (name, _) => args.isEmpty || args.contains(name) }
      .sortBy { case (name, _) =>
        (if (name.startsWith("p_")) 1 else 0, name)
      }
    val results = ordered.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink materializes every output column (count() would let
      // Catalyst prune the projection and flatter the numbers)
      val err: Option[String] =
        try { fn(spark, sfDir).write.mode("overwrite").format("noop").save(); None }
        catch { case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}")
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // no cross-query pollution: drop any block-manager state a query left
      // behind (result checkpoints, caches) OUTSIDE its timed region — at
      // large sf the accumulated blocks otherwise eat the shared heap and a
      // later query pays the bill (seen as an sf10 OOM in d_ngram_jaccard
      // caused by everything before it)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      spark.catalog.clearCache()
      // drop pipeline scratch output before its dirty pages flush to disk
      // during the NEXT query's timed region
      graft.util.TempDirs.cleanAll()
      (name, elapsed, err)
    }
    def jstr(s: String) = graft.util.Json.escape(s)
    val qs = results.map { case (k, v, _) => jstr(k) + ":" + v }
      .mkString("{", ",", "}")
    // a failed query must be loud, not a flattering ~0 s entry
    val errs = results.collect { case (k, _, Some(e)) => jstr(k) + ":" + jstr(e) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":${jstr(sfDir)}}""")
    spark.stop()
  }
}
