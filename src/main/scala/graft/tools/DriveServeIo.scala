package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Cold/warm IO measurement for the persisted retrieval-serve layouts
  * (r10 verdict tasks 1/3/4): times one serve mode three ways in one JVM —
  * an untimed touch pass (JIT + index-build warm), a warm pass (page
  * cache hot), and a cold pass (page cache dropped via
  * /proc/sys/vm/drop_caches when writable — requires root; skipped
  * otherwise). Every timed region also records its task-input bytes and
  * records from the listener bus, so the layout's scan volume is
  * measured, not asserted. Queries are COLLECTED into a local relation
  * before timing, so the timed read surface is index files only.
  *
  * The battery fixture's dim-4 embedding hides the codes layout's whole
  * point — at 4 longs a vector row is barely wider than its ids, so codes
  * vs vectors is a ~1.3× file-size difference. `dim=` builds a dedicated
  * index pair at a realistic embedding width (e.g. dim=64: vectors 64
  * longs/row, codes m ints/row — the d·8/m-fold gap the layout exists
  * for) and serves from that.
  *
  * Usage: DriveServeIo <sfDir> <adc|rerank|flat|scan_codes|scan_flat>
  *   [nq=0 → the 25-query bench slice] [gate=0 → the serve default]
  *   [dim=4] [m=5 — must divide dim+1]
  *
  * scan_codes / scan_flat time a FULL aggregate read of the payload
  * column of the PQ codes layout / the flat vector layout — the raw
  * per-byte cost of each serve scan, independent of scoring CPU.
  */
object DriveServeIo {

  private def dropCaches(): Boolean = try {
    Runtime.getRuntime.exec(Array("sync")).waitFor()
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/proc/sys/vm/drop_caches"), "3\n")
    true
  } catch { case _: Throwable => false }

  /** Bytes actually fetched from the block device (all disks, sectors×512
    * from /sys/block/<dev>/stat) — Spark's listener-bus bytesRead
    * undercounts small-file parquet scans badly (measured 0.5 MB reported
    * for a 9.3 MB full read), so the COLD regions' IO claim rests on the
    * kernel's own counter: after drop_caches every page the scan touches
    * is a real disk fetch. Warm regions read ~0 here, which is itself the
    * page-cache check.
    */
  private def diskBytesRead(): Long = try {
    val root = new java.io.File("/sys/block")
    Option(root.listFiles()).getOrElse(Array.empty)
      // physical devices only: layered block devices (dm-*/md*) replay the
      // same read at two layers and would double-count it; loop/ram/zram
      // are not disks at all. (Other processes' IO still lands in the
      // delta — the tool's contract is an otherwise-quiet machine, same as
      // every timed battery run.)
      .filterNot(d => Seq("loop", "dm-", "md", "ram", "zram")
        .exists(d.getName.startsWith))
      .map { d =>
        val stat = java.nio.file.Files.readString(
          java.nio.file.Paths.get(d.getAbsolutePath, "stat")).trim
        stat.split("\\s+")(2).toLong * 512L
      }.sum
  } catch { case _: Throwable => -1L }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args(1)
    val kv = args.drop(2).map { a =>
      a.split("=", 2) match {
        case Array(k, v) => (k, v)
        case _ => sys.error(s"bad argument '$a' — expected key=value; " +
          "usage: DriveServeIo <sfDir> <adc|rerank|flat|scan_codes|" +
          "scan_flat> [nq=N] [gate=N] [dim=N] [m=N] [wide=1]")
      }
    }.toMap
    val nQueries = kv.getOrElse("nq", "0").toInt
    val gate = kv.getOrElse("gate", "0").toLong
    val dim = kv.getOrElse("dim", "4").toInt
    val m = kv.getOrElse("m", "5").toInt
    val wide = kv.getOrElse("wide", "0") == "1"
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

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("text").isNotNull)

    // dim 4 reuses the battery's cached indexes; any other dim builds its
    // own pair once (marker-gated) under the same tmp-cache convention
    def ensureDimIndex(kind: String)(build: String => Unit): String = {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_serveio_${kind}_dim${dim}_m${m}_" +
          Integer.toHexString(sfDir.hashCode))
      val ok = new java.io.File(dir, "_GRAFT_OK")
      if (!ok.exists()) {
        if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
        build(dir.getAbsolutePath)
        java.nio.file.Files.createFile(ok.toPath)
      }
      dir.getAbsolutePath
    }
    lazy val pqPathBase =
      if (dim == 4) graft.QueriesData.ensureChunkIndexPq(spark, sfDir)
      else ensureDimIndex("pq") { p =>
        graft.ann.Retrieval.writeChunkIndexPq(docs.select("doc_id", "text"),
          p, nLists = 8, m = m, ksub = 32, dim = dim)
      }
    lazy val flatPathBase =
      if (dim == 4) graft.QueriesData.ensureChunkIndex(spark, sfDir)
      else ensureDimIndex("flat") { p =>
        graft.ann.Retrieval.writeChunkIndex(docs.select("doc_id", "text"),
          p, nLists = 8, dim = dim)
      }

    // wide=1: a clone of each layout whose STORED VECTORS carry full-range
    // 64-bit (xxhash64-derived) values parquet cannot bitpack or
    // dictionary-encode — the fixture embedding's 0–999 range compresses
    // ~6× on disk and hides most of the codes layout's byte advantage, so
    // the honest cold-IO rung for REAL (incompressible float) embeddings
    // measures against these. Codes files are copied untouched: 5-bit PQ
    // codes bitpack by design in both worlds, the claim under test is the
    // vector side's bytes. Serve SCORES on the wide clones are meaningless
    // (the inner product wraps) — every mode here is an IO measurement.
    def ensureWideClone(src: String, kind: String): String = {
      val dir = new java.io.File(System.getProperty("java.io.tmpdir"),
        s"graft_serveio_wide_${kind}_dim${dim}_m${m}_" +
          Integer.toHexString(src.hashCode))
      val ok = new java.io.File(dir, "_GRAFT_WIDE_OK")
      if (!ok.exists()) {
        if (dir.exists()) org.apache.commons.io.FileUtils.deleteDirectory(dir)
        def widen(df: DataFrame): DataFrame = df.withColumn("vec",
          transform(col("vec"),
            x => xxhash64(col("doc_id"), col("chunk_idx"), x)))
        if (kind == "pq") {
          // codes + sidecars verbatim; _vecs rewritten with wide values
          org.apache.commons.io.FileUtils.copyDirectory(
            new java.io.File(src), dir,
            (f: java.io.File) => f.getName != "_vecs")
          widen(spark.read.parquet(s"$src/_vecs"))
            .write.partitionBy("list", "vb").parquet(s"$dir/_vecs")
        } else {
          // data rewritten first (overwrite would clear the dir), then the
          // model sidecars copied alongside
          widen(spark.read.parquet(src))
            .write.partitionBy("list").parquet(dir.getAbsolutePath)
          Option(new java.io.File(src).listFiles()).getOrElse(Array.empty)
            .filter(f => f.isFile && f.getName.endsWith(".json"))
            .foreach(f => org.apache.commons.io.FileUtils
              .copyFileToDirectory(f, dir))
        }
        java.nio.file.Files.createFile(ok.toPath)
      }
      dir.getAbsolutePath
    }
    lazy val pqPath =
      if (wide) ensureWideClone(pqPathBase, "pq") else pqPathBase
    lazy val flatPath =
      if (wide) ensureWideClone(flatPathBase, "flat") else flatPathBase

    // query set → local relation (driver-resident), so timed serves read
    // ONLY index files; nq > 0 picks an eval-sized slice that can push the
    // exact re-rank past its collect gate
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

    // raw layout scans: aggregate over the payload column so every page of
    // it is decoded — the per-byte scan cost with zero scoring CPU. The
    // fold reduces each element mod 1000 first: wide=1 vectors carry
    // full-range 64-bit values whose raw running sum trips ANSI overflow
    def scanCodes(): DataFrame = spark.read.parquet(pqPath)
      .agg(sum(aggregate(col("pq_code"), lit(0L),
        (a, x) => a + pmod(x, lit(1000)))), count(lit(1)))
    def scanFlat(): DataFrame = spark.read.parquet(flatPath)
      .agg(sum(aggregate(col("vec"), lit(0L),
        (a, x) => a + pmod(x, lit(1000L)))), count(lit(1)))

    def serve(): DataFrame = mode match {
      case "adc" => graft.ann.Retrieval.retrieveFromChunkIndexPq(spark,
        pqPath, qs, k = 5, nProbe = 3, dim = dim, exactRerank = false)
      case "rerank" =>
        if (gate > 0)
          graft.ann.Retrieval.retrieveFromChunkIndexPq(spark, pqPath, qs,
            k = 5, nProbe = 3, dim = dim, collectGate = gate)
        else graft.ann.Retrieval.retrieveFromChunkIndexPq(spark, pqPath,
          qs, k = 5, nProbe = 3, dim = dim)
      case "flat" => graft.ann.Retrieval.retrieveFromChunkIndex(spark,
        flatPath, qs, k = 5, nProbe = 3, dim = dim)
      case "scan_codes" => scanCodes()
      case "scan_flat"  => scanFlat()
      case other => sys.error(s"unknown mode $other")
    }

    // listener bus is async: poll until the counters stop moving
    def drained(): (Long, Long) = {
      var prev = -1L
      var cur = metrics.bytesRead.sum()
      while (cur != prev) { prev = cur; Thread.sleep(300); cur = metrics.bytesRead.sum() }
      (cur, metrics.recordsRead.sum())
    }
    def timed(region: String): Unit = {
      val (b0, r0) = drained()
      val d0 = diskBytesRead()
      val t0 = System.nanoTime()
      serve().write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      val d1 = diskBytesRead()
      val (b1, r1) = drained()
      println(f"""{"mode":"$mode","region":"$region","secs":$secs%.2f,""" +
        s""""disk_bytes":${if (d0 < 0 || d1 < 0) -1 else d1 - d0},""" +
        s""""bytes_read":${b1 - b0},"records_read":${r1 - r0},""" +
        s""""nq":${qRows.length},"dim":$dim,"wide":$wide,"sf":"$sfDir"""" +
        (if (gate > 0) s""","collect_gate":$gate}""" else "}"))
    }

    // drop block-manager state between regions: the over-gate rerank serve
    // persists its shortlist, and CacheManager substitutes a cached
    // subtree into any later plan that canonicalizes equal — a "cold" run
    // served from the Spark cache would silently skip the codes scan this
    // tool exists to measure (drop_caches clears the PAGE cache only)
    def freshRegion(): Unit = {
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    serve().write.mode("overwrite").format("noop").save()   // touch pass
    freshRegion()
    timed("warm")
    freshRegion()
    if (dropCaches()) timed("cold")
    else println(s"""{"mode":"$mode","region":"cold","skipped":"drop_caches not writable"}""")
    spark.stop()
  }
}
