package graft.catalog

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** S12's batch leg (reference offset_store/sqlite.rs:126-154): a small
  * parquet state table of `(backup_id, topic, partition, last_offset,
  * checkpoint_ts)` consulted by incremental batch backups to resume from
  * `last_offset + 1` without a streaming checkpoint.
  *
  * The table is O(backups × topics × partitions) rows — metadata-sized at any
  * data scale — but it lives in the storage root next to the backups, so all
  * IO goes through Hadoop FS (s3a/abfss/gs work unchanged). Updates are
  * read-merge-write with an atomic directory rename, same recipe as
  * [[Manifest.save]].
  */
object OffsetStateTable {

  val schema: StructType = StructType(Seq(
    StructField("backup_id", StringType, nullable = false),
    StructField("topic", StringType, nullable = false),
    StructField("partition", IntegerType, nullable = false),
    StructField("last_offset", LongType, nullable = false),
    StructField("checkpoint_ts", LongType, nullable = false)))

  def path(stateRoot: String): String = s"$stateRoot/_graft_offset_state"

  /** Current state as a DataFrame; empty (with schema) when absent. */
  def load(spark: SparkSession, stateRoot: String): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path(stateRoot))
    val fs = org.apache.hadoop.fs.FileSystem.get(
      p.toUri, spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.schema(schema).parquet(path(stateRoot))
    else spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
  }

  /** get_all_offsets for one backup id (sqlite.rs:172-192) as a driver map —
    * bounded by partition count.
    */
  def lastOffsets(spark: SparkSession, stateRoot: String,
                  backupId: String): Map[(String, Int), Long] =
    load(spark, stateRoot).filter(col("backup_id") === backupId)
      .collect()
      .map(r => (r.getString(1), r.getInt(2)) -> r.getLong(3)).toMap

  /** Merge the manifest's per-partition high-water marks into the state
    * table: `last_offset` only ever advances (a re-run over old data must not
    * move the resume point backwards). Serialized per JVM like Manifest.save;
    * cross-process writers coordinate at the orchestration layer.
    */
  def update(spark: SparkSession, stateRoot: String, m: BackupManifest,
             nowMs: Long = System.currentTimeMillis()): Unit = {
    import spark.implicits._
    val fresh = for {
      t <- m.topics
      p <- t.partitions
      last <- p.lastOffset
    } yield (m.backup_id, t.name, p.partition_id, last, nowMs)
    if (fresh.isEmpty) return
    mergeAndSwap(spark, stateRoot, fresh.toDF("backup_id", "topic", "partition",
      "last_offset", "checkpoint_ts"))
  }

  /** The reference's offsets.db as this state table's schema (S12 interop,
    * offset_store/sqlite.rs:72-79 — identical columns by construction). Reads
    * the SQLite file directly via [[graft.sources.SqliteFile]]; driver-side
    * materialization is fine, the table is O(backups × partitions).
    */
  def fromSqlite(spark: SparkSession, dbPath: String): DataFrame = {
    val db = graft.sources.SqliteFile.open(dbPath, spark.sparkContext.hadoopConfiguration)
    // SQLite columns are dynamically typed: a NULL or TEXT-affinity value in a
    // hand-edited or drifted db must fail with the row/column named, not a
    // bare cast exception mid-import
    def s(r: graft.sources.SqliteFile.Row, i: Int, name: String): String = r.values(i) match {
      case v: String => v
      case other => throw new IllegalArgumentException(
        s"offsets rowid=${r.rowid}: column '$name' is not TEXT (got $other)")
    }
    def l(r: graft.sources.SqliteFile.Row, i: Int, name: String): Long = r.values(i) match {
      case v: java.lang.Long => v.longValue()
      case other => throw new IllegalArgumentException(
        s"offsets rowid=${r.rowid}: column '$name' is not INTEGER (got $other)")
    }
    val rows = db.table("offsets").map { r =>
      org.apache.spark.sql.Row(s(r, 0, "backup_id"), s(r, 1, "topic"),
        l(r, 2, "partition").toInt, l(r, 3, "last_offset"), l(r, 4, "checkpoint_ts"))
    }
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
  }

  /** Migrate a reference offsets.db into the parquet state table. Existing
    * marks win when higher — the advance-only rule of [[update]] — so the
    * import is idempotent and can never move a resume point backwards.
    * Returns the number of marks read from the db.
    */
  def importSqlite(spark: SparkSession, dbPath: String, stateRoot: String): Long = {
    val fresh = fromSqlite(spark, dbPath)
    val n = fresh.count()
    if (n > 0) mergeAndSwap(spark, stateRoot, fresh)
    n
  }

  /** Write the state table back out as a reference-shaped `offsets.db` —
    * the inverse of [[importSqlite]], closing the one-way-migration
    * asymmetry: a user running both tools side by side can round-trip marks
    * in either direction (reference sync: sqlite.rs:231). `backup_jobs` is
    * synthesized from the distinct backup ids (status 'completed',
    * timestamps from each backup's newest checkpoint) — the parquet state
    * table deliberately doesn't track job lifecycle. Returns the number of
    * marks written.
    */
  def exportSqlite(spark: SparkSession, stateRoot: String, dbPath: String): Int = {
    val rows = load(spark, stateRoot).collect() // metadata-sized by contract
    val offsets = rows.toSeq.map(r => graft.sources.SqliteWriter.OffsetRow(
      r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
    val jobs = offsets.groupBy(_.backupId).toSeq.map { case (id, rs) =>
      val ts = rs.map(_.checkpointTs).max
      graft.sources.SqliteWriter.JobRow(id, None, "completed", ts, ts, Some(ts))
    }
    graft.sources.SqliteWriter.write(dbPath,
      spark.sparkContext.hadoopConfiguration, offsets, jobs)
    offsets.size
  }

  private def mergeAndSwap(spark: SparkSession, stateRoot: String,
                           freshDF: DataFrame): Unit = synchronized {
    val merged = load(spark, stateRoot).unionByName(freshDF)
      .groupBy("backup_id", "topic", "partition")
      .agg(max("last_offset").as("last_offset"),
        max_by(col("checkpoint_ts"), col("last_offset")).as("checkpoint_ts"))

    // write-tmp-then-swap: readers never see a HALF-WRITTEN dir; there is a
    // brief missing-dir window during the delete+rename (benign — load()
    // treats absent as empty, and the marks are rebuildable from manifests)
    val target = new org.apache.hadoop.fs.Path(path(stateRoot))
    val tmp = new org.apache.hadoop.fs.Path(
      s"${path(stateRoot)}.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    // the merge reads the CURRENT table — materialize before replacing it
    val rows = merged.collect().toSeq
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1),
      merged.schema).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      target.toUri, spark.sparkContext.hadoopConfiguration)
    try {
      if (fs.exists(target)) fs.delete(target, true)
      // same scheme split as Manifest.save: FileContext only exists for
      // filesystems with an AbstractFileSystem binding — s3a/gs have none
      // by default and would throw UnsupportedFileSystemException; there
      // FileSystem.rename (copy-based on object stores) does the move. The
      // missing-dir window is documented above and the marks are
      // rebuildable from manifests.
      val fcBound = Set("file", "hdfs", "viewfs", "abfs", "abfss", "wasb", "wasbs")
        .contains(Option(fs.getUri.getScheme).getOrElse("file"))
      if (fcBound) {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(fs.getUri, fs.getConf)
        fc.rename(tmp, target, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
      } else if (!fs.rename(tmp, target)) {
        throw new java.io.IOException(s"state-table rename failed: $tmp -> $target")
      }
    } catch { case e: Throwable =>
      try fs.delete(tmp, true) catch { case _: Throwable => () }
      throw e
    }
  }
}
