package graft.pipelines

import graft.catalog.{BackupManifest, Manifest}
import graft.codec.{CompressionCodec, SegmentCodec}
import graft.functions.KFunctions
import graft.model.KRecord
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Restore/PITR options (reference RestoreConfig, restore/engine.rs):
  * time window bounds are epoch millis, both ends INCLUSIVE
  * (restore/helpers.rs:55-73).
  */
case class RestoreConfig(
    backupRoot: String,
    backupId: String,
    windowStartMs: Option[Long] = None,
    windowEndMs: Option[Long] = None,
    includeTopics: Seq[String] = Nil,
    excludeTopics: Seq[String] = Nil,
    sourcePartitions: Option[Seq[Int]] = None,
    topicMapping: Map[String, String] = Map.empty,
    partitionMapping: Map[Int, Int] = Map.empty,
    completedSegmentKeys: Set[String] = Set.empty)

/** The restore "query" (reference lifecycle §3.2): manifest catalog → segment
  * pruning (F6) → checkpoint anti-join (F9) → binary scan + KBAK decode
  * (S8/S10) → record time filter (F7) → topic/partition remap (F13/F14).
  *
  * Scale shape: pruning happens on the CATALOG (one row per segment), so at
  * 100 TB a narrow PITR window touches only the overlapping ~128 MB objects;
  * the binaryFile scan parallelizes one file per task; decode is a streaming
  * flatMap (no per-task materialization); the ts filter is re-applied
  * per-record because segment stats are ranges, not predicates.
  */
object Restore {

  /** The restored record set as a canonical-record Dataset (the produce step
    * K3 is a separate sink; tests and validation consume this directly).
    */
  def records(spark: SparkSession, cfg: RestoreConfig): Dataset[KRecord] = {
    import spark.implicits._
    val manifest = Manifest.load(cfg.backupRoot, cfg.backupId)
    val keys = prunedSegmentKeys(manifest, cfg)
    val root = cfg.backupRoot

    val decoded: Dataset[KRecord] =
      if (keys.isEmpty) spark.emptyDataset[KRecord]
      else spark.read.format("binaryFile")
        .load(keys.map(k => s"$root/$k"): _*)
        .select("path", "content")
        .as[(String, Array[Byte])]
        .flatMap { case (path, bytes) =>
          val (topic, partition) = parseSegmentPath(path)
          // magic-sniffed: KBAK binary or legacy JSON (S10/S11)
          graft.codec.LegacySegment.decodeAny(bytes, path, topic, partition)
        }

    val timeFiltered = (cfg.windowStartMs, cfg.windowEndMs) match {
      case (None, None) => decoded
      case (s, e) =>
        val lo = s.getOrElse(Long.MinValue)
        val hi = e.getOrElse(Long.MaxValue)
        decoded.filter(r => r.timestamp >= lo && r.timestamp <= hi)
    }
    timeFiltered
  }

  /** Restore with topic rename / explicit partition remap applied (F13/F14). */
  def remapped(spark: SparkSession, cfg: RestoreConfig): DataFrame = {
    val base = records(spark, cfg).toDF()
    val t = if (cfg.topicMapping.isEmpty) base
      else {
        val m = typedLit(cfg.topicMapping)
        base.withColumn("topic", coalesce(element_at(m, col("topic")), col("topic")))
      }
    if (cfg.partitionMapping.isEmpty) t
    else {
      val m = typedLit(cfg.partitionMapping)
      t.withColumn("partition",
        coalesce(element_at(m, col("partition")), col("partition")))
    }
  }

  /** Catalog-side planning: topic include/exclude (F2) → partition filter (F5)
    * → time-window segment pruning (F6) → completed-segment anti set (F9).
    * Driver-side list ops — the manifest is small (1 row per 128 MB object).
    */
  def prunedSegmentKeys(manifest: BackupManifest, cfg: RestoreConfig): Seq[String] = {
    for {
      t <- manifest.topics
      if graft.functions.KHash.topicMatches(t.name, cfg.includeTopics, cfg.excludeTopics)
      p <- t.partitions
      if cfg.sourcePartitions.forall(_.contains(p.partition_id))
      s <- p.segments
      if s.overlapsTimeWindow(cfg.windowStartMs, cfg.windowEndMs)
      if !cfg.completedSegmentKeys.contains(s.key)
    } yield s.key
  }

  /** A5 restore-report metrics via `Dataset.observe` (restore/engine.rs
    * 346-357): record/byte counters accumulate during the ACTION that
    * consumes the returned DataFrame — no extra pass. Read the observation
    * after the action completes.
    */
  def withMetrics(df: DataFrame): (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation("restore_metrics")
    val observed = df.observe(obs,
      count(lit(1)).as("records_restored"),
      coalesce(sum(coalesce(length(col("value")), lit(0)) +
        coalesce(length(col("key")), lit(0))), lit(0L)).as("bytes_restored"))
    (observed, obs)
  }

  /** `.../topics/{topic}/partition={p}/segment-....bin[.ext]` → (topic, p). */
  def parseSegmentPath(path: String): (String, Int) = {
    val parts = path.split('/')
    val pIdx = parts.lastIndexWhere(_.startsWith("partition="))
    require(pIdx > 0, s"Not a segment path: $path")
    (parts(pIdx - 1), parts(pIdx).substring("partition=".length).toInt)
  }

  /** validate-restore's report shape (reference manifest.rs:827-856
    * DryRunReport): would the restore succeed, and what would it touch.
    */
  case class DryRunValidation(
      backup_id: String, valid: Boolean, errors: Seq[String], warnings: Seq[String],
      segments_to_process: Long, records_to_restore: Long, bytes_to_restore: Long,
      time_range: Option[(Long, Long)],
      topics: Seq[(String, String, Long, Long)]) { // (source, target, segments, records)
    def toJson: String = {
      import graft.util.Json.{escape => js}
      val ts = topics.map { case (s, t, ns, nr) =>
        s"""{"source_topic":${js(s)},"target_topic":${js(t)},"segments":$ns,"records":$nr}"""
      }.mkString("[", ",", "]")
      s"""{"backup_id":${js(backup_id)},"valid":$valid,""" +
        s""""errors":${errors.map(js).mkString("[", ",", "]")},""" +
        s""""warnings":${warnings.map(js).mkString("[", ",", "]")},""" +
        s""""segments_to_process":$segments_to_process,""" +
        s""""records_to_restore":$records_to_restore,""" +
        s""""bytes_to_restore":$bytes_to_restore,""" +
        s""""time_range":${time_range.map(r => s"[${r._1},${r._2}]").getOrElse("null")},""" +
        s""""topics":$ts}"""
    }
  }

  /** `validate-restore` (cli/commands/validate_restore.rs:1-46 +
    * engine dry_run): a forced dry-run over the catalog — no data read, no
    * produce — reporting whether the configured restore would succeed and
    * exactly what it would touch. Errors: missing/corrupt manifest, inverted
    * time window, filters matching nothing. Warnings: empty partitions,
    * remaps to already-existing source topic names.
    */
  def validateRestore(spark: SparkSession, cfg: RestoreConfig): DryRunValidation = {
    val errors = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    val manifestOpt =
      try Some(Manifest.load(cfg.backupRoot, cfg.backupId))
      catch { case e: Exception =>
        errors += s"manifest unreadable at ${Manifest.path(cfg.backupRoot, cfg.backupId)}: ${e.getMessage}"
        None
      }
    for (s <- cfg.windowStartMs; e <- cfg.windowEndMs; if s > e)
      errors += s"time window inverted: start $s > end $e"
    manifestOpt match {
      case None =>
        DryRunValidation(cfg.backupId, valid = false, errors.result(),
          warnings.result(), 0, 0, 0, None, Nil)
      case Some(m) =>
        val keys = prunedSegmentKeys(m, cfg).toSet
        val selected = for {
          t <- m.topics
          p <- t.partitions
          s <- p.segments if keys.contains(s.key)
        } yield (t.name, p.partition_id, s)
        if (m.totalSegments == 0) warnings += "backup contains no segments"
        else if (selected.isEmpty)
          errors += "no segments match the configured filters/window"
        val targets = m.topics.map(t =>
          t.name -> cfg.topicMapping.getOrElse(t.name, t.name)).toMap
        val collisions = targets.filter { case (s, t) =>
          t != s && m.topics.exists(_.name == t)
        }
        collisions.foreach { case (s, t) =>
          warnings += s"topic remap $s -> $t collides with a backed-up topic name"
        }
        for {
          t <- m.topics
          p <- t.partitions if p.segments.isEmpty
        } warnings += s"${t.name}/partition=${p.partition_id} has no segments"
        val segs = selected.map(_._3)
        DryRunValidation(
          cfg.backupId,
          valid = errors.result().isEmpty,
          errors.result(), warnings.result(),
          segments_to_process = segs.size.toLong,
          records_to_restore = segs.map(_.record_count).sum,
          bytes_to_restore = segs.map(_.uncompressed_size).sum,
          time_range =
            if (segs.isEmpty) None
            else Some((segs.map(_.start_timestamp).min, segs.map(_.end_timestamp).max)),
          topics = selected.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, rows) =>
            (t, targets(t), rows.size.toLong, rows.map(_._3.record_count).sum)
          })
    }
  }

  /** Dry-run rollup (A3, restore/engine.rs:443-518): per (topic, partition)
    * with topic and global subtotals via `rollup` — counts of segments,
    * records, bytes, offset and time ranges — computed purely on the catalog.
    */
  def dryRun(spark: SparkSession, cfg: RestoreConfig): DataFrame = {
    val manifest = Manifest.load(cfg.backupRoot, cfg.backupId)
    val keys = prunedSegmentKeys(manifest, cfg).toSet
    Manifest.toDF(spark, manifest)
      .filter(col("segment_key").isInCollection(keys))
      .rollup("topic", "partition")
      .agg(count(lit(1)).as("n_segments"),
        sum("record_count").as("n_records"),
        sum("uncompressed_size").as("n_bytes"),
        min("start_offset").as("min_offset"),
        max("end_offset").as("max_offset"),
        min("start_timestamp").as("min_ts"),
        max("end_timestamp").as("max_ts"))
  }
}
