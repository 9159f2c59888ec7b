package graft.remap

import graft.catalog.BackupManifest
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

import java.nio.charset.StandardCharsets

/** Persistence for [[OffsetMapping]] as `{backup_id}/offset-mapping.json`,
  * plus the reference's fallback chain for the `offset-reset` commands
  * (cli/commands/offset_reset.rs:168-214 `load_offset_mapping`):
  *
  *  1. `offset-mapping.json` saved by a three-phase restore (exact targets,
  *     detailed anchor pairs);
  *  2. derived from `manifest.json` — source ranges and timestamps only, no
  *     target offsets (lookups fall back to interpolation only when a later
  *     produce fills targets; plan rows come out unresolved and the caller
  *     warns).
  *
  * JSON shape mirrors the case classes verbatim (snake_case fields), the
  * same convention as the manifest — a reference-tool user can read it.
  *
  * Scale note: what is persisted is bounded — one range entry per
  * (topic, partition) plus detailed anchor pairs CAPPED per partition
  * ([[fromPairs]]): the produce-side pairs DataFrame never lands on the
  * driver unbounded.
  */
object OffsetMappingStore {
  implicit private val formats: Formats = DefaultFormats

  val FileName = "offset-mapping.json"

  /** Detailed anchors kept per (topic, partition) in the persisted mapping.
    * Enough for nearest-≤ + delta to resolve exactly within any contiguous
    * produced run this long; beyond that, delta extrapolation from the
    * nearest kept anchor still resolves exactly for contiguous produces.
    */
  val MaxPairsPerPartition = 1000

  def toJson(m: OffsetMapping): String = Serialization.writePretty(m)
  def fromJson(s: String): OffsetMapping = JsonMethods.parse(s).extract[OffsetMapping]

  private def fs(root: String) = {
    val p = new org.apache.hadoop.fs.Path(root)
    p.getFileSystem(new org.apache.hadoop.conf.Configuration())
  }

  def path(root: String, backupId: String) = s"$root/$backupId/$FileName"

  /** Overwrite-save (derived data: last writer wins is correct — the mapping
    * is rebuilt whole by each three-phase run, never merged).
    */
  def save(root: String, backupId: String, m: OffsetMapping): String = {
    val f = fs(root)
    val p = new org.apache.hadoop.fs.Path(path(root, backupId))
    val os = f.create(p, true)
    try os.write(toJson(m).getBytes(StandardCharsets.UTF_8)) finally os.close()
    p.toString
  }

  def load(root: String, backupId: String): Option[OffsetMapping] = {
    val f = fs(root)
    val p = new org.apache.hadoop.fs.Path(path(root, backupId))
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(fromJson(new String(
        org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), StandardCharsets.UTF_8)))
      finally in.close()
    }
  }

  /** Build a bounded driver-side mapping from the distributed produce-pairs
    * DataFrame (columns topic, partition, source_offset, target_offset,
    * timestamp): exact per-partition range entries from a small aggregation,
    * plus every Nth pair capped at [[MaxPairsPerPartition]] anchors per
    * partition — O(partitions × cap) reaches the driver, never O(records).
    */
  def fromPairs(pairs: DataFrame,
                maxPerPartition: Int = MaxPairsPerPartition): OffsetMapping = {
    val ranges = pairs.groupBy("topic", "partition").agg(
      min("source_offset").as("sf"), max("source_offset").as("sl"),
      min_by(col("target_offset"), col("source_offset")).as("tf"),
      max_by(col("target_offset"), col("source_offset")).as("tl"),
      min_by(col("timestamp"), col("source_offset")).as("ft"),
      max_by(col("timestamp"), col("source_offset")).as("lt"),
      count(lit(1)).as("n"))
    val entries = ranges.collect().map { r =>
      s"${r.getString(0)}/${r.getInt(1)}" -> OffsetRangeEntry(
        r.getLong(2), r.getLong(3), Some(r.getLong(4)), Some(r.getLong(5)),
        r.getLong(6), r.getLong(7))
    }.toMap
    // thin the anchors map-side with a MODULO stride on the source offset —
    // deliberately not a row_number window: WindowExec would buffer each
    // (topic, partition) group's full sampled-pair set in one task (the
    // biggest partition's group at that), while the modulo filter is a pure
    // narrow map after a broadcast of the per-partition counts. Offsets are
    // near-dense, so offset % stride ≈ a uniform 1-in-stride sample with the
    // same cap; the exact-first-anchor guarantee comes from keeping each
    // partition's min explicitly (it anchors range interpolation).
    val counted = pairs.groupBy("topic", "partition")
      .agg(count(lit(1)).as("np"), min("source_offset").as("first_src"))
    val stride = pairs.join(broadcast(counted), Seq("topic", "partition"))
      .where(col("source_offset") === col("first_src") ||
        pmod(col("source_offset"), greatest(lit(1L),
          ceil(col("np") / maxPerPartition)).cast("bigint")) === 0)
    val detailed = stride.select("topic", "partition", "source_offset",
        "target_offset", "timestamp")
      .collect()
      .groupBy(r => s"${r.getString(0)}/${r.getInt(1)}")
      .map { case (k, rows) =>
        k -> rows.sortBy(_.getLong(2))
          .map(r => OffsetPair(r.getLong(2), r.getLong(3), r.getLong(4))).toVector
      }
    OffsetMapping(entries, detailed)
  }

  /** Last-resort mapping from the manifest: source offset/timestamp ranges
    * per partition, target offsets unknown (offset_reset.rs:190-214).
    */
  def fromManifest(m: BackupManifest): OffsetMapping =
    OffsetMapping(entries = (for {
      t <- m.topics
      p <- t.partitions
      if p.segments.nonEmpty
    } yield {
      val sf = p.segments.map(_.start_offset).min
      val sl = p.segments.map(_.end_offset).max
      val ft = p.segments.map(_.start_timestamp).min
      val lt = p.segments.map(_.end_timestamp).max
      s"${t.name}/${p.partition_id}" -> OffsetRangeEntry(sf, sl, None, None, ft, lt)
    }).toMap)
}
