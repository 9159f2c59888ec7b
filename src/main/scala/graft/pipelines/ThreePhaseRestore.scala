package graft.pipelines

import graft.model.KRecord
import graft.remap.{ConsumerGroupSnapshot, OffsetMappingDF, OffsetResetEntry, OffsetResetPlan}
import graft.sinks.{Produce, ProduceResult, RecordSink}
import org.apache.spark.sql.SparkSession

/** Where phase-3 offset commits land — an AdminClient
  * `alterConsumerGroupOffsets` in production, a recording stub in tests.
  */
trait GroupOffsetCommitter extends Serializable {
  def commit(group: String, topic: String, partition: Int, offset: Long): Unit
}

final class RecordingCommitter extends GroupOffsetCommitter {
  val committed = scala.collection.mutable.ArrayBuffer.empty[(String, String, Int, Long)]
  def commit(g: String, t: String, p: Int, o: Long): Unit =
    synchronized { committed += ((g, t, p, o)) }
}

case class ThreePhaseReport(
    backup_id: String,
    records_restored: Long,
    produce_results: Seq[ProduceResult],
    reset_plan: Option[OffsetResetPlan],
    applied: Boolean,
    warnings: Seq[String],
    success: Boolean,
    mapping_path: Option[String] = None)

/** The reference's flagship command (restore/three_phase.rs:101-215):
  *
  *  - Phase 2: restore the backed-up records (catalog prune → decode →
  *    time filter → remap) and produce them, collecting per-record
  *    source→target offset pairs;
  *  - Phase 3: map each consumer group's committed offsets through the
  *    mapping (J1/J3) into a reset plan, then apply via the committer or
  *    stop at dry-run.
  *
  * Repartitioned restores cannot produce offset mappings — Phase 3 skips
  * them with a warning (three_phase.rs:118-131). Consumer groups resolve
  * from the explicit list or from a snapshot (auto_consumer_groups).
  */
object ThreePhaseRestore {

  def run(spark: SparkSession,
          restoreCfg: RestoreConfig,
          sink: RecordSink,
          committed: Seq[(String, String, Int, Long)] = Nil, // (group, topic, p, offset)
          snapshot: Option[ConsumerGroupSnapshot] = None,
          committer: Option[GroupOffsetCommitter] = None,
          dryRun: Boolean = false,
          repartitionedTopics: Set[String] = Set.empty,
          pairEvery: Int = Produce.DefaultPairEvery,
          saveMapping: Boolean = false): ThreePhaseReport = {
    import spark.implicits._
    val warnings = Seq.newBuilder[String]

    // Phase 2: restore + produce with offset capture. The sampled pairs stay
    // a DataFrame — only O(partitions) summaries reach the driver, so the
    // phase survives a 100 TB restore.
    val records = Restore.remapped(spark, restoreCfg).as[KRecord]
    val (produceResults, pairsDF, unpersistPairs) =
      Produce.runDistributed(records, sink, pairEvery = pairEvery)
    val restored = produceResults.map(_.recordCount).sum

    // everything after this point consumes pairsDF — guarantee the eagerly
    // checkpointed produce pairs are freed even when the mapping save or the
    // lookup job throws (repeated failed runs in one long-lived session must
    // not accumulate pinned checkpoint blocks)
    var pairsFreed = false
    def freePairs(): Unit = if (!pairsFreed) { pairsFreed = true; unpersistPairs() }
    try {

    // Persist the source→target mapping next to the backup so the offline
    // `offset-reset plan/execute/script` commands can load it later
    // (offset_reset.rs load_offset_mapping tier 2). Bounded: range entries +
    // capped anchor pairs per partition, never O(records) on the driver.
    val mappingPath =
      if (saveMapping && restored > 0)
        Some(graft.remap.OffsetMappingStore.save(
          restoreCfg.backupRoot, restoreCfg.backupId,
          graft.remap.OffsetMappingStore.fromPairs(pairsDF)))
      else None

    // Phase 3 inputs: explicit committed offsets ∪ snapshot import (J4).
    // BOTH must pass through topic/partition remapping — the offset mapping
    // is keyed by the POST-remap names the records were produced under.
    val remappedCommitted = committed.map { case (g, t, p, o) =>
      (g, restoreCfg.topicMapping.getOrElse(t, t),
        restoreCfg.partitionMapping.getOrElse(p, p), o)
    }
    val fromSnapshot = snapshot.toSeq.flatMap(s =>
      ConsumerGroupSnapshot.importOffsets(s, restoreCfg.topicMapping,
        restoreCfg.partitionMapping))
    // one reset decision per (group, topic, partition): the EXPLICIT list
    // wins over snapshot-derived entries (it is the operator's direct
    // instruction; a stale capture must not silently override it), and
    // post-remap collisions (two source partitions mapped onto one target)
    // keep the first and warn instead of double-committing last-writer-wins
    val merged = (remappedCommitted ++ fromSnapshot)
      .foldLeft((Vector.empty[(String, String, Int, Long)],
        Set.empty[(String, String, Int)], Vector.empty[(String, String, Int)])) {
        case ((acc, seen, dups), e @ (g, t, p, _)) =>
          if (seen((g, t, p))) (acc, seen, dups :+ ((g, t, p)))
          else (acc :+ e, seen + ((g, t, p)), dups)
      }
    if (merged._3.nonEmpty)
      warnings += "Duplicate reset entries collapsed (explicit list wins " +
        "over snapshot; first wins on remap collisions): " +
        merged._3.distinct.map { case (g, t, p) => s"$g:$t/$p" }.sorted.mkString(", ")
    val (skipped, effective) = merged._1
      .partition { case (_, t, _, _) => repartitionedTopics.contains(t) }
    // warn about what was ACTUALLY dropped — naming every repartitioned
    // topic would claim resets were skipped even when no offset referenced
    // one
    if (skipped.nonEmpty)
      warnings += s"Repartitioned topics skipped for offset reset: " +
        skipped.map(_._2).distinct.sorted.mkString(", ")

    // Phase-3 resolution is the distributed as-of join (J1's detailed path):
    // committed offsets probe the pairs DataFrame, nearest-≤ anchor + delta.
    // Anchors exist at every sub-batch base, so contiguous runs resolve
    // exactly; only the resolved plan rows (O(groups × partitions)) are
    // collected.
    val plan =
      if (effective.isEmpty) { freePairs(); None }
      else {
        val probes = effective.map { case (_, t, p, o) => (t, p, o) }.distinct
          .toDF("topic", "partition", "source_offset")
        val resolved = OffsetMappingDF.lookupTargets(pairsDF, probes).collect()
          .map(r => ((r.getString(0), r.getInt(1), r.getLong(2)),
            if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
        freePairs()
        Some(OffsetResetPlan(effective.map { case (g, t, p, o) =>
          OffsetResetEntry(g, t, p, o, resolved.getOrElse((t, p, o), None))
        }))
      }

    val applied = plan match {
      case Some(p) if !dryRun && committer.isDefined =>
        p.entries.foreach { e =>
          e.target_offset.foreach(t =>
            committer.get.commit(e.group_id, e.topic, e.partition, t))
        }
        true
      case Some(_) if dryRun =>
        warnings += "Phase 3 ran in dry-run mode, offsets not actually reset"
        false
      case _ => false
    }

    val incomplete = plan.toSeq.flatMap(_.groups).filterNot(g => plan.get.groupComplete(g))
    if (incomplete.nonEmpty)
      warnings += s"Groups with unresolved offsets: ${incomplete.mkString(", ")}"

    ThreePhaseReport(restoreCfg.backupId, restored, produceResults, plan, applied,
      warnings.result(), success = incomplete.isEmpty, mapping_path = mappingPath)
    } finally freePairs()
  }
}
