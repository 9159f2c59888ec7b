package graft.remap

import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}

/** Consumer-group offsets snapshot
  * (backup/engine.rs:730-741 write; restore/engine.rs:124-150 parse):
  * {{{
  * { "snapshot_time": 1778044734905,
  *   "groups": [ { "group_id": "g",
  *                 "offsets": { "topic": { "0": 10, "1": 10 } } } ] }
  * }}}
  * Import rules (tests restore/engine.rs:1727-1804): negative offsets are
  * skipped, non-numeric partition keys are skipped, and topic/partition
  * remapping applies during import.
  */
case class GroupOffsets(group_id: String, offsets: Map[String, Map[String, Long]])
case class ConsumerGroupSnapshot(snapshot_time: Long, groups: List[GroupOffsets])

object ConsumerGroupSnapshot {
  implicit private val formats: Formats = DefaultFormats

  def fromJson(s: String): ConsumerGroupSnapshot =
    JsonMethods.parse(s).extract[ConsumerGroupSnapshot]

  def toJson(s: ConsumerGroupSnapshot): String = Serialization.writePretty(s)

  /** Keep only offsets on `topics` with non-negative values and drop groups
    * left empty — the snapshot-groups capture filter
    * (crates/kafka-backup-cli/src/commands/snapshot_groups.rs:108-125:
    * `backed_topics.contains(&co.topic) && co.offset >= 0`, then groups with
    * no qualifying offsets are skipped). Group order follows the input
    * list; topic and partition maps are rebuilt SORTED (topics
    * lexicographic, partitions numeric) so the stored artifact is
    * byte-deterministic — a plain immutable Map's iteration order is
    * unspecified past 4 entries, which would make snapshot bytes differ
    * across runs.
    */
  def restrictTo(snapshot: ConsumerGroupSnapshot,
                 topics: Set[String]): ConsumerGroupSnapshot =
    ConsumerGroupSnapshot(snapshot.snapshot_time,
      snapshot.groups.flatMap { g =>
        val kept = g.offsets.toSeq.sortBy(_._1).collect {
          case (t, parts) if topics(t) =>
            t -> scala.collection.immutable.ListMap(
              parts.toSeq.filter(_._2 >= 0)
                .sortBy { case (p, _) => (p.toIntOption.getOrElse(Int.MaxValue), p) }: _*)
        }.filter(_._2.nonEmpty)
        if (kept.isEmpty) None
        else Some(GroupOffsets(g.group_id,
          scala.collection.immutable.ListMap(kept: _*)))
      })

  /** Flatten to committed-offset tuples, applying import rules and optional
    * topic/partition remapping (J4 auto-snapshot import join).
    */
  def importOffsets(snapshot: ConsumerGroupSnapshot,
                    topicMapping: Map[String, String] = Map.empty,
                    partitionMapping: Map[Int, Int] = Map.empty): Seq[(String, String, Int, Long)] =
    for {
      g <- snapshot.groups
      (topic, parts) <- g.offsets.toSeq.sortBy(_._1)
      (pKey, off) <- parts.toSeq.sortBy(_._1)
      p <- pKey.toIntOption.toSeq // non-numeric partition keys skipped
      if off >= 0                 // negative offsets skipped
    } yield (g.group_id,
      topicMapping.getOrElse(topic, topic),
      partitionMapping.getOrElse(p, p),
      off)
}
