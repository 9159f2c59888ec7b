package graft.remap

import graft.pipelines.GroupOffsetCommitter
import org.json4s._
import org.json4s.jackson.{JsonMethods, Serialization}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Pre-reset safety snapshot (restore/offset_rollback.rs:55-106): captured
  * committed offsets before Phase 3 applies a reset plan, so a bad reset can
  * be rolled back and the rollback verified.
  */
case class OffsetSnapshotEntry(group_id: String, topic: String, partition: Int,
                               offset: Long)
case class OffsetSnapshot(taken_at: Long, reason: String,
                          entries: List[OffsetSnapshotEntry])

object OffsetRollback {
  implicit private val formats: Formats = DefaultFormats

  def snapshot(committed: Seq[(String, String, Int, Long)], reason: String,
               takenAt: Long = System.currentTimeMillis()): OffsetSnapshot =
    OffsetSnapshot(takenAt, reason,
      committed.sorted.map { case (g, t, p, o) => OffsetSnapshotEntry(g, t, p, o) }.toList)

  def save(path: String, s: OffsetSnapshot): Unit = {
    val p = Paths.get(path)
    if (p.getParent != null) Files.createDirectories(p.getParent)
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.write(tmp, Serialization.writePretty(s).getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.REPLACE_EXISTING, StandardCopyOption.ATOMIC_MOVE)
  }

  def load(path: String): OffsetSnapshot =
    JsonMethods.parse(new String(Files.readAllBytes(Paths.get(path)),
      StandardCharsets.UTF_8)).extract[OffsetSnapshot]

  /** Re-commit every snapshotted offset (the rollback apply). */
  def apply(s: OffsetSnapshot, committer: GroupOffsetCommitter): Int = {
    s.entries.foreach(e => committer.commit(e.group_id, e.topic, e.partition, e.offset))
    s.entries.size
  }

  /** J9 verify: snapshot vs currently-committed — mismatches only
    * (restore/offset_rollback.rs:579-668). Driver-side twin of
    * [[OffsetMappingDF.rollbackVerify]].
    */
  def verify(s: OffsetSnapshot,
             actual: Seq[(String, String, Int, Long)]): Seq[(String, String, Int, Option[Long], Option[Long])] = {
    val exp = s.entries.map(e => (e.group_id, e.topic, e.partition) -> e.offset).toMap
    val act = actual.map { case (g, t, p, o) => (g, t, p) -> o }.toMap
    (exp.keySet ++ act.keySet).toSeq.sorted.flatMap { k =>
      (exp.get(k), act.get(k)) match {
        case (Some(a), Some(b)) if a == b => None
        case (e, a) => Some((k._1, k._2, k._3, e, a))
      }
    }
  }
}
