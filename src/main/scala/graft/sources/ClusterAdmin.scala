package graft.sources

import graft.remap.{ConsumerGroupSnapshot, GroupOffsets}

/** AdminClient-shaped facade for the broker metadata legs (S2-S7):
  * topic/metadata scan, batched ListOffsets with earliest/latest sentinels,
  * offsets-for-times, consumer-group list/describe, committed-offset fetch,
  * and group-offset alteration (reference kafka/admin.rs,
  * kafka/consumer_groups.rs:107-244,347-465, kafka/partition_router.rs:715-792).
  *
  * In production this binds to `org.apache.kafka.clients.admin.AdminClient`
  * (listTopics/listOffsets/listConsumerGroupOffsets/
  * alterConsumerGroupOffsets map 1:1 — the jar is not in this sandbox);
  * [[InMemoryClusterAdmin]] is the broker-free implementation the pipelines
  * and tests drive. Everything downstream (snapshot capture, Spark source
  * option maps, phase-3 committers) depends only on this trait.
  */
trait ClusterAdmin {

  /** S2: topic names and partition counts (metadata scan). */
  def listTopics(): Map[String, Int]

  /** S3/S4: one BATCHED lookup for many (topic, partition) specs — the
    * reference batches ListOffsets requests per node; AdminClient.listOffsets
    * does natively. Spec per partition: Earliest / Latest / ForTimestamp.
    */
  def listOffsets(specs: Map[(String, Int), OffsetSpec]): Map[(String, Int), Long]

  /** S6: group ids. */
  def listConsumerGroups(): Seq[String]

  /** S7: committed offsets for one group. */
  def committedOffsets(group: String): Map[(String, Int), Long]

  /** Phase-3 leg: alterConsumerGroupOffsets. */
  def alterConsumerGroupOffsets(group: String, offsets: Map[(String, Int), Long]): Unit

  /** Restore auto-create leg (admin.rs:158-240 create_topics): create each
    * topic with its partition count; ALREADY-EXISTS is success (error_code 36
    * is tolerated there — restores re-run). Returns per-topic outcome:
    * "created" | "exists".
    */
  def createTopics(topics: Map[String, Int]): Map[String, String]

  /** Truncation leg (admin.rs:382-446 delete_records): delete records below
    * the given offset per partition; returns the new low-water marks.
    */
  def deleteRecords(beforeOffsets: Map[(String, Int), Long]): Map[(String, Int), Long]

  /** Config read leg (admin.rs:448-511 describe_configs): per-topic config
    * entries — retention.ms, cleanup.policy and friends drive restore-side
    * topic sizing decisions.
    */
  def describeConfigs(topics: Seq[String]): Map[String, Map[String, String]]

  /** Config write leg (admin.rs:513-570 incremental_alter_configs): SET the
    * given keys per topic, leaving others untouched (the incremental
    * semantics, not a whole-config replace).
    */
  def alterConfigs(updates: Map[String, Map[String, String]]): Unit
}

sealed trait OffsetSpec
object OffsetSpec {
  case object Earliest extends OffsetSpec
  case object Latest extends OffsetSpec
  /** S5 offsets-for-times: first offset with timestamp >= ts. */
  case class ForTimestamp(ts: Long) extends OffsetSpec
}

/** Broker-free ClusterAdmin over fixture data: per-partition offset bounds,
  * an optional (offset, timestamp) index for offsets-for-times, and mutable
  * committed group offsets. Mirrors a broker's answers exactly enough for
  * every downstream consumer (the reference's MemoryBackend pattern).
  */
final class InMemoryClusterAdmin(
    initialBounds: Map[(String, Int), (Long, Long)], // earliest, latest (exclusive HWM)
    timeIndex: Map[(String, Int), Seq[(Long, Long)]] = Map.empty, // (offset, ts) ascending
    initialCommitted: Map[String, Map[(String, Int), Long]] = Map.empty)
    extends ClusterAdmin {

  private val committed =
    new java.util.concurrent.ConcurrentHashMap[String, Map[(String, Int), Long]]()
  initialCommitted.foreach { case (g, o) => committed.put(g, o) }
  private val bounds =
    new java.util.concurrent.ConcurrentHashMap[(String, Int), (Long, Long)]()
  initialBounds.foreach { case (tp, b) => bounds.put(tp, b) }

  private def boundsMap: Map[(String, Int), (Long, Long)] = {
    import scala.jdk.CollectionConverters._
    bounds.asScala.toMap
  }

  override def listTopics(): Map[String, Int] =
    boundsMap.keys.groupBy(_._1).map { case (t, ks) => t -> (ks.map(_._2).max + 1) }

  override def listOffsets(specs: Map[(String, Int), OffsetSpec]): Map[(String, Int), Long] =
    specs.flatMap { case (tp, spec) =>
      Option(bounds.get(tp)).flatMap { case (earliest, latest) =>
        spec match {
          case OffsetSpec.Earliest => Some(tp -> earliest)
          case OffsetSpec.Latest => Some(tp -> latest)
          case OffsetSpec.ForTimestamp(ts) =>
            // first offset with timestamp >= ts; none → no entry (broker
            // returns -1/null for out-of-range timestamps)
            timeIndex.getOrElse(tp, Nil).find(_._2 >= ts).map(tp -> _._1)
        }
      }
    }

  override def listConsumerGroups(): Seq[String] = {
    import scala.jdk.CollectionConverters._
    committed.keySet().asScala.toSeq.sorted
  }

  override def committedOffsets(group: String): Map[(String, Int), Long] =
    Option(committed.get(group)).getOrElse(Map.empty)

  override def alterConsumerGroupOffsets(group: String,
                                         offsets: Map[(String, Int), Long]): Unit =
    committed.compute(group, (_, prev) =>
      Option(prev).getOrElse(Map.empty) ++ offsets)

  // serializes topic creation's check-then-act (a broker's controller does
  // the same); per-partition updates below use compute for atomicity
  private val createLock = new Object

  override def createTopics(topics: Map[String, Int]): Map[String, String] =
    createLock.synchronized {
      val existing = listTopics().keySet
      topics.map { case (t, n) =>
        if (existing.contains(t)) t -> "exists" // error_code 36 path: tolerated
        else {
          (0 until n).foreach(p => bounds.put((t, p), (0L, 0L)))
          t -> "created"
        }
      }
    }

  override def deleteRecords(beforeOffsets: Map[(String, Int), Long])
      : Map[(String, Int), Long] =
    beforeOffsets.flatMap { case (tp, off) =>
      // atomic + monotonic: concurrent truncations can never REGRESS the
      // low-water mark (Kafka's log start offset only advances)
      Option(bounds.compute(tp, (_, prev) =>
        if (prev == null) null
        else {
          val (earliest, latest) = prev
          (math.max(earliest, math.min(off, latest)), latest)
        })).map { case (lwm, _) => tp -> lwm }
    }

  private val configs =
    new java.util.concurrent.ConcurrentHashMap[String, Map[String, String]]()

  override def describeConfigs(topics: Seq[String]): Map[String, Map[String, String]] =
    topics.filter(t => listTopics().contains(t))
      .map(t => t -> Option(configs.get(t)).getOrElse(Map.empty)).toMap

  override def alterConfigs(updates: Map[String, Map[String, String]]): Unit =
    updates.foreach { case (t, kv) =>
      configs.compute(t, (_, prev) => Option(prev).getOrElse(Map.empty) ++ kv)
    }
}

object ClusterAdmin {

  /** Capture a consumer-group snapshot from the live cluster (S6+S7 →
    * backup/engine.rs:730-741's snapshot artifact). Groups, topics, and
    * partitions are all SORTED (groups/topics lexicographic, partitions
    * numeric) so the artifact is byte-deterministic regardless of the
    * admin implementation's listing order — an unsorted small Map would
    * serialize in insertion order and make snapshot bytes run-dependent.
    */
  def captureSnapshot(admin: ClusterAdmin, nowMs: Long): ConsumerGroupSnapshot =
    ConsumerGroupSnapshot(nowMs, admin.listConsumerGroups().sorted.map { g =>
      val byTopic = admin.committedOffsets(g).groupBy(_._1._1)
      GroupOffsets(g, scala.collection.immutable.ListMap(
        byTopic.toSeq.sortBy(_._1).map { case (t, ps) =>
          t -> scala.collection.immutable.ListMap(
            ps.toSeq.sortBy(_._1._2)
              .map { case ((_, p), off) => p.toString -> off }: _*)
        }: _*))
    }.toList)

  /** Snapshot-mode Spark source options from live latest offsets (St3/F10):
    * capture a consistent cut via one batched ListOffsets, pin endingOffsets.
    */
  def snapshotReadOptions(admin: ClusterAdmin, bootstrap: String,
                          topics: Seq[String]): Map[String, String] = {
    val parts = for {
      (t, n) <- admin.listTopics().toSeq if topics.isEmpty || topics.contains(t)
      p <- 0 until n
    } yield (t, p)
    val latest = admin.listOffsets(parts.map(_ -> (OffsetSpec.Latest: OffsetSpec)).toMap)
    KafkaSourceOptions.snapshotRead(bootstrap, latest)
  }

  /** PITR entry options from offsets-for-times (S5 + F7): each partition
    * starts at the first offset at/after the window start.
    */
  def pitrReadOptions(admin: ClusterAdmin, bootstrap: String,
                      windowStartMs: Long): Map[String, String] = {
    val parts = for {
      (t, n) <- admin.listTopics().toSeq
      p <- 0 until n
    } yield (t, p)
    KafkaSourceOptions.startByTimestampPerPartition(bootstrap,
      parts.map(_ -> windowStartMs).toMap)
  }

  /** Restore topic auto-create (restore path of admin.rs create_topics):
    * every backed-up topic, under its POST-remap name, created with its
    * recorded partition count (manifest.rs:81-89 effectivePartitionCount);
    * already-existing topics are fine — restores re-run.
    *
    * `partitionMapping` must size the target too: remapping partition 0→7
    * on a 4-partition topic means the target needs ≥8 partitions or every
    * produce to the remapped id fails with unknown-partition.
    */
  def autoCreateForRestore(admin: ClusterAdmin,
                           manifest: graft.catalog.BackupManifest,
                           topicMapping: Map[String, String] = Map.empty,
                           partitionMapping: Map[Int, Int] = Map.empty): Map[String, String] =
    admin.createTopics(restoreTopicSizes(manifest, topicMapping, partitionMapping))

  /** Post-remap (topic → partition count) a restore target needs. */
  private def restoreTopicSizes(manifest: graft.catalog.BackupManifest,
                                topicMapping: Map[String, String],
                                partitionMapping: Map[Int, Int]): Map[String, Int] =
    manifest.topics
      .map { t =>
        val mappedMax = t.partitions
          .map(p => partitionMapping.getOrElse(p.partition_id, p.partition_id))
          .foldLeft(-1)(math.max) + 1
        topicMapping.getOrElse(t.name, t.name) ->
          math.max(t.effectivePartitionCount, mappedMax)
      }
      // two source topics may legally remap onto one target (topic merge):
      // size the target for the LARGEST source so every partition fits
      .groupBy(_._1).map { case (t, xs) => t -> xs.map(_._2).max }

  /** Prepare a restore target end to end: [[autoCreateForRestore]] then
    * [[waitReady]] on the same post-remap (topic → partitions) map — the
    * order the reference's restore engine runs before its first produce.
    * Returns the create outcomes once every topic is ready.
    */
  def prepareRestoreTarget(admin: ClusterAdmin,
                           manifest: graft.catalog.BackupManifest,
                           topicMapping: Map[String, String] = Map.empty,
                           partitionMapping: Map[Int, Int] = Map.empty,
                           timeoutMs: Long = 30000L): Map[String, String] = {
    // size ONCE and use for both create and wait — two computations could
    // drift into creating one thing and waiting on another
    val sizes = restoreTopicSizes(manifest, topicMapping, partitionMapping)
    val outcomes = admin.createTopics(sizes)
    waitReady(admin, sizes, timeoutMs = timeoutMs)
    outcomes
  }

  /** Create-then-wait-ready gate (reference restore/engine.rs polls topic
    * readiness after auto-create before the first produce): poll
    * `listTopics` until every requested topic is visible with at least its
    * requested partition count. Returns the poll count; throws on timeout
    * naming the topics still missing. `sleep` is injectable so specs drive
    * the loop without wall-clock waits.
    */
  def waitReady(admin: ClusterAdmin, topics: Map[String, Int],
                timeoutMs: Long = 30000L, pollMs: Long = 200L,
                sleep: Long => Unit = Thread.sleep): Int = {
    val deadline = System.nanoTime() + timeoutMs * 1000000L
    var polls = 0
    var ready = false
    while (!ready) {
      polls += 1
      val seen = admin.listTopics()
      val missing = topics.filter { case (t, n) => seen.get(t).forall(_ < n) }
      if (missing.isEmpty) ready = true
      else if (System.nanoTime() > deadline)
        throw new IllegalStateException(
          s"topics not ready after $timeoutMs ms: ${missing.keys.toSeq.sorted.mkString(", ")}")
      else sleep(pollMs)
    }
    polls
  }

  /** Phase-3 committer backed by the admin facade — plugs into
    * ThreePhaseRestore and BulkOffsetReset unchanged.
    */
  def committer(admin: ClusterAdmin): graft.pipelines.GroupOffsetCommitter =
    new graft.pipelines.GroupOffsetCommitter {
      def commit(g: String, t: String, p: Int, o: Long): Unit =
        admin.alterConsumerGroupOffsets(g, Map((t, p) -> o))
    }
}
