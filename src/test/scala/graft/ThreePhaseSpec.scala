package graft

import graft.codec.CompressionCodec
import graft.model.KRecord
import graft.pipelines._
import graft.remap.ConsumerGroupSnapshot
import graft.sinks.CollectingSink
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ThreePhaseSpec extends SparkSpec {

  private lazy val tmp = Files.createTempDirectory("graft-3p").toString
  private lazy val manifest = Backup.run(spark, KRecord.fromEvents(spark, sf0001),
    BackupConfig("tp", tmp, CompressionCodec.Zstd, enrichHeaders = false))

  test("three-phase restore: produce, map offsets, apply reset plan") {
    manifest
    val sink = new CollectingSink()
    val committer = new RecordingCommitter()
    // committed group offsets on the SOURCE cluster: one per topic at offset 500
    val committed = Seq(("g1", "click", 0, 500L), ("g1", "purchase", 1, 500L))
    val report = ThreePhaseRestore.run(spark, RestoreConfig(tmp, "tp"), sink,
      committed = committed, committer = Some(committer))
    assert(report.records_restored == 1000)
    assert(report.success, report.warnings.mkString("; "))
    assert(report.applied)
    val plan = report.reset_plan.get
    assert(plan.entries.forall(_.target_offset.isDefined))
    assert(committer.committed.size == 2)
    // every committed target equals the plan target
    committer.committed.foreach { case (g, t, p, o) =>
      assert(plan.entries.exists(e => e.group_id == g && e.topic == t &&
        e.partition == p && e.target_offset.contains(o)))
    }
  }

  test("three-phase dry-run + snapshot groups + repartitioned skip") {
    manifest
    val snapshot = ConsumerGroupSnapshot(1700000000000L, List(
      graft.remap.GroupOffsets("snap-group", Map("view" -> Map("2" -> 300L),
        "click" -> Map("0" -> 10L), // lands on the repartitioned topic → skipped
        "error" -> Map("0" -> -5L))))) // negative skipped
    val committer = new RecordingCommitter()
    val report = ThreePhaseRestore.run(spark, RestoreConfig(tmp, "tp"),
      new CollectingSink(), snapshot = Some(snapshot),
      committer = Some(committer), dryRun = true,
      repartitionedTopics = Set("click"))
    assert(!report.applied)
    assert(committer.committed.isEmpty)
    assert(report.warnings.exists(_.contains("dry-run")))
    assert(report.warnings.exists(w =>
      w.contains("Repartitioned") && w.contains("click")))
    val plan = report.reset_plan.get
    assert(plan.entries.map(_.topic).distinct == Seq("view")) // error + click skipped
    // and NO false warning when no offset references a repartitioned topic
    val quiet = ThreePhaseRestore.run(spark, RestoreConfig(tmp, "tp"),
      new CollectingSink(), snapshot = Some(ConsumerGroupSnapshot(
        1700000000000L, List(graft.remap.GroupOffsets("snap-group",
          Map("view" -> Map("2" -> 300L)))))),
      committer = Some(new RecordingCommitter()), dryRun = true,
      repartitionedTopics = Set("click"))
    assert(!quiet.warnings.exists(_.contains("Repartitioned")),
      "must not claim resets were skipped when none referenced the topic")
  }

  test("snapshot-groups CLI: facade capture filtered to manifest topics, stored beside the backup") {
    manifest
    // raw cluster state standing in for the live S6/S7 leg: one group with
    // offsets on backed + unbacked topics and a negative offset, one group
    // with ONLY a foreign topic (must be dropped entirely)
    val raw = ConsumerGroupSnapshot(1L, List(
      graft.remap.GroupOffsets("app", Map(
        "click" -> Map("0" -> 500L, "1" -> -3L), // negative skipped at import
        "not-backed-up" -> Map("0" -> 7L))),
      graft.remap.GroupOffsets("foreign-only", Map(
        "not-backed-up" -> Map("0" -> 9L)))))
    val groupsJson = Files.createTempFile("graft-sg", ".json")
    Files.writeString(groupsJson, ConsumerGroupSnapshot.toJson(raw))
    Cli.run(spark, Array("snapshot-groups", tmp, "tp", groupsJson.toString,
      "--now", "1700000000000"))
    val stored = ConsumerGroupSnapshot.fromJson(Files.readString(
      java.nio.file.Paths.get(s"$tmp/tp/consumer-groups-snapshot.json")))
    assert(stored.snapshot_time == 1700000000000L)
    assert(stored.groups.map(_.group_id) == List("app"),
      s"foreign-only group must be dropped: ${stored.groups}")
    assert(stored.groups.head.offsets == Map("click" -> Map("0" -> 500L)),
      "only backed-up topics with non-negative offsets survive")
    // the stored artifact round-trips into the reset-plan path unchanged
    val imported = ConsumerGroupSnapshot.importOffsets(stored)
    assert(imported == Seq(("app", "click", 0, 500L)))
  }

  test("native murmur2 expression matches driver hash and stays in codegen") {
    manifest
    import graft.functions.{KFunctions, KHash}
    val df = spark.read.parquet(s"$sf0001/events.parquet")
      .withColumn("key", encode(col("user_id").cast("string"), "UTF-8"))
      .withColumn("h", KFunctions.kafka_murmur2(col("key")))
      .withColumn("tp", KFunctions.kafka_partition(col("key"), 12))
    df.select("key", "h", "tp").collect().foreach { r =>
      val k = r.getAs[Array[Byte]](0)
      assert(r.getInt(1) == KHash.murmur2(k))
      assert(r.getInt(2) == KHash.kafkaPartition(k, 12))
    }
    // the expression appears inside a WholeStageCodegen stage (no UDF boundary)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython") && !plan.toLowerCase.contains("scalaudf"),
      s"murmur2 must not be a UDF:\n${plan.take(1500)}")
  }

  test("fromPairs thinning keeps gap anchors: lookups stay exact across source gaps") {
    import spark.implicits._
    // two contiguous runs with a large source gap (compacted-topic shape):
    // run A sources 0..2999 → targets 0..2999; gap; run B sources
    // 10000..12999 → targets 3000..5999. 6000 pairs >> cap=100, so the
    // stride drops most anchors — but run B's start anchor must survive or
    // every lookup inside run B silently lands ~7000 records off.
    val runA = (0L until 3000L).map(s => ("t", 0, s, s, 1000L + s))
    val runB = (0L until 3000L).map(i => ("t", 0, 10000L + i, 3000L + i, 5000L + i))
    val pairs = (runA ++ runB)
      .toDF("topic", "partition", "source_offset", "target_offset", "timestamp")
    val m = graft.remap.OffsetMappingStore.fromPairs(pairs, maxPerPartition = 100)
    // exact across the gap, at run starts, mid-run, and between anchors
    assert(m.lookupTargetOffset("t", 0, 0L).contains(0L))
    assert(m.lookupTargetOffset("t", 0, 2999L).contains(2999L))
    assert(m.lookupTargetOffset("t", 0, 10000L).contains(3000L))
    assert(m.lookupTargetOffset("t", 0, 11507L).contains(4507L))
    assert(m.lookupTargetOffset("t", 0, 12999L).contains(5999L))
    // thinned: far fewer anchors than pairs, but bounded-close to the cap
    val kept = m.detailed("t/0").size
    assert(kept < 300, s"thinning ineffective: $kept anchors")
    // JSON round-trip preserves the thinned mapping exactly
    assert(graft.remap.OffsetMappingStore.fromJson(
      graft.remap.OffsetMappingStore.toJson(m)) == m)
  }

  test("offset-reset plan/execute/script from the persisted offset mapping") {
    manifest
    // a three-phase run with saveMapping persists offset-mapping.json
    val report = ThreePhaseRestore.run(spark, RestoreConfig(tmp, "tp"),
      new CollectingSink(), committed = Seq(("g1", "click", 0, 500L)),
      committer = Some(new RecordingCommitter()), saveMapping = true)
    assert(report.success)
    val stored = graft.remap.OffsetMappingStore.load(tmp, "tp")
    assert(stored.isDefined, "offset-mapping.json must exist after saveMapping")
    val m = stored.get
    assert(m.entries.nonEmpty && m.detailed.nonEmpty)
    // JSON round-trip is lossless
    assert(graft.remap.OffsetMappingStore.fromJson(
      graft.remap.OffsetMappingStore.toJson(m)) == m)
    // the persisted mapping resolves a committed offset to the same target
    // the live three-phase plan produced
    val live = report.reset_plan.get.entries.head
    assert(m.lookupTargetOffset(live.topic, live.partition, live.source_offset)
      == live.target_offset)

    // drive the CLI over the stored mapping: plan (text), script, execute
    val groupsJson = Files.createTempFile("graft-groups", ".json")
    Files.writeString(groupsJson, ConsumerGroupSnapshot.toJson(
      ConsumerGroupSnapshot(1700000000000L, List(graft.remap.GroupOffsets(
        "g1", Map("click" -> Map("0" -> 500L)))))))
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Array("offset-reset", "plan", tmp, "tp",
        groupsJson.toString))
    }
    val text = out.toString
    assert(text.contains("g1") && text.contains("click"), text)
    assert(text.contains("complete"), text)

    out.reset()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Array("offset-reset", "script", tmp, "tp",
        groupsJson.toString, "--bootstrap", "b:9092"))
    }
    assert(out.toString.contains("kafka-consumer-groups") ||
      out.toString.contains("--bootstrap-server 'b:9092'"), out.toString)

    out.reset()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Array("offset-reset", "execute", tmp, "tp",
        groupsJson.toString))
    }
    assert(out.toString.contains("applied 1 resets"), out.toString)

    // manifest fallback: no mapping file → plan still prints, rows unresolved
    val bare = Files.createTempDirectory("graft-bare").toString
    Backup.run(spark, KRecord.fromEvents(spark, sf0001),
      BackupConfig("nomap", bare, CompressionCodec.Zstd, enrichHeaders = false))
    out.reset()
    Console.withOut(new java.io.PrintStream(out)) {
      Cli.run(spark, Array("offset-reset", "plan", bare, "nomap",
        groupsJson.toString))
    }
    assert(out.toString.contains("INCOMPLETE"), out.toString)
  }
}
