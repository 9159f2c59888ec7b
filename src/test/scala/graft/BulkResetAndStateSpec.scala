package graft

import graft.catalog.OffsetStateTable
import graft.codec.CompressionCodec
import graft.model.KRecord
import graft.pipelines._
import graft.remap.{BulkOffsetReset, OffsetResetEntry, OffsetResetPlan, OffsetResetPlanCsv}
import org.apache.spark.sql.functions._
import java.nio.file.Files

class BulkResetAndStateSpec extends SparkSpec {

  test("incremental backup: second run writes only new offsets; merge dedups (S12)") {
    val tmp = Files.createTempDirectory("graft-inc").toString
    val all = KRecord.fromEvents(spark, sf0001)
    val half = all.filter(col("offset") < 500)
    val m1 = Backup.runIncremental(spark, half,
      BackupConfig("inc", tmp, CompressionCodec.Zstd, enrichHeaders = false))
    val n1 = m1.totalRecords
    assert(n1 == half.count())
    // state advanced to each partition's high-water mark
    val state1 = OffsetStateTable.lastOffsets(spark, tmp, "inc")
    assert(state1.nonEmpty)
    m1.topics.foreach(t => t.partitions.foreach(p =>
      assert(state1((t.name, p.partition_id)) == p.lastOffset.get)))
    // second run over the FULL source: only records past the marks land
    val m2 = Backup.runIncremental(spark, all,
      BackupConfig("inc", tmp, CompressionCodec.Zstd, enrichHeaders = false))
    assert(m2.totalRecords == all.count(), "merged manifest must cover everything")
    val restored = Restore.records(spark, RestoreConfig(tmp, "inc"))
    assert(restored.count() == all.count())
    // no duplicated offsets after the merge
    assert(restored.toDF().select("topic", "partition", "offset").distinct().count()
      == all.count())
    // third run with nothing new: manifest unchanged
    val m3 = Backup.runIncremental(spark, all,
      BackupConfig("inc", tmp, CompressionCodec.Zstd, enrichHeaders = false))
    assert(m3.totalRecords == all.count() && m3.totalSegments == m2.totalSegments)
  }

  test("bulk reset: all groups commit, metrics and report roll up") {
    val plan = OffsetResetPlan((1 to 100).map(i =>
      OffsetResetEntry(s"g${i % 10}", "t", i % 4, i.toLong, Some(i.toLong + 1000))))
    val committer = new RecordingCommitter()
    val report = BulkOffsetReset.execute(BulkOffsetReset.adapt(committer),
      BulkOffsetReset.batches(plan), BulkOffsetReset.Config(maxConcurrent = 8))
    assert(report.status == "success")
    assert(report.total_groups == 10 && report.failed_groups == 0)
    assert(report.total_offsets_reset == 100)
    assert(committer.committed.size == 100)
    assert(report.p50_latency_ms <= report.p99_latency_ms)
    assert(report.toJson.contains("\"status\":\"success\""))
    // unresolved targets are excluded from batches, like the reference
    val withHole = OffsetResetPlan(plan.entries :+
      OffsetResetEntry("gX", "t", 0, 1L, None))
    assert(BulkOffsetReset.batches(withHole).flatMap(_.offsets).size == 100)
  }

  test("bulk reset: failed partitions retry with backoff, then report partial") {
    // committer fails (t,1) twice then succeeds; (t,3) always fails
    val attempts = new java.util.concurrent.ConcurrentHashMap[(String, Int), Integer]()
    val committer = new BulkOffsetReset.BatchCommitter {
      def commitBatch(g: String, offsets: Seq[(String, Int, Long)]) =
        offsets.flatMap { case (t, p, _) =>
          val n = attempts.merge((g, p), 1, (a, b) => a + b)
          if (p == 3) Some(BulkOffsetReset.PartitionError(t, p, "always down"))
          else if (p == 1 && n <= 2) Some(BulkOffsetReset.PartitionError(t, p, "flaky"))
          else None
        }
    }
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val plan = OffsetResetPlan(Seq(
      OffsetResetEntry("g1", "t", 0, 1, Some(10)),
      OffsetResetEntry("g1", "t", 1, 2, Some(20)),
      OffsetResetEntry("g2", "t", 3, 3, Some(30))))
    val report = BulkOffsetReset.execute(BulkOffsetReset.adapt(
      new graft.pipelines.GroupOffsetCommitter {
        def commit(g: String, t: String, p: Int, o: Long): Unit = ()
      }), Nil) // empty work: status success, zero groups
    assert(report.total_groups == 0 && report.status == "success")
    val real = BulkOffsetReset.execute(committer, BulkOffsetReset.batches(plan),
      BulkOffsetReset.Config(maxConcurrent = 2, maxRetryAttempts = 3,
        sleeper = ms => { sleeps += ms; () }))
    assert(real.status == "partial")
    val g1 = real.outcomes.find(_.group_id == "g1").get
    assert(g1.partitions_failed == 0 && g1.retry_attempts == 2)
    val g2 = real.outcomes.find(_.group_id == "g2").get
    assert(g2.partitions_failed == 1 && g2.retry_attempts == 3)
    assert(g2.errors.head.message == "always down")
    // exponential backoff: g1 slept ~100,200; g2 ~100,200,400 (plus jitter)
    assert(sleeps.size == 5)
    assert(sleeps.sorted.take(2).forall(s => s >= 100 && s < 150))
    assert(sleeps.max >= 400 && sleeps.max < 500)
    // flaky partition committed exactly once per attempt until success
    assert(real.total_offsets_reset == 2)
  }

  test("reset-plan CSV round-trips through the bulk-reset parser") {
    val plan = OffsetResetPlan(Seq(
      OffsetResetEntry("plain", "t", 0, 5, Some(105)),
      OffsetResetEntry("""evil,"grp""", "to,pic", 1, 6, Some(106)),
      OffsetResetEntry("new\nline grp", "t", 3, 8, Some(108)), // quoted \n spans lines
      OffsetResetEntry("unresolved", "t", 2, 7, None)))
    val parsed = OffsetResetPlanCsv.parse(plan.toCsv)
    assert(parsed.entries == plan.entries)
    intercept[IllegalArgumentException](OffsetResetPlanCsv.parse("nope\n1,2"))
  }

  test("bulk reset fail-fast: continueOnError=false skips groups after a failure") {
    val committer = new BulkOffsetReset.BatchCommitter {
      def commitBatch(g: String, offsets: Seq[(String, Int, Long)]) =
        if (g == "g0") offsets.map { case (t, p, _) =>
          BulkOffsetReset.PartitionError(t, p, "down") }
        else Nil
    }
    // serial pool (maxConcurrent=1) makes the skip deterministic: g0 fails
    // first, later groups must be skipped, not committed
    val work = (0 until 5).map(i =>
      BulkOffsetReset.Batch(s"g$i", Seq(("t", i, 100L))))
    val report = BulkOffsetReset.execute(committer, work,
      BulkOffsetReset.Config(maxConcurrent = 1, maxRetryAttempts = 0,
        continueOnError = false, sleeper = _ => ()))
    assert(report.failed_groups == 5 && report.status == "failed")
    assert(report.outcomes.count(_.errors.exists(_.message.startsWith("skipped"))) == 4)
    // same shape with continueOnError=true commits the healthy groups
    val tolerant = BulkOffsetReset.execute(committer, work,
      BulkOffsetReset.Config(maxConcurrent = 1, maxRetryAttempts = 0, sleeper = _ => ()))
    assert(tolerant.successful_groups == 4 && tolerant.status == "partial")
  }

  test("report and health JSON are locale-independent (de_DE decimal comma)") {
    val prev = java.util.Locale.getDefault
    java.util.Locale.setDefault(java.util.Locale.GERMANY)
    try {
      val report = BulkOffsetReset.execute(
        BulkOffsetReset.adapt(new RecordingCommitter()),
        Seq(BulkOffsetReset.Batch("g", Seq(("t", 0, 1L)))))
      assert(!report.toJson.matches(""".*\d,\d.*"""),
        s"decimal comma leaked into JSON: ${report.toJson}")
      val h = new graft.metrics.HealthRegistry()
      h.recordRecords(5)
      assert(!h.report().toJson.matches(""".*"current_throughput":\d+,\d.*"""))
    } finally java.util.Locale.setDefault(prev)
  }

  test("validate-restore: valid catalog, inverted window, missing manifest") {
    val tmp = Files.createTempDirectory("graft-vr").toString
    Backup.run(spark, KRecord.fromEvents(spark, sf0001),
      BackupConfig("vr", tmp, CompressionCodec.Lz4, enrichHeaders = false))
    val ok = Restore.validateRestore(spark, RestoreConfig(tmp, "vr"))
    assert(ok.valid && ok.errors.isEmpty)
    assert(ok.records_to_restore == 1000 && ok.segments_to_process > 0)
    assert(ok.time_range.isDefined && ok.topics.nonEmpty)
    assert(ok.toJson.contains("\"valid\":true"))
    // remap collision with an existing topic is a warning, not an error
    val remap = Restore.validateRestore(spark, RestoreConfig(tmp, "vr",
      topicMapping = Map("click" -> "view")))
    assert(remap.valid && remap.warnings.exists(_.contains("collides")))
    val inverted = Restore.validateRestore(spark, RestoreConfig(tmp, "vr",
      windowStartMs = Some(100), windowEndMs = Some(50)))
    assert(!inverted.valid && inverted.errors.exists(_.contains("inverted")))
    val missing = Restore.validateRestore(spark, RestoreConfig(tmp, "nope"))
    assert(!missing.valid && missing.errors.exists(_.contains("unreadable")))
    // a window past all data: filters match nothing
    val empty = Restore.validateRestore(spark, RestoreConfig(tmp, "vr",
      windowStartMs = Some(Long.MaxValue - 1), windowEndMs = Some(Long.MaxValue)))
    assert(!empty.valid && empty.errors.exists(_.contains("no segments match")))
  }

  test("cli status/validate-restore/backup-incremental drive end-to-end") {
    val tmp = Files.createTempDirectory("graft-cli3").toString
    Cli.run(spark, Array("backup-incremental", sf0001, tmp, "c3"))
    Cli.run(spark, Array("status", tmp, "c3"))
    Cli.run(spark, Array("status", tmp))
    Cli.run(spark, Array("validate-restore", tmp, "c3", "--json"))
  }
}
