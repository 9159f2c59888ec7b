package graft

import graft.notification.{CompositeNotifier, NotificationException, PagerDutyNotifier, SlackNotifier}
import graft.remap.{BulkOffsetReset, OffsetResetPlan}
import graft.sources.{ClusterAdmin, InMemoryClusterAdmin, OffsetSpec}
import graft.validation.EvidenceReport
import org.scalatest.funsuite.AnyFunSuite
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress

class AdminNotificationSpec extends AnyFunSuite {

  private val bounds = Map(
    ("orders", 0) -> (10L, 500L), ("orders", 1) -> (0L, 300L),
    ("audit", 0) -> (0L, 42L))
  private val timeIndex = Map(
    ("orders", 0) -> Seq((10L, 1000L), (100L, 2000L), (400L, 3000L)))

  test("admin facade: metadata, batched ListOffsets sentinels, offsets-for-times (S2-S5)") {
    val admin = new InMemoryClusterAdmin(bounds, timeIndex)
    assert(admin.listTopics() == Map("orders" -> 2, "audit" -> 1))
    // one batched call answers mixed specs — the S4 shape
    val got = admin.listOffsets(Map(
      ("orders", 0) -> OffsetSpec.ForTimestamp(1500L),
      ("orders", 1) -> OffsetSpec.Latest,
      ("audit", 0) -> OffsetSpec.Latest))
    assert(got(("orders", 1)) == 300L && got(("audit", 0)) == 42L)
    assert(got(("orders", 0)) == 100L) // first offset with ts >= 1500
    assert(admin.listOffsets(
      Map(("orders", 0) -> OffsetSpec.Earliest))(("orders", 0)) == 10L)
    // out-of-range timestamp → no entry, like a broker's -1
    assert(admin.listOffsets(
      Map(("orders", 0) -> OffsetSpec.ForTimestamp(99999L))).isEmpty)
    assert(admin.listOffsets(
      Map(("ghost", 0) -> OffsetSpec.Latest)).isEmpty)
  }

  test("admin facade: group snapshot capture, commit, and source options (S6/S7/St3)") {
    val admin = new InMemoryClusterAdmin(bounds,
      initialCommitted = Map("g1" -> Map(("orders", 0) -> 123L, ("orders", 1) -> 50L)))
    assert(admin.listConsumerGroups() == Seq("g1"))
    val snap = ClusterAdmin.captureSnapshot(admin, 1700L)
    assert(snap.snapshot_time == 1700L)
    assert(snap.groups.head.offsets("orders")("0") == 123L)
    // snapshot JSON round-trips through the existing import path
    val imported = graft.remap.ConsumerGroupSnapshot.importOffsets(
      graft.remap.ConsumerGroupSnapshot.fromJson(
        graft.remap.ConsumerGroupSnapshot.toJson(snap)))
    assert(imported.contains(("g1", "orders", 0, 123L)))
    // snapshot-read options pin a consistent cut from live latest offsets
    val opts = ClusterAdmin.snapshotReadOptions(admin, "k:9092", Seq("orders"))
    assert(opts("endingOffsets") == """{"orders":{"0":500,"1":300}}""")
    val pitr = ClusterAdmin.pitrReadOptions(admin, "k:9092", 1500L)
    assert(pitr("startingOffsetsByTimestamp").contains(""""orders":{"0":1500,"1":1500}"""))
    // phase-3 committer writes back through the facade, visible to S7 reads
    ClusterAdmin.committer(admin).commit("g1", "orders", 0, 400L)
    assert(admin.committedOffsets("g1")(("orders", 0)) == 400L)
    // and powers the bulk executor unchanged
    val plan = OffsetResetPlan(Seq(
      graft.remap.OffsetResetEntry("g1", "orders", 1, 50L, Some(299L))))
    val report = BulkOffsetReset.execute(
      BulkOffsetReset.adapt(ClusterAdmin.committer(admin)),
      BulkOffsetReset.batches(plan))
    assert(report.status == "success")
    assert(admin.committedOffsets("g1")(("orders", 1)) == 299L)
  }

  test("admin facade: topic auto-create and delete-records legs") {
    val admin = new InMemoryClusterAdmin(bounds)
    // create: new topic materializes with its partitions; existing tolerated
    val r = admin.createTopics(Map("orders" -> 2, "fresh" -> 3))
    assert(r == Map("orders" -> "exists", "fresh" -> "created"))
    assert(admin.listTopics()("fresh") == 3)
    assert(admin.listOffsets(Map(("fresh", 2) -> OffsetSpec.Latest))(("fresh", 2)) == 0L)
    // manifest-driven auto-create under a topic remap
    val m = graft.catalog.BackupManifest("b", 0L, None, Nil, "zstd", List(
      graft.catalog.TopicBackup("orders", Some(4), Nil),
      graft.catalog.TopicBackup("click", None, List(
        graft.catalog.PartitionBackup(5, Nil)))))
    val created = ClusterAdmin.autoCreateForRestore(admin, m,
      Map("click" -> "click_replay"))
    assert(created("click_replay") == "created")
    assert(admin.listTopics()("click_replay") == 6) // max id 5 + 1 fallback
    // delete-records: low-water mark advances, clamped to the HWM
    val lwm = admin.deleteRecords(Map(("orders", 0) -> 100L, ("orders", 1) -> 9999L))
    assert(lwm == Map(("orders", 0) -> 100L, ("orders", 1) -> 300L))
    assert(admin.listOffsets(Map(("orders", 0) -> OffsetSpec.Earliest))(("orders", 0)) == 100L)
    // ...and never regresses (monotonic log start offset)
    assert(admin.deleteRecords(Map(("orders", 0) -> 50L)) == Map(("orders", 0) -> 100L))
    // configs: incremental alter merges keys; describe skips unknown topics
    admin.alterConfigs(Map("orders" -> Map("retention.ms" -> "604800000")))
    admin.alterConfigs(Map("orders" -> Map("cleanup.policy" -> "compact")))
    assert(admin.describeConfigs(Seq("orders", "ghost")) ==
      Map("orders" -> Map("retention.ms" -> "604800000", "cleanup.policy" -> "compact")))
  }

  test("admin facade: create-then-wait-ready polls until topics materialize") {
    val admin = new InMemoryClusterAdmin(bounds)
    // a facade whose topic becomes visible only on the 3rd metadata poll —
    // the propagation window a real controller has after CreateTopics
    var calls = 0
    val lagged = new ClusterAdmin {
      def listTopics(): Map[String, Int] = {
        calls += 1
        if (calls >= 3) admin.listTopics() + ("late" -> 4) else admin.listTopics()
      }
      def listOffsets(s: Map[(String, Int), OffsetSpec]) = admin.listOffsets(s)
      def listConsumerGroups() = admin.listConsumerGroups()
      def committedOffsets(g: String) = admin.committedOffsets(g)
      def alterConsumerGroupOffsets(g: String, o: Map[(String, Int), Long]) =
        admin.alterConsumerGroupOffsets(g, o)
      def createTopics(t: Map[String, Int]) = admin.createTopics(t)
      def deleteRecords(b: Map[(String, Int), Long]) = admin.deleteRecords(b)
      def describeConfigs(t: Seq[String]) = admin.describeConfigs(t)
      def alterConfigs(u: Map[String, Map[String, String]]) = admin.alterConfigs(u)
    }
    var slept = 0L
    val polls = ClusterAdmin.waitReady(lagged, Map("late" -> 4, "orders" -> 2),
      sleep = slept += _)
    assert(polls == 3, s"must poll until visible, got $polls")
    assert(slept > 0L, "must back off between polls")
    // under-partitioned is NOT ready; timeout names the offender
    val err = intercept[IllegalStateException] {
      ClusterAdmin.waitReady(lagged, Map("late" -> 40), timeoutMs = 0L, sleep = _ => ())
    }
    assert(err.getMessage.contains("late"))
    // the composed prepare path: create + wait on the same post-remap sizes
    val m = graft.catalog.BackupManifest("b", 0L, None, Nil, "zstd", List(
      graft.catalog.TopicBackup("fresh2", Some(2), Nil)))
    val outcomes = ClusterAdmin.prepareRestoreTarget(admin, m)
    assert(outcomes == Map("fresh2" -> "created"))
    assert(admin.listTopics()("fresh2") == 2)
  }

  // --- notifications (K11) ---

  private val report = EvidenceReport("b7", 1700000000000L, 1000, 5, "ab" * 32,
    Map("message_count" -> "Passed", "offset_range" -> "Failed"))

  private def withServer(status: Int)(f: (String, () => Seq[String]) => Unit): Unit = {
    val received = java.util.Collections.synchronizedList(new java.util.ArrayList[String]())
    val server = HttpServer.create(new InetSocketAddress(0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(x: HttpExchange): Unit = {
        received.add(new String(x.getRequestBody.readAllBytes(), "UTF-8"))
        x.sendResponseHeaders(status, 2L)
        try x.getResponseBody.write("ok".getBytes) finally x.close()
      }
    })
    server.start()
    try f(s"http://127.0.0.1:${server.getAddress.getPort}/hook",
      () => { import scala.jdk.CollectionConverters._; received.asScala.toSeq })
    finally server.stop(0)
  }

  test("slack notifier posts Block Kit payload; failure on non-2xx (K11)") {
    withServer(200) { (url, received) =>
      new SlackNotifier(url).sendFailure(report, "https://ev/b7.json")
      val body = received().head
      assert(body.contains(""""type":"header""""))
      assert(body.contains("Kafka Backup Validation FAILED"))
      assert(body.contains("*Backup ID:*\\nb7"))
      assert(body.contains("FAILED (1/2 checks)"))
      assert(body.contains("<https://ev/b7.json|Download Report>"))
    }
    withServer(500) { (url, _) =>
      val e = intercept[NotificationException](
        new SlackNotifier(url).sendSuccess(report, "u"))
      assert(e.getMessage.contains("500"))
    }
  }

  test("pagerduty notifier: failure triggers, success resolves on one dedup key (K11)") {
    withServer(202) { (url, received) =>
      val pd = new PagerDutyNotifier("ik-123", severity = "critical", eventsUrl = url)
      pd.sendFailure(report, "https://ev/b7.json")
      pd.sendSuccess(report, "https://ev/b7.json")
      val Seq(fail, ok) = received()
      assert(fail.contains(""""event_action":"trigger""""))
      assert(fail.contains(""""severity":"critical""""))
      assert(ok.contains(""""event_action":"resolve""""))
      assert(ok.contains(""""severity":"info""""))
      // same dedup key so the resolve clears the trigger
      Seq(fail, ok).foreach(b =>
        assert(b.contains(""""dedup_key":"kafka-backup-validation-b7"""")))
      assert(fail.contains(""""routing_key":"ik-123""""))
      assert(fail.contains(""""checks_passed":1,"checks_total":2"""))
    }
  }

  test("composite notifier: one dead webhook does not mute the rest") {
    withServer(200) { (okUrl, received) =>
      val dead = new SlackNotifier("http://127.0.0.1:1/black-hole")
      val live = new SlackNotifier(okUrl)
      val e = intercept[NotificationException](
        new CompositeNotifier(Seq(dead, live)).sendSuccess(report, "u"))
      assert(received().size == 1, "live webhook must still be called")
      assert(e.getMessage.nonEmpty)
    }
  }
}
