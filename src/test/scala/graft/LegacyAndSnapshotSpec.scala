package graft

import graft.codec.{CompressionCodec, LegacySegment, SegmentCodec}
import graft.model.{KHeader, KRecord}
import graft.remap.ConsumerGroupSnapshot
import graft.sinks.RateLimiter
import org.scalatest.funsuite.AnyFunSuite

class LegacyAndSnapshotSpec extends AnyFunSuite {

  private def rec(offset: Long, key: Array[Byte], value: Array[Byte],
                  headers: Seq[KHeader] = Nil) =
    KRecord("t", 0, offset, 1700000000000L + offset, key, value, headers)

  test("legacy JSON segment round-trips with nulls, unicode, and headers") {
    val in = Seq(
      rec(0, "k0".getBytes, "v0".getBytes, Seq(KHeader("h", "hv".getBytes))),
      rec(1, null, "只有值".getBytes("UTF-8")),
      rec(2, "key2".getBytes, null))
    for (codec <- Seq(CompressionCodec.None, CompressionCodec.Zstd, CompressionCodec.Lz4)) {
      val bytes = LegacySegment.encodeLegacy(in, codec)
      val out = LegacySegment.decodeAny(bytes, s"seg.json${codec.extension}", "t", 0).toSeq
      assert(out.size == 3)
      assert(out(0).offset == 0 && new String(out(0).value) == "v0")
      assert(out(0).headers.head.key == "h" && new String(out(0).headers.head.value) == "hv")
      assert(out(1).key == null && new String(out(1).value, "UTF-8") == "只有值")
      assert(out(2).value == null)
      assert(out.map(_.timestamp) == in.map(_.timestamp))
    }
  }

  test("decodeAny sniffs binary vs legacy by magic bytes") {
    val records = Seq(rec(5, "k".getBytes, "v".getBytes))
    val binary = SegmentCodec.encode(records, CompressionCodec.Zstd)
    val legacy = LegacySegment.encodeLegacy(records)
    assert(LegacySegment.isBinarySegment(binary))
    assert(!LegacySegment.isBinarySegment(legacy))
    assert(LegacySegment.decodeAny(binary, "s.bin.zst", "t", 0).next().offset == 5)
    assert(LegacySegment.decodeAny(legacy, "s.json", "t", 0).next().offset == 5)
  }

  test("consumer-group snapshot: parse, skip rules, remap (J4)") {
    val json =
      """{ "snapshot_time": 1778044734905,
        |  "groups": [ { "group_id": "issue51-group",
        |                "offsets": { "issue51-topic": { "0": 10, "1": 10, "2": 10,
        |                                                 "bogus": 7, "3": -1 } } } ] }""".stripMargin
    val snap = ConsumerGroupSnapshot.fromJson(json)
    assert(snap.snapshot_time == 1778044734905L)
    val imported = ConsumerGroupSnapshot.importOffsets(snap)
    // "bogus" partition and negative offset skipped
    assert(imported == Seq(
      ("issue51-group", "issue51-topic", 0, 10L),
      ("issue51-group", "issue51-topic", 1, 10L),
      ("issue51-group", "issue51-topic", 2, 10L)))
    val remapped = ConsumerGroupSnapshot.importOffsets(snap,
      topicMapping = Map("issue51-topic" -> "restored-topic"),
      partitionMapping = Map(0 -> 5))
    assert(remapped.head == ("issue51-group", "restored-topic", 5, 10L))
    // round trip
    val again = ConsumerGroupSnapshot.fromJson(ConsumerGroupSnapshot.toJson(snap))
    assert(again == snap)
  }

  test("token-bucket rate limiter paces acquisitions (St9)") {
    val rl = new RateLimiter(permitsPerSec = 1000)
    val t0 = System.nanoTime()
    (1 to 1500).foreach(_ => rl.acquire())
    val elapsed = (System.nanoTime() - t0) / 1e9
    // 1500 permits at 1000/s with burst 1000 → ≥ ~0.4 s
    assert(elapsed >= 0.3, s"limiter too permissive: $elapsed s")
    assert(elapsed < 3.0, s"limiter too strict: $elapsed s")
  }
}
