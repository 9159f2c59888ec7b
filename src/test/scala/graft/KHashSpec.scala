package graft

import graft.functions.KHash
import org.scalatest.funsuite.AnyFunSuite

class KHashSpec extends AnyFunSuite {

  test("murmur2 matches Kafka's public golden vectors") {
    // Golden values from Apache Kafka's public UtilsTest.testMurmur2.
    val cases = Map(
      "21" -> -973932308,
      "foobar" -> -790332482,
      "a-little-bit-long-string" -> -985981536,
      "a-little-bit-longer-string" -> -1486304829,
      "lkjh234lh9fiuh90y23oiuhsafujhadof229phr9h19h89h8" -> -58897971,
      "abc" -> 479470107)
    cases.foreach { case (k, expected) =>
      assert(KHash.murmur2(k.getBytes("UTF-8")) == expected, s"murmur2($k)")
    }
  }

  test("toPositive masks the sign bit (not abs)") {
    assert(KHash.toPositive(-1) == Int.MaxValue)
    assert(KHash.toPositive(Int.MinValue) == 0)
    assert(KHash.toPositive(5) == 5)
  }

  test("empty key hashes deterministically (not round-robin)") {
    // reference test: restore/repartition.rs:499-506
    val p1 = KHash.kafkaPartition(Array.emptyByteArray, 10)
    val p2 = KHash.kafkaPartition(Array.emptyByteArray, 10)
    assert(p1 == p2 && p1 >= 0 && p1 < 10)
  }

  test("partition assignment in range for adversarial keys") {
    for (key <- Seq("hello", "test-key", "", "order-12345", "ÿÿ")) {
      val p = KHash.kafkaPartition(key.getBytes("ISO-8859-1"), 6)
      assert(p >= 0 && p < 6)
    }
  }

  test("LE long round trip and string fallback") {
    for (v <- Seq(0L, 1L, -1L, Long.MaxValue, Long.MinValue, 1700000000000L)) {
      assert(KHash.bytesToLongLE(KHash.longToBytesLE(v)) == v)
    }
    assert(KHash.bytesToLongLE("12345".getBytes) == 12345L)
    assert(KHash.bytesToLongLE("nope".getBytes) == null)
    assert(KHash.bytesToLongLE(null) == null)
  }

  test("glob to regex: * ? literals and specials") {
    assert("orders".matches(KHash.globToRegex("orders")))
    assert("orders-v2".matches(KHash.globToRegex("orders*")))
    assert("Xorders".matches(KHash.globToRegex("?orders")))
    assert(!"orders".matches(KHash.globToRegex("?orders")))
    assert("a.b".matches(KHash.globToRegex("a.b")))
    assert(!"aXb".matches(KHash.globToRegex("a.b")))
    assert("pre.fix-1".matches(KHash.globToRegex("pre.fix-*")))
  }

  test("topic selection: empty include = all; exclude wins; ~regex") {
    assert(KHash.topicMatches("any", Nil, Nil))
    assert(KHash.topicMatches("orders", Seq("ord*"), Nil))
    assert(!KHash.topicMatches("orders", Seq("ord*"), Seq("orders")))
    assert(KHash.topicMatches("orders", Seq("~ord.+"), Nil))
    assert(!KHash.topicMatches("orders", Nil, Seq("~.*ers")))
    assert(!KHash.topicMatches("clicks", Seq("ord*"), Nil))
  }
}
