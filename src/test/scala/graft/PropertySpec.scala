package graft

import graft.codec.{CompressionCodec, SegmentCodec}
import graft.model.{KHeader, KRecord}
import graft.sources.{SqliteFile, SqliteWriter}
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck fuzzing of the pure-JVM byte-format boundaries — the places a
  * hand-picked fixture can't cover: arbitrary unicode in strings, arbitrary
  * (incl. empty and null) byte payloads, boundary longs. Spark-side
  * semantics stay in the example-based suites; these properties hit the
  * encoders/decoders directly so hundreds of samples run in milliseconds.
  */
class PropertySpec extends AnyFunSuite {

  private def check(name: String, prop: Prop, min: Int = 200): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(min), prop)
    assert(res.passed, s"$name: ${res.status}")
  }

  // unicode-heavy but NUL-free strings (Kafka topic/key names and SQLite
  // TEXT never carry NUL)
  private val text: Gen[String] =
    Gen.listOf(Gen.frequency(
      5 -> Gen.alphaNumChar,
      1 -> Gen.oneOf('	', ' ', '-', '.', '_'),
      // any BMP char below the surrogate range (multi-byte UTF-8 coverage)
      1 -> Gen.choose(0x00A1.toChar, 0xD7FF.toChar))).map(_.mkString)

  private val bytesOrNull: Gen[Array[Byte]] = Gen.frequency(
    6 -> Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    1 -> Gen.const(Array.empty[Byte]),
    1 -> Gen.const(null: Array[Byte]))

  private val header: Gen[KHeader] =
    for { k <- text; v <- bytesOrNull } yield KHeader(k, v)

  private def recordAt(offset: Long): Gen[KRecord] = for {
    ts <- Gen.chooseNum(0L, 4102444800000L) // epoch-ms up to year 2100
    key <- bytesOrNull
    value <- bytesOrNull
    hs <- Gen.resize(4, Gen.listOf(header))
  } yield KRecord("t", 0, offset, ts, key, value, hs)

  private val segment: Gen[List[KRecord]] = for {
    n <- Gen.chooseNum(1, 40)
    base <- Gen.chooseNum(0L, Long.MaxValue / 2)
    recs <- Gen.sequence[List[KRecord], KRecord](
      (0 until n).map(i => recordAt(base + i)))
  } yield recs

  test("KBAK segment encode/decode round-trips arbitrary records (all codecs)") {
    val codecs = Seq(CompressionCodec.None, CompressionCodec.Zstd, CompressionCodec.Lz4)
    check("segment round-trip", Prop.forAll(segment) { recs =>
      codecs.forall { codec =>
        val out = SegmentCodec.decode(SegmentCodec.encode(recs, codec)).toList
        out.size == recs.size && out.zip(recs).forall { case (a, b) =>
          a.offset == b.offset && a.timestamp == b.timestamp &&
            java.util.Arrays.equals(a.key, b.key) &&
            java.util.Arrays.equals(a.value, b.value) &&
            a.headers.size == b.headers.size &&
            a.headers.zip(b.headers).forall { case (x, y) =>
              x.key == y.key && java.util.Arrays.equals(x.value, y.value) }
        }
      }
    }, min = 100)
  }

  test("offsets.db writer/reader round-trips arbitrary marks") {
    val mark: Gen[(String, String, Int, Long)] = for {
      backup <- Gen.resize(20, text).suchThat(_.nonEmpty)
      topic <- Gen.resize(40, text).suchThat(_.nonEmpty)
      p <- Gen.chooseNum(0, 10000)
      off <- Gen.chooseNum(0L, Long.MaxValue)
    } yield (backup, topic, p, off)
    check("offsets.db round-trip", Prop.forAll(
      Gen.resize(25, Gen.nonEmptyListOf(mark))) { marks =>
      // the writer requires unique PKs (backup_id, topic, partition)
      val uniq = marks.distinctBy(m => (m._1, m._2, m._3))
      val rows = uniq.zipWithIndex.map { case ((b, t, p, o), i) =>
        SqliteWriter.OffsetRow(b, t, p, o, 1700000000000L + i) }
      val db = SqliteFile.open(SqliteWriter.offsetsDb(rows, Nil))
      val back = db.table("offsets").map(_.values).map {
        case Seq(b: String, t: String, p: java.lang.Long,
                 o: java.lang.Long, _) => (b, t, p.toInt, o.toLong)
      }.toSet
      back == uniq.map(m => (m._1, m._2, m._3, m._4)).toSet
    }, min = 100)
  }

  test("segment decode rejects arbitrary corruption loudly, never mis-decodes") {
    val recs = (0L until 10L).map(i =>
      KRecord("t", 0, i, 1700000000000L + i, Array[Byte](1), Array[Byte](2), Nil))
    val good = SegmentCodec.encode(recs, CompressionCodec.Zstd)
    val flip: Gen[(Int, Byte)] = for {
      pos <- Gen.chooseNum(0, good.length - 1)
      b <- Gen.choose(Byte.MinValue, Byte.MaxValue)
    } yield (pos, b)
    check("corruption detection", Prop.forAll(flip) { case (pos, b) =>
      if (good(pos) == b) true // not actually a corruption
      else {
        val bad = good.clone(); bad(pos) = b
        try {
          val out = SegmentCodec.decode(bad).toList
          // a surviving decode must be byte-exact on every field (e.g. the
          // flip landed in dead padding) — silent data changes are the bug
          out.size == recs.size && out.zip(recs).forall { case (a, r) =>
            a.offset == r.offset && a.timestamp == r.timestamp &&
              java.util.Arrays.equals(a.value, r.value) }
        } catch { case _: Exception => true } // loud rejection is correct
      }
    }, min = 300)
  }
}
