package graft

import graft.catalog.OffsetStateTable
import graft.codec.CompressionCodec
import graft.model.KRecord
import graft.pipelines.{Backup, BackupConfig}
import graft.sources.SqliteFile
import org.json4s._
import org.json4s.jackson.JsonMethods
import java.nio.file.Files

/** offsets.db interop (offset_store/sqlite.rs): the golden fixture is a real
  * SQLite file written by the SQLite library itself (page_size=512 so the
  * offsets table spans interior b-tree nodes, one 1.8 kB topic name so a
  * payload overflows the page), with the expected rows stored alongside it as
  * JSON. The parser must reproduce the library's own content bit-exactly.
  */
class SqliteOffsetsSpec extends SparkSpec {

  private def resource(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(s"/fixtures/$name")
    try in.readAllBytes() finally in.close()
  }

  private lazy val expected: Map[String, List[List[Any]]] = {
    implicit val formats: Formats = DefaultFormats
    JsonMethods.parse(new String(resource("offsets-ref-expected.json"), "UTF-8"))
      .extract[Map[String, List[List[Any]]]]
  }

  private lazy val db = SqliteFile.open(resource("offsets-ref.db"))

  private def asLong(x: Any): Long = x match {
    case i: BigInt => i.toLong
    case i: Int => i.toLong
    case l: Long => l
    case other => throw new IllegalArgumentException(s"$other")
  }

  test("sqlite_master enumerates the reference tables") {
    assert(db.tables.keySet == Set("offsets", "backup_jobs", "throughput_stats"))
  }

  test("REAL columns decode (serial type 7), NULLs intact, integral-REAL caveat pinned") {
    // SQLite stores integral-valued REALs (0.0, -1.0) with INTEGER serial
    // types — without DDL affinity parsing they surface as Long (documented
    // SqliteFile caveat); fractional values arrive as true serial-7 doubles
    def num(x: Any): Option[Double] = Option(x).map {
      case d: java.lang.Double => d.doubleValue()
      case l: java.lang.Long => l.doubleValue()
      case other => fail(s"unexpected $other")
    }
    val got = db.table("throughput_stats").map(r => (
      r.values(0).asInstanceOf[String], num(r.values(1)), num(r.values(2)),
      Option(r.values(3)).map(_.asInstanceOf[String]))).toSet
    assert(got == Set(
      ("backup-2025-00", Some(212.5), Some(4.6875), Some("zstd")),
      ("backup-2025-01", Some(-1.0), Some(0.0), None),
      ("backup-2025-02", Some(1032.25), None, Some("lz4"))))
    // fractional REALs really exercised the float path
    assert(db.table("throughput_stats").exists(r =>
      r.values(1).isInstanceOf[java.lang.Double]))
  }

  test("offsets table decodes bit-exactly, across interior pages and overflow") {
    val got = db.table("offsets").map(r => (
      r.values(0).asInstanceOf[String], r.values(1).asInstanceOf[String],
      asLong(r.values(2)), asLong(r.values(3)), asLong(r.values(4)))).toSet
    val want = expected("offsets").map(l => (
      l(0).asInstanceOf[String], l(1).asInstanceOf[String],
      asLong(l(2)), asLong(l(3)), asLong(l(4)))).toSet
    assert(got.size == want.size)
    assert(got == want)
    // the overflow row survived reassembly
    assert(got.exists(_._2.length > 1800))
    // every integer serial-type width appears (1..8-byte, incl. the 9e17 mark)
    assert(got.exists(_._4 > 100000000000000000L))
  }

  test("backup_jobs decodes including NULL columns") {
    val got = db.table("backup_jobs").map(r => (
      r.values(0).asInstanceOf[String], Option(r.values(1)).map(_.asInstanceOf[String]),
      r.values(2).asInstanceOf[String], Option(r.values(5)).map(asLong))).toSet
    assert(got == Set(
      ("backup-2025-00", Some("cluster-a"), "completed", Some(1754000050000L)),
      ("backup-2025-01", None, "running", None),
      ("backup-2025-02", Some("cluster-b"), "failed", Some(1754000450000L))))
  }

  test("fromSqlite lands the reference marks in the state-table schema") {
    val dbPath = {
      val p = Files.createTempFile("offsets-ref", ".db")
      Files.write(p, resource("offsets-ref.db")); p.toString
    }
    val df = OffsetStateTable.fromSqlite(spark, dbPath)
    assert(df.schema == OffsetStateTable.schema)
    assert(df.count() == expected("offsets").size)
  }

  test("importSqlite is advance-only and idempotent; incremental backup resumes from it") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dbPath = {
      val p = Files.createTempFile("offsets-ref", ".db")
      Files.write(p, resource("offsets-ref.db")); p.toString
    }
    val root = Files.createTempDirectory("graft-sqlite-import").toString
    val n = OffsetStateTable.importSqlite(spark, dbPath, root)
    assert(n == expected("offsets").size)
    val marks = OffsetStateTable.lastOffsets(spark, root, "backup-2025-00")
    assert(marks(("orders", 0)) == 0L && marks(("orders", 1)) == 2L)
    // idempotent: a second import changes nothing
    OffsetStateTable.importSqlite(spark, dbPath, root)
    assert(OffsetStateTable.load(spark, root).count() == n)
    // advance-only: a higher existing mark survives a re-import
    OffsetStateTable.update(spark, root, graft.catalog.BackupManifest(
      "backup-2025-00", 1L, None, Nil, "none", List(graft.catalog.TopicBackup(
        "orders", Some(12), List(graft.catalog.PartitionBackup(0, List(
          graft.catalog.SegmentMetadata("k", 0, 500, 0, 0, 501, 1, 1))))))))
    OffsetStateTable.importSqlite(spark, dbPath, root)
    assert(OffsetStateTable.lastOffsets(spark, root, "backup-2025-00")(("orders", 0)) == 500L)

    // the migration story end-to-end: a backup against freshly imported marks
    // picks up only records past each partition's sqlite resume point
    val resumeRoot = Files.createTempDirectory("graft-sqlite-resume-state").toString
    OffsetStateTable.importSqlite(spark, dbPath, resumeRoot)
    val recs = (0 until 2).flatMap(p => (0L until 10L).map(o =>
      KRecord("orders", p, o, 1754000000000L + o, null, Array[Byte](1), Seq.empty)))
      .toDS().toDF()
    val backupRoot = Files.createTempDirectory("graft-sqlite-resume").toString
    val m = Backup.runIncremental(spark, recs,
      BackupConfig("backup-2025-00", backupRoot, CompressionCodec.None,
        enrichHeaders = false),
      stateRoot = Some(resumeRoot))
    // marks: partition 0 → 0 (keeps offsets 1..9), partition 1 → 2 (keeps 3..9)
    assert(m.totalRecords == 9 + 7, s"resumed backup took ${m.totalRecords} records")
    val p0 = m.topics.head.partitions.find(_.partition_id == 0).get
    assert(p0.segments.map(_.start_offset).min == 1)
    val p1 = m.topics.head.partitions.find(_.partition_id == 1).get
    assert(p1.segments.map(_.start_offset).min == 3)
  }

  test("INTEGER PRIMARY KEY alias (first column) surfaces as the rowid; later NULLs stay NULL") {
    // fixture written by the SQLite library: jobs(id INTEGER PRIMARY KEY,
    // name TEXT, started INTEGER) — the alias column is stored as serial 0
    // and the value lives in the cell's rowid (fileformat2 §2.1)
    val ipk = SqliteFile.open(resource("ipk-alias.db"))
    val jobs = ipk.table("jobs").map(r =>
      (asLong(r.values(0)), Option(r.values(1)).map(_.asInstanceOf[String]),
        Option(r.values(2)).map(asLong))).toSet
    assert(jobs == Set(
      (7L, Some("alpha"), Some(100L)),
      (42L, Some("beta"), None),
      (9001L, None, Some(300L))))
    // the substituted value IS the rowid, not a column payload
    assert(ipk.table("jobs").forall(r => r.values(0) == java.lang.Long.valueOf(r.rowid)))
    // genuine NULL in a non-first column of a plain table is untouched
    val notes = ipk.table("notes").map(r =>
      (r.values(0).asInstanceOf[String], Option(r.values(1)))).toMap
    assert(notes("a").isEmpty && notes("b").contains("x"))
  }

  test("malformed input fails loudly, not garbage") {
    intercept[IllegalArgumentException](SqliteFile.open("not a database".getBytes))
    intercept[IllegalArgumentException](db.table("nonexistent"))
  }

  // ── write-back: the pure-JDK writer (SqliteWriter) ──────────────────────

  private lazy val sqlite3Bin: Option[String] = {
    val fromPath = sys.env.getOrElse("PATH", "").split(':').iterator
      .map(d => new java.io.File(d, "sqlite3")).find(_.canExecute)
    fromPath.orElse( // sbt strips conda's PATH entry in this container
      Some(new java.io.File("/root/miniconda/bin/sqlite3")).filter(_.canExecute))
      .map(_.getAbsolutePath)
  }

  private def sqlite3(args: String*): Option[String] = {
    import scala.sys.process._
    sqlite3Bin.flatMap { bin =>
      try Some((Seq(bin) ++ args).!!)
      catch { case _: Exception => None }
    }
  }

  test("writer round-trips through our own reader, all serial widths and unicode") {
    import graft.sources.SqliteWriter
    import graft.sources.SqliteWriter.{JobRow, OffsetRow}
    val offsets = Seq(
      OffsetRow("b-1", "orders", 0, 0L, 1754000000000L), // serial 8 (zero)
      OffsetRow("b-1", "orders", 1, 1L, 1754000000001L), // serial 9 (one)
      OffsetRow("b-1", "orders", 2, 127L, 1754000000002L), // 1-byte
      OffsetRow("b-1", "ordérs-ünïcode", 0, 40000L, 1754000000003L), // 3-byte
      OffsetRow("b-2", "t", 5, 900000000000000000L, 1754000000004L)) // 8-byte
    val jobs = Seq(
      JobRow("b-1", Some("cluster-a"), "completed", 1L, 2L, Some(3L)),
      JobRow("b-2", None, "running", 4L, 5L, None)) // NULLs
    val bytes = SqliteWriter.offsetsDb(offsets, jobs)
    val rt = SqliteFile.open(bytes)
    // (tables lists type='table' rows only; the two autoindexes are present
    // in sqlite_master but exposed to SQL engines, not this facade)
    assert(rt.tables.keySet == Set("offsets", "backup_jobs"))
    val got = rt.table("offsets").map(r => OffsetRow(
      r.values(0).asInstanceOf[String], r.values(1).asInstanceOf[String],
      asLong(r.values(2)).toInt, asLong(r.values(3)), asLong(r.values(4))))
    assert(got.toSet == offsets.toSet)
    val gotJobs = rt.table("backup_jobs").map(r => JobRow(
      r.values(0).asInstanceOf[String],
      Option(r.values(1)).map(_.asInstanceOf[String]),
      r.values(2).asInstanceOf[String], asLong(r.values(3)), asLong(r.values(4)),
      Option(r.values(5)).map(asLong)))
    assert(gotJobs.toSet == jobs.toSet)
    // duplicate PKs are rejected, not silently deduped
    intercept[IllegalArgumentException](SqliteWriter.offsetsDb(
      offsets :+ offsets.head, jobs))
    intercept[IllegalArgumentException](SqliteWriter.offsetsDb(
      offsets, jobs :+ jobs.head.copy(status = "other")))
  }

  test("writer output passes sqlite3's own integrity_check, data readable, upsert works") {
    import graft.sources.SqliteWriter.{JobRow, OffsetRow}
    val offsets = (0 until 40).map(i =>
      OffsetRow(s"backup-${i % 3}", s"topic-${i % 7}", i, i * 1000L, 1754000000000L + i))
    val jobs = (0 until 3).map(i => JobRow(s"backup-$i", Some(s"c$i"), "completed",
      1L, 2L, Some(3L)))
    val p = Files.createTempFile("graft-export", ".db")
    Files.write(p, graft.sources.SqliteWriter.offsetsDb(offsets, jobs))
    sqlite3(p.toString, "PRAGMA integrity_check;") match {
      case None => info("sqlite3 CLI not available; library-level check skipped")
      case Some(out) =>
        assert(out.trim == "ok", s"integrity_check: $out")
        // real SQL over the written file, including an index-driven lookup
        val cnt = sqlite3(p.toString,
          "SELECT count(*) FROM offsets;").get.trim
        assert(cnt == "40")
        val one = sqlite3(p.toString,
          "SELECT last_offset FROM offsets WHERE backup_id='backup-1' " +
            "AND topic='topic-1' AND partition=22;").get.trim
        assert(one == "22000")
        // the PK autoindex is live: ON CONFLICT upsert replaces, not appends
        sqlite3(p.toString,
          "INSERT INTO offsets VALUES('backup-1','topic-1',22,999,0) " +
            "ON CONFLICT(backup_id,topic,partition) DO UPDATE " +
            "SET last_offset=excluded.last_offset;")
        assert(sqlite3(p.toString,
          "SELECT count(*), max(last_offset) FROM offsets WHERE " +
            "backup_id='backup-1' AND topic='topic-1' AND partition=22;")
          .get.trim == "1|999")
        // schema object the reference's CREATE INDEX IF NOT EXISTS can extend
        sqlite3(p.toString,
          "CREATE INDEX IF NOT EXISTS idx_offsets_backup ON offsets(backup_id);")
        assert(sqlite3(p.toString, "PRAGMA integrity_check;").get.trim == "ok")
    }
  }

  test("writer scales past one page: interior table pages + two-level index, still valid") {
    import graft.sources.SqliteWriter.{JobRow, OffsetRow}
    val offsets = for (t <- 0 until 60; part <- 0 until 50)
      yield OffsetRow("big-backup", f"topic-$t%03d", part, t * 1000L + part, 1754000000000L)
    val jobs = Seq(JobRow("big-backup", None, "completed", 1L, 2L, Some(3L)))
    val bytes = graft.sources.SqliteWriter.offsetsDb(offsets, jobs)
    assert(bytes.length > 3 * 4096, "3000 rows must span multiple pages")
    val rt = SqliteFile.open(bytes)
    assert(rt.table("offsets").size == 3000)
    val p = Files.createTempFile("graft-export-big", ".db")
    Files.write(p, bytes)
    sqlite3(p.toString, "PRAGMA integrity_check;").foreach { out =>
      assert(out.trim == "ok", s"integrity_check: $out")
      assert(sqlite3(p.toString,
        "SELECT count(*) FROM offsets WHERE backup_id='big-backup';").get.trim == "3000")
      assert(sqlite3(p.toString,
        "SELECT last_offset FROM offsets WHERE backup_id='big-backup' " +
          "AND topic='topic-059' AND partition=49;").get.trim == "59049")
    }
  }

  test("export-offsets-db: state table -> sqlite -> import round-trips identically") {
    val root = Files.createTempDirectory("graft-sqlite-export").toString
    val dbPath = Files.createTempDirectory("graft-sqlite-export-db")
      .resolve("offsets.db").toString
    OffsetStateTable.update(spark, root, graft.catalog.BackupManifest(
      "rt-backup", 1L, None, Nil, "none", List(graft.catalog.TopicBackup(
        "orders", Some(2), List(
          graft.catalog.PartitionBackup(0, List(
            graft.catalog.SegmentMetadata("k0", 0, 500, 0, 0, 501, 1, 1))),
          graft.catalog.PartitionBackup(1, List(
            graft.catalog.SegmentMetadata("k1", 0, 42, 0, 0, 43, 1, 1))))))),
      nowMs = 1754000123456L)
    val before = OffsetStateTable.load(spark, root).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    // CLI surface
    Cli.run(spark, Array("export-offsets-db", root, dbPath))
    // reference-shaped reader sees the same marks; import into a FRESH state
    // root reproduces the table exactly
    val root2 = Files.createTempDirectory("graft-sqlite-export2").toString
    val n = OffsetStateTable.importSqlite(spark, dbPath, root2)
    assert(n == before.size)
    val after = OffsetStateTable.load(spark, root2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3), r.getLong(4)))
      .toSet
    assert(after == before)
    // and sqlite's own library agrees when available
    sqlite3(dbPath, "SELECT backup_id, topic, partition, last_offset FROM offsets " +
      "ORDER BY topic, partition;").foreach { out =>
      assert(out.trim.linesIterator.toSeq == Seq(
        "rt-backup|orders|0|500", "rt-backup|orders|1|42"))
    }
  }
}
