package graft.sources

import java.nio.charset.StandardCharsets

/** Minimal SQLite database file WRITER, pure JDK — the write-back half of
  * [[SqliteFile]] (which reads). Closes the one-way-migration asymmetry with
  * the reference's offset store: `import-offsets-db` pulls a reference
  * `offsets.db` into the parquet state table, and [[graft.catalog
  * .OffsetStateTable.exportSqlite]] pushes marks back out as a database the
  * reference (sqlx), the sqlite3 CLI, and [[SqliteFile]] itself all open.
  *
  * Format per sqlite.org/fileformat2.html. Scope: UTF-8, rowid tables, no
  * freelist, no WAL (legacy journal headers — a WAL-mode opener just
  * switches modes), payloads must fit their page (no overflow chains — the
  * offsets schema's rows are tens of bytes). Table b-trees build with
  * arbitrary depth; index b-trees (the PK autoindexes sqlx's upserts need)
  * build to two levels, ~8k rows at the 4 KiB page size — far above
  * backups × topics × partitions in practice, and loud when exceeded.
  *
  * Reference schema being reproduced: offset_store/sqlite.rs:70-99 —
  * `offsets(backup_id, topic, partition, last_offset, checkpoint_ts)` with
  * PRIMARY KEY (backup_id, topic, partition), and `backup_jobs(backup_id
  * PRIMARY KEY, source_cluster_id, status, created_at, last_heartbeat,
  * last_checkpoint)`. The two CREATE INDEX secondaries are NOT written:
  * the reference runs CREATE INDEX IF NOT EXISTS at open and recreates
  * them; the PK autoindexes, which CREATE INDEX cannot recreate, are.
  */
object SqliteWriter {

  final case class OffsetRow(backupId: String, topic: String, partition: Int,
                             lastOffset: Long, checkpointTs: Long)
  final case class JobRow(backupId: String, sourceClusterId: Option[String],
                          status: String, createdAt: Long, lastHeartbeat: Long,
                          lastCheckpoint: Option[Long])

  private val PageSize = 4096
  private val MaxLeafPayload = PageSize - 35 // fileformat2 §1.6, table leaves

  private val OffsetsDdl =
    "CREATE TABLE offsets (backup_id TEXT NOT NULL, topic TEXT NOT NULL, " +
      "partition INTEGER NOT NULL, last_offset INTEGER NOT NULL, " +
      "checkpoint_ts INTEGER NOT NULL DEFAULT (strftime('%s', 'now') * 1000), " +
      "PRIMARY KEY (backup_id, topic, partition))"
  private val JobsDdl =
    "CREATE TABLE backup_jobs (backup_id TEXT PRIMARY KEY, " +
      "source_cluster_id TEXT, status TEXT NOT NULL DEFAULT 'running', " +
      "created_at INTEGER NOT NULL DEFAULT (strftime('%s', 'now') * 1000), " +
      "last_heartbeat INTEGER NOT NULL DEFAULT (strftime('%s', 'now') * 1000), " +
      "last_checkpoint INTEGER)"

  // ---- low-level encoding ---------------------------------------------

  private def varint(v: Long): Array[Byte] = {
    require(v >= 0, s"negative varint $v") // all writer uses are non-negative
    if (v <= 0x7f) Array(v.toByte)
    else {
      var groups = List[Byte]((v & 0x7f).toByte)
      var rest = v >>> 7
      while (rest != 0) { groups = ((rest & 0x7f) | 0x80).toByte :: groups; rest >>>= 7 }
      groups.toArray
    }
  }

  private def be(v: Long, len: Int): Array[Byte] =
    Array.tabulate(len)(i => ((v >> (8 * (len - 1 - i))) & 0xff).toByte)

  /** Smallest signed big-endian width for v among SQLite's 1/2/3/4/6/8. */
  private def intWidth(v: Long): Int = {
    def fits(bits: Int) = v >= -(1L << (bits - 1)) && v < (1L << (bits - 1))
    if (fits(8)) 1 else if (fits(16)) 2 else if (fits(24)) 3
    else if (fits(32)) 4 else if (fits(48)) 6 else 8
  }

  private def serialOf(v: Any): (Long, Array[Byte]) = v match {
    case null => (0L, Array.emptyByteArray)
    case l: Long =>
      if (l == 0L) (8L, Array.emptyByteArray)
      else if (l == 1L) (9L, Array.emptyByteArray)
      else {
        val w = intWidth(l)
        val serial = w match { case 1 => 1L; case 2 => 2L; case 3 => 3L
          case 4 => 4L; case 6 => 5L; case 8 => 6L }
        (serial, be(l, w))
      }
    case d: Double => (7L, be(java.lang.Double.doubleToLongBits(d), 8))
    case s: String =>
      val b = s.getBytes(StandardCharsets.UTF_8); (13L + 2L * b.length, b)
    case b: Array[Byte] => (12L + 2L * b.length, b)
    case other => throw new IllegalArgumentException(
      s"unsupported SQLite value: ${other.getClass}")
  }

  /** SQLite record: varint(header length incl. itself), serial types, bodies. */
  private[sources] def record(values: Seq[Any]): Array[Byte] = {
    val parts = values.map(serialOf)
    val serialBytes = parts.map(p => varint(p._1))
    val serialsLen = serialBytes.map(_.length).sum
    // header length varint counts itself; iterate to the fixed point (the
    // varint width is monotone in the value, so this converges immediately)
    var hl = serialsLen + 1
    while (varint(hl.toLong).length + serialsLen != hl)
      hl = varint(hl.toLong).length + serialsLen
    val hlv = varint(hl.toLong)
    val out = new java.io.ByteArrayOutputStream()
    out.write(hlv); serialBytes.foreach(out.write); parts.foreach(p => out.write(p._2))
    out.toByteArray
  }

  // ---- page assembly ----------------------------------------------------

  private final class PageStore {
    val pages = scala.collection.mutable.ArrayBuffer[Array[Byte]](null) // page 1 slot
    def alloc(page: Array[Byte]): Int = { pages += page; pages.length }
    def setPage1(page: Array[Byte]): Unit = pages(0) = page
  }

  /** Assemble one b-tree page. `headerAt` is 100 for page 1. */
  private def page(pageType: Int, cells: Seq[Array[Byte]],
                   rightMost: Option[Int], headerAt: Int = 0): Array[Byte] = {
    val interior = pageType == 0x05 || pageType == 0x02
    val headerSize = if (interior) 12 else 8
    val buf = new Array[Byte](PageSize)
    val ptrArray = headerAt + headerSize
    var contentEnd = PageSize
    val ptrs = new Array[Int](cells.length)
    for (i <- cells.indices.reverse) {
      contentEnd -= cells(i).length
      System.arraycopy(cells(i), 0, buf, contentEnd, cells(i).length)
      ptrs(i) = contentEnd
    }
    require(contentEnd >= ptrArray + 2 * cells.length,
      s"page overflow: ${cells.length} cells, ${cells.map(_.length).sum} bytes")
    buf(headerAt) = pageType.toByte
    buf(headerAt + 3) = ((cells.length >> 8) & 0xff).toByte
    buf(headerAt + 4) = (cells.length & 0xff).toByte
    buf(headerAt + 5) = ((contentEnd >> 8) & 0xff).toByte
    buf(headerAt + 6) = (contentEnd & 0xff).toByte
    rightMost.foreach { rm =>
      val b = be(rm.toLong, 4); System.arraycopy(b, 0, buf, headerAt + 8, 4)
    }
    for (i <- cells.indices) {
      buf(ptrArray + 2 * i) = ((ptrs(i) >> 8) & 0xff).toByte
      buf(ptrArray + 2 * i + 1) = (ptrs(i) & 0xff).toByte
    }
    buf
  }

  private def fitsLeaf(cellSizes: Seq[Int], headerAt: Int = 0): Boolean =
    headerAt + 8 + cellSizes.map(_ + 2).sum <= PageSize

  /** Greedy left-to-right chunking under the page budget. */
  private def chunk(cells: Seq[Array[Byte]], headerSize: Int): Seq[Seq[Array[Byte]]] = {
    val out = scala.collection.mutable.ArrayBuffer[Seq[Array[Byte]]]()
    var cur = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var used = headerSize
    for (c <- cells) {
      if (cur.nonEmpty && used + c.length + 2 > PageSize) {
        out += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer(); used = headerSize
      }
      cur += c; used += c.length + 2
    }
    if (cur.nonEmpty) out += cur.toSeq
    out.toSeq
  }

  /** Rowid-table b-tree from (rowid, record) rows in rowid order; any depth. */
  private def buildTableTree(rows: Seq[(Long, Array[Byte])], store: PageStore): Int = {
    val cells = rows.map { case (rowid, payload) =>
      require(payload.length <= MaxLeafPayload,
        s"row payload ${payload.length}B exceeds page capacity (no overflow-chain writes)")
      val out = new java.io.ByteArrayOutputStream()
      out.write(varint(payload.length.toLong)); out.write(varint(rowid)); out.write(payload)
      out.toByteArray
    }
    if (rows.isEmpty) return store.alloc(page(0x0d, Nil, None))
    val leafChunks = chunk(cells, headerSize = 8)
    if (leafChunks.length == 1)
      return store.alloc(page(0x0d, leafChunks.head, None))
    // two levels: leaves + one interior root. Interior cell = 4-byte child +
    // varint(max rowid in that child). ~680 children per 4 KiB interior ×
    // ~65 rows per leaf ≈ 44k rows — loud past that, not subtly wrong.
    val bounds = leafChunks.scanLeft(0)(_ + _.length)
    val children = leafChunks.zipWithIndex.map { case (cs, i) =>
      (store.alloc(page(0x0d, cs, None)), rows(bounds(i + 1) - 1)._1)
    }
    val icells = children.init.map { case (child, maxRowid) =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(be(child.toLong, 4)); out.write(varint(maxRowid)); out.toByteArray
    }
    require(12 + icells.map(_.length + 2).sum <= PageSize,
      s"table b-tree interior overflow (${children.length} leaves); beyond " +
        "the supported size for offsets.db export (~44k rows)")
    store.alloc(page(0x05, icells, Some(children.last._1)))
  }

  /** Unsigned-lexicographic key comparison on encoded index RECORDS is wrong
    * in general — so index keys are compared as TYPED tuples by the caller
    * and arrive pre-sorted here.
    */
  /** Index b-tree from pre-sorted key records; one or two levels. */
  private def buildIndexTree(keys: Seq[Array[Byte]], store: PageStore): Int = {
    keys.foreach(k => require(k.length <= MaxLeafPayload,
      s"index key ${k.length}B exceeds page capacity"))
    val leafCells = keys.map { k =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(varint(k.length.toLong)); out.write(k); out.toByteArray
    }
    if (keys.isEmpty) return store.alloc(page(0x0a, Nil, None))
    if (fitsLeaf(leafCells.map(_.length)))
      return store.alloc(page(0x0a, leafCells, None))
    // two levels: distribute keys to leaves, PROMOTING one separator key
    // between adjacent leaves (index b-trees hold each key exactly once)
    val budget = PageSize - 8
    val groups = scala.collection.mutable.ArrayBuffer[Seq[Int]]() // key indices
    var cur = scala.collection.mutable.ArrayBuffer[Int]()
    var used = 0
    var i = 0
    while (i < keys.length) {
      // close the group and promote key i as the separator — but never
      // promote the LAST key (it would vanish from the tree; the page
      // builder's own capacity require backstops the margin)
      if (cur.nonEmpty && i + 1 < keys.length &&
          used + leafCells(i).length + 2 > budget - 64) {
        groups += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer()
        used = 0; i += 1 // key i is promoted, not stored in any leaf
      }
      cur += i; used += leafCells(i).length + 2; i += 1
    }
    if (cur.nonEmpty) groups += cur.toSeq
    val leaves = groups.map(g => store.alloc(page(0x0a, g.map(leafCells), None)))
    val seps = groups.init.map(g => keys(g.last + 1)) // the key after each group
    val icells = leaves.init.zip(seps).map { case (child, key) =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(be(child.toLong, 4)); out.write(varint(key.length.toLong)); out.write(key)
      out.toByteArray
    }
    require(fitsLeaf(icells.map(_.length).toSeq), // 12-byte header ~ same budget
      s"index interior overflow (${leaves.length} leaves) — offsets.db export " +
        "supports ~8k rows per index at the 4 KiB page size")
    store.alloc(page(0x02, icells.toSeq, Some(leaves.last)))
  }

  // ---- database assembly ------------------------------------------------

  private def utf8Cmp(a: String, b: String): Int = {
    val x = a.getBytes(StandardCharsets.UTF_8)
    val y = b.getBytes(StandardCharsets.UTF_8)
    var i = 0
    while (i < x.length && i < y.length) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Serialize a complete offsets.db. Rows may arrive in any order; they are
    * written in primary-key order with rowids 1..N (what a fresh INSERT
    * sequence produces). Duplicate primary keys are rejected loudly — the
    * autoindexes this writer emits are UNIQUE.
    */
  def offsetsDb(offsets: Seq[OffsetRow], jobs: Seq[JobRow]): Array[Byte] = {
    val off = offsets.sortWith { (a, b) =>
      val c1 = utf8Cmp(a.backupId, b.backupId)
      if (c1 != 0) c1 < 0 else {
        val c2 = utf8Cmp(a.topic, b.topic)
        if (c2 != 0) c2 < 0 else a.partition < b.partition
      }
    }
    off.sliding(2).foreach {
      case Seq(a, b) => require(
        (a.backupId, a.topic, a.partition) != (b.backupId, b.topic, b.partition),
        s"duplicate offsets PK: (${a.backupId}, ${a.topic}, ${a.partition})")
      case _ => ()
    }
    val jb = jobs.sortWith((a, b) => utf8Cmp(a.backupId, b.backupId) < 0)
    jb.sliding(2).foreach {
      case Seq(a, b) => require(a.backupId != b.backupId,
        s"duplicate backup_jobs PK: ${a.backupId}")
      case _ => ()
    }

    val store = new PageStore
    val offRows = off.zipWithIndex.map { case (r, i) =>
      ((i + 1).toLong, record(Seq(r.backupId, r.topic, r.partition.toLong,
        r.lastOffset, r.checkpointTs)))
    }
    val offRoot = buildTableTree(offRows, store)
    val offIdxRoot = buildIndexTree(off.zipWithIndex.map { case (r, i) =>
      record(Seq(r.backupId, r.topic, r.partition.toLong, (i + 1).toLong))
    }, store)
    val jobRows = jb.zipWithIndex.map { case (r, i) =>
      ((i + 1).toLong, record(Seq(r.backupId, r.sourceClusterId.orNull, r.status,
        r.createdAt, r.lastHeartbeat,
        r.lastCheckpoint.map(java.lang.Long.valueOf).orNull)))
    }
    val jobRoot = buildTableTree(jobRows, store)
    val jobIdxRoot = buildIndexTree(jb.zipWithIndex.map { case (r, i) =>
      record(Seq(r.backupId, (i + 1).toLong))
    }, store)

    // sqlite_master on page 1 (creation order; autoindex rows carry sql NULL)
    val masterRows: Seq[(Long, Array[Byte])] = Seq(
      (1L, record(Seq("table", "offsets", "offsets", offRoot.toLong, OffsetsDdl))),
      (2L, record(Seq("index", "sqlite_autoindex_offsets_1", "offsets",
        offIdxRoot.toLong, null))),
      (3L, record(Seq("table", "backup_jobs", "backup_jobs", jobRoot.toLong, JobsDdl))),
      (4L, record(Seq("index", "sqlite_autoindex_backup_jobs_1", "backup_jobs",
        jobIdxRoot.toLong, null))))
    val masterCells = masterRows.map { case (rowid, payload) =>
      val out = new java.io.ByteArrayOutputStream()
      out.write(varint(payload.length.toLong)); out.write(varint(rowid)); out.write(payload)
      out.toByteArray
    }
    store.setPage1(page(0x0d, masterCells, None, headerAt = 100))

    val nPages = store.pages.length
    val db = new Array[Byte](nPages * PageSize)
    for ((p, i) <- store.pages.zipWithIndex)
      System.arraycopy(p, 0, db, i * PageSize, PageSize)

    // 100-byte file header (fileformat2 §1.3)
    val magic = "SQLite format 3\u0000".getBytes(StandardCharsets.ISO_8859_1)
    System.arraycopy(magic, 0, db, 0, 16)
    db(16) = ((PageSize >> 8) & 0xff).toByte; db(17) = (PageSize & 0xff).toByte
    db(18) = 1; db(19) = 1 // legacy journal read/write versions
    db(20) = 0 // reserved space
    db(21) = 64; db(22) = 32; db(23) = 32 // payload fractions (fixed values)
    def putU32(off: Int, v: Long): Unit =
      System.arraycopy(be(v, 4), 0, db, off, 4)
    putU32(24, 1L) // file change counter
    putU32(28, nPages.toLong) // database size in pages
    putU32(40, 4L) // schema cookie (4 objects created)
    putU32(44, 4L) // schema format number
    putU32(56, 1L) // text encoding: UTF-8
    putU32(92, 1L) // version-valid-for = change counter → size-in-pages valid
    putU32(96, 3039002L) // sqlite version stamp (informational)
    db
  }

  /** Write via Hadoop FS (local, s3a://, abfss://, gs:// — wherever the
    * reference syncs its store). Single atomic create-overwrite; the file is
    * metadata-sized.
    */
  def write(path: String, conf: org.apache.hadoop.conf.Configuration,
            offsets: Seq[OffsetRow], jobs: Seq[JobRow]): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = org.apache.hadoop.fs.FileSystem.get(p.toUri, conf)
    val out = fs.create(p, true)
    try out.write(offsetsDb(offsets, jobs)) finally out.close()
  }
}
