package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.charset.StandardCharsets

/** WARC (ISO 28500 / WARC 1.1) interchange — the crawl format a
  * training-data pipeline actually receives (Common Crawl ships WARC):
  * read crawl archives into the documents shape and write corpora back out
  * as standards-shaped archives. Built from the PUBLIC spec
  * (https://iipc.github.io/warc-specifications/), no reference-repo analog
  * — the brief's "another source format" for the curation chain
  * (WARC → [[graft.text.CorpusClean.extractHtmlText]] → pipeline).
  *
  * Scope (the 100 TB-relevant subset, deliberately):
  *  - records are `WARC/1.0|1.1` header blocks (CRLF lines, `Name: value`)
  *    + `Content-Length` payload bytes + CRLF CRLF separator;
  *  - `resource` records carry raw payloads; `response` records carry an
  *    HTTP response whose header block (up to the first CRLF CRLF) is
  *    stripped to yield the body — the two types a corpus reader needs;
  *    other types (warcinfo, request, metadata) are skipped;
  *  - whole-member gzip (the Common Crawl layout: each record its own gzip
  *    member, members concatenated) and plain files both read — sniffed by
  *    magic, decompressed as a multi-member stream.
  *
  * Files are whole-file units exactly like KBAK segments: read =
  * `binaryFile` scan → per-file parse (streamed record-by-record, never
  * the whole archive as one String); write = one archive per partition via
  * the same Hadoop-FS single-writer recipe. Malformed tails are counted,
  * not job-fatal (the PERMISSIVE discipline of [[CorpusIO]]).
  */
object WarcIO {

  private val Crlf = "\r\n".getBytes(StandardCharsets.US_ASCII)

  /** One parsed payload-bearing record. `warc_file`/`rec_idx` give a
    * stable provenance key; `corrupt` marks a malformed tail (the rest of
    * that file is skipped, prior records stand).
    */
  final case class WarcRecord(
      warc_file: String,
      rec_idx: Int,
      warc_type: String,
      target_uri: String, // null when absent
      content: Array[Byte],
      corrupt: Boolean)

  /** Parse one archive's bytes (gzip-sniffed) into payload records. */
  def parse(fileName: String, raw: Array[Byte]): Iterator[WarcRecord] = {
    val bytes = if (isGzip(raw)) gunzipAll(raw) else raw
    new Iterator[WarcRecord] {
      private var pos = 0
      private var idx = 0
      private var done = bytes.isEmpty
      private var pending: WarcRecord = null
      advance()

      private def advance(): Unit = {
        pending = null
        while (pending == null && !done) {
          skipPadding()
          if (pos >= bytes.length) { done = true; return }
          parseOne() match {
            case Some(r) => pending = r
            case None if pos >= bytes.length => done = true
            case None =>
              // malformed from here on: surface one corrupt marker, stop
              pending = WarcRecord(fileName, idx, "corrupt", null,
                Array.emptyByteArray, corrupt = true)
              done = true
          }
        }
      }

      // inter-record padding (the record separator and any stray CRLFs) —
      // runs before EVERY header parse, including the tail-skip recursion
      // over non-payload record types
      private def skipPadding(): Unit =
        while (pos < bytes.length &&
          (bytes(pos) == '\r' || bytes(pos) == '\n')) pos += 1

      private def parseOne(): Option[WarcRecord] = {
        skipPadding()
        if (pos >= bytes.length) return None
        val headerEnd = indexOfDoubleCrlf(bytes, pos)
        if (headerEnd < 0) return None
        val header = new String(bytes, pos, headerEnd - pos,
          StandardCharsets.UTF_8)
        val lines = header.split("\r\n")
        if (!lines.headOption.exists(_.startsWith("WARC/"))) return None
        val fields = lines.tail.flatMap { l =>
          val i = l.indexOf(':')
          if (i < 0) None else Some(l.take(i).trim.toLowerCase -> l.drop(i + 1).trim)
        }.toMap
        val len = fields.get("content-length").flatMap(_.toLongOption)
          .getOrElse(return None)
        val bodyStart = headerEnd + 4
        if (bodyStart + len > bytes.length) return None
        val wtype = fields.getOrElse("warc-type", "")
        val payload0 = java.util.Arrays.copyOfRange(bytes, bodyStart,
          (bodyStart + len).toInt)
        pos = (bodyStart + len).toInt
        val rec = wtype match {
          case "resource" =>
            Some(WarcRecord(fileName, idx, wtype,
              fields.get("warc-target-uri").orNull, payload0, corrupt = false))
          case "response" =>
            // strip the HTTP header block; a body-less response is empty
            val h = indexOfDoubleCrlf(payload0, 0)
            val body =
              if (h < 0) Array.emptyByteArray
              else java.util.Arrays.copyOfRange(payload0, h + 4, payload0.length)
            Some(WarcRecord(fileName, idx, wtype,
              fields.get("warc-target-uri").orNull, body, corrupt = false))
          case _ => None // warcinfo/request/metadata: skipped, not counted
        }
        idx += 1
        rec.orElse { parseOne() } // tail-skip non-payload record types
      }

      override def hasNext: Boolean = pending != null
      override def next(): WarcRecord = {
        val r = pending; advance(); r
      }
    }
  }

  private def indexOfDoubleCrlf(b: Array[Byte], from: Int): Int = {
    var i = from
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }

  private def isGzip(b: Array[Byte]): Boolean =
    b.length >= 2 && (b(0) & 0xff) == 0x1f && (b(1) & 0xff) == 0x8b

  /** Decompress a concatenated-member gzip stream (the Common Crawl
    * member-per-record layout) — JDK GZIPInputStream reads multi-member
    * streams natively.
    */
  private def gunzipAll(b: Array[Byte]): Array[Byte] = {
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(b))
    val out = new java.io.ByteArrayOutputStream(b.length * 4)
    val buf = new Array[Byte](64 << 10)
    try {
      var n = in.read(buf)
      while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
    } finally in.close()
    out.toByteArray
  }

  /** Read a directory of `.warc`/`.warc.gz` archives into
    * `(warc_file, rec_idx, warc_type, target_uri, content, corrupt)` —
    * whole-file units through the binaryFile source, parsed record-by-
    * record where the bytes live. Compose with
    * [[graft.text.CorpusClean.extractHtmlText]] +
    * [[graft.text.CorpusPipeline]] for the crawl-to-corpus chain.
    */
  def readWarc(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.warc*")
      .load(path)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, raw) => parse(p, raw) }
      .toDF()
  }

  /** Write `(urlCol, contentCol)` rows as WARC 1.1 `resource` records, one
    * archive per partition (`part-NNNNN.warc` + optional whole-file gzip),
    * via the same Hadoop-FS single-writer recipe as the segment writer.
    * `dateIso` is the WARC-Date stamped on every record — an explicit
    * parameter (not now()) so archives are byte-reproducible; record ids
    * derive from a content digest for the same reason. Returns the file
    * count.
    */
  def writeWarc(df: DataFrame, dir: String, urlCol: String,
                contentCol: String, dateIso: String = "2020-01-01T00:00:00Z",
                gzip: Boolean = false): Long = {
    val spark = df.sparkSession
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    import spark.implicits._
    val files = df.select(col(urlCol).cast("string"), col(contentCol))
      .as[(String, Array[Byte])]
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val name = f"part-$pid%05d.warc" + (if (gzip) ".gz" else "")
          val path = new org.apache.hadoop.fs.Path(dir, name)
          val fs = path.getFileSystem(conf.value)
          val raw = fs.create(path, true)
          val out =
            if (gzip) new java.util.zip.GZIPOutputStream(raw) else raw
          try {
            it.foreach { case (url, content0) =>
              val content =
                if (content0 == null) Array.emptyByteArray else content0
              val digest = java.security.MessageDigest.getInstance("SHA-256")
                .digest(content)
              val id = digest.take(16).map("%02x".format(_)).mkString
              val header =
                s"WARC/1.1\r\n" +
                  s"WARC-Type: resource\r\n" +
                  s"WARC-Record-ID: <urn:sha256:$id>\r\n" +
                  s"WARC-Date: $dateIso\r\n" +
                  (if (url != null) s"WARC-Target-URI: $url\r\n" else "") +
                  s"Content-Type: application/octet-stream\r\n" +
                  s"Content-Length: ${content.length}\r\n\r\n"
              out.write(header.getBytes(StandardCharsets.UTF_8))
              out.write(content)
              out.write(Crlf); out.write(Crlf)
            }
          } finally out.close()
          Iterator.single(name)
        }
      }
    files.count()
  }
}
