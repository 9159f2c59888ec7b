package graft.util

/** Shared mechanics of the exactly-once micro-batch commit protocol the
  * streaming index ingests use (IVF-PQ chunk index, BM25 postings index):
  * every batch's files land in the live partitioned layout under a
  * batch-tagged filename prefix, gated by a marker file —
  *
  *   marker check → scrub this tag's files → stage under `_staging/` →
  *   per-file rename into the layout → marker write → staging cleanup
  *
  * so a foreachBatch replay (at-least-once contract, same batchId) at ANY
  * crash point converges to the single-application state.
  *
  * `streamId` namespaces the tag. batchIds are only stable within ONE
  * streaming checkpoint lineage — a new checkpoint restarts at 0, and an
  * un-namespaced batch 0 would silently no-op against the old stream's
  * marker, DROPPING data. Every new checkpoint directory must therefore
  * carry its own streamId (concurrent streams into one index get distinct
  * namespaces the same way).
  */
object StreamCommit {

  /** Tag charset is restricted so tags parse unambiguously and never glob. */
  def requireValidStreamId(streamId: String): Unit =
    require(streamId.matches("[A-Za-z0-9_-]*"),
      s"streamId must match [A-Za-z0-9_-]*, got '$streamId'")

  /** Marker name / filename-prefix stem for one (streamId, batchId). */
  def tag(streamId: String, batchId: Long): String =
    if (streamId.isEmpty) s"b$batchId" else s"$streamId~b$batchId"

  /** Inverse of [[tag]]: (streamId, batchId), or None for foreign files. */
  def parseTag(name: String): Option[(String, Long)] = name match {
    case TagRe(sid, id) => Some((if (sid == null) "" else sid, id.toLong))
    case _              => None
  }
  private val TagRe = "^(?:([A-Za-z0-9_-]+)~)?b([0-9]+)$".r

  /** The batch tag a [[promote]] prefixed onto a data file's name —
    * `b3-part-...parquet` → `("", 3)` — or None for base files (Spark
    * part files start with `part-`, which can never parse as a tag:
    * the no-stream form requires a leading `b<digits>-` and the
    * streamId form requires a `~` before any `-`).
    */
  def tagOfFileName(name: String): Option[(String, Long)] = name match {
    case FileTagRe(sid, id) => Some((if (sid == null) "" else sid, id.toLong))
    case _                  => None
  }
  private val FileTagRe = "^(?:([A-Za-z0-9_-]+)~)?b([0-9]+)-.*".r

  /** True iff a data file belongs to the COMMITTED view of a
    * streaming-ingested layout: base files (no batch-tag prefix), files of
    * a batch whose marker is present, and files of a batch already FOLDED
    * into a stats sidecar — compaction deletes markers but promoted files
    * keep their tag prefix forever, so for those the folded watermark (not
    * marker presence) is the durable commit record. A batchId in the
    * sidecar's `removed` set OVERRIDES both: recording the removal intent
    * is the rollback's commit point ([[removeBatchGuarded]]), so a
    * recorded batch's leftover files (a rollback that crashed before its
    * scrub) are never committed, even while its marker lingers or after a
    * watermark folds across the gap. Layouts without a compacting sidecar
    * pass empty maps.
    */
  def isCommittedFile(name: String, markerTags: Set[String],
                      foldedWatermark: Map[String, Long],
                      removed: Map[String, Set[Long]] = Map.empty): Boolean =
    tagOfFileName(name) match {
      case None => true
      case Some((sid, id)) =>
        !removed.getOrElse(sid, Set.empty).contains(id) &&
          (markerTags.contains(tag(sid, id)) ||
            id <= foldedWatermark.getOrElse(sid, -1L))
    }

  /** The committed parquet data files under the given partition-directory
    * globs — the driver-side file pruning a committed-only serve snapshot
    * uses instead of a per-row `input_file_name()` filter (which would pay
    * a regex per scanned ROW; this pays one list per layout, and the file
    * count is base-files + one-ish per ingest batch — metadata-sized).
    * A half-promoted batch (files landed, marker not yet written, or
    * crashed before its marker) is invisible to the returned set.
    */
  def committedDataFiles(fs: org.apache.hadoop.fs.FileSystem,
                         globs: Seq[String], markerTags: Set[String],
                         foldedWatermark: Map[String, Long],
                         removed: Map[String, Set[Long]] = Map.empty)
      : Seq[String] =
    globs
      .flatMap { g =>
        Option(fs.globStatus(new org.apache.hadoop.fs.Path(g)))
          .getOrElse(Array.empty).toSeq
      }
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet") &&
        isCommittedFile(st.getPath.getName, markerTags, foldedWatermark,
          removed))
      .map(_.getPath.toString)

  def fs(spark: org.apache.spark.sql.SparkSession, path: String)
      : org.apache.hadoop.fs.FileSystem =
    org.apache.hadoop.fs.FileSystem.get(new java.net.URI(path),
      spark.sparkContext.hadoopConfiguration)

  /** Escape Hadoop-glob metacharacters so a literal path can be embedded
    * in a glob pattern — an index at a legal directory like `/data/idx[v2]`
    * must not have `[v2]` read as a character class (the scrub would then
    * silently miss a crashed attempt's files and the replay would land
    * duplicates). Tag names never need escaping (charset-restricted).
    */
  def escapeGlob(literal: String): String =
    literal.replaceAll("([\\\\*?\\[\\]{}])", "\\\\$1")

  /** Delete every file matching the globs — replay's first step removes
    * whatever subset of this tag's files a crashed attempt landed.
    * Callers pass the index path through [[escapeGlob]]; only the
    * partition-dir and tag-prefix wildcards stay live.
    */
  def scrub(fs: org.apache.hadoop.fs.FileSystem, globs: Seq[String]): Unit =
    globs.foreach { g =>
      Option(fs.globStatus(new org.apache.hadoop.fs.Path(g)))
        .getOrElse(Array.empty)
        .foreach(st => fs.delete(st.getPath, false))
    }

  /** Move every staged parquet file into the live layout, preserving the
    * partition-directory structure and prefixing the filename with
    * `prefix` (what makes the batch's files scrubbable on replay).
    */
  def promote(fs: org.apache.hadoop.fs.FileSystem, stagedRoot: String,
              targetRoot: String, prefix: String): Unit = {
    // qualify BOTH roots: listFiles returns scheme-qualified paths, and
    // URI.relativize against a schemeless base silently returns the input
    // unchanged — which would promote into a garbage destination
    val root = fs.makeQualified(new org.apache.hadoop.fs.Path(stagedRoot))
    val target = fs.makeQualified(new org.apache.hadoop.fs.Path(targetRoot))
    if (!fs.exists(root)) return
    val it = fs.listFiles(root, true)
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) {
        val rel = root.toUri.relativize(f.getPath.toUri).getPath
        require(!rel.startsWith("/"),
          s"cannot relativize ${f.getPath} against $root")
        val relDir = new org.apache.hadoop.fs.Path(rel).getParent
        val destDir =
          if (relDir == null) target
          else new org.apache.hadoop.fs.Path(target, relDir)
        fs.mkdirs(destDir)
        val dest = new org.apache.hadoop.fs.Path(destDir,
          prefix + f.getPath.getName)
        require(fs.rename(f.getPath, dest),
          s"promote rename failed: ${f.getPath} -> $dest")
      }
    }
  }

  /** Write the marker that commits the batch (its existence IS the
    * applied-ness of the tag; `body` may carry per-batch metadata, e.g.
    * BM25's stats delta). Written to a dot-temp name and renamed into
    * place: the marker's EXISTENCE is the commit, so a create-then-write
    * would expose a visible empty marker between the two — a crash there
    * would gate replays forever while the body (BM25's stats delta) was
    * never recorded, and a concurrent reader could fold a torn delta.
    * Dot-prefixed temps are harmless to [[listMarkers]] — its `*` glob
    * DOES match dot-files (Hadoop globStatus has no hidden-file rule), but
    * [[parseTag]] rejects the `.tag.tmp.x` shape — and never gate a
    * replay. A crash between the temp write and the rename leaves the
    * temp behind; this tag's replay reaches this function again and the
    * scrub below removes it, so temps never accumulate on a live stream
    * (abandoned streams' stragglers are swept by the stats compaction).
    */
  def writeMarker(fs: org.apache.hadoop.fs.FileSystem, path: String,
                  tagName: String, body: String = ""): Unit = {
    val marker = new org.apache.hadoop.fs.Path(
      s"$path/_stream_appends/$tagName")
    fs.mkdirs(marker.getParent)
    // tag names are charset-restricted ([[requireValidStreamId]]) so the
    // embedded tag never needs glob escaping; the layout path does
    scrub(fs, Seq(
      s"${escapeGlob(path)}/_stream_appends/.$tagName.tmp.*"))
    val tmp = new org.apache.hadoop.fs.Path(marker.getParent,
      s".$tagName.tmp.${java.util.UUID.randomUUID().toString.take(8)}")
    val os = fs.create(tmp, true)
    try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    require(fs.rename(tmp, marker), s"marker rename failed: $tmp -> $marker")
  }

  def markerExists(fs: org.apache.hadoop.fs.FileSystem, path: String,
                   tagName: String): Boolean =
    fs.exists(new org.apache.hadoop.fs.Path(s"$path/_stream_appends/$tagName"))

  /** Roll back one ingested batch — the administrative "remove a poisoned
    * batch" operation: delete the batch's marker FIRST (the commit point:
    * the batch stops being committed, its stats delta — if the layout
    * carries one in the marker — vanishes atomically with it, and
    * committed-only serves exclude it from here on), then scrub its
    * tagged data files from the layout. Crash between the two steps
    * leaves exactly the promoted-without-marker state every reader and
    * replay already handles (default serves see it transiently, the
    * at-least-once contract; committed-only serves never see it; a
    * re-run of this removal — or a re-ingest of the same tag — scrubs
    * the leftovers). Idempotent: removing an absent batch is a no-op
    * (returns false). Callers enforce layout-specific preconditions
    * (e.g. BM25 refuses batches already FOLDED into the base stats).
    * Reader contract: removal does NOT quiesce serves — a serve planned
    * before it fails loudly (FileNotFoundException) when executed after
    * the scrub, never silently serving a partial batch (spec-pinned).
    */
  def removeBatch(fs: org.apache.hadoop.fs.FileSystem, path: String,
                  tagName: String, dataGlobs: Seq[String]): Boolean = {
    val had = markerExists(fs, path, tagName)
    if (had)
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$path/_stream_appends/$tagName"), false)
    // scrub even when the marker was absent: a crashed earlier removal
    // (or a crashed pre-marker ingest) may have left data files behind
    scrub(fs, dataGlobs)
    had
  }

  /** Parsed `_ingest_watermarks.json`. `watermarks` maps streamId → highest
    * batchId stamped permanently committed by [[compactMarkers]];
    * `removed` records batchIds deliberately rolled back by
    * [[removeBatchGuarded]], so compaction can extend a watermark ACROSS an
    * intentional gap (an unrecorded gap still pins it — that is an
    * in-flight crash, and folding past it would stamp an uncommitted batch
    * committed forever). `version` and `writer` are the CAS fields guarding
    * the sidecar's two read-modify-writers (compact and removal), the same
    * discipline as the BM25 stats sidecar. Sidecars written before the
    * envelope existed (a bare `{sid: wm}` map) parse as version 0 with
    * empty `removed`.
    *
    * `removed` entries are KEPT, never pruned — the record is what makes a
    * crashed removal's re-run converge (idempotent no-op that finishes the
    * scrub) instead of hitting the permanently-committed refusal, and what
    * keeps a rollback's leftover files uncommitted ([[isCommittedFile]])
    * until something scrubs them. The growth bound is one long per
    * DELIBERATE rollback per stream: rollbacks are rare administrative
    * operations (each is a human decision to excise a poisoned batch), so
    * a sidecar carrying even thousands of them stays metadata-sized
    * (~10 bytes each), and a rebuild resets it. Pruning entries at or
    * below the watermark was considered and rejected: with the
    * intent-record-FIRST removal ordering, a recorded entry no longer
    * implies its scrub completed, so pruning could re-commit orphaned
    * files, and it would turn the documented crash recovery ("re-run the
    * removal") into a refusal.
    */
  private[graft] case class WmState(watermarks: Map[String, Long],
                                    removed: Map[String, Set[Long]],
                                    version: Long, writer: String)

  private[graft] def readWatermarkState(
      spark: org.apache.spark.sql.SparkSession, path: String): WmState = {
    val f = fs(spark, path)
    if (!f.exists(new org.apache.hadoop.fs.Path(
      s"$path/_ingest_watermarks.json")))
      return WmState(Map.empty, Map.empty, 0L, "")
    parseWatermarkState(Sidecar.read(spark, path, "_ingest_watermarks.json"))
  }

  private[graft] def parseWatermarkState(body: String): WmState = {
    import org.json4s._
    implicit val formats: Formats = DefaultFormats
    val j = org.json4s.jackson.JsonMethods.parse(body)
    (j \ "watermarks") match {
      case JObject(fields) =>
        val rem = (j \ "removed") match {
          case JObject(rf) => rf.map { case (k, v) =>
            k -> v.extract[Seq[Long]].toSet }.toMap
          case _ => Map.empty[String, Set[Long]]
        }
        WmState(fields.map { case (k, v) => k -> v.extract[Long] }.toMap,
          rem, (j \ "version").extractOpt[Long].getOrElse(0L),
          (j \ "writer").extractOpt[String].getOrElse(""))
      case _ => j match { // legacy bare-map format
        case JObject(fields) =>
          WmState(fields.map { case (k, v) => k -> v.extract[Long] }.toMap,
            Map.empty, 0L, "")
        case _ => WmState(Map.empty, Map.empty, 0L, "")
      }
    }
  }

  private def renderWatermarkState(watermarks: Map[String, Long],
                                   removed: Map[String, Set[Long]],
                                   version: Long, writer: String): String = {
    def jmap(fields: Seq[String]) = fields.mkString("{", ",", "}")
    val wm = jmap(watermarks.toSeq.sortBy(_._1)
      .map { case (k, v) => s"${Json.escape(k)}:$v" })
    val rm = jmap(removed.toSeq.sortBy(_._1).filter(_._2.nonEmpty)
      .map { case (k, v) =>
        s"${Json.escape(k)}:${v.toSeq.sorted.mkString("[", ",", "]")}" })
    s"""{"version":$version,"writer":${Json.escape(writer)},""" +
      s""""watermarks":$wm,"removed":$rm}"""
  }

  /** Commit a read-modify-write of the watermark sidecar with the same
    * cheap CAS check as [[graft.ann.Bm25]]'s `writeStatsCas`: the two
    * administrative RMW writers — [[compactMarkers]] and
    * [[removeBatchGuarded]] — are single-writer by deployment contract,
    * and this turns a violated contract into a LOUD failure on at least
    * one side (version re-read just before the rename; (version, nonce)
    * re-read just after it) plus an `ingest_watermark_cas_conflict_total`
    * bump, instead of a silently lost update. Not a lock: two writers
    * whose write+recheck windows fully interleave can still both pass —
    * the realistic overlap (two seconds-long admin ops) fails loudly.
    */
  private[graft] def writeWatermarksCas(
      spark: org.apache.spark.sql.SparkSession, path: String,
      expect: WmState, watermarks: Map[String, Long],
      removed: Map[String, Set[Long]], recoveryHint: String): Unit = {
    def conflict(what: String): Nothing = {
      graft.metrics.GraftCounters.inc("ingest_watermark_cas_conflict_total")
      throw new IllegalStateException(
        s"ingest watermark sidecar CAS conflict at $path: $what — a " +
          "concurrent administrative writer (compactMarkers / " +
          "remove-ingest-batch) violated the single-administrative-writer " +
          s"contract. Recovery: $recoveryHint")
    }
    val pre = readWatermarkState(spark, path)
    if (pre.version != expect.version)
      conflict(s"read version ${expect.version}, found ${pre.version} " +
        "before write")
    val nonce = java.util.UUID.randomUUID().toString
    Sidecar.write(spark, path, "_ingest_watermarks.json",
      renderWatermarkState(watermarks, removed, expect.version + 1, nonce))
    val post = readWatermarkState(spark, path)
    if (post.version != expect.version + 1 || post.writer != nonce)
      conflict(s"post-write readback saw version ${post.version} / writer " +
        s"'${post.writer}' where this writer committed " +
        s"${expect.version + 1} / '$nonce' — this update was overwritten")
  }

  /** Per-stream committed watermarks from `_ingest_watermarks.json`:
    * every batchId ≤ the watermark is committed (its marker was folded by
    * [[compactMarkers]] and deleted). Missing sidecar = nothing folded.
    */
  def readWatermarks(spark: org.apache.spark.sql.SparkSession,
                     path: String): Map[String, Long] =
    readWatermarkState(spark, path).watermarks

  /** Marker compaction for layouts WITHOUT a stats sidecar (the PQ/flat
    * chunk indexes; BM25 markers carry stats deltas and compact through
    * [[graft.ann.Bm25.compactStreamStats]] instead — bodied markers are
    * refused here so that path cannot be misused to LOSE deltas). Bounds
    * the committed-only serve's marker scan for long-lived streams: per
    * stream, the watermark extends over the CONTIGUOUS run above the
    * previous watermark in which every batchId has a marker OR is recorded
    * in the sidecar's `removed` set (a deliberate [[removeBatchGuarded]]
    * rollback) — batchIds within one checkpoint lineage are contiguous
    * from 0, so an UNRECORDED gap means an in-flight crash, and folding
    * past it would stamp an uncommitted batch committed forever. The
    * CAS-guarded sidecar write is the commit point ([[writeWatermarksCas]]
    * — a removal racing this compact fails loudly on at least one side);
    * marker deletion after it is idempotent (a surviving folded marker is
    * redundant with the watermark — both read paths agree — and the next
    * compact deletes it). A recorded-removed batch whose rollback crashed
    * between its intent record and its marker delete still has a marker:
    * folding across it deletes that marker too, and its leftover data
    * files stay uncommitted via the removed record ([[isCommittedFile]])
    * until a removal re-run scrubs them. The sidecar state is read BEFORE
    * the markers are listed, so a removal's intent record landing in
    * between moves the version and fails this compact's CAS — a stale
    * marker listing can never fold a rolled-back batch silently. Single
    * administrative writer per index, like every admin op. Returns the
    * new watermark map.
    */
  def compactMarkers(spark: org.apache.spark.sql.SparkSession,
                     path: String): Map[String, Long] = {
    // state FIRST, markers second (see scaladoc: the CAS catches a removal
    // that lands between the two reads)
    val st = readWatermarkState(spark, path)
    val markers = listMarkers(fs(spark, path), path)
    compactMarkersFrom(spark, path, st, markers)
  }

  /** The per-stream contiguous fold both sidecar families' compactions
    * share (ONE copy of the walk — the two compacts must never drift on
    * it): extend the watermark over the contiguous run above `from` in
    * which every batchId has a marker OR is recorded removed. batchIds
    * within one checkpoint lineage are contiguous from 0, so an
    * UNRECORDED gap means an in-flight crash and pins the fold — but a
    * stream that makes NO progress while holding unfolded markers is also
    * the signature of a lineage that does not start at 0 (a manual ingest
    * with 1-based ids), for which compaction would silently never bound
    * the marker scan; that case logs a warning naming the first missing
    * id and bumps `ingest_compact_pinned_total` so it is observable.
    */
  private[graft] def contiguousFold(path: String, streamId: String,
                                    from: Long, ids: Set[Long],
                                    removed: Set[Long]): Long = {
    var w = from
    while (ids.contains(w + 1) || removed.contains(w + 1)) w += 1
    if (w == from && ids.exists(_ > from)) {
      graft.metrics.GraftCounters.inc("ingest_compact_pinned_total")
      org.slf4j.LoggerFactory.getLogger("graft.util.StreamCommit").warn(
        s"compaction of stream '$streamId' at $path made no progress: " +
          s"batch ${from + 1} has no marker and no removal record while " +
          s"later batches (${ids.filter(_ > from).toSeq.sorted.take(5)
            .mkString(",")}...) wait unfolded — either an in-flight batch " +
          "(fold resumes when its marker lands), a crashed removal that " +
          "was never recorded (re-run remove-ingest-batch --missing-ok), " +
          "or a lineage whose batchIds do not start at 0 (unsupported: " +
          "compaction can never bound this stream's marker scan)")
    }
    w
  }

  /** The RMW half of [[compactMarkers]] — seam-exposed (pre-read state +
    * pre-listed markers injectable) so the spec can pin the
    * compact-vs-removal race orders deterministically.
    */
  private[graft] def compactMarkersFrom(
      spark: org.apache.spark.sql.SparkSession, path: String,
      st: WmState, markers: Seq[(String, Long, String)]): Map[String, Long] = {
    val f = fs(spark, path)
    require(markers.forall(_._3.isEmpty),
      s"$path has markers carrying metadata bodies (a BM25-style layout) " +
        "— use the layout's own stats compaction, not compactMarkers")
    val wm1 = st.watermarks ++ markers.groupBy(_._1).map { case (sid, ms) =>
      sid -> contiguousFold(path, sid, st.watermarks.getOrElse(sid, -1L),
        ms.map(_._2).toSet, st.removed.getOrElse(sid, Set.empty[Long]))
    }
    if (wm1 != st.watermarks)
      writeWatermarksCas(spark, path, st, wm1, st.removed,
        "re-run compactMarkers — it is idempotent; the conflicting " +
          "writer's update is the one on disk")
    markers
      .filter { case (sid, id, _) => id <= wm1.getOrElse(sid, -1L) }
      .foreach { case (sid, id, _) =>
        f.delete(new org.apache.hadoop.fs.Path(
          s"$path/_stream_appends/${tag(sid, id)}"), false)
      }
    wm1
  }

  /** [[removeBatch]] for watermark-compacted layouts (the PQ/flat chunk
    * indexes) — the full guarded rollback, INTENT-RECORD-FIRST.
    * MAINTENANCE WARNING: [[graft.ann.Bm25.removeIngestBatch]] mirrors
    * this sequencing against the delta-carrying BM25 stats sidecar — any
    * protocol change must land in both (IngestRaceSpec pins both
    * families' race orders and crash seams so a one-sided edit fails
    * tests). Protocol:
    *   1. pre-check: a batch already recorded removed is an idempotent
    *      no-op that finishes a crashed attempt's physical cleanup
    *      (lingering marker deleted, leftover files scrubbed); a batch at
    *      or below the watermark and NOT recorded removed is permanently
    *      committed — refuse loudly; a batch with NO trace at all (no
    *      marker, no data files) is refused unless `allowMissing` —
    *      recording a never-ingested batchId would permanently refuse its
    *      future apply;
    *   2. CAS-record the batchId in the sidecar's `removed` set — THE
    *      COMMIT POINT of the removal, and the whole race guard: a
    *      concurrent [[compactMarkers]] that committed between the state
    *      read and this write moves the version and fails THIS CAS with
    *      NOTHING yet mutated (re-run; if the batch is now below the
    *      watermark it was concurrently folded — the loud
    *      "concurrently compacted" failure, files intact, still served
    *      correctly, rebuild to remove); and a compact that reads state
    *      AFTER this write sees the recorded removal, so its fold skips
    *      the batch and extends the watermark across the deliberate gap.
    *      This ordering closes the pre-r14 residual where a stale compact
    *      could win the CAS race after the scrub and stamp a scrubbed
    *      batch committed — now every mutation happens strictly after the
    *      version bump that any stale compact must fail against;
    *   3. delete the marker;
    *   4. scrub the batch's tagged data files. A crash anywhere after
    *      step 2 leaves a recorded removal whose re-run (step 1's no-op
    *      arm) converges; until the scrub completes, the recorded entry
    *      keeps the leftovers out of every committed serve
    *      ([[isCommittedFile]]) while default serves may see them
    *      transiently (the documented at-least-once mode).
    * Re-ingesting a removed batchId is REFUSED by the apply paths
    * ([[refuseReplayOfRemoved]]) — a replay must not resurrect a
    * deliberate rollback; fixed data re-ingests under a fresh batchId.
    * Reader contract (serve-vs-rollback): rollback does NOT quiesce
    * serves. A serve planned before the rollback holds a file listing and
    * fails LOUDLY (FileNotFoundException) when executed after the scrub —
    * it never silently serves a partial batch. Deployments quiesce
    * serving around rollbacks or treat the failure as a retry signal.
    */
  private[graft] def removeBatchGuarded(
      spark: org.apache.spark.sql.SparkSession, path: String,
      streamId: String, batchId: Long, dataGlobs: Seq[String],
      afterPreCheck: () => Unit = () => (),
      afterMarkerDelete: () => Unit = () => (),
      allowMissing: Boolean = false): Boolean = {
    requireValidStreamId(streamId)
    val f = fs(spark, path)
    val st0 = readWatermarkState(spark, path)
    val tagName = tag(streamId, batchId)
    if (st0.removed.getOrElse(streamId, Set.empty).contains(batchId)) {
      // finish a crashed earlier attempt: the intent record IS the
      // removal's commit point, so complete the physical cleanup
      if (markerExists(f, path, tagName))
        f.delete(new org.apache.hadoop.fs.Path(
          s"$path/_stream_appends/$tagName"), false)
      scrub(f, dataGlobs)
      return false
    }
    if (batchId <= st0.watermarks.getOrElse(streamId, -1L))
      throw new IllegalStateException(
        s"ingest batch $batchId of stream '$streamId' at $path is at or " +
          s"below the marker-compaction watermark " +
          s"(${st0.watermarks.getOrElse(streamId, -1L)}) — compacted " +
          "batches are permanently committed; rebuild the index instead")
    // refuse to record a removal for a batch with NO trace (no marker, no
    // data files): batchIds are engine-assigned and contiguous, so a
    // recorded removal of a NOT-YET-ingested id would permanently refuse
    // that id's future apply ([[refuseReplayOfRemoved]]) — a fat-fingered
    // `remove-ingest-batch 7` (meant 1) would otherwise brick the stream
    // when micro-batch 7 arrives. allowMissing=true is the explicit
    // override for the one legitimate traceless case: residue of a
    // PRE-intent-record crashed removal (marker and files already gone,
    // the watermark pinned at the unrecorded gap) that needs the removal
    // recorded to let compaction fold across it.
    if (!allowMissing &&
      !markerExists(f, path, tag(streamId, batchId)) &&
      dataGlobs.forall(g =>
        Option(f.globStatus(new org.apache.hadoop.fs.Path(g)))
          .getOrElse(Array.empty).isEmpty))
      throw new IllegalArgumentException(
        s"ingest batch $batchId of stream '$streamId' at $path has no " +
          "marker and no data files — nothing to remove. If this batchId " +
          "was never ingested, recording its removal would permanently " +
          "refuse its future apply (batchIds are engine-assigned); if it " +
          "is the residue of a pre-r14 removal that crashed after its " +
          "scrub but before recording (watermark pinned at the gap), " +
          "re-run with allowMissing/--missing-ok to record it")
    afterPreCheck()
    try {
      writeWatermarksCas(spark, path, st0, st0.watermarks,
        st0.removed + (streamId ->
          (st0.removed.getOrElse(streamId, Set.empty) + batchId)),
        "nothing is mutated yet (the intent record is the removal's FIRST " +
          s"write) — re-run remove-ingest-batch $batchId (idempotent)")
    } catch {
      case e: IllegalStateException =>
        val now = readWatermarkState(spark, path)
        if (batchId <= now.watermarks.getOrElse(streamId, -1L) &&
          !now.removed.getOrElse(streamId, Set.empty).contains(batchId))
          throw new IllegalStateException(
            s"ingest batch $batchId of stream '$streamId' at $path was " +
              "concurrently compacted to permanently-committed (a compact " +
              "committed between this removal's state read and its intent " +
              "record — single-administrative-writer contract violated). " +
              "Its data files were NOT scrubbed: the index still serves " +
              "the batch correctly; rebuild the index to remove it", e)
        throw e
    }
    val had = markerExists(f, path, tagName)
    if (had)
      f.delete(new org.apache.hadoop.fs.Path(
        s"$path/_stream_appends/$tagName"), false)
    afterMarkerDelete()
    scrub(f, dataGlobs)
    had
  }

  /** Apply-side replay gate shared by the streaming-ingest apply paths:
    * returns true (skip — the batch is already committed AND folded; its
    * marker was deleted by compaction, so the marker-existence gate alone
    * would wrongly re-apply it) for a batchId at or below the stream's
    * watermark, and REFUSES loudly a batchId recorded as deliberately
    * removed — an at-least-once replay (or a manual re-ingest) of a
    * rolled-back batch would silently resurrect data an administrator
    * excised (the recorded removal makes its files uncommitted forever,
    * so the re-applied data would be half-visible at best). Fixed data
    * re-ingests under a FRESH batchId (or a fresh streamId/checkpoint).
    */
  private[graft] def refuseReplayOfRemoved(
      watermarks: Map[String, Long], removed: Map[String, Set[Long]],
      streamId: String, batchId: Long, path: String): Boolean = {
    if (removed.getOrElse(streamId, Set.empty).contains(batchId))
      throw new IllegalStateException(
        s"ingest batch $batchId of stream '$streamId' at $path was " +
          "deliberately rolled back (recorded in the sidecar's removed " +
          "set) — re-applying it would resurrect an excised batch. " +
          "Re-ingest corrected data under a fresh batchId or streamId")
    batchId <= watermarks.getOrElse(streamId, -1L)
  }

  /** All markers under the layout: (streamId, batchId, marker body). */
  def listMarkers(fs: org.apache.hadoop.fs.FileSystem, path: String)
      : Seq[(String, Long, String)] =
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(
      s"${escapeGlob(path)}/_stream_appends/*"))).getOrElse(Array.empty).toSeq
      .flatMap { st =>
        parseTag(st.getPath.getName).map { case (sid, id) =>
          val in = fs.open(st.getPath)
          val body = new String(
            try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
            finally in.close(),
            java.nio.charset.StandardCharsets.UTF_8)
          (sid, id, body)
        }
      }
}
