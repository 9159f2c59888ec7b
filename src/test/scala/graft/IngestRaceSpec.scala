package graft

import org.apache.spark.sql.functions._
import graft.ann.{Bm25, Retrieval}
import graft.util.StreamCommit

/** The ingest-protocol admin races: marker compaction vs batch rollback on
  * both sidecar families (the dense layouts' `_ingest_watermarks.json`, the
  * BM25 stats sidecar), in BOTH interleaving orders — each must fail LOUDLY
  * on at least one side instead of silently stamping a scrubbed batch
  * permanently committed (or folding its stats delta). Plus the
  * serve-vs-rollback reader contract and the one-snapshot-per-serve-call
  * coherence of the committed-only dense serve.
  */
class IngestRaceSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(lo: Long, hi: Long, word: String) =
    (lo until hi).map(i => (i, s"$word w$i rho " * 18)).toDF("doc_id", "text")

  test("dense race, removal-then-stale-compact: a compact whose marker listing predates a rollback fails its CAS loudly; a fresh compact extends the watermark ACROSS the recorded removal") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race1").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rca"), path, nLists = 4,
        fitBudget = 48)
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rca"), path,
        batchId = 0L, streamId = "r1"))
      assert(Retrieval.applyChunkIngestBatch(mkDocs(50, 60, "rca"), path,
        batchId = 1L, streamId = "r1"))
      val fs = StreamCommit.fs(spark, path)
      // the doomed compact reads its state and lists markers FIRST...
      val staleState = StreamCommit.readWatermarkState(spark, path)
      val staleMarkers = StreamCommit.listMarkers(fs, path)
      assert(staleMarkers.map(_._2).sorted == Seq(0L, 1L))
      // ...then the rollback completes (marker delete, scrub, recorded)
      assert(Retrieval.removeChunkIngestBatch(spark, path, batchId = 1L,
        streamId = "r1"))
      val afterRemove = StreamCommit.readWatermarkState(spark, path)
      assert(afterRemove.removed == Map("r1" -> Set(1L)))
      assert(afterRemove.version == staleState.version + 1,
        "a rollback must bump the sidecar version (that IS the guard)")
      // the stale compact would stamp the scrubbed batch 1 committed — its
      // CAS must fail loudly and leave the sidecar untouched
      val c0 = graft.metrics.GraftCounters
        .get("ingest_watermark_cas_conflict_total")
      val ex = intercept[IllegalStateException] {
        StreamCommit.compactMarkersFrom(spark, path, staleState, staleMarkers)
      }
      assert(ex.getMessage.contains("CAS conflict"))
      assert(graft.metrics.GraftCounters
        .get("ingest_watermark_cas_conflict_total") == c0 + 1)
      assert(StreamCommit.readWatermarkState(spark, path) == afterRemove)
      // batch 0's marker must survive (the failed compact deletes nothing)
      assert(StreamCommit.listMarkers(fs, path).map(_._2) == Seq(0L))
      // a FRESH compact folds batch 0 and extends the watermark across the
      // deliberately removed batch 1 — a rollback no longer pins the
      // watermark (and with it the committed serve's marker scan) forever
      assert(StreamCommit.compactMarkers(spark, path) == Map("r1" -> 1L))
      assert(StreamCommit.listMarkers(fs, path).isEmpty)
      // later batches keep folding past the gap
      assert(Retrieval.applyChunkIngestBatch(mkDocs(60, 70, "rca"), path,
        batchId = 2L, streamId = "r1"))
      assert(StreamCommit.compactMarkers(spark, path) == Map("r1" -> 2L))
      // committed serve sees folded batches 0 and 2, never the removed 1
      val qs = Seq((7L, "rca w7 rho"), (47L, "rca w47 rho"),
        (57L, "rca w57 rho"), (67L, "rca w67 rho")).toDF("query_id", "text")
      val served = Retrieval.retrieveFromChunkIndex(spark, path, qs, k = 4,
          nProbe = 4, committedOnly = true)
        .select("query_id", "doc_id").as[(Long, Long)].collect().toSeq
      assert(served.exists(_._2 >= 60L) && served.exists(_._2 < 50L))
      assert(!served.exists(r => r._2 >= 50L && r._2 < 60L),
        "the removed batch must stay invisible after folding past it")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("dense race, compact-inside-removal: the intent-record CAS fails the rollback loudly BEFORE any mutation (the batch stays correctly served, nothing scrubbed)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race2").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rcb"), path, nLists = 4,
        fitBudget = 48)
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rcb"), path,
        batchId = 0L, streamId = "r2"))
      val qs = Seq((7L, "rcb w7 rho"), (47L, "rcb w47 rho"))
        .toDF("query_id", "text")
      def serveCommitted() = Retrieval.retrieveFromChunkIndex(spark, path,
          qs, k = 4, nProbe = 4, committedOnly = true)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      val before = serveCommitted()
      assert(before.exists(_._3 >= 40L), "fixture: batch 0 must be served")
      val tag = StreamCommit.tag("r2", 0L)
      val glob = s"${StreamCommit.escapeGlob(path)}/list=*/$tag-*"
      val c0 = graft.metrics.GraftCounters
        .get("ingest_watermark_cas_conflict_total")
      // the compact lands between the removal's state read and its intent
      // record — the removal's CAS must fail against the moved version and
      // abort with NOTHING mutated (intent-first: the record is write #1)
      val ex = intercept[IllegalStateException] {
        StreamCommit.removeBatchGuarded(spark, path, "r2", 0L, Seq(glob),
          afterPreCheck =
            () => StreamCommit.compactMarkers(spark, path))
      }
      assert(ex.getMessage.contains("concurrently compacted"))
      assert(StreamCommit.readWatermarkState(spark, path).removed.isEmpty,
        "the failed removal must not have recorded its intent")
      assert(graft.metrics.GraftCounters
        .get("ingest_watermark_cas_conflict_total") == c0 + 1)
      // nothing scrubbed: the batch's files are intact and the committed
      // serve (now via the watermark) is unchanged
      val fs = StreamCommit.fs(spark, path)
      assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(glob)))
        .getOrElse(Array.empty).nonEmpty,
        "the aborted rollback must not scrub the batch's files")
      assert(serveCommitted() == before)
      // the batch is permanently committed now — a re-run refuses cleanly
      val ex2 = intercept[IllegalStateException] {
        Retrieval.removeChunkIngestBatch(spark, path, batchId = 0L,
          streamId = "r2")
      }
      assert(ex2.getMessage.contains("watermark"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("dense rollback: re-remove of a recorded-removed batch is an idempotent no-op, even after the watermark folded past it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race3").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rcc"), path, nLists = 4,
        fitBudget = 48)
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rcc"), path,
        batchId = 0L, streamId = "r3"))
      assert(Retrieval.applyChunkIngestBatch(mkDocs(50, 60, "rcc"), path,
        batchId = 1L, streamId = "r3"))
      assert(Retrieval.removeChunkIngestBatch(spark, path, batchId = 1L,
        streamId = "r3"))
      assert(!Retrieval.removeChunkIngestBatch(spark, path, batchId = 1L,
        streamId = "r3"), "second removal is a recorded no-op")
      assert(StreamCommit.compactMarkers(spark, path) == Map("r3" -> 1L))
      // even below the watermark, a RECORDED removal re-runs as a no-op
      // instead of the permanently-committed refusal
      assert(!Retrieval.removeChunkIngestBatch(spark, path, batchId = 1L,
        streamId = "r3"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("bm25 race, compact-inside-removal: the intent-record CAS aborts the rollback loudly with postings intact and stats consistent") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race4").toFile
    val path = dir.getAbsolutePath
    try {
      val seed = mkDocs(0, 40, "rcd")
      val b0 = mkDocs(40, 50, "rcd")
      Bm25.writeIndex(seed, path, nBuckets = 8)
      assert(Bm25.applyIngestBatch(b0, path, batchId = 0L, streamId = "r4"))
      val qs = Seq((7L, "rcd w7 rho"), (47L, "rcd w47 rho"))
        .toDF("query_id", "text")
      def serve(committed: Boolean) = Bm25.retrieveFromIndex(spark, path,
          qs, k = 5, committedOnly = committed)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      val truth = Bm25.topK(seed.unionByName(b0), qs, k = 5)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      assert(serve(committed = true) == truth)
      val c0 = graft.metrics.GraftCounters.get("bm25_stats_cas_conflict_total")
      val ex = intercept[IllegalStateException] {
        Bm25.removeIngestBatch(spark, path, batchId = 0L, streamId = "r4",
          afterPreCheck = () => Bm25.compactStreamStats(spark, path))
      }
      assert(ex.getMessage.contains("concurrently folded"))
      assert(Bm25.readStats(spark, path).removed.isEmpty,
        "the failed removal must not have recorded its intent")
      assert(graft.metrics.GraftCounters
        .get("bm25_stats_cas_conflict_total") == c0 + 1)
      // postings intact, delta folded into base: both serve modes still
      // rank exactly the union corpus
      assert(serve(committed = true) == truth)
      assert(serve(committed = false) == truth)
      // and the batch is now permanently folded — re-removal refuses
      val ex2 = intercept[IllegalStateException] {
        Bm25.removeIngestBatch(spark, path, batchId = 0L, streamId = "r4")
      }
      assert(ex2.getMessage.contains("folded"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("bm25 race, removal-then-stale-compact: a clean rollback bumps the stats version, so a compact holding the pre-delete marker listing fails its CAS instead of folding the scrubbed delta") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race5").toFile
    val path = dir.getAbsolutePath
    try {
      Bm25.writeIndex(mkDocs(0, 40, "rce"), path, nBuckets = 8)
      assert(Bm25.applyIngestBatch(mkDocs(40, 50, "rce"), path,
        batchId = 0L, streamId = "r5"))
      // the doomed compact's RMW reads the stats (version v)...
      val stale = Bm25.readStats(spark, path)
      val staleMarkers = StreamCommit.listMarkers(
        StreamCommit.fs(spark, path), path)
      assert(staleMarkers.nonEmpty)
      // ...the rollback completes (marker deleted, postings scrubbed,
      // version bumped — the bump IS the guard)
      assert(Bm25.removeIngestBatch(spark, path, batchId = 0L,
        streamId = "r5"))
      val afterRemove = Bm25.readStats(spark, path)
      assert(afterRemove.version == stale.version + 1)
      assert(afterRemove.nDocs == stale.nDocs,
        "rollback must not change the base counts")
      // the stale compact's write (base + the scrubbed batch's delta, as
      // compactStreamStats would compute from its stale listing) must fail
      val delta = graft.util.Sidecar.requiredLong(staleMarkers.head._3,
        "n_docs", "test marker")
      val ex = intercept[IllegalStateException] {
        Bm25.writeStatsCas(spark, path, stale, stale.nDocs + delta,
          stale.totalTokens, stale.folded + ("r5" -> 0L), stale.removed,
          "test hint")
      }
      assert(ex.getMessage.contains("CAS conflict"))
      assert(Bm25.readStats(spark, path) == afterRemove,
        "the stale fold must not land")
      // the REAL compact path, run fresh, is a safe no-op (marker gone)
      Bm25.compactStreamStats(spark, path)
      assert(Bm25.readStats(spark, path).nDocs == stale.nDocs)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("serve-vs-rollback reader contract: a committed serve planned before a rollback fails LOUDLY when executed after it — never a silent partial result") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race6").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rcf"), path, nLists = 4,
        fitBudget = 48)
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rcf"), path,
        batchId = 0L, streamId = "r6"))
      val qs = Seq((7L, "rcf w7 rho"), (47L, "rcf w47 rho"))
        .toDF("query_id", "text")
      // plan (and file-list) the serve BEFORE the rollback
      val planned = Retrieval.retrieveFromChunkIndex(spark, path, qs, k = 4,
        nProbe = 4, committedOnly = true)
      assert(Retrieval.removeChunkIngestBatch(spark, path, batchId = 0L,
        streamId = "r6"))
      val ex = intercept[Throwable] { planned.collect() }
      val chain = Iterator.iterate(ex)(_.getCause).takeWhile(_ != null)
        .take(10).toSeq
      assert(chain.exists(e =>
        e.getClass.getName.contains("FileNotFound") ||
          String.valueOf(e.getMessage).toLowerCase.contains("does not exist") ||
          String.valueOf(e.getMessage).contains("FileNotFound")),
        s"expected a loud missing-file failure, got: $ex")
      // a serve planned AFTER the rollback is correct (pre-batch corpus)
      val fresh = Retrieval.retrieveFromChunkIndex(spark, path, qs, k = 4,
          nProbe = 4, committedOnly = true)
        .select("doc_id").as[Long].collect()
      assert(fresh.nonEmpty && fresh.forall(_ < 40L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("committed PQ serve takes ONE marker snapshot per logical call: every query shard of an over-gate serve sees the same index view") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race7").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndexPq(mkDocs(0, 40, "rcg"), path, nLists = 4,
        m = 5, ksub = 16, fitBudget = 48)
      assert(Retrieval.applyPqIngestBatch(mkDocs(40, 50, "rcg"), path,
        batchId = 0L, streamId = "r7"))
      val qs = Seq((7L, "rcg w7 rho"), (47L, "rcg w47 rho"),
        (57L, "rcg w57 rho")).toDF("query_id", "text")
      def collect(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("query_id", "rank")
          .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      // snapshot the index view WITH batch 0 committed...
      val snap0 = Retrieval.committedSnapshotOf(spark, path)
      val view0 = collect(Retrieval.retrieveFromChunkIndexPq(spark, path,
        qs, k = 4, nProbe = 4, shortlist = 100000, committedOnly = true))
      // ...then a second batch commits (marker lands, files promoted).
      // Its docs DUPLICATE the base texts under new ids ≥ 50: identical
      // text → identical chunk embeddings → score ties right behind every
      // base hit, so batch-1 visibility changes the top-k DETERMINISTICALLY
      // (hash embeddings carry no semantics to rely on otherwise)
      val dupBatch = (50L until 90L).map(i =>
        (i, s"rcg w${i - 50} rho " * 18)).toDF("doc_id", "text")
      assert(Retrieval.applyPqIngestBatch(dupBatch, path,
        batchId = 1L, streamId = "r7"))
      // an over-gate serve pinned to snap0 recurses through query shards;
      // every shard must serve the snap0 view — batch 1 invisible in all
      // of them even though its marker is on disk at file-listing time
      val sharded = collect(Retrieval.retrievePqWithSnapshot(spark, path,
        qs, k = 4, nProbe = 4, shortlist = 100000, dim = 4, salt = "emb",
        textCol = "text", exactRerank = true, maxQueries = 1L,
        collectGate = 200000L, snapshot = Some(snap0)))
      assert(sharded == view0,
        "shards must share the one per-call snapshot (no batch-1 rows)")
      assert(!sharded.exists(_._3 >= 50L))
      // a FRESH committed serve (new call, new snapshot) does see batch 1
      val fresh = collect(Retrieval.retrieveFromChunkIndexPq(spark, path,
        qs, k = 4, nProbe = 4, shortlist = 100000, committedOnly = true))
      assert(fresh.exists(_._3 >= 50L))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("bm25 crash-then-compact: a removal dying between marker delete and scrub cannot be resurrected — the intent record keeps the orphans uncommitted, the compact folds ACROSS without the delta and finishes the scrub, and the re-run converges") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race9").toFile
    val path = dir.getAbsolutePath
    try {
      val seed = mkDocs(0, 40, "rch")
      val b0 = mkDocs(40, 50, "rch")
      val b1 = mkDocs(50, 60, "rch")
      val b2 = mkDocs(60, 70, "rch")
      Bm25.writeIndex(seed, path, nBuckets = 8)
      assert(Bm25.applyIngestBatch(b0, path, batchId = 0L, streamId = "r9"))
      assert(Bm25.applyIngestBatch(b1, path, batchId = 1L, streamId = "r9"))
      assert(Bm25.applyIngestBatch(b2, path, batchId = 2L, streamId = "r9"))
      val qs = Seq((7L, "rch w7 rho"), (47L, "rch w47 rho"),
        (57L, "rch w57 rho"), (67L, "rch w67 rho")).toDF("query_id", "text")
      def serve(committed: Boolean) = Bm25.retrieveFromIndex(spark, path,
          qs, k = 5, committedOnly = committed)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      val truth = Bm25.topK(seed.unionByName(b0).unionByName(b2), qs, k = 5)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long, Long, Double)].collect().toSeq
      // the removal of batch 1 CRASHES between its marker delete and its
      // scrub: intent recorded, marker gone (delta died with it), posting
      // files orphaned in the layout — the exact pre-r14 poison state
      val boom = new RuntimeException("crash before scrub")
      assert(intercept[RuntimeException] {
        Bm25.removeIngestBatch(spark, path, batchId = 1L, streamId = "r9",
          afterMarkerDelete = () => throw boom)
      } eq boom)
      val fs = StreamCommit.fs(spark, path)
      val orphanGlob = new org.apache.hadoop.fs.Path(
        s"$path/bucket=*/r9~b1-*")
      assert(Option(fs.globStatus(orphanGlob)).getOrElse(Array.empty)
        .nonEmpty, "fixture: the crash must leave orphaned posting files")
      assert(Bm25.readStats(spark, path).removed == Map("r9" -> Set(1L)))
      // the orphans are uncommitted NOW: the committed serve ranks exactly
      // the corpus minus batch 1, stats matching the scanned postings
      assert(serve(committed = true) == truth)
      // the compact folds the contiguous markers-or-removed run {0,rm(1),2}
      // to watermark 2 WITHOUT batch 1's delta — pre-r14 the per-stream-MAX
      // fold here permanently committed the orphans with no delta — and
      // finishes the crashed removal's scrub
      Bm25.compactStreamStats(spark, path)
      val st = Bm25.readStats(spark, path)
      assert(st.folded == Map("r9" -> 2L))
      assert(st.removed == Map("r9" -> Set(1L)),
        "the removal record must survive compaction (it IS the convergence)")
      assert(st.nDocs == Bm25.corpusStats(
        seed.unionByName(b0).unionByName(b2))._1,
        "the folded base stats must not carry the removed batch's delta")
      assert(Option(fs.globStatus(orphanGlob)).getOrElse(Array.empty).isEmpty,
        "the compact must finish the crashed removal's scrub")
      // batch 1 is invisible in BOTH serve modes
      assert(serve(committed = true) == truth)
      assert(serve(committed = false) == truth)
      // the re-run removal CONVERGES (idempotent no-op) instead of
      // throwing "already folded" — the recorded intent distinguishes a
      // rolled-back batch from a genuinely folded one forever
      assert(!Bm25.removeIngestBatch(spark, path, batchId = 1L,
        streamId = "r9"))
      // and a replay cannot resurrect the excised batch
      val ex = intercept[IllegalStateException] {
        Bm25.applyIngestBatch(b1, path, batchId = 1L, streamId = "r9")
      }
      assert(ex.getMessage.contains("rolled back"))
      assert(serve(committed = false) == truth)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("dense crash-then-compact: a removal dying between marker delete and scrub stays excised — orphans uncommitted via the record, compact folds across, re-run converges, replay refused") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race10").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rci"), path, nLists = 4,
        fitBudget = 48)
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rci"), path,
        batchId = 0L, streamId = "ra"))
      assert(Retrieval.applyChunkIngestBatch(mkDocs(50, 60, "rci"), path,
        batchId = 1L, streamId = "ra"))
      val glob = s"${StreamCommit.escapeGlob(path)}/list=*/ra~b1-*"
      val boom = new RuntimeException("crash before scrub")
      assert(intercept[RuntimeException] {
        StreamCommit.removeBatchGuarded(spark, path, "ra", 1L, Seq(glob),
          afterMarkerDelete = () => throw boom)
      } eq boom)
      val fs = StreamCommit.fs(spark, path)
      assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(glob)))
        .getOrElse(Array.empty).nonEmpty,
        "fixture: the crash must leave orphaned data files")
      // committed serve excludes the orphans via the removed record even
      // though no watermark covers them yet
      val qs = Seq((7L, "rci w7 rho"), (47L, "rci w47 rho"),
        (57L, "rci w57 rho")).toDF("query_id", "text")
      def servedIds() = Retrieval.retrieveFromChunkIndex(spark, path, qs,
          k = 4, nProbe = 4, committedOnly = true)
        .select("doc_id").as[Long].collect().toSeq
      assert(!servedIds().exists(id => id >= 50L && id < 60L))
      // compact folds ACROSS the recorded removal; the record survives
      assert(StreamCommit.compactMarkers(spark, path) == Map("ra" -> 1L))
      val st = StreamCommit.readWatermarkState(spark, path)
      assert(st.removed == Map("ra" -> Set(1L)))
      assert(!servedIds().exists(id => id >= 50L && id < 60L),
        "folding across the gap must not commit the orphans")
      // re-run converges: finishes the scrub, returns false
      assert(!Retrieval.removeChunkIngestBatch(spark, path, batchId = 1L,
        streamId = "ra"))
      assert(Option(fs.globStatus(new org.apache.hadoop.fs.Path(glob)))
        .getOrElse(Array.empty).isEmpty,
        "the re-run must finish the crashed removal's scrub")
      // a replay of the excised batch refuses loudly
      val ex = intercept[IllegalStateException] {
        Retrieval.applyChunkIngestBatch(mkDocs(50, 60, "rci"), path,
          batchId = 1L, streamId = "ra")
      }
      assert(ex.getMessage.contains("rolled back"))
      // a FOLDED (never removed) batch replays as a clean no-op
      assert(!Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rci"), path,
        batchId = 0L, streamId = "ra"))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("no-trace removal guard: a never-ingested batchId refuses loudly (recording it would brick the stream's future apply); --missing-ok records it and compaction folds across") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race11").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rcj"), path, nLists = 4,
        fitBudget = 48)
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rcj"), path,
        batchId = 0L, streamId = "rb"))
      // fat-fingered removal of a batch that does not exist: refuse, and
      // record NOTHING — the stream must still be able to apply batch 7
      val ex = intercept[IllegalArgumentException] {
        Retrieval.removeChunkIngestBatch(spark, path, batchId = 7L,
          streamId = "rb")
      }
      assert(ex.getMessage.contains("nothing to remove"))
      assert(StreamCommit.readWatermarkState(spark, path).removed.isEmpty)
      // same guard on the BM25 sidecar
      val bdir = java.nio.file.Files.createTempDirectory("graft_race11b")
        .toFile
      try {
        Bm25.writeIndex(mkDocs(0, 40, "rcj"), bdir.getAbsolutePath,
          nBuckets = 8)
        val exB = intercept[IllegalArgumentException] {
          Bm25.removeIngestBatch(spark, bdir.getAbsolutePath, batchId = 3L,
            streamId = "rb")
        }
        assert(exB.getMessage.contains("nothing to remove"))
        assert(Bm25.readStats(spark, bdir.getAbsolutePath).removed.isEmpty)
      } finally org.apache.commons.io.FileUtils.deleteDirectory(bdir)
      // the legitimate traceless case — pre-intent-record crash residue
      // (marker and files long gone, watermark pinned at the gap):
      // --missing-ok records the removal and compaction folds across it
      assert(Retrieval.applyChunkIngestBatch(mkDocs(50, 60, "rcj"), path,
        batchId = 2L, streamId = "rb"))   // batch 1 "vanished" pre-record
      assert(StreamCommit.compactMarkers(spark, path) == Map("rb" -> 0L),
        "the unrecorded gap at batch 1 must pin the watermark")
      assert(!Retrieval.removeChunkIngestBatch(spark, path, batchId = 1L,
        streamId = "rb", allowMissing = true))
      assert(StreamCommit.compactMarkers(spark, path) == Map("rb" -> 2L),
        "the recorded removal must unpin the fold")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("contiguous-fold no-progress signal: a lineage whose batchIds do not start at 0 bumps ingest_compact_pinned_total instead of silently never compacting") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race12").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rck"), path, nLists = 4,
        fitBudget = 48)
      // 1-based manual ingest: batch 0 never exists in this lineage
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rck"), path,
        batchId = 1L, streamId = "rc"))
      val c0 = graft.metrics.GraftCounters.get("ingest_compact_pinned_total")
      assert(StreamCommit.compactMarkers(spark, path)
        .getOrElse("rc", -1L) == -1L,
        "an unrecorded batch-0 gap must pin the fold (safety first)")
      assert(graft.metrics.GraftCounters
        .get("ingest_compact_pinned_total") == c0 + 1,
        "the permanently-pinned stream must be observable, not silent")
      // a fold that DOES progress does not bump the counter
      assert(Retrieval.applyChunkIngestBatch(mkDocs(50, 60, "rck"), path,
        batchId = 0L, streamId = "rc"))
      val c1 = graft.metrics.GraftCounters.get("ingest_compact_pinned_total")
      assert(StreamCommit.compactMarkers(spark, path) == Map("rc" -> 1L))
      assert(graft.metrics.GraftCounters
        .get("ingest_compact_pinned_total") == c1)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("per-stream independence: one stream's fold and removal records never gate another stream's batches of the same ids") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race13").toFile
    val path = dir.getAbsolutePath
    try {
      Retrieval.writeChunkIndex(mkDocs(0, 40, "rcl"), path, nLists = 4,
        fitBudget = 48)
      assert(Retrieval.applyChunkIngestBatch(mkDocs(40, 50, "rcl"), path,
        batchId = 0L, streamId = "sA"))
      assert(Retrieval.applyChunkIngestBatch(mkDocs(50, 60, "rcl"), path,
        batchId = 1L, streamId = "sA"))
      assert(Retrieval.applyChunkIngestBatch(mkDocs(60, 70, "rcl"), path,
        batchId = 0L, streamId = "sB"))
      // sA rolls back ITS batch 1; sB is untouched
      assert(Retrieval.removeChunkIngestBatch(spark, path, batchId = 1L,
        streamId = "sA"))
      assert(StreamCommit.compactMarkers(spark, path) ==
        Map("sA" -> 1L, "sB" -> 0L),
        "folds must advance per stream, across sA's recorded removal")
      // sB's batch 1 must still apply — sA's removal record is namespaced
      assert(Retrieval.applyChunkIngestBatch(mkDocs(70, 80, "rcl"), path,
        batchId = 1L, streamId = "sB"))
      assert(StreamCommit.compactMarkers(spark, path) ==
        Map("sA" -> 1L, "sB" -> 1L))
      // and sA's excised ids stay excised while sB's batch-1 ids are
      // committed — asserted on the committed FILE view (hash embeddings
      // carry no semantics, so a rank-based assertion would be luck)
      val fs = StreamCommit.fs(spark, path)
      val tags = StreamCommit.listMarkers(fs, path)
        .map(m => StreamCommit.tag(m._1, m._2)).toSet
      val st = StreamCommit.readWatermarkState(spark, path)
      val committed = StreamCommit.committedDataFiles(fs,
        Seq(s"${StreamCommit.escapeGlob(path)}/list=*/*"),
        tags, st.watermarks, st.removed)
      val ids = spark.read.option("basePath", path).parquet(committed: _*)
        .select("doc_id").distinct().as[Long].collect().toSet
      assert(!ids.exists(id => id >= 50L && id < 60L),
        "sA's removed batch must stay out of the committed view")
      assert((70L until 80L).forall(ids),
        "sB's batch 1 must be fully committed")
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }

  test("watermark sidecar envelope: legacy bare-map bodies parse as version 0; the CAS rejects a stale writer and the rendered envelope round-trips") {
    val dir = java.nio.file.Files.createTempDirectory("graft_race8").toFile
    val path = dir.getAbsolutePath
    try {
      // legacy format (pre-envelope): bare {sid: wm}
      graft.util.Sidecar.write(spark, path, "_ingest_watermarks.json",
        """{"s1":4}""")
      val legacy = StreamCommit.readWatermarkState(spark, path)
      assert(legacy == StreamCommit.WmState(Map("s1" -> 4L), Map.empty, 0L, ""))
      assert(StreamCommit.readWatermarks(spark, path) == Map("s1" -> 4L))
      // CAS write advances to the envelope format and round-trips
      StreamCommit.writeWatermarksCas(spark, path, legacy,
        Map("s1" -> 6L), Map("s1" -> Set(5L)), "test hint")
      val st = StreamCommit.readWatermarkState(spark, path)
      assert(st.watermarks == Map("s1" -> 6L) &&
        st.removed == Map("s1" -> Set(5L)) && st.version == 1L)
      // a writer holding the legacy (version-0) state now conflicts
      val ex = intercept[IllegalStateException] {
        StreamCommit.writeWatermarksCas(spark, path, legacy,
          Map("s1" -> 9L), Map.empty, "test hint")
      }
      assert(ex.getMessage.contains("CAS conflict"))
      assert(StreamCommit.readWatermarkState(spark, path) == st)
    } finally org.apache.commons.io.FileUtils.deleteDirectory(dir)
  }
}
