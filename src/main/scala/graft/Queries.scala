package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{KFunctions, KHash}

/** The operator battery (SURVEY §2), each expressed Spark-first over the
  * synthetic testdata tables, with a DuckDB-equivalent oracle in
  * [[Queries.oracles]]. The `events` table plays the Kafka record stream:
  * topic = event_type, partition p = user_id % 4, offset = event_id,
  * timestamp = ts (epoch millis as BIGINT `ts_ms`; the physical parquet type
  * of events.ts is generator-dependent — TIMESTAMP(MICROS), or TIMESTAMP(NANOS)
  * surfaced as Long nanos via nanosAsLong — so all ts arithmetic goes through
  * the dtype-adaptive [[graft.model.KRecord.tsMillis]] family).
  *
  * Determinism rules shared with the oracles: every float aggregate goes
  * through DECIMAL(18,4) (exact, order-independent) and is surfaced as DOUBLE;
  * every result has a total ORDER BY.
  */
object Queries {

  // PITR window used across queries: [2024-01-10, 2024-01-20] UTC, inclusive.
  val T1 = 1704844800000L
  val T2 = 1705708800000L

  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = s.read.parquet(s"$dir/events.parquet")
    raw.withColumn("ts_ms", graft.model.KRecord.tsMillis(raw.schema("ts").dataType))
      .withColumn("p", col("user_id") % 4)
  }

  /** ts_ms ∈ [lo, hi] expressed on the raw ts column in its native type so
    * the predicate reaches the parquet scan (`PushedFilters` + row-group
    * min/max pruning); a filter on the derived `ts_ms` column would evaluate
    * post-scan. Dtype-adaptive: see [[graft.model.KRecord.tsBetweenMs]].
    */
  private def tsMsBetween(df: DataFrame, lo: Long, hi: Long) =
    graft.model.KRecord.tsBetweenMs(df.schema("ts").dataType, lo, hi)

  private def lineitem(s: SparkSession, dir: String) = s.read.parquet(s"$dir/lineitem.parquet")
  private def orders(s: SparkSession, dir: String) = s.read.parquet(s"$dir/orders.parquet")
  private def customer(s: SparkSession, dir: String) = s.read.parquet(s"$dir/customer.parquet")
  private def supplier(s: SparkSession, dir: String) = s.read.parquet(s"$dir/supplier.parquet")
  private def nation(s: SparkSession, dir: String) = s.read.parquet(s"$dir/nation.parquet")
  private def region(s: SparkSession, dir: String) = s.read.parquet(s"$dir/region.parquet")

  private def dec(c: Column): Column = c.cast("decimal(18,4)")

  /** Offset-mapping fixture (J1-J4): every 10th event is a mapping point
    * (source_offset = event_id, target_offset = event_id + 1000 + p), kept
    * per stream partition so the as-of join partitions cleanly at scale.
    */
  private def mapping(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_id") % 10 === 0)
      .select(col("p"), col("event_id").as("src"),
        (col("event_id") + 1000 + col("p")).as("tgt"), col("ts_ms").as("map_ts"))

  private def probes(s: SparkSession, dir: String): DataFrame =
    events(s, dir).filter(col("event_id") % 7 === 0)
      .select(col("p"), col("event_id").as("probe"))

  /** As-of join core (J1, manifest.rs:624-671): for each probe find the
    * nearest mapping point with src <= probe within its partition, then
    * delta-extrapolate. Spark-first shape: union + running `last(ignoreNulls)`
    * window partitioned by the stream partition — one shuffle, no
    * driver-side loop, no cross-partition global sort; DuckDB oracle uses its
    * native ASOF JOIN.
    */
  private def asofTargets(s: SparkSession, dir: String): DataFrame = {
    val m = mapping(s, dir).select(col("p"), col("src").as("k"),
      col("src"), col("tgt"), lit(1).as("is_m"))
    val pr = probes(s, dir).select(col("p"), col("probe").as("k"),
      lit(null).cast("bigint").as("src"), lit(null).cast("bigint").as("tgt"),
      lit(0).as("is_m"))
    val w = Window.partitionBy("p").orderBy(col("k"), col("is_m").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    m.unionByName(pr)
      .withColumn("asof_src", last("src", ignoreNulls = true).over(w))
      .withColumn("asof_tgt", last("tgt", ignoreNulls = true).over(w))
      .filter(col("is_m") === 0 && col("asof_src").isNotNull)
      .select(col("p"), col("k").as("probe"),
        (col("asof_tgt") + (col("k") - col("asof_src"))).as("target"))
  }

  // ───────────────────────── kafka-backup operators over `events` ──────────

  val kafka: Map[String, (SparkSession, String) => DataFrame] = Map(
    // F7 record time-window filter — both bounds inclusive, ms precision
    "q_pitr_window" -> ((s, d) => { val ev = events(s, d)
      ev.filter(tsMsBetween(ev, T1, T2))
        .select("event_id", "ts_ms", "event_type", "user_id")
        .orderBy("event_id")
    }),

    // F8 offset-range scan bound: start inclusive, end exclusive
    "q_offset_range" -> ((s, d) => events(s, d)
      .filter(col("event_id") >= 100 && col("event_id") < 600)
      .select("event_id", "event_type", "user_id")
      .orderBy("event_id")),

    // F5 partition filter
    "q_partition_filter" -> ((s, d) => events(s, d)
      .filter(col("p").isin(1, 3))
      .select("event_id", "p")
      .orderBy("event_id")),

    // F1 topic glob include/exclude (include "p*"/"?lick", exclude none)
    "q_topic_glob" -> ((s, d) => events(s, d)
      .filter(col("event_type").rlike(KHash.globToRegex("p*")) ||
        col("event_type").rlike(KHash.globToRegex("?lick")))
      .groupBy("event_type").agg(count(lit(1)).as("n"))
      .orderBy("event_type")),

    // F6 segment time-window pruning on a derived min/max manifest
    "q_segment_prune" -> ((s, d) => events(s, d)
      .groupBy(expr("event_id div 100").as("seg"))
      .agg(count(lit(1)).as("record_count"),
        min("ts_ms").as("start_ts"), max("ts_ms").as("end_ts"))
      .filter(col("end_ts") >= T1 && col("start_ts") <= T2)
      .orderBy("seg")),

    // A1/A4 manifest totals + time range over the derived segment catalog
    "q_manifest_describe" -> ((s, d) => events(s, d)
      .groupBy(expr("event_id div 100").as("seg"))
      .agg(count(lit(1)).as("record_count"),
        min("ts_ms").as("start_ts"), max("ts_ms").as("end_ts"))
      .agg(count(lit(1)).as("total_segments"),
        sum("record_count").as("total_records"),
        min("start_ts").as("min_ts"), max("end_ts").as("max_ts"))),

    // A2/J7 per-partition watermarks
    "q_partition_watermarks" -> ((s, d) => events(s, d)
      .groupBy("p")
      .agg(min("event_id").as("start_offset"), max("event_id").as("end_offset"),
        count(lit(1)).as("n_records"))
      .orderBy("p")),

    // A3 dry-run rollup: per (topic, partition) + topic + global subtotals
    "q_dryrun_rollup" -> ((s, d) => { val ev = events(s, d)
      ev.filter(tsMsBetween(ev, T1, T2))
        .rollup("event_type", "p")
        .agg(count(lit(1)).as("n_records"),
          min("event_id").as("min_offset"), max("event_id").as("max_offset"))
        .orderBy(col("event_type").asc_nulls_first, col("p").asc_nulls_first)
    }),

    // A6 offset-mapping range fold: min/max offset with their timestamps
    "q_offset_mapping_range" -> ((s, d) => events(s, d)
      .groupBy("p")
      .agg(min("event_id").as("src_min"), max("event_id").as("src_max"),
        min_by(col("ts_ms"), col("event_id")).as("ts_of_min"),
        max_by(col("ts_ms"), col("event_id")).as("ts_of_max"))
      .orderBy("p")),

    // J1 as-of offset lookup with delta extrapolation
    "q_asof_lookup" -> ((s, d) => asofTargets(s, d).orderBy("p", "probe")),

    // J2 first offset with ts >= T per partition (PITR entry point)
    "q_ts_to_offset" -> ((s, d) => events(s, d)
      .groupBy("p")
      .agg(min(when(col("ts_ms") >= T1, col("event_id"))).as("first_offset"))
      .orderBy("p")),

    // J6 validation: per-partition record count vs offset-span expectation
    "q_validation_counts" -> ((s, d) => events(s, d)
      .groupBy("p")
      .agg(count(lit(1)).as("actual"),
        (max("event_id") - min("event_id") + 1).as("expected_span"))
      .withColumn("diff", col("expected_span") - col("actual"))
      .orderBy("p")),

    // A10 validation summary: outcomes rolled up
    "q_validation_summary" -> ((s, d) => events(s, d)
      .groupBy("p")
      .agg(count(lit(1)).as("actual"),
        (max("event_id") - min("event_id") + 1).as("expected_span"))
      .withColumn("outcome",
        when(col("expected_span") === col("actual"), "pass").otherwise("fail"))
      .groupBy("outcome").agg(count(lit(1)).as("n"))
      .orderBy("outcome")),

    // J5 manifest merge: union of overlapping slices, dedup, existing wins
    "q_merge_dedup" -> ((s, d) => {
      val a = events(s, d).filter(col("event_id") < 600)
      val b = events(s, d).filter(col("event_id") >= 400 && col("event_id") < 800)
      a.unionByName(b).dropDuplicates("event_id")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // F9 checkpoint anti-join: skip completed units
    "q_checkpoint_antijoin" -> ((s, d) => {
      val done = events(s, d).filter(col("event_id") % 3 === 0).select("event_id")
      events(s, d).join(done, Seq("event_id"), "left_anti")
        .groupBy("event_type").agg(count(lit(1)).as("n"))
        .orderBy("event_type")
    }),

    // F13 topic rename via mapping, unmapped pass through
    "q_topic_rename" -> ((s, d) => {
      val m = typedLit(Map("click" -> "interaction", "view" -> "impression"))
      events(s, d)
        .withColumn("topic", coalesce(element_at(m, col("event_type")), col("event_type")))
        .groupBy("topic").agg(count(lit(1)).as("n"))
        .orderBy("topic")
    }),

    // F11/F12 header enrichment round-trip: LE-encoded offset extracted back
    "q_header_roundtrip" -> ((s, d) => {
      val base = events(s, d).select(col("event_id"),
        col("event_type").as("topic"), col("p").cast("int").as("partition"),
        col("event_id").as("offset"), col("ts_ms").as("timestamp"),
        lit(null).cast("binary").as("key"), lit(null).cast("binary").as("value"),
        array().cast(graft.model.KRecord.schema("headers").dataType).as("headers"))
      base.withColumn("headers", KFunctions.enriched_headers(col("headers"),
          col("offset"), col("timestamp"), "cluster-a", col("partition")))
        .select(col("event_id"),
          KFunctions.bytes_to_long_le(
            KFunctions.header_value(col("headers"), "x-original-offset")).as("orig_offset"))
        .orderBy("event_id")
    }),

    // J3 consumer-group reset plan: committed offsets → target via as-of.
    // Routed through OffsetMappingDF.resetPlan: mapping pruned to committed
    // partitions + one as-of lookup per distinct probe — never the G×M
    // crossJoin replication (the plan shape is locked in PlanSpec).
    "q_group_reset_plan" -> ((s, d) => {
      val committed = events(s, d)
        .groupBy(col("event_type").as("group_id"), col("p").as("partition"))
        .agg(max("event_id").as("committed_offset"))
        .withColumn("topic", lit("events"))
      val m = mapping(s, d).select(lit("events").as("topic"),
        col("p").as("partition"), col("src").as("source_offset"),
        col("tgt").as("target_offset"))
      graft.remap.OffsetMappingDF.resetPlan(committed, m)
        .select(col("group_id").as("grp"), col("partition").as("p"),
          col("committed_offset").as("committed"), col("target_offset").as("target"))
        .orderBy("grp", "p")
    }),

    // J9 rollback verify: expected (all) vs actual (≤ T2) committed offsets
    "q_rollback_verify" -> ((s, d) => {
      val expected = events(s, d).groupBy("p").agg(max("event_id").as("expected"))
      val evA = events(s, d)
      val actual = evA.filter(graft.model.KRecord.tsBeforeMs(evA.schema("ts").dataType, T2 + 1))
        .groupBy("p").agg(max("event_id").as("actual"))
      expected.join(actual, Seq("p"), "full_outer")
        .filter(not(col("expected") <=> col("actual")))
        .orderBy("p")
    }),

    // A9 deterministic digest: sha256 over ordered offset summary
    "q_digest" -> ((s, d) => events(s, d)
      .groupBy("p")
      .agg(sort_array(collect_list(col("event_id"))).as("offs"))
      .select(col("p"),
        sha2(concat_ws(",", transform(col("offs"), _.cast("string"))), 256).as("digest"))
      .orderBy("p")),

    // A7 latency percentiles: exact p50/p99 + avg per event_type
    "q_percentiles" -> ((s, d) => events(s, d)
      .groupBy("event_type")
      .agg(round(expr("percentile(value, 0.5)"), 4).as("p50"),
        round(expr("percentile(value, 0.99)"), 4).as("p99"),
        (sum(dec(col("value"))).cast("double") / count(lit(1))).as("avg_value"))
      .orderBy("event_type")),

    // J1 range-only fallback: linear interpolation over (first, last) anchors
    "q_offset_interpolation" -> ((s, d) => {
      val ranges = events(s, d).groupBy("p")
        .agg(min("event_id").as("src_first"), max("event_id").as("src_last"))
        .withColumn("tgt_first", col("src_first") + 1000)
        .withColumn("tgt_last", col("src_last") + 5000)
      val prs = probes(s, d)
      prs.join(ranges, Seq("p"))
        .select(col("p"), col("probe"),
          (col("tgt_first") + floor(
            (col("probe") - col("src_first")).cast("double") /
              (col("src_last") - col("src_first")) *
              (col("tgt_last") - col("tgt_first"))).cast("bigint")).as("target"))
        .orderBy("p", "probe")
    }),

    // J10 set difference: configured literal topics minus existing topics
    "q_missing_topics" -> ((s, d) => {
      import s.implicits._
      Seq("click", "purchase", "payments", "audit_log").toDF("topic")
        .except(events(s, d).select(col("event_type").as("topic")).distinct())
        .orderBy("topic")
    }),

    // F10/St3 snapshot clamp: every partition stops at its captured latest
    "q_snapshot_clamp" -> ((s, d) => {
      val evS = events(s, d)
      val snapshot = evS.filter(graft.model.KRecord.tsBeforeMs(evS.schema("ts").dataType, T2 + 1))
        .groupBy("p").agg(max("event_id").as("snap_latest"))
      events(s, d).join(snapshot, Seq("p"))
        .filter(col("event_id") <= col("snap_latest"))
        .groupBy("p").agg(count(lit(1)).as("n"), max("event_id").as("last_offset"))
        .orderBy("p")
    }),

    // end-to-end: backup events → KBAK segments → restore → per-topic totals
    // (the whole codec+catalog+scan pipeline, hash-checked by the oracle)
    "p_roundtrip_counts" -> ((s, d) => {
      val tmp = graft.util.TempDirs.create("graft-rt")
      graft.pipelines.Backup.run(s, graft.model.KRecord.fromEvents(s, d),
        graft.pipelines.BackupConfig("rt", tmp, graft.codec.CompressionCodec.Zstd,
          enrichHeaders = false))
      graft.pipelines.Restore.records(s,
          graft.pipelines.RestoreConfig(tmp, "rt")).toDF()
        .groupBy("topic")
        .agg(count(lit(1)).as("n"), min("offset").as("min_offset"),
          max("offset").as("max_offset"))
        .orderBy("topic")
    }),

    // headline throughput workload: events replicated ×8 with 1 KB payloads
    // (~0.8 GB at sf0.1) through the full backup pipeline — BENCH seconds for
    // this entry divide into MB for the MB/s comparison with BASELINE.md
    "p_backup_throughput" -> ((s, d) => {
      val tmp = graft.util.TempDirs.create("graft-tp")
      val pad = lit(("x" * 1000).getBytes) // binary concat: single pass, no charset decode
      val fat = graft.model.KRecord.fromEvents(s, d)
        .crossJoin(s.range(8).select(col("id").as("rep")))
        .withColumn("offset", col("offset") * 8 + col("rep"))
        .withColumn("value", concat(col("value"), pad))
        .drop("rep")
      val m = graft.pipelines.Backup.run(s, fat,
        graft.pipelines.BackupConfig("tp", tmp, graft.codec.CompressionCodec.Zstd,
          enrichHeaders = false))
      // deterministic output: per-topic segment stats (no wall-clock columns)
      graft.catalog.Manifest.toDF(s, m)
        .groupBy("topic")
        .agg(count(lit(1)).as("n_segments"), sum("record_count").as("n_records"),
          sum("uncompressed_size").as("raw_bytes"))
        .orderBy("topic")
    }),

    // end-to-end incremental resume (S12 batch leg): half backup → state
    // table marks → full-source second run writes ONLY new offsets → restore
    // must equal the full corpus exactly (hash-checked by the oracle). A
    // duplicated or dropped record flips the counts.
    "p_incremental_resume" -> ((s, d) => {
      val tmp = graft.util.TempDirs.create("graft-inc")
      val all = graft.model.KRecord.fromEvents(s, d)
      val cut = all.agg(max("offset")).head().getLong(0) / 2
      // lz4: the entry proves resume CORRECTNESS; zstd's extra encode cost
      // belongs to p_backup_throughput, not here
      val cfg = graft.pipelines.BackupConfig("inc", tmp,
        graft.codec.CompressionCodec.Lz4, enrichHeaders = false)
      graft.pipelines.Backup.runIncremental(s, all.filter(col("offset") <= cut), cfg)
      graft.pipelines.Backup.runIncremental(s, all, cfg)
      graft.pipelines.Restore.records(s,
          graft.pipelines.RestoreConfig(tmp, "inc")).toDF()
        .groupBy("topic")
        .agg(count(lit(1)).as("n"), min("offset").as("min_offset"),
          max("offset").as("max_offset"))
        .orderBy("topic")
    }),

    // end-to-end PITR: restore only the [T1,T2] window through the segments
    "p_pitr_roundtrip" -> ((s, d) => {
      val tmp = graft.util.TempDirs.create("graft-pitr")
      graft.pipelines.Backup.run(s, graft.model.KRecord.fromEvents(s, d),
        graft.pipelines.BackupConfig("rt", tmp, graft.codec.CompressionCodec.Lz4,
          enrichHeaders = false, maxSegmentBytes = 256 * 1024))
      graft.pipelines.Restore.records(s,
          graft.pipelines.RestoreConfig(tmp, "rt", Some(T1), Some(T2))).toDF()
        .groupBy("topic").agg(count(lit(1)).as("n"))
        .orderBy("topic")
    }),

    // sessionization (gaps-and-islands, 6h inactivity gap) per user over the
    // event stream — one key shuffle feeds both window passes and the
    // session aggregate combines map-side (plan-locked in SessionizeSpec).
    // Per-user rollup keeps the output metadata-sized.
    "q_sessionize" -> ((s, d) =>
      graft.operators.Sessionize.sessionReport(
          events(s, d), "user_id", "ts_ms",
          gapMs = 6 * 3600 * 1000L, tiebreakCol = "event_id")
        .orderBy("user_id"))
  )

  val kafkaOracles: Map[String, String] = Map(
    "q_pitr_window" ->
      s"""SELECT event_id, epoch_ms(ts) AS ts_ms, event_type, user_id FROM events
         |WHERE epoch_ms(ts) BETWEEN $T1 AND $T2 ORDER BY event_id""".stripMargin,
    "q_offset_range" ->
      """SELECT event_id, event_type, user_id FROM events
        |WHERE event_id >= 100 AND event_id < 600 ORDER BY event_id""".stripMargin,
    "q_partition_filter" ->
      """SELECT event_id, user_id % 4 AS p FROM events
        |WHERE user_id % 4 IN (1, 3) ORDER BY event_id""".stripMargin,
    "q_topic_glob" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE regexp_matches(event_type, '^p.*$') OR regexp_matches(event_type, '^.lick$')
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_segment_prune" ->
      s"""SELECT event_id // 100 AS seg, count(*) AS record_count,
         |       min(epoch_ms(ts)) AS start_ts, max(epoch_ms(ts)) AS end_ts
         |FROM events GROUP BY 1
         |HAVING max(epoch_ms(ts)) >= $T1 AND min(epoch_ms(ts)) <= $T2
         |ORDER BY seg""".stripMargin,
    "q_manifest_describe" ->
      """SELECT count(*) AS total_segments, CAST(sum(record_count) AS BIGINT) AS total_records,
        |       min(start_ts) AS min_ts, max(end_ts) AS max_ts
        |FROM (SELECT event_id // 100 AS seg, count(*) AS record_count,
        |             min(epoch_ms(ts)) AS start_ts, max(epoch_ms(ts)) AS end_ts
        |      FROM events GROUP BY 1)""".stripMargin,
    "q_partition_watermarks" ->
      """SELECT user_id % 4 AS p, min(event_id) AS start_offset,
        |       max(event_id) AS end_offset, count(*) AS n_records
        |FROM events GROUP BY 1 ORDER BY p""".stripMargin,
    "q_dryrun_rollup" ->
      s"""SELECT event_type, user_id % 4 AS p, count(*) AS n_records,
         |       min(event_id) AS min_offset, max(event_id) AS max_offset
         |FROM events WHERE epoch_ms(ts) BETWEEN $T1 AND $T2
         |GROUP BY ROLLUP (event_type, p)
         |ORDER BY event_type NULLS FIRST, p NULLS FIRST""".stripMargin,
    "q_offset_mapping_range" ->
      """SELECT user_id % 4 AS p, min(event_id) AS src_min, max(event_id) AS src_max,
        |       arg_min(epoch_ms(ts), event_id) AS ts_of_min,
        |       arg_max(epoch_ms(ts), event_id) AS ts_of_max
        |FROM events GROUP BY 1 ORDER BY p""".stripMargin,
    "q_asof_lookup" ->
      """WITH m AS (SELECT user_id % 4 AS p, event_id AS src,
        |                  event_id + 1000 + user_id % 4 AS tgt
        |           FROM events WHERE event_id % 10 = 0),
        |     pr AS (SELECT user_id % 4 AS p, event_id AS probe FROM events
        |            WHERE event_id % 7 = 0)
        |SELECT pr.p AS p, pr.probe, m.tgt + (pr.probe - m.src) AS target
        |FROM pr ASOF JOIN m ON pr.p = m.p AND pr.probe >= m.src
        |ORDER BY pr.p, pr.probe""".stripMargin,
    "q_ts_to_offset" ->
      s"""SELECT user_id % 4 AS p,
         |       min(event_id) FILTER (WHERE epoch_ms(ts) >= $T1) AS first_offset
         |FROM events GROUP BY 1 ORDER BY p""".stripMargin,
    "q_validation_counts" ->
      """SELECT user_id % 4 AS p, count(*) AS actual,
        |       max(event_id) - min(event_id) + 1 AS expected_span,
        |       max(event_id) - min(event_id) + 1 - count(*) AS diff
        |FROM events GROUP BY 1 ORDER BY p""".stripMargin,
    "q_validation_summary" ->
      """SELECT CASE WHEN expected_span = actual THEN 'pass' ELSE 'fail' END AS outcome,
        |       count(*) AS n
        |FROM (SELECT user_id % 4 AS p, count(*) AS actual,
        |             max(event_id) - min(event_id) + 1 AS expected_span
        |      FROM events GROUP BY 1)
        |GROUP BY 1 ORDER BY outcome""".stripMargin,
    "q_merge_dedup" ->
      """SELECT event_type, count(*) AS n FROM (
        |  SELECT DISTINCT ON (event_id) * FROM (
        |    SELECT * FROM events WHERE event_id < 600
        |    UNION ALL
        |    SELECT * FROM events WHERE event_id >= 400 AND event_id < 800))
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_checkpoint_antijoin" ->
      """SELECT event_type, count(*) AS n FROM events
        |WHERE event_id % 3 <> 0 GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_topic_rename" ->
      """SELECT CASE event_type WHEN 'click' THEN 'interaction'
        |            WHEN 'view' THEN 'impression' ELSE event_type END AS topic,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY topic""".stripMargin,
    "q_header_roundtrip" ->
      "SELECT event_id, event_id AS orig_offset FROM events ORDER BY event_id",
    "q_group_reset_plan" ->
      """WITH committed AS (SELECT event_type AS grp, user_id % 4 AS p,
        |                          max(event_id) AS committed
        |                   FROM events GROUP BY 1, 2),
        |     m AS (SELECT user_id % 4 AS p, event_id AS src,
        |                  event_id + 1000 + user_id % 4 AS tgt
        |           FROM events WHERE event_id % 10 = 0)
        |SELECT c.grp, c.p AS p, c.committed, m.tgt + (c.committed - m.src) AS target
        |FROM committed c ASOF JOIN m ON c.p = m.p AND c.committed >= m.src
        |ORDER BY c.grp, c.p""".stripMargin,
    "q_rollback_verify" ->
      s"""SELECT e.p, e.expected, a.actual FROM
         |  (SELECT user_id % 4 AS p, max(event_id) AS expected FROM events GROUP BY 1) e
         |  FULL OUTER JOIN
         |  (SELECT user_id % 4 AS p, max(event_id) AS actual FROM events
         |   WHERE epoch_ms(ts) <= $T2 GROUP BY 1) a
         |  USING (p)
         |WHERE e.expected IS DISTINCT FROM a.actual ORDER BY p""".stripMargin,
    "q_digest" ->
      """SELECT user_id % 4 AS p,
        |       sha256(string_agg(event_id::VARCHAR, ',' ORDER BY event_id)) AS digest
        |FROM events GROUP BY 1 ORDER BY p""".stripMargin,
    "q_percentiles" ->
      """SELECT event_type,
        |       round(quantile_cont(value, 0.5), 4) AS p50,
        |       round(quantile_cont(value, 0.99), 4) AS p99,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_offset_interpolation" ->
      """WITH r AS (SELECT user_id % 4 AS p, min(event_id) AS src_first,
        |                  max(event_id) AS src_last,
        |                  min(event_id) + 1000 AS tgt_first,
        |                  max(event_id) + 5000 AS tgt_last
        |           FROM events GROUP BY 1),
        |     pr AS (SELECT user_id % 4 AS p, event_id AS probe FROM events
        |            WHERE event_id % 7 = 0)
        |SELECT pr.p AS p, pr.probe,
        |       r.tgt_first + CAST(floor((pr.probe - r.src_first)::DOUBLE
        |         / (r.src_last - r.src_first) * (r.tgt_last - r.tgt_first)) AS BIGINT) AS target
        |FROM pr JOIN r ON pr.p = r.p ORDER BY pr.p, pr.probe""".stripMargin,
    "q_missing_topics" ->
      """SELECT topic FROM (VALUES ('click'), ('purchase'), ('payments'), ('audit_log')) t(topic)
        |EXCEPT SELECT DISTINCT event_type FROM events ORDER BY topic""".stripMargin,
    "q_snapshot_clamp" ->
      s"""WITH snap AS (SELECT user_id % 4 AS p, max(event_id) AS snap_latest
         |              FROM events WHERE epoch_ms(ts) <= $T2 GROUP BY 1)
         |SELECT e.user_id % 4 AS p, count(*) AS n, max(e.event_id) AS last_offset
         |FROM events e JOIN snap ON e.user_id % 4 = snap.p
         |WHERE e.event_id <= snap.snap_latest
         |GROUP BY 1 ORDER BY p""".stripMargin,
    "p_roundtrip_counts" ->
      """SELECT event_type AS topic, count(*) AS n, min(event_id) AS min_offset,
        |       max(event_id) AS max_offset
        |FROM events GROUP BY 1 ORDER BY topic""".stripMargin,
    // same totals as a single-shot backup: the two-run incremental path must
    // be lossless and duplicate-free to hash-match
    "p_incremental_resume" ->
      """SELECT event_type AS topic, count(*) AS n, min(event_id) AS min_offset,
        |       max(event_id) AS max_offset
        |FROM events GROUP BY 1 ORDER BY topic""".stripMargin,
    "p_pitr_roundtrip" ->
      s"""SELECT event_type AS topic, count(*) AS n FROM events
         |WHERE epoch_ms(ts) BETWEEN $T1 AND $T2 GROUP BY 1 ORDER BY topic""".stripMargin,
    // the same gaps-and-islands construction: lag finds the >6h gaps, the
    // running sum numbers sessions, two GROUP BYs roll sessions then users
    "q_sessionize" ->
      """WITH l AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
        |         lag(epoch_ms(ts)) OVER (PARTITION BY user_id
        |                                 ORDER BY epoch_ms(ts), event_id) AS prev
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts_ms,
        |         sum(CASE WHEN prev IS NULL OR ts_ms - prev > 21600000
        |                  THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS session_seq
        |  FROM l),
        |sess AS (
        |  SELECT user_id, session_seq, count(*) AS n_events,
        |         max(ts_ms) - min(ts_ms) AS duration_ms
        |  FROM s GROUP BY 1, 2)
        |SELECT user_id, count(*) AS n_sessions,
        |       CAST(sum(n_events) AS BIGINT) AS n_events,
        |       max(n_events) AS max_session_events,
        |       max(duration_ms) AS max_session_ms,
        |       CAST(sum(duration_ms) AS BIGINT) AS total_session_ms
        |FROM sess GROUP BY 1 ORDER BY user_id""".stripMargin
  )

  // ───────────────────────── analytic anchors over the TPC-H-ish tables ────

  val tpch: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> ((s, d) => lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")),

    "q3_shipping" -> ((s, d) => {
      val c = customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      val o = orders(s, d).filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp"))
      val l = lineitem(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy("l_orderkey")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    }),

    "q5_region_revenue" -> ((s, d) => {
      val l = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
      // join-then-agg, NOT agg-then-join: a per-order pre-aggregation on
      // l_orderkey barely collapses map-side (key cardinality ~ row count /
      // 4, far above rows-per-partition) yet pays a full hash-agg of the
      // fact table. Joining lineitem against the NARROW (o_orderkey, r_name)
      // stream instead lets the final groupBy(r_name) collapse to 5 groups
      // in the partial (map-side) agg — the shuffle after the join carries 5
      // rows per task. The dims fold into orders via broadcasts; the only
      // data-sized exchanges are the two orderkey shuffles of the join,
      // which is the canonical 100 TB shape (orders is never broadcastable)
      val orderRegion = o
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .select(col("o_orderkey"), col("r_name"))
      // SHUFFLE_HASH on the narrow side pins the hash build to orderRegion:
      // without it, Catalyst's static stats rate the 3-column lineitem scan
      // SMALLER than the join-output orderRegion (join estimates inflate) and
      // broadcast the FACT table — a driver-side hashed relation of all of
      // lineitem (measured 2.5-4.7 s at sf0.1, and a driver OOM the moment a
      // stats mis-estimate let it through at real scale). The hinted shape —
      // both sides shuffled on orderkey, hash only the narrow (orderkey,
      // r_name) stream — is the one that survives 100 TB, where neither side
      // is broadcastable and AQE skew-split still applies to shuffled-hash
      l.join(orderRegion.hint("shuffle_hash"),
          l("l_orderkey") === orderRegion("o_orderkey"))
        .groupBy("r_name")
        .agg(sum(dec(col("l_extendedprice")) * (lit(1) - dec(col("l_discount"))))
          .cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("r_name")
    }),

    "q6_selective" -> ((s, d) => lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.02, 0.06) && col("l_quantity") < 24)
      .agg(sum(dec(col("l_extendedprice")) * dec(col("l_discount")))
        .cast("double").as("revenue"),
        count(lit(1)).as("n"))),

    "q18_top_orders" -> ((s, d) => {
      val l = lineitem(s, d)
      val big = l.groupBy("l_orderkey")
        .agg(sum(dec(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 150)
      val o = orders(s, d)
      o.join(big, o("o_orderkey") === big("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("sum_qty").desc, col("o_orderkey"))
        .limit(20)
    }),

    "q_window_topn" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      orders(s, d)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 5)
        .select("o_orderpriority", "rn", "o_orderkey",
          "o_totalprice")
        .orderBy("o_orderpriority", "rn")
    })
  )

  val tpchOracles: Map[String, String] = Map(
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS sum_disc_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q3_shipping" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_region_revenue" ->
      """SELECT r_name,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * (1 - CAST(l_discount AS DECIMAL(18,4)))) AS DOUBLE) AS revenue,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q6_selective" ->
      """SELECT CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.02 AND 0.06 AND l_quantity < 24""".stripMargin,
    "q18_top_orders" ->
      """SELECT o_orderkey, o_custkey, CAST(sum_qty AS DOUBLE) AS sum_qty FROM (
        |  SELECT o_orderkey, o_custkey,
        |         (SELECT sum(CAST(l_quantity AS DECIMAL(18,4))) FROM lineitem
        |          WHERE l_orderkey = o_orderkey) AS sum_qty
        |  FROM orders)
        |WHERE sum_qty > 150 ORDER BY sum_qty DESC, o_orderkey LIMIT 20""".stripMargin,
    "q_window_topn" ->
      """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_orderpriority
        |                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders)
        |WHERE rn <= 5 ORDER BY o_orderpriority, rn""".stripMargin
  )

  /** Queries with no SQL-expressible oracle (murmur2 is not available in
    * DuckDB): driver records a rows-only check; bit-exactness is covered by
    * ScalaTest golden vectors instead.
    */
  val rowsOnly: Map[String, (SparkSession, String) => DataFrame] = Map(
    // 2.10 murmur2 repartition placement distribution
    "q_murmur2_partition" -> ((s, d) => events(s, d)
      .withColumn("key", encode(col("user_id").cast("string"), "UTF-8"))
      .withColumn("target_partition", KFunctions.kafka_partition(col("key"), 12))
      .groupBy("target_partition").agg(count(lit(1)).as("n"))
      .orderBy("target_partition"))
  )

  val all: Map[String, (SparkSession, String) => DataFrame] =
    kafka ++ tpch ++ rowsOnly ++ QueriesData.all
  val oracles: Map[String, String] = kafkaOracles ++ tpchOracles ++ QueriesData.oracles
}
