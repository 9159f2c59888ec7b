package graft.sources

/** Builders for the Spark Kafka source option maps that carry the reference's
  * scan semantics (S1/S3/S5, F8/F10):
  *
  *  - per-partition offset ranges → `startingOffsets`/`endingOffsets` JSON
  *    (the fetch-loop bounds of backup/engine.rs:904-947);
  *  - snapshot mode → `endingOffsets` pinned to captured latest (St3);
  *  - PITR entry → `startingOffsetsByTimestamp` (offsets-for-times, S5);
  *  - continuous topic discovery → `subscribePattern` from the glob config
  *    (F1, re-discovery per cycle St1).
  *
  * Pure option construction — testable without a broker; feed the result to
  * `spark.read/readStream.format("kafka").options(...)`.
  */
object KafkaSourceOptions {

  /** `{"topic":{"0":123,...},...}` offsets JSON. Sentinels: -2 earliest, -1
    * latest (ListOffsets semantics, kafka/fetch.rs:263-331).
    */
  def offsetsJson(offsets: Map[(String, Int), Long]): String = {
    val byTopic = offsets.groupBy(_._1._1)
    byTopic.toSeq.sortBy(_._1).map { case (topic, parts) =>
      val ps = parts.toSeq.sortBy(_._1._2)
        .map { case ((_, p), off) => s""""$p":$off""" }.mkString(",")
      s""""$topic":{$ps}"""
    }.mkString("{", ",", "}")
  }

  /** Batch read bounded by explicit offset ranges (F8). Spark requires the
    * assign/starting/ending partition sets to agree — missing bounds are
    * filled with the earliest (-2) / latest (-1) sentinels rather than
    * emitting options the source rejects.
    */
  def boundedRead(bootstrap: String, start: Map[(String, Int), Long],
                  end: Map[(String, Int), Long]): Map[String, String] = {
    val allParts = (start.keySet ++ end.keySet).toSeq.sorted
    val filledStart = allParts.map(k => k -> start.getOrElse(k, -2L)).toMap
    val filledEnd = allParts.map(k => k -> end.getOrElse(k, -1L)).toMap
    val topics = allParts.map(_._1).distinct.sorted
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "assign" -> topics.map(t =>
        s""""$t":[${allParts.filter(_._1 == t).map(_._2).distinct.sorted.mkString(",")}]""")
        .mkString("{", ",", "}"),
      "startingOffsets" -> offsetsJson(filledStart),
      "endingOffsets" -> offsetsJson(filledEnd))
  }

  /** Snapshot mode (St3/F10): every partition stops exactly at its captured
    * latest — a consistent cut.
    */
  def snapshotRead(bootstrap: String, captured: Map[(String, Int), Long]): Map[String, String] =
    boundedRead(bootstrap,
      captured.map { case (k, _) => k -> -2L }, // earliest
      captured)

  /** PITR entry (S5): start every partition at the first offset with
    * ts >= windowStart. Uses the global `startingTimestamp` option —
    * `startingOffsetsByTimestamp` has no all-partitions wildcard (a "-1"
    * partition key is rejected by the source); use
    * [[startByTimestampPerPartition]] when partition ids are known.
    */
  def startByTimestamp(bootstrap: String, topics: Seq[String],
                       windowStartMs: Long): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribe" -> topics.sorted.mkString(","),
    "startingTimestamp" -> windowStartMs.toString)

  /** Per-partition offsets-for-times form, for enumerated partitions. */
  def startByTimestampPerPartition(bootstrap: String,
                                   partitions: Map[(String, Int), Long]): Map[String, String] = {
    val byTopic = partitions.groupBy(_._1._1)
    Map(
      "kafka.bootstrap.servers" -> bootstrap,
      "assign" -> byTopic.toSeq.sortBy(_._1).map { case (t, ps) =>
        s""""$t":[${ps.keys.map(_._2).toSeq.sorted.mkString(",")}]""" }
        .mkString("{", ",", "}"),
      "startingOffsetsByTimestampStrategy" -> "error",
      "startingOffsetsByTimestamp" -> byTopic.toSeq.sortBy(_._1).map { case (t, ps) =>
        val inner = ps.toSeq.sortBy(_._1._2)
          .map { case ((_, p), ts) => s""""$p":$ts""" }.mkString(",")
        s""""$t":{$inner}""" }.mkString("{", ",", "}"))
  }

  /** Merge the SASL/SCRAM/TLS surface into any of the option maps above
    * (reference security_args.rs: one shared security block for every
    * Kafka-touching command).
    */
  def withSecurity(opts: Map[String, String], cfg: KafkaSecurityConfig): Map[String, String] =
    opts ++ KafkaSecurity.options(cfg)

  /** Continuous mode with glob topic discovery (St1/F1): globs become one
    * subscribePattern regex (auto-discovers new topics every cycle natively).
    *
    * subscribePattern is FULL-match (the Kafka consumer uses
    * `matcher.matches()`), while the batch path's `~` regexes are
    * substring-search (`KHash.topicMatches` uses find) — so raw regexes are
    * wrapped in `.*(?:…).*` to keep the two paths selecting the same
    * topics, and every alternative is non-capturing-grouped so a top-level
    * `|` inside one pattern can't swallow its neighbours.
    */
  def continuous(bootstrap: String, includeGlobs: Seq[String]): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrap,
    "subscribePattern" ->
      (if (includeGlobs.isEmpty) ".*"
       else includeGlobs.map(g =>
         if (g.startsWith("~")) s".*(?:${g.substring(1)}).*"
         else s"(?:${graft.functions.KHash.globToRegex(g)})").mkString("|")),
    "maxOffsetsPerTrigger" -> "1000000") // St9 read-side rate bound
}
