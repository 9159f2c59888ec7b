package graft.model

import org.apache.spark.sql.types._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A single record header. Kafka allows duplicate header keys, so headers are
  * an ordered list, never a map (reference: tests/unit_suite/backup.rs:338).
  */
case class KHeader(key: String, value: Array[Byte])

/** The canonical record of the engine — the Kafka record shape.
  *
  * Mirrors the reference's `BinaryRecord`
  * (crates/kafka-backup-core/src/segment/format.rs:137-144) and `BackupRecord`
  * (crates/kafka-backup-core/src/manifest.rs:184-215), with topic/partition made
  * explicit columns (the reference encodes them in the storage path,
  * backup/engine.rs:1156-1162).
  *
  * `timestamp` is epoch **milliseconds** end-to-end (manifest.rs:199); kept as
  * Long internally to avoid µs/ms truncation surprises — expose TimestampType
  * views via [[KRecord.withTsView]].
  */
case class KRecord(
    topic: String,
    partition: Int,
    offset: Long,
    timestamp: Long,
    key: Array[Byte],
    value: Array[Byte],
    headers: Seq[KHeader])

object KRecord {

  /** Canonical schema — deliberately identical to Spark's own Kafka-source
    * output schema (minus timestampType) so `spark.read.format("kafka")` output
    * plugs in unchanged.
    */
  val schema: StructType = StructType(Seq(
    StructField("topic", StringType),
    StructField("partition", IntegerType),
    StructField("offset", LongType),
    StructField("timestamp", LongType), // epoch millis
    StructField("key", BinaryType, nullable = true),
    StructField("value", BinaryType, nullable = true),
    StructField("headers", ArrayType(StructType(Seq(
      StructField("key", StringType),
      StructField("value", BinaryType, nullable = true)))))
  ))

  /** Add a TimestampType view column over the millis column. */
  def withTsView(df: DataFrame): DataFrame =
    df.withColumn("ts", timestamp_millis(col("timestamp")))

  /** Epoch-millis Column over an `events.ts` column, whatever its physical
    * parquet type landed as in the scan:
    *   - `LongType` — TIMESTAMP(NANOS) surfaced as epoch nanos via
    *     `spark.sql.legacy.parquet.nanosAsLong=true` (pre-r8 testdata);
    *   - `TimestampNTZType` / `TimestampType` — TIMESTAMP(MICROS)
    *     (r8+ testdata; session timezone is UTC everywhere in this repo, so
    *     the NTZ→TZ cast is exact).
    * One definition so a unit change in the generator can never silently
    * skew the millis column between pipelines.
    */
  def tsMillis(tsType: DataType): org.apache.spark.sql.Column = tsType match {
    // FLOOR division, not `div` (which truncates toward zero): a pre-epoch
    // nano timestamp must land in the same millisecond bucket the timestamp
    // legs compute via unix_millis (which floors), or the projection and the
    // range predicates below disagree on boundary rows
    case LongType =>
      // pmod-adjusted numerator is exactly divisible, so integer `div` IS
      // floor here (a double `/` would lose precision above 2^53 nanos)
      expr("(ts - pmod(ts, 1000000)) div 1000000")
    case _ => unix_millis(col("ts").cast(TimestampType))
  }

  /** Pushdown-correct `ts` range predicate for `ts_ms ∈ [loMs, hiMs]`
    * (inclusive): the comparison stays on the RAW `ts` column in its native
    * type with same-type literals, so it reaches the parquet scan
    * (`PushedFilters` + row-group min/max pruning) instead of evaluating
    * post-scan on a derived column.
    */
  def tsBetweenMs(tsType: DataType, loMs: Long, hiMs: Long): org.apache.spark.sql.Column = {
    // an "open" upper bound near Long.MaxValue must degrade to lower-bound
    // only — (hiMs+1)*1e6 would overflow negative and silently match nothing
    val hiOverflows = hiMs >= Long.MaxValue / 1000000L - 1
    tsType match {
      case LongType =>
        if (hiOverflows) col("ts") >= loMs * 1000000L
        else col("ts").between(loMs * 1000000L, (hiMs + 1) * 1000000L - 1)
      case _: TimestampNTZType =>
        // micros precision: [lo ms, (hi+1) ms - 1 µs]
        if (hiOverflows) col("ts") >= ntzLit(loMs * 1000L)
        else col("ts").between(ntzLit(loMs * 1000L), ntzLit((hiMs + 1) * 1000L - 1))
      case _ =>
        if (hiOverflows) col("ts") >= timestamp_millis(lit(loMs))
        else col("ts") >= timestamp_millis(lit(loMs)) &&
          col("ts") < timestamp_millis(lit(hiMs + 1))
    }
  }

  /** Pushdown-correct strict upper bound: `ts_ms < hiExclusiveMs`. */
  def tsBeforeMs(tsType: DataType, hiExclusiveMs: Long): org.apache.spark.sql.Column =
    tsType match {
      case LongType            => col("ts") < hiExclusiveMs * 1000000L
      case _: TimestampNTZType => col("ts") < ntzLit(hiExclusiveMs * 1000L)
      case _                   => col("ts") < timestamp_millis(lit(hiExclusiveMs))
    }

  /** TIMESTAMP_NTZ literal from epoch micros (UTC wall clock). */
  private def ntzLit(epochMicros: Long): org.apache.spark.sql.Column =
    lit(java.time.LocalDateTime.ofInstant(
      java.time.Instant.EPOCH.plus(epochMicros, java.time.temporal.ChronoUnit.MICROS),
      java.time.ZoneOffset.UTC))

  /** Map the synthetic `events` table onto the canonical record shape:
    * topic = event_type, partition = user_id % numPartitions, offset =
    * event_id, timestamp = ts in millis, key = user_id utf8 bytes, value =
    * props utf8 bytes. Used by tests and the parquet-fixture backup pipeline.
    */
  def fromEvents(spark: SparkSession, sfDir: String, numPartitions: Int = 4): DataFrame =
    eventsProjection(spark.read.parquet(s"$sfDir/events.parquet"), numPartitions)

  /** The ONE canonical events→record mapping, shared by the batch fixture
    * above and the streaming file source (StreamingBackup.eventsFileSource) —
    * a unit change (e.g. timestamp scale) must not be able to diverge
    * between the two legs.
    */
  def eventsProjection(events: DataFrame, numPartitions: Int = 4): DataFrame =
    events.select(
      col("event_type").as("topic"),
      // pmod, not %: a negative id must still land in [0, numPartitions) —
      // Kafka partition ids are non-negative by definition
      pmod(col("user_id"), lit(numPartitions)).cast(IntegerType).as("partition"),
      col("event_id").as("offset"),
      tsMillis(events.schema("ts").dataType).as("timestamp"),
      encode(col("user_id").cast(StringType), "UTF-8").as("key"),
      encode(col("props"), "UTF-8").as("value"),
      array().cast(schema("headers").dataType).as("headers"))
}
