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

  /** Map the synthetic `events` table onto the canonical record shape:
    * topic = event_type, partition = user_id % numPartitions, offset =
    * event_id, timestamp = ts in millis, key = user_id utf8 bytes, value =
    * props utf8 bytes. Used by tests and the parquet-fixture backup pipeline.
    *
    * Requires `spark.sql.legacy.parquet.nanosAsLong=true` — events.ts is
    * parquet TIMESTAMP(NANOS), surfaced as a Long of epoch nanos.
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
      (col("user_id") % numPartitions).cast(IntegerType).as("partition"),
      col("event_id").as("offset"),
      expr("ts div 1000000").as("timestamp"),
      encode(col("user_id").cast(StringType), "UTF-8").as("key"),
      encode(col("props"), "UTF-8").as("value"),
      array().cast(schema("headers").dataType).as("headers"))
}
