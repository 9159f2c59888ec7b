package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL corpus interchange — the lingua franca of training-data pipelines
  * (every public corpus release ships as compressed JSON-lines shards).
  *
  * Scale rules encoded here rather than left to callers:
  *  - **Schema is REQUIRED on read.** Schema inference is a full extra pass
  *    over the data before the real one — at 100 TB that doubles the scan.
  *    Pass the schema you expect; malformed rows surface in the
  *    `_corrupt_record` column instead of failing the job (PERMISSIVE), so
  *    a bad shard is a quantifiable report, not a 3-hour-in crash.
  *  - **Compressed shards.** Splittability does not apply to JSONL shards
  *    (each file is one stream), so shard SIZE is the parallelism knob:
  *    partition the writer to the shard count you want downstream readers
  *    to parallelize over. gzip is the default because it is available on
  *    every JVM; pass "zstd" (better ratio AND faster) on clusters that
  *    ship the native Hadoop codec libs — text-source zstd needs them,
  *    unlike parquet's pure-Java zstd.
  *  - **Optional partitionBy** columns give directory-level pruning to every
  *    downstream reader (source=..., split=... are the conventional keys).
  */
object CorpusIO {

  def writeJsonl(df: DataFrame, path: String,
                 compression: String = "gzip",
                 partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).option("compression", compression)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).json(path)
  }

  /** The returned frame carries the caller's schema plus `_corrupt_record`
    * (null for clean rows, the raw line for malformed ones) — count it
    * before trusting a shard, drop it after.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val full =
      if (schema.fieldNames.contains("_corrupt_record")) schema
      else schema.add("_corrupt_record", org.apache.spark.sql.types.StringType)
    spark.read
      .schema(full)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
  }
}
