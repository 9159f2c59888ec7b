package graft.util

import org.apache.spark.sql.SparkSession

/** Shared Hadoop-FS JSON-sidecar IO for persisted model/index layouts (ANN
  * indexes, LM counts, classifier coefficients). The filesystem is resolved
  * FROM THE PATH URI, so `s3a://…`, `hdfs://…`, and local paths all work and
  * every call site agrees on the resolution rule.
  */
object Sidecar {

  def write(spark: SparkSession, path: String, name: String,
            body: String): Unit = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val os = fs.create(new org.apache.hadoop.fs.Path(s"$path/$name"), true)
    try os.write(body.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
  }

  def read(spark: SparkSession, path: String, name: String): String = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(path), spark.sparkContext.hadoopConfiguration)
    val in = fs.open(new org.apache.hadoop.fs.Path(s"$path/$name"))
    new String(
      try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in) finally in.close(),
      java.nio.charset.StandardCharsets.UTF_8)
  }

  /** Extract a required long field from a flat JSON sidecar body. */
  def requiredLong(body: String, field: String, where: String): Long =
    (""""""" + field + """"\s*:\s*(\d+)""").r.findFirstMatchIn(body)
      .map(_.group(1).toLong)
      .getOrElse(throw new IllegalArgumentException(s"$where has no $field"))
}
