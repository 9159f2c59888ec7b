package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off skew ladder for the BM25 df fix (round-9 verdict task 1):
  * a corpus where one stopword appears in 60% of documents, queried WITH
  * that stopword — the exact shape that funneled a corpus-sized posting
  * list through a single WindowExec buffer under the old
  * `count().over(Window.partitionBy("term"))` df. Prints seconds per
  * corpus size; linear growth (no single-reducer cliff) is the pass.
  */
object DriveBm25Skew {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    def corpus(n: Long) = spark.range(n).select(col("id").as("doc_id"),
      concat(
        when(col("id") % 5 < 3, lit("the ")).otherwise(lit("")),
        lit("alpha"), (col("id") % 1000).cast("string"), lit(" "),
        lit("beta"), (col("id") % 97).cast("string"), lit(" "),
        lit("gamma"), (col("id") % 13).cast("string")).as("text"))
    val qs = Seq((1L, "the alpha7"), (2L, "beta11 gamma3"))
      .toDF("query_id", "text")
    for (n <- Seq(100000L, 400000L, 1600000L)) {
      val docs = corpus(n).localCheckpoint(true) // exclude synthesis cost
      // warm once at the smallest size only (JIT), then time
      def once(): Double = {
        val t0 = System.nanoTime()
        graft.ann.Bm25.topK(docs, qs, k = 10)
          .write.mode("overwrite").format("noop").save()
        (System.nanoTime() - t0) / 1e9
      }
      if (n == 100000L) once()
      val t = once()
      println(f"n=$n%d skewed-term topK: $t%.2f s")
      graft.util.Checkpoints.free(docs)
    }
    spark.stop()
  }
}
