package graft
import org.apache.spark.sql.SparkSession

/** Plan dumper: `tools/run.sh graft.Explain q5_region_revenue [q1_pricing ...]`
  * prints the AQE-final formatted plan for each named [[SparkEntry.queries]]
  * entry against `SPARK_GRAFT_SF_DIR`. The query is EXECUTED first (noop sink)
  * so the printed plan is the adaptive final plan, not the static guess.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    require(args.nonEmpty, "usage: graft.Explain <queryName>...")
    val unknown = args.toSet -- SparkEntry.queries.keySet
    require(unknown.isEmpty, s"unknown queries: ${unknown.mkString(", ")}")
    for (name <- args) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      // execute through df's OWN QueryExecution: a write/save (or even
      // Dataset.foreachPartition, which goes through the separate
      // rddQueryExecution) builds a different QE and leaves this one's
      // adaptive plan unexecuted (isFinalPlan=false — the static guess).
      // toRdd IS this QE's executedPlan; foreach keeps rows distributed
      df.queryExecution.toRdd.foreach(_ => ())
      println(s"==== $name (executed; AQE final plan) ====")
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
