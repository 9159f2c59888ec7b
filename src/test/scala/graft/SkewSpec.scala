package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

class SkewSpec extends SparkSpec {

  test("salted aggregation equals plain aggregation on skewed data") {
    import spark.implicits._
    // 90% of rows hit one key — the classic hot-partition shape
    val df = spark.range(100000)
      .withColumn("k", when(col("id") % 10 =!= 0, "hot").otherwise(concat(lit("k"), col("id") % 7)))
      .withColumn("v", col("id").cast("double"))
    val plain = df.groupBy("k")
      .agg(sum("v").as("s"), count(lit(1)).as("n"), min("v").as("mn"), max("v").as("mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    val salted = Skew.saltedAggregate(df, Seq("k"), saltBuckets = 16,
        Skew.sum2(col("v"), "s"), Skew.count2("n"), Skew.min2(col("v"), "mn"), Skew.max2(col("v"), "mx"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(salted == plain)
  }

  test("salted plan has two aggregation exchanges (key+salt, then key)") {
    import spark.implicits._
    val df = spark.range(100).withColumn("k", lit("x")).withColumn("v", col("id").cast("double"))
    val plan = Skew.saltedAggregate(df, Seq("k"), 8, Skew.sum2(col("v"), "s"))
      .queryExecution.explainString(FormattedMode)
    assert("\\+- Exchange".r.findAllIn(plan).size == 2,
      s"expected exactly two shuffles (key+salt, then key):\n${plan.take(800)}")
    assert(plan.contains("__salt"), "stage-1 grouping must include the salt")
  }
}
