package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

class SkewSpec extends SparkSpec {

  test("salted aggregation equals plain aggregation on skewed data") {
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

  test("salted collect_list and exact count-distinct (the aggregates that DO skew)") {
    val df = spark.range(10000)
      .withColumn("k", when(col("id") % 10 =!= 0, "hot").otherwise(lit("cold")))
      .withColumn("v", col("id") % 500)
    val out = Skew.saltedAggregate(df, Seq("k"), 8,
        Skew.collectList2(col("v"), "vals"), Skew.countDistinct2(col("v"), "nd"))
      .collect().map(r => r.getString(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    val expectHot = df.filter(col("k") === "hot").select("v").collect().map(_.getLong(0))
    assert(out("hot")._1.sorted == expectHot.sorted.toSeq, "collect_list content")
    assert(out("hot")._2 == expectHot.distinct.length)
    assert(out("cold")._2 == df.filter(col("k") === "cold")
      .select("v").distinct().count())
  }

  test("salt is deterministic (content hash, retry-safe) and guarded") {
    val df = spark.range(1000).withColumn("k", lit("x")).withColumn("v", col("id").cast("double"))
    val a = Skew.saltedAggregate(df, Seq("k"), 8, Skew.sum2(col("v"), "s")).collect()
    val b = Skew.saltedAggregate(df, Seq("k"), 8, Skew.sum2(col("v"), "s")).collect()
    assert(a.toSeq == b.toSeq)
    intercept[IllegalArgumentException](Skew.saltedAggregate(df, Seq("k"), 0, Skew.sum2(col("v"), "s")))
    intercept[IllegalArgumentException](Skew.saltedAggregate(df, Seq("k"), 8))
    intercept[IllegalArgumentException](Skew.saltedAggregate(
      df.withColumn("__graft_salt", lit(1)), Seq("k"), 8, Skew.sum2(col("v"), "s")))
  }

  test("identical duplicate rows spread across salt buckets; MapType guarded") {
    // replayed/duplicated messages: every row byte-identical — a pure content
    // hash would land all of them in ONE salt bucket (degenerate single reducer)
    val dups = spark.range(8000).select(lit("hot").as("k"), lit(42L).as("v"))
      .repartition(16)
    val nBuckets = dups.withColumn("__s",
        pmod(hash(spark_partition_id(), col("k"), col("v")), lit(8)))
      .select("__s").distinct().count()
    assert(nBuckets > 2, s"identical rows must spread over salt buckets, got $nBuckets")
    // and the salted aggregate still matches the plain one
    val out = Skew.saltedAggregate(dups, Seq("k"), 8,
      Skew.sum2(col("v"), "s"), Skew.count2("n")).collect()
    assert(out.length == 1 && out(0).getLong(1) == 42L * 8000 && out(0).getLong(2) == 8000L)
    // MapType columns must be excluded from the salt hash, not crash hash()
    val withMap = spark.range(100).select(lit("k").as("k"), col("id").cast("double").as("v"),
      map(lit("a"), col("id")).as("m"))
    val r = Skew.saltedAggregate(withMap, Seq("k"), 4, Skew.sum2(col("v"), "s")).collect()
    assert(r.length == 1 && r(0).getDouble(1) == (0 until 100).map(_.toDouble).sum)
  }

  test("salted plan has two aggregation exchanges (key+salt, then key)") {
    val df = spark.range(100).withColumn("k", lit("x")).withColumn("v", col("id").cast("double"))
    val plan = Skew.saltedAggregate(df, Seq("k"), 8, Skew.sum2(col("v"), "s"))
      .queryExecution.explainString(FormattedMode)
    assert("\\+- Exchange".r.findAllIn(plan).size == 2,
      s"expected exactly two shuffles (key+salt, then key):\n${plan.take(800)}")
    assert(plan.contains("__graft_salt"), "stage-1 grouping must include the salt")
  }
}
