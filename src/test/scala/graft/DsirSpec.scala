package graft

import graft.dedup.Dedup
import graft.text.Dsir
import org.apache.spark.sql.functions._

/** DSIR importance resampling (Xie et al. 2023) and the cross-group dup
  * overlap report. The battery entry `d_dsir_select` hash-pins the whole
  * pipeline against DuckDB; these specs pin the semantic properties the
  * hash can't explain on its own — monotonicity toward the target
  * distribution, smoothing behavior, determinism, and edge cases.
  */
class DsirSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("fitLogRatios: target-only grams score positive, raw-only negative") {
    val target = corpus(1L -> "alpha beta alpha", 2L -> "alpha gamma")
    val raw = corpus(3L -> "delta epsilon", 4L -> "delta zeta delta")
    val ratios = Dsir.fitLogRatios(target, raw, nBuckets = 256)
    assert(ratios.count() === 256, "dense spine: one row per bucket")
    // a bucket hit only by target grams must have log_ratio > 0, and one
    // hit only by raw grams < 0; untouched buckets get the pure-smoothing
    // constant (same value everywhere)
    val rows = ratios.collect().map(r =>
      (r.getAs[Long]("bucket"), r.getAs[Long]("n_t"), r.getAs[Long]("n_r"),
        r.getAs[Double]("log_ratio")))
    val tOnly = rows.filter(r => r._2 > 0 && r._3 == 0)
    val rOnly = rows.filter(r => r._2 == 0 && r._3 > 0)
    val empty = rows.filter(r => r._2 == 0 && r._3 == 0)
    assert(tOnly.nonEmpty && rOnly.nonEmpty && empty.nonEmpty)
    assert(tOnly.forall(_._4 > 0), "target-only bucket must score positive")
    assert(rOnly.forall(_._4 < 0), "raw-only bucket must score negative")
    assert(empty.map(_._4).distinct.length === 1,
      "all-smoothing buckets share one ratio")
  }

  test("scoreLogWeights: target-like docs outscore raw-like docs") {
    val target = corpus((1L to 20L).map(i => i -> "quantum physics lattice gauge theory"): _*)
    val raw = corpus(
      (21L to 40L).map(i => i -> "celebrity gossip fashion week party"): _*)
    val ratios = Dsir.fitLogRatios(target, raw, nBuckets = 1024)
    val probe = corpus(100L -> "quantum lattice theory",
      101L -> "celebrity fashion party",
      102L -> "")
    val s = Dsir.scoreLogWeights(probe, ratios, nBuckets = 1024)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(100L) > s(101L),
      s"target-like doc must outscore raw-like: $s")
    assert(s(102L) === 0.0, "gram-less doc scores exactly 0")
    assert(s.size === 3, "every probe doc surfaces, including empty text")
  }

  test("scoreLogWeights: null text scores 0 and survives") {
    val target = corpus(1L -> "a b c")
    val raw = corpus(2L -> "x y z")
    val ratios = Dsir.fitLogRatios(target, raw, nBuckets = 64)
    val probe = Seq((10L, null: String), (11L, "x y")).toDF("doc_id", "text")
    val s = Dsir.scoreLogWeights(probe, ratios, nBuckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(s(10L) === 0.0)
    assert(s(11L) < 0.0, "raw-gram doc scores negative")
  }

  test("resampleTopK is deterministic and partition-invariant") {
    val scored = spark.range(0, 500).toDF("doc_id")
      .withColumn("log_weight", (col("doc_id") % 17).cast("double") / 3.0)
    val a = Dsir.resampleTopK(scored, 50).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = Dsir.resampleTopK(scored.repartition(13), 50).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b, "selection must not depend on partitioning")
    assert(a.size === 50)
  }

  test("resampleTopK favors heavier weights in aggregate") {
    // two weight classes, equal population: the heavy class must win most
    // of the sample (Gumbel noise is bounded-ish relative to the 5.0 gap)
    val scored = spark.range(0, 1000).toDF("doc_id")
      .withColumn("log_weight",
        when(col("doc_id") < 500, lit(5.0)).otherwise(lit(0.0)))
    val picked = Dsir.resampleTopK(scored, 100)
      .select("doc_id").collect().map(_.getLong(0))
    val heavy = picked.count(_ < 500)
    assert(heavy > 80, s"heavy class should dominate the draw, got $heavy/100")
  }

  test("select composes: k rows, ordered by the rounded gumbel key") {
    val all = corpus((1L to 60L).map(i =>
      i -> (if (i % 3 == 0) "spark shuffle partition join"
            else "recipe garden cooking flowers")): _*)
    val target = all.where(col("doc_id") % 3 === 0)
    val raw = all.where(col("doc_id") % 3 =!= 0)
    val out = Dsir.select(target, raw, k = 10, nBuckets = 512)
    val rows = out.collect()
    assert(rows.length === 10)
    val keys = rows.map(_.getAs[Double]("gumbel_key"))
    assert(keys.sameElements(keys.sortBy(-_)), "output ordered by key desc")
  }

  test("nBuckets must divide 65536; k and lambda validated") {
    val d = corpus(1L -> "a")
    intercept[IllegalArgumentException] { Dsir.fitLogRatios(d, d, nBuckets = 1000) }
    intercept[IllegalArgumentException] { Dsir.fitLogRatios(d, d, lambda = 0.0) }
    intercept[IllegalArgumentException] {
      Dsir.resampleTopK(d.withColumn("log_weight", lit(0.0)), 0)
    }
  }

  test("crossGroupOverlap counts shared dup groups once per pair") {
    val df = Seq(
      (1L, "copied text", "src0"),
      (2L, "Copied Text ", "src1"), // same dupKey (lower+trim)
      (3L, "copied text", "src2"),
      (4L, "unique a", "src0"),
      (5L, "unique b", "src1"),
      (6L, "shared two", "src1"),
      (7L, "shared two", "src2")).toDF("doc_id", "text", "source")
    val got = Dedup.crossGroupOverlap(df, "source").collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("src0", "src1") -> 1L, ("src0", "src2") -> 1L,
      ("src1", "src2") -> 2L))
  }

  test("crossGroupOverlap: null text and null group contribute nothing") {
    val df = Seq(
      (1L, null: String, "a"), (2L, null: String, "b"),
      (3L, "t", null: String), (4L, "t", "a"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.crossGroupOverlap(df, "source").count() === 0,
      "null texts are not duplicates of each other; null groups drop")
  }

  test("crossGroupOverlap: within-group duplicates alone produce no pairs") {
    val df = Seq((1L, "same", "a"), (2L, "same", "a"))
      .toDF("doc_id", "text", "source")
    assert(Dedup.crossGroupOverlap(df, "source").count() === 0)
  }
}
