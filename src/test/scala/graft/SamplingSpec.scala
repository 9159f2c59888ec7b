package graft

import graft.text.Sampling
import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

/** Deterministic sampling battery: hash-fraction splits, weighted mixing,
  * benchmark decontamination. Known answers are hand-computed from md5 —
  * the whole point of these operators is that the assignment is portable
  * integer arithmetic, so the spec pins the exact bits.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("hashBucket16 matches hand-computed md5 fold") {
    // md5("42:split") = 58ad5b25... -> 0x58ad = 22701
    val got = spark.range(42, 43).toDF("doc_id")
      .select(Sampling.hashBucket16(col("doc_id"), "split")).head().getLong(0)
    assert(got === 22701L)
  }

  test("assignSplits is exhaustive, deterministic, and partition-independent") {
    val docs = spark.range(0, 2000).toDF("doc_id")
    val splits = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val a = Sampling.assignSplits(docs, splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val b = Sampling.assignSplits(docs.repartition(7), splits).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(a === b, "assignment must not depend on partitioning")
    assert(a.size === 2000, "every doc gets a split")
    val counts = a.values.groupBy(identity).view.mapValues(_.size).toMap
    // binomial(2000, 0.8): 5 sigma ≈ 90
    assert(math.abs(counts("train") - 1600) < 120, s"train skewed: $counts")
    assert(math.abs(counts("val") - 200) < 90, s"val skewed: $counts")
    assert(math.abs(counts("test") - 200) < 90, s"test skewed: $counts")
  }

  test("assignSplits rejects bad weights") {
    val docs = spark.range(0, 1).toDF("doc_id")
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, Seq("a" -> 0.5, "b" -> 0.2))
    }
    intercept[IllegalArgumentException] {
      Sampling.assignSplits(docs, Seq.empty)
    }
  }

  test("sampleWeighted: integer weights copy exactly, fractional weights hash-sample") {
    val docs = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        when(col("id") < 500, "a").otherwise("b").as("source"))
    val out = Sampling.sampleWeighted(docs, Map("a" -> 2.0, "b" -> 0.5))
      .groupBy("source").agg(countDistinct("doc_id").as("docs"),
        count(lit(1)).as("rows")).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("a") === ((500L, 1000L)), "w=2.0 must emit exactly 2 copies per doc")
    val (bDocs, bRows) = out("b")
    assert(bDocs === bRows, "w=0.5 emits at most one copy per doc")
    assert(math.abs(bDocs - 250L) < 70, s"w=0.5 kept $bDocs of 500 (expect ~250)")
    // copy indices are dense from 0
    val copies = Sampling.sampleWeighted(docs, Map("a" -> 2.0, "b" -> 0.5))
      .filter(col("source") === "a").groupBy("doc_id")
      .agg(sort_array(collect_list("copy")).as("c"))
      .select("c").distinct().collect()
    assert(copies.length === 1 && copies.head.getSeq[Long](0) === Seq(0L, 1L))
  }

  test("sampleWeighted is deterministic under retry-like re-evaluation") {
    val docs = spark.range(0, 400)
      .select(col("id").as("doc_id"), lit("a").as("source"))
    def run() = Sampling.sampleWeighted(docs, Map("a" -> 1.5))
      .select("doc_id", "copy").collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(run().toSeq === run().toSeq)
  }

  test("decontaminate flags n-gram overlap with the benchmark, honors minMatches") {
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "x alpha beta gamma y"),               // shares "alpha beta gamma"
      (11L, "x alpha beta gamma delta y"),          // shares 2 distinct 3-grams... plus more
      (12L, "nothing in common here at all")
    ).toDF("doc_id", "text")
    val out = Sampling.decontaminate(corpus, bench, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.keySet === Set(10L, 11L))
    assert(out(10L) === 1L)
    assert(out(11L) === 2L) // "alpha beta gamma" and "beta gamma delta"
    val strict = Sampling.decontaminate(corpus, bench, shingleN = 3, minMatches = 2)
      .collect().map(_.getLong(0)).toSet
    assert(strict === Set(11L))
    // the over-sized-benchmark path (measured-count gate trips → shuffle
    // join instead of broadcast) must produce the identical flags
    val unbroadcast = Sampling.decontaminate(corpus, bench, shingleN = 3,
        broadcastMaxGrams = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(unbroadcast === out)
  }

  test("decontaminateReport: provenance pairs per benchmark item, flagged-set consistent") {
    val bench = Seq(
      (100L, "alpha beta gamma delta"),
      (200L, "gamma delta epsilon zeta"),
      (300L, "totally unrelated benchmark item")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "x alpha beta gamma delta epsilon y"), // overlaps BOTH 100 and 200
      (11L, "x gamma delta epsilon z"),            // overlaps 200 (and 100? no 3-gram)
      (12L, "nothing in common here at all")).toDF("doc_id", "text")
    val rows = Sampling.decontaminateReport(corpus, bench, shingleN = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // doc 10 shares "alpha beta gamma"+"beta gamma delta" with 100 and
    // "gamma delta epsilon" with 200; doc 11 only "gamma delta epsilon"
    assert(rows.keySet == Set((10L, 100L), (10L, 200L), (11L, 200L)),
      s"provenance pairs wrong: ${rows.keySet}")
    assert(rows((10L, 100L)) == 2L)
    assert(rows((10L, 200L)) == 1L)
    assert(rows((11L, 200L)) == 1L)
    // the reported corpus docs are exactly decontaminate's flagged set
    val flagged = Sampling.decontaminate(corpus, bench, shingleN = 3)
      .collect().map(_.getLong(0)).toSet
    assert(rows.keySet.map(_._1) == flagged)
    // a benchmark with no leaks contributes no rows
    assert(!rows.keySet.exists(_._2 == 300L))
  }

  test("decontaminateBloom: exact result (bloom only prunes), native probe in plan") {
    val bench = Seq((1L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "x alpha beta gamma y"),
      (11L, "x alpha beta gamma delta y"),
      (12L, "nothing in common here at all")
    ).toDF("doc_id", "text")
    val exact = Sampling.decontaminate(corpus, bench, shingleN = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val bloomed = Sampling.decontaminateBloom(corpus, bench, shingleN = 3)
    assert(bloomed.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap === exact)
    // the probe is the native codegen expression, not a UDF, and it sits in
    // the plan as a Filter feeding the confirm join
    val plan = bloomed.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(1500))
    assert(!plan.toLowerCase.contains("scalaudf"), plan.take(1500))
    // minMatches flows through identically
    assert(Sampling.decontaminateBloom(corpus, bench, shingleN = 3,
      minMatches = 2).collect().map(_.getLong(0)).toSet === Set(11L))
  }

  test("decontaminateBloom on sf0.001 == exact decontaminate, row for row") {
    val all = spark.read.parquet(s"$sf0001/documents.parquet")
    val corpus = all.filter(col("doc_id") % 20 =!= 7)
    val bench = all.filter(col("doc_id") % 20 === 7)
    def key(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1).toSeq
    // tight fpp and loose fpp must both be exact — fpp only moves prune cost
    assert(key(Sampling.decontaminateBloom(corpus, bench, 13, fpp = 0.01))
      === key(Sampling.decontaminate(corpus, bench, 13)))
    assert(key(Sampling.decontaminateBloom(corpus, bench, 13, fpp = 0.5))
      === key(Sampling.decontaminate(corpus, bench, 13)))
  }

  test("decontaminateBloom: empty benchmark flags nothing, keeps schema") {
    val corpus = Seq((1L, "some words here")).toDF("doc_id", "text")
    val out = Sampling.decontaminateBloom(corpus,
      Seq.empty[(Long, String)].toDF("doc_id", "text"), shingleN = 3)
    assert(out.columns.toSeq === Seq("doc_id", "n_matched"))
    assert(out.count() === 0)
  }

  test("stratifiedTake: exactly min(k, |stratum|) per stratum, deterministic, map-side limited") {
    val docs = spark.range(0, 1000)
      .select(col("id").as("doc_id"),
        when(col("id") % 10 < 7, "big").otherwise(
          when(col("id") % 10 < 9, "mid").otherwise("tiny")).as("lang"))
    val taken = Sampling.stratifiedTake(docs, k = 50, strataCols = Seq("lang"))
    val counts = taken.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("big" -> 50L, "mid" -> 50L, "tiny" -> 50L))
    // small stratum: takes everything when |stratum| < k
    val tinyAll = Sampling.stratifiedTake(docs.filter(col("lang") === "tiny"),
      k = 500, strataCols = Seq("lang")).count()
    assert(tinyAll === 100L)
    // deterministic and partition-independent
    val a = taken.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    val b = Sampling.stratifiedTake(docs.repartition(13), k = 50,
      strataCols = Seq("lang")).select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(a === b)
    // the rn <= k filter must become a map-side WindowGroupLimit: each task
    // pre-truncates to k per stratum before the shuffle — the reason a
    // billion-row stratum doesn't ship a billion rows
    val p = taken.queryExecution.explainString(FormattedMode)
    assert(p.contains("WindowGroupLimit"), s"rank filter not pushed map-side:\n$p")
  }

  test("null inputs: null text never matches, null source takes the default weight, null id falls to the last split") {
    val withNullText = Seq((1L, "alpha beta gamma delta"), (2L, null))
      .toDF("doc_id", "text")
    // null text on either side: no shingles, no flags, no crash
    val flags = Sampling.decontaminate(withNullText,
      Seq((9L, "alpha beta gamma")).toDF("doc_id", "text"), shingleN = 3)
      .collect().map(_.getLong(0)).toSet
    assert(flags === Set(1L))
    assert(Sampling.decontaminate(withNullText,
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"),
      shingleN = 3).count() === 0)
    // null source → defaultWeight applies
    val mixed = Sampling.sampleWeighted(
      Seq((1L, null.asInstanceOf[String]), (2L, "a")).toDF("doc_id", "source"),
      Map("a" -> 2.0), defaultWeight = 1.0)
    assert(mixed.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap === Map(1L -> 1L, 2L -> 2L))
    // null id: md5(null) is null, every `bucket < cut` is unknown → the doc
    // lands deterministically in the LAST split (documented fall-through)
    val s = Sampling.assignSplits(
      Seq(Some(1L), None).map(Tuple1(_)).toDF("doc_id"),
      Seq("train" -> 0.9, "test" -> 0.1))
    assert(s.filter(col("doc_id").isNull).select("split").head().getString(0) === "test")
  }

  test("plan shapes: splits/mixing are shuffle-free; decontaminate broadcasts the benchmark") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val splitPlan = Sampling.assignSplits(docs, Seq("train" -> 0.9, "test" -> 0.1))
      .queryExecution.explainString(FormattedMode)
    assert(!splitPlan.contains("Exchange"), s"assignSplits must be a narrow map:\n$splitPlan")
    val mixPlan = Sampling.sampleWeighted(docs, Map("src0" -> 2.5))
      .queryExecution.explainString(FormattedMode)
    assert(!mixPlan.contains("Exchange"), s"sampleWeighted must be a narrow map:\n$mixPlan")
    val deconPlan = Sampling.decontaminate(
        docs.filter(col("doc_id") % 20 =!= 7),
        docs.filter(col("doc_id") % 20 === 7), shingleN = 13)
      .queryExecution.explainString(FormattedMode)
    assert(deconPlan.contains("BroadcastHashJoin"),
      s"benchmark grams must broadcast:\n$deconPlan")
    assert(!deconPlan.contains("SortMergeJoin"),
      "the corpus side must never sort-merge against the benchmark")
  }

  test("corpus pipeline: parquet staging matches localCheckpoint; stage written once, never recomputed") {
    import graft.text.CorpusPipeline
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val local = CorpusPipeline.summary(docs).collect().map(_.toString).sorted

    val dir = java.nio.file.Files.createTempDirectory("graft-stagespec").toString
    try {
      val stagedDf = CorpusPipeline.summary(docs, staging = Some(dir))
      // durable: the normalized corpus is real parquet under the staging dir,
      // written exactly once (one overwrite of one directory, by construction)
      val files = new java.io.File(s"$dir/normalized").listFiles()
      assert(files != null && files.exists(_.getName.endsWith(".parquet")),
        "staging dir must hold the written normalized stage")
      // plan-locked: downstream branches read the STAGED copy — the normalize
      // kernel ran exactly once (inside the stage write) and must not appear
      // anywhere in the final plan, whose scans point at the staging path
      val plan = stagedDf.queryExecution.explainString(FormattedMode)
      assert(!plan.contains("nfc_normalize"),
        s"normalize must not be recomputed downstream:\n${plan.take(2000)}")
      assert(plan.contains(s"$dir/normalized"),
        "downstream scans must read the staged parquet")
      // identical results on both materialization paths
      assert(stagedDf.collect().map(_.toString).sorted === local)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("temperatureMix: alpha=1 is the identity mix; alpha=0 equalizes sources") {
    val docs = ((0 until 8).map(i => (i.toLong, "A")) ++
      Seq((100L, "B"), (101L, "B"))).toDF("doc_id", "source")
    // alpha=1: every w_s = 1.0 exactly -> one copy each, no cut involved
    val id = Sampling.temperatureMix(docs, alpha = 1.0).collect()
    assert(id.length === 10 && id.forall(_.getAs[Long]("copy") === 0L))
    // alpha=0: w_A = 10/8/2 = 0.625, w_B = 10/2/2 = 2.5 (exact doubles) ->
    // A docs keep at most one copy, every B doc gets at least two
    val eq = Sampling.temperatureMix(docs, alpha = 0.0).collect()
      .groupBy(_.getAs[String]("source"))
      .view.mapValues(_.groupBy(_.getAs[Long]("doc_id")).view.mapValues(_.length).toMap).toMap
    assert(eq("A").values.forall(_ === 1), s"A over-copied: ${eq("A")}")
    assert(eq("B").values.forall(c => c === 2 || c === 3), s"B copies: ${eq("B")}")
    assert(eq("B").size === 2, "no B doc dropped")
  }

  test("shuffleOrder: a partition-invariant permutation with contiguous per-shard ranks") {
    val docs = spark.range(0, 1000).toDF("doc_id")
    val a = Sampling.shuffleOrder(docs, nShards = 8).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    val b = Sampling.shuffleOrder(docs.repartition(7), nShards = 8).collect()
      .map(r => r.getLong(0) -> ((r.getInt(1), r.getLong(2)))).toMap
    assert(a === b, "coordinates must not depend on partitioning")
    assert(a.size === 1000)
    // ranks are a contiguous 0..n-1 within every shard
    a.values.groupBy(_._1).foreach { case (shard, rs) =>
      val ps = rs.map(_._2).toSeq.sorted
      assert(ps === (0L until ps.size.toLong), s"shard $shard ranks not contiguous")
    }
    // md5 spreads shards evenly-ish (binomial 5-sigma on 1000 docs / 8)
    val sizes = a.values.groupBy(_._1).view.mapValues(_.size)
    sizes.foreach { case (shard, n) =>
      assert(math.abs(n - 125) < 60, s"shard $shard skewed: $n")
    }
    // the order is actually shuffled, not id order
    val shard0 = a.collect { case (id, (0, p)) => (p, id) }.toSeq.sortBy(_._1).map(_._2)
    assert(shard0 != shard0.sorted, "permutation should not be the identity")
  }

  test("temperatureMix: deterministic under repartition; null source passes through once") {
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
    val a = Sampling.temperatureMix(docs, alpha = 0.5).select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    val b = Sampling.temperatureMix(docs.repartition(7), alpha = 0.5)
      .select("doc_id", "copy")
      .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(a.toSeq === b.toSeq)
    val withNull = Seq((1L, "A"), (2L, null.asInstanceOf[String])).toDF("doc_id", "source")
    val got = Sampling.temperatureMix(withNull, alpha = 0.5).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("copy"))
    assert(got.count(_._1 == 2L) === 1, "null-source doc kept exactly once")
    intercept[IllegalArgumentException] {
      Sampling.temperatureMix(withNull, alpha = 1.5)
    }
  }
}
