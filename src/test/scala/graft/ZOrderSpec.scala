package graft

import graft.operators.ZOrder
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  test("zValue: known-answer bit interleave") {
    import spark.implicits._
    // x=0b101, y=0b011 at 3 bits → z bits (y2 x2 y1 x1 y0 x0) = 0b011011 = 27
    val df = Seq((5L, 3L), (0L, 0L), (7L, 7L), (1L, 0L), (0L, 1L))
      .toDF("x", "y")
      .select(ZOrder.zValue(3, col("x"), col("y")).as("z"))
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(27L, 0L, 63L, 1L, 2L))
  }

  test("clampToBits: negatives to 0, overflow to max, null to max (least/greatest skip nulls)") {
    import spark.implicits._
    // Spark AND DuckDB least/greatest both IGNORE nulls, so a null dim lands
    // at the max bucket in both engines — consistent, but callers with
    // nullable dims should coalesce to an explicit sentinel first
    val out = Seq(Some(-5L), Some(0L), Some(1023L), Some(4096L), None)
      .toDF("v").select(ZOrder.clampToBits(col("v"), 10).as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getLong(0)))
    assert(out.toSeq == Seq(Some(0L), Some(0L), Some(1023L), Some(1023L), Some(1023L)))
  }

  test("zValue stays inside whole-stage codegen (no UDF in the projection)") {
    // range (not a local Seq) so the projection actually plans instead of
    // constant-folding into a LocalTableScan
    val p = spark.range(100).select(
        ZOrder.zValue(8, col("id"), col("id") + 1).as("z"))
      .queryExecution.executedPlan.toString
    // the "*(1)" stage marker is toString's WholeStageCodegen notation
    assert(p.contains("*(1) Project"), s"z projection must codegen:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"))
  }

  test("writeZOrdered: every file has a tight min/max span on BOTH dimensions") {
    import spark.implicits._
    // a 64x64 grid: a linear sort on x would give files spanning ALL of y
    val grid = spark.range(64 * 64).select(
      (col("id") / 64).cast("long").as("x"), (col("id") % 64).as("y"))
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      ZOrder.writeZOrdered(grid, dir, nFiles = 16,
        ZOrder.zValue(6, ZOrder.clampToBits(col("x"), 6), ZOrder.clampToBits(col("y"), 6)))
      val files = new java.io.File(dir).listFiles()
        .filter(_.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      assert(files.length >= 8, s"expected ~16 files, got ${files.length}")
      // per-file spans: the min/max range a parquet reader would prune on.
      // 4096 rows over 16 z-range files ≈ 16x16 Morton tiles; range
      // boundaries are SAMPLED, so a file may straddle two adjacent tiles
      // (span ≤ 32) — still far below the 63 a 1-D sort leaves on the
      // non-sorted dimension.
      val spans = files.map { f =>
        val r = spark.read.parquet(f)
          .agg(max("x") - min("x"), max("y") - min("y")).head()
        (r.getLong(0), r.getLong(1))
      }
      assert(spans.forall { case (sx, sy) => sx <= 33 && sy <= 33 },
        s"z-order files must bound both dims (<=33 of 63): ${spans.toSeq}")
      // contrast: the same write sorted only by x leaves y unpruned
      val lin = java.nio.file.Files.createTempDirectory("graft-linear").toString
      try {
        grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
          .write.mode("overwrite").parquet(lin)
        val ySpans = new java.io.File(lin).listFiles()
          .filter(_.getName.endsWith(".parquet")).map { f =>
            val r = spark.read.parquet(f.getAbsolutePath)
              .agg(max("y") - min("y")).head()
            r.getLong(0)
          }
        assert(ySpans.forall(_ == 63L),
          s"x-only layout must span all of y (the contrast case): ${ySpans.toSeq}")
      } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(lin))
    } finally org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
  }

  test("bucketSpans report: buckets partition the z range with tight per-dim spans") {
    import spark.implicits._
    val grid = spark.range(32 * 32).select(
      (col("id") / 32).cast("long").as("a"), (col("id") % 32).as("b"))
    val rep = ZOrder.bucketSpans(grid, bits = 5, bucketBits = 4,
      ("a", col("a")), ("b", col("b"))).orderBy("bucket").collect()
    assert(rep.length == 16, "10 z bits >> 6 = 16 occupied buckets on a full grid")
    assert(rep.forall(_.getLong(1) == 64L), "even occupancy on a uniform grid")
    rep.foreach { r =>
      assert(r.getAs[Long]("max_a") - r.getAs[Long]("min_a") <= 8)
      assert(r.getAs[Long]("max_b") - r.getAs[Long]("min_b") <= 8)
    }
  }
}
