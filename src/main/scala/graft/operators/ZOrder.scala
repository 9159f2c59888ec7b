package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) multi-dimensional data layout.
  *
  * Why it matters at 100 TB: parquet pruning is driven by per-file and
  * per-row-group min/max on each column. A sort on ONE column gives perfect
  * pruning on that column and none on the others; interleaving the bits of
  * several columns and range-partitioning + sorting on the interleaved value
  * gives every laid-out file a tight min/max span on EVERY participating
  * dimension, so selective predicates on any of them skip most of the scan.
  * This is the layout step behind Delta/Iceberg's OPTIMIZE ZORDER, built
  * here from Spark built-ins only: the z-value is a pure shift/and/or
  * expression (whole-stage codegen, no UDF), the layout is
  * `repartitionByRange` + `sortWithinPartitions` — one range exchange, the
  * same cost as any global sort of the write.
  *
  * The z-value needs each dimension as a small non-negative integer.
  * `clampToBits` is the explicit normalizer (callers pick the resolution;
  * 8-16 bits per dimension is plenty for file-level pruning — more bits
  * refine ordering WITHIN files, which parquet's own row-group sort stats
  * already cover).
  */
object ZOrder {

  /** `c` clamped into [0, 2^bits): negative to 0, overflow to the max. */
  def clampToBits(c: Column, bits: Int): Column =
    greatest(lit(0L), least(c.cast("long"), lit((1L << bits) - 1)))

  /** Bit-interleaved Morton value of `dims`, `bits` bits each (dim 0 owns
    * the lowest interleaved bit). Every dim must already be in [0, 2^bits)
    * — compose with [[clampToBits]]. Total bits = dims.length * bits <= 62.
    * Built as a flat sum of `(dim >> b & 1) * 2^(b*n + i)` terms: all
    * integer built-ins, one codegen'd projection, no UDF.
    */
  def zValue(bits: Int, dims: Column*): Column = {
    require(dims.nonEmpty, "zValue needs at least one dimension")
    require(dims.length * bits <= 62,
      s"${dims.length} dims x $bits bits exceeds a signed long")
    val terms = for {
      b <- 0 until bits
      (d, i) <- dims.zipWithIndex
    } yield (shiftright(d.cast("long"), b).bitwiseAND(lit(1L))) *
      lit(1L << (b * dims.length + i))
    terms.reduce(_ + _)
  }

  /** Write `df` z-ordered on `zCol` into `nFiles` range partitions. The
    * z column itself is dropped before the write (it is recomputable and
    * would bloat the files); range partitioning and the within-partition
    * sort survive the projection, so file k holds a contiguous z-range.
    */
  def writeZOrdered(df: DataFrame, path: String, nFiles: Int,
                    zCol: Column): Unit =
    df.withColumn("graft_z", zCol)
      .repartitionByRange(nFiles, col("graft_z"))
      .sortWithinPartitions("graft_z")
      .drop("graft_z")
      .write.mode("overwrite").parquet(path)

  /** Layout quality report: per z-range bucket (top `bucketBits` bits of
    * the z-value), the row count and each dimension's min/max span. Tight
    * per-bucket spans on every dimension are exactly what file-level
    * min/max pruning sees after [[writeZOrdered]] — this is the measurable
    * form of "z-order helps all dimensions". Metadata-sized output
    * (2^bucketBits rows).
    */
  def bucketSpans(df: DataFrame, bits: Int, bucketBits: Int,
                  dims: (String, Column)*): DataFrame = {
    val z = zValue(bits, dims.map(d => clampToBits(d._2, bits)): _*)
    val shift = dims.length * bits - bucketBits
    val spans = dims.flatMap { case (name, c) =>
      Seq(min(c).as(s"min_$name"), max(c).as(s"max_$name"))
    }
    val aggs = count(lit(1)).as("n") +: spans
    df.withColumn("graft_z", z)
      .withColumn("bucket", shiftright(col("graft_z"), shift))
      .groupBy("bucket")
      .agg(aggs.head, aggs.tail: _*)
  }
}
