package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for hot keys.
  *
  * Scope note: sum/count/min/max do NOT need salting — Spark's map-side
  * partial HashAggregate already collapses a hot key to one row per map task,
  * so no reducer sees the raw row volume. Salting earns its keep for
  * aggregates whose partial state grows with the data — collect_list /
  * collect_set / exact count-distinct — where a hot key's entire state
  * otherwise materializes on a single reducer. It is an out-of-memory
  * avoidance tool, not a latency tool: the extra shuffle costs wall-clock at
  * small scale and pays off when one key's aggregate state would not fit a
  * single executor. The decomposable helpers exist for completeness (mixing
  * them into a salted plan costs only the partial rows) and for testing the
  * two-stage machinery.
  *
  * The salt is a deterministic content hash of the row, NOT `rand()`:
  * positionally-seeded rand re-assigns salts when a failed map task is
  * recomputed with a different input order, which double-counts or drops rows
  * in the two-stage plan (silent corruption under task retry).
  */
object Skew {

  /** Decomposable-aggregate spec: `partial` per (key, salt) producing a
    * column aliased `name`; `merge` combines the stage-1 partials per key.
    */
  case class SaltedAgg(partial: Column, merge: Column)

  def sum2(c: Column, as: String): SaltedAgg =
    SaltedAgg(sum(c).as(as), sum(col(as)).as(as))
  def count2(as: String): SaltedAgg =
    SaltedAgg(count(lit(1)).as(as), sum(col(as)).as(as))
  def min2(c: Column, as: String): SaltedAgg =
    SaltedAgg(min(c).as(as), min(col(as)).as(as))
  def max2(c: Column, as: String): SaltedAgg =
    SaltedAgg(max(c).as(as), max(col(as)).as(as))

  /** collect_list with salted state: each reducer holds ~1/saltBuckets of a
    * hot key's elements; merge flattens. Order is unspecified (as with plain
    * collect_list).
    */
  def collectList2(c: Column, as: String): SaltedAgg =
    SaltedAgg(collect_list(c).as(as), flatten(collect_list(col(as))).as(as))

  /** Exact count-distinct with salted state: per-salt distinct sets, merged
    * and de-duplicated at stage 2.
    */
  def countDistinct2(c: Column, as: String): SaltedAgg =
    SaltedAgg(collect_set(c).as(as),
      size(array_distinct(flatten(collect_list(col(as))))).cast("long").as(as))

  /** Two-stage salted aggregation: stage 1 shuffles on (keys, salt) — a hot
    * key's state spreads over `saltBuckets` reducers — stage 2 merges the
    * (keys × salts) partial rows. Note: summing decimals twice widens
    * precision twice vs a plain aggregate (decimal(p+20,s) vs (p+10,s)).
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      aggs: SaltedAgg*): DataFrame = {
    require(saltBuckets > 0, "saltBuckets must be positive")
    require(aggs.nonEmpty, "at least one SaltedAgg is required")
    require(!df.columns.contains("__graft_salt") && !keys.contains("__graft_salt"),
      "input must not use the reserved __graft_salt column")
    // Salt = hash(input partition id, hashable columns). The partition-id mix
    // spreads FULLY IDENTICAL duplicate rows (replayed messages — a common
    // hot-key shape) across buckets proportional to their input partitions,
    // where a pure content hash would collapse them onto one reducer; it is
    // stable under task retry because a recomputed task re-reads the same
    // partition. Columns containing MapType ANYWHERE in their type tree are
    // excluded: Catalyst's hash() rejects maps recursively (undefined element
    // order), so a struct-of-map or array-of-map would fail analysis too.
    import org.apache.spark.sql.types._
    def containsMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case ArrayType(et, _) => containsMap(et)
      case StructType(fields) => fields.exists(f => containsMap(f.dataType))
      case _ => false
    }
    val hashable = df.schema.fields.collect {
      case f if !containsMap(f.dataType) => col(f.name)
    }.toSeq
    val salted = df.withColumn("__graft_salt",
      pmod(hash(spark_partition_id() +: hashable: _*), lit(saltBuckets)))
    val stage1 = salted.groupBy((keys :+ "__graft_salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    stage1.groupBy(keys.map(col): _*)
      .agg(aggs.head.merge, aggs.tail.map(_.merge): _*)
  }
}
