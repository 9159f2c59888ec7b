package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew tooling for hot keys. AQE's skew-join handling covers joins at
  * runtime; aggregation over a hot key (one topic receiving most of the
  * traffic, one stopword-heavy shingle) still funnels the key's entire
  * partition through one reducer. Salting splits each key across
  * `saltBuckets` reducers with a two-stage aggregation.
  */
object Skew {

  /** Decomposable-aggregate spec: stage 1 computes `partial` per
    * (key, salt), stage 2 merges partials per key with `merge`.
    */
  case class SaltedAgg(partial: Column, merge: String => Column, name: String)

  def sum2(c: Column, as: String): SaltedAgg =
    SaltedAgg(sum(c).as(as), col0 => sum(col(col0)).as(as), as)
  def count2(as: String): SaltedAgg =
    SaltedAgg(count(lit(1)).as(as), col0 => sum(col(col0)).as(as), as)
  def min2(c: Column, as: String): SaltedAgg =
    SaltedAgg(min(c).as(as), col0 => min(col(col0)).as(as), as)
  def max2(c: Column, as: String): SaltedAgg =
    SaltedAgg(max(c).as(as), col0 => max(col(col0)).as(as), as)

  /** Two-stage salted aggregation: stage 1 shuffles on (keys, salt) — the hot
    * key spreads over `saltBuckets` reducers — stage 2 shuffles only the
    * (keys × salts) partial rows. Correct for any decomposable aggregate.
    */
  def saltedAggregate(df: DataFrame, keys: Seq[String], saltBuckets: Int,
                      aggs: SaltedAgg*): DataFrame = {
    require(saltBuckets > 0)
    val salted = df.withColumn("__salt", (rand(42) * saltBuckets).cast("int"))
    val stage1 = salted.groupBy((keys :+ "__salt").map(col): _*)
      .agg(aggs.head.partial, aggs.tail.map(_.partial): _*)
    val merged = stage1.groupBy(keys.map(col): _*)
      .agg(aggs.head.merge(aggs.head.name), aggs.tail.map(a => a.merge(a.name)): _*)
    merged
  }
}
