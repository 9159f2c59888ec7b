package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Per-source corpus profile: the first report a training-data run produces
  * (doc counts, duplicate surface, length distribution, token volume).
  *
  * Two paths with the SAME schema:
  *  - [[exact]] is the correctness gate (full DuckDB oracle — exact
  *    count-distinct and exact interpolated percentiles). Its state grows
  *    with the data: count-distinct shuffles one row per distinct digest and
  *    exact percentile accumulates each group's values, so it is the
  *    small-to-medium-corpus / per-shard form.
  *  - [[approx]] is the 100 TB form: HyperLogLog++ `approx_count_distinct`
  *    (fixed ~KB state per group, map-side mergeable) and GK
  *    `percentile_approx` (bounded quantile summaries). Constant state per
  *    (source, metric) regardless of corpus size; ProfileSpec pins it within
  *    tolerance of [[exact]] so the swap is a measured trade, not a guess.
  *
  * Both are single-shuffle: partial aggregates combine map-side and only
  * sketch/summary state moves. The duplicate digest is the battery-wide
  * md5(lower(substring(text,1,40))) so "unique" here agrees with
  * d_exact_dedup's definition of a duplicate.
  */
object Profile {

  private def digest: Column = md5(lower(substring(col("text"), 1, 40)))

  private def tokens: Column =
    size(filter(split(trim(lower(col("text"))), "\\s+"), t => t =!= ""))

  def exact(docs: DataFrame): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      countDistinct(digest).as("n_unique"),
      round(percentile(col("n_chars"), lit(0.5)), 4).as("p50_chars"),
      round(percentile(col("n_chars"), lit(0.9)), 4).as("p90_chars"),
      sum("n_chars").as("total_chars"),
      round(avg(tokens.cast("double")), 4).as("avg_tokens"))

  def approx(docs: DataFrame, accuracy: Int = 10000): DataFrame =
    docs.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      approx_count_distinct(digest).as("n_unique"),
      percentile_approx(col("n_chars"), lit(0.5), lit(accuracy))
        .cast("double").as("p50_chars"),
      percentile_approx(col("n_chars"), lit(0.9), lit(accuracy))
        .cast("double").as("p90_chars"),
      sum("n_chars").as("total_chars"),
      round(avg(tokens.cast("double")), 4).as("avg_tokens"))

  /** Most-frequent terms per group — the datasheet's "top words" panel.
    * Tokenization matches [[TextFunctions.tokens]] on the lowercased text
    * (so counts agree with the avg_tokens metric above). Ties on frequency
    * break lexicographically, so the report is deterministic at any scale.
    *
    * Scale shape: the term count is the canonical word-count (explode +
    * partial-agg groupBy — the map side collapses each partition's repeats
    * before the one (group, term) exchange), and the per-group top-k is a
    * `row_number <= k` that Spark executes as a map-side WindowGroupLimit:
    * a vocabulary-sized group contributes at most k rows per partition to
    * the final ordering, so driver and executors hold O(groups × k), never
    * the vocabulary.
    */
  def topTerms(docs: DataFrame, k: Int,
               groupCols: Seq[String] = Seq("source"),
               textCol: String = "text"): DataFrame = {
    require(k > 0, "k must be positive")
    import org.apache.spark.sql.expressions.Window
    val g = groupCols.map(col)
    val counts = docs
      .select(g :+ explode(TextFunctions.tokens(lower(col(textCol)))).as("term"): _*)
      .groupBy(g :+ col("term"): _*)
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(g: _*).orderBy(col("n").desc, col("term"))
    counts.withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
  }
}
