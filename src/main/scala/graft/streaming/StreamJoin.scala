package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream joins (the remaining Structured Streaming
  * operator family: dedup, keyed state, session windows and stream-static
  * joins live in StreamingText/Sessionize; this adds stream-STREAM).
  *
  * Spark keeps BOTH sides' unmatched rows in state until the watermark plus
  * the time bound passes, so the join condition MUST carry an event-time
  * range — without it state never expires and a 100 TB-scale stream OOMs by
  * construction. `withinTime` builds exactly that shape: key equality plus
  * `rightTs ∈ [leftTs - before, leftTs + after]`, both sides watermarked.
  * State size is then bounded by (event rate) × (delay + before + after),
  * independent of stream length — the property StreamJoinSpec pins by
  * asserting late rows stop matching once the watermark passes them.
  */
object StreamJoin {

  /** Inner (or left-outer) join of two event streams on `keyCol` where the
    * right event's time lies within [left - before, left + after]. Both
    * `leftTs`/`rightTs` must be TIMESTAMP columns with distinct names; all
    * non-key column names must be disjoint across the two sides (rename
    * upstream — keeping the projection explicit beats silent suffixing).
    */
  def withinTime(left: DataFrame, right: DataFrame, keyCol: String,
                 leftTs: String, rightTs: String, delay: String,
                 before: String, after: String,
                 joinType: String = "inner"): DataFrame = {
    val overlap = right.columns.toSet.intersect(left.columns.toSet) - keyCol
    require(overlap.isEmpty,
      s"non-key columns must be disjoint, clashing: ${overlap.mkString(", ")}")
    val rkey = s"graft_${keyCol}_r"
    val l = left.withWatermark(leftTs, delay)
    val r = right.withWatermark(rightTs, delay)
      .withColumnRenamed(keyCol, rkey)
    l.join(r,
        col(keyCol) === col(rkey) &&
          col(rightTs) >= col(leftTs) - expr(s"interval $before") &&
          col(rightTs) <= col(leftTs) + expr(s"interval $after"),
        joinType)
      .drop(rkey)
  }
}
