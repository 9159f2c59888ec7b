package graft.util

import org.apache.spark.sql.DataFrame

/** Block-manager hygiene for eagerly-checkpointed DataFrames.
  *
  * `localCheckpoint(true)` pins its result RDD in the block manager; for
  * iterative operators that checkpoint every round (PageRank, HITS,
  * connected components) the stale rounds must be released as the loop
  * advances or a long-lived session accumulates them. `Dataset.unpersist`
  * cannot do it — checkpoints persist at the RDD layer, below the SQL
  * cache manager — so this reaches through the plan to the backing RDD.
  */
object Checkpoints {

  /** Unpersist the RDD behind a locally-checkpointed DataFrame
    * (best-effort: a no-op if the plan isn't the expected LogicalRDD
    * shape). Safe on the CURRENT result only after the caller is done
    * with it; operators use it on superseded iterates.
    */
  def free(df: DataFrame): Unit =
    df.queryExecution.logical match {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(false)
      case _ => ()
    }
}
