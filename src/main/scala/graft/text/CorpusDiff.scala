package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus snapshot diff — the release-notes operator for recurring-crawl
  * pipelines: given two corpus versions, classify every document id as
  * `added` / `removed` / `changed` / `unchanged` by content digest, and
  * roll the classification up into the per-source report a release ships
  * with. (The same digest family as [[graft.dedup.Dedup.dupKey]], so "the
  * doc changed" means its dedup identity changed, not byte cosmetics the
  * pipeline already canonicalizes away.)
  */
object CorpusDiff {

  /** Per-document diff between two snapshots: output
    * `(idCol, status, attrs…)` where status ∈ added | removed | changed |
    * unchanged, and `carryCols` (e.g. `source`) are taken from the NEW
    * snapshot when present, the old one for removed docs.
    *
    * Scale shape: each side collapses to a narrow `(id, digest, carry…)`
    * projection before the full-outer id join — one shuffle per side at
    * tens of bytes per row, never document text. No window, no skew key:
    * ids are unique per side by contract (enforce upstream with
    * [[graft.dedup.Dedup.exact]] if a snapshot can contain id dups).
    */
  def diff(oldDocs: DataFrame, newDocs: DataFrame,
           idCol: String = "doc_id", textCol: String = "text",
           carryCols: Seq[String] = Seq("source")): DataFrame = {
    // presence is its own marker — a null-text doc carries a null digest,
    // and presence-by-digest would misread it as absent
    def slim(df: DataFrame, tag: String): DataFrame =
      df.select(col(idCol) +: lit(1).as(s"__in_$tag") +:
        graft.dedup.Dedup.dupKey(col(textCol)).as(s"__dig_$tag") +:
        carryCols.map(c => col(c).as(s"__${c}_$tag")): _*)
    val o = slim(oldDocs, "old")
    val n = slim(newDocs, "new")
    val joined = o.join(n, Seq(idCol), "full_outer")
    val status = when(col("__in_old").isNull, lit("added"))
      .when(col("__in_new").isNull, lit("removed"))
      .when(col("__dig_old") <=> col("__dig_new"), lit("unchanged"))
      .otherwise(lit("changed"))
    joined.select(col(idCol) +: status.as("status") +:
      carryCols.map(c =>
        coalesce(col(s"__${c}_new"), col(s"__${c}_old")).as(c)): _*)
  }

  /** The rollup report over [[diff]]: document counts per (`groupCols…`,
    * status). Partial aggregation collapses each task's rows to at most
    * |groups|×4 before the final exchange.
    */
  def diffReport(oldDocs: DataFrame, newDocs: DataFrame,
                 idCol: String = "doc_id", textCol: String = "text",
                 groupCols: Seq[String] = Seq("source")): DataFrame =
    diff(oldDocs, newDocs, idCol, textCol, groupCols)
      .groupBy(groupCols.head, (groupCols.tail :+ "status"): _*)
      .agg(count(lit(1)).as("n_docs"))
}
