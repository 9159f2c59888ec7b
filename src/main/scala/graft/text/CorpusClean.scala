package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-level cleaning operators for LLM training pipelines — the C4
  * recipe family (Raffel et al. 2020 §2.2): boilerplate removal at line
  * granularity across the WHOLE corpus, not per document.
  */
object CorpusClean {

  /** C4-style global line deduplication: every distinct (trimmed) line keeps
    * its FIRST corpus-wide occurrence — ordered by (doc id, line index) — and
    * every later occurrence is dropped; documents are reassembled in original
    * line order. Blank lines are layout, not content: dropped before
    * counting. Output: `(idCol, text_clean, n_kept, n_dropped)`, one row per
    * input document (a fully-boilerplate doc comes back with empty
    * `text_clean`).
    *
    * Scale shape: the dedup is `groupBy(line).agg(min(doc, idx))` + a
    * semi-join back — NOT a window `row_number() over (partition by line)`.
    * Partial aggregation collapses a line duplicated across millions of docs
    * map-side, so the shuffle carries each distinct line ~once per input
    * partition and no executor ever buffers a duplicate group in memory
    * (WindowExec would buffer the largest group's rows — the exact skew that
    * boilerplate lines produce). Reassembly is a per-document
    * `collect_list` bounded by document size.
    */
  def globalLineDedup(docs: DataFrame, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    val lines = docs.select(col(idCol), posexplode(split(col(textCol), "\n")))
      .withColumn("ln", trim(col("col")))
      .where(col("ln") =!= "")
      .select(col(idCol), col("pos").as("idx"), col("ln"))
    val winners = lines.groupBy("ln")
      .agg(min(struct(col(idCol), col("idx"))).as("w"))
      .select(col("ln"), col("w")(idCol).as(idCol), col("w.idx").as("idx"))
    val kept = lines.join(winners, Seq("ln", idCol, "idx"), "left_semi")
    val reassembled = kept.groupBy(idCol)
      .agg(sort_array(collect_list(struct(col("idx"), col("ln")))).as("ls"))
      .select(col(idCol),
        array_join(transform(col("ls"), e => e.getField("ln")), "\n").as("text_clean"),
        size(col("ls")).as("n_kept"))
    val totals = lines.groupBy(idCol).agg(count(lit(1)).as("n_lines"))
    docs.select(col(idCol))
      .join(reassembled, Seq(idCol), "left")
      .join(totals, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("text_clean"), lit("")).as("text_clean"),
        coalesce(col("n_kept"), lit(0)).cast("long").as("n_kept"),
        (coalesce(col("n_lines"), lit(0L)) - coalesce(col("n_kept"), lit(0)))
          .cast("long").as("n_dropped"))
  }
}
