package graft

import org.apache.spark.sql.functions._
import graft.ann.Retrieval

/** Chunk-level retrieval capstone (chunk → embed → top-k with provenance):
  * exact integer scoring, ranking determinism, the eval-sized-queries
  * contract, and the map-side top-k plan shape.
  */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("hashEmbedding: deterministic, dim-sized, values in [0, 1000)") {
    val out = Seq("hello world", "hello world", "", "other")
      .toDF("text")
      .select(Retrieval.hashEmbedding(col("text"), 6, "emb").as("v"))
      .as[Seq[Long]].collect()
    assert(out.forall(_.length == 6))
    assert(out.flatten.forall(v => v >= 0 && v < 1000))
    assert(out(0) == out(1))               // same text → same vector
    assert(out(0) != out(3))               // different text → different vector
    assert(out(2).nonEmpty)                // empty string still embeds
  }

  test("topKChunks: exact inner products, rank order, ties broken by (doc, chunk)") {
    val chunks = Seq(
      (1L, 0L, 0L, Seq(1L, 0L)),   // score vs q=(2,3): 2
      (1L, 1L, 24L, Seq(0L, 2L)),  // 6
      (2L, 0L, 0L, Seq(3L, 0L)),   // 6 — ties doc1/chunk1; doc 1 wins
      (3L, 0L, 0L, Seq(5L, 5L))    // 25
    ).toDF("doc_id", "chunk_idx", "chunk_start", "vec")
    val queries = Seq((7L, Seq(2L, 3L))).toDF("query_id", "vec")
    val out = Retrieval.topKChunks(chunks, queries, k = 3)
      .orderBy("rank")
      .select("rank", "doc_id", "chunk_idx", "score")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 3L, 0L, 25L), (2L, 1L, 1L, 6L),
      (3L, 2L, 0L, 6L)), out.mkString(", "))
  }

  test("topKChunks: oversized query set fails loudly instead of a silent cartesian") {
    val chunks = Seq((1L, 0L, 0L, Seq(1L))).toDF(
      "doc_id", "chunk_idx", "chunk_start", "vec")
    val queries = Seq((1L, Seq(1L)), (2L, Seq(2L))).toDF("query_id", "vec")
    val e = intercept[IllegalArgumentException] {
      Retrieval.topKChunks(chunks, queries, k = 1, maxQueries = 1L)
    }
    assert(e.getMessage.contains("IVF"), e.getMessage)
  }

  test("retrieveChunks: query side broadcasts, per-query top-k collapses map-side") {
    val docs = (0L until 40L).map(i => (i, s"tok$i " * 50)).toDF("doc_id", "text")
    val qs = Seq((1L, "tok1 tok2 tok3")).toDF("query_id", "text")
    val out = Retrieval.retrieveChunks(docs, qs, k = 3)
    val p = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$p")
    assert(p.contains("WindowGroupLimit"),
      s"per-query top-k must push below the exchange:\n$p")
    assert(out.count() == 3)
  }

  test("retrieveChunks: re-shard invariant; null-text docs contribute no chunks") {
    val docs = ((0L until 30L).map(i => (i, s"alpha beta w$i " * 20)) :+
      (99L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val qs = Seq((5L, "alpha beta w5"), (9L, "alpha beta w9"))
      .toDF("query_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Retrieval.retrieveChunks(d, qs, k = 4)
        .orderBy("query_id", "rank")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    val a = run(docs)
    assert(a == run(docs.repartition(7)))
    assert(a.forall(_._3 != 99L))
  }
}
