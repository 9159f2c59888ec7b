package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Chunk-level retrieval — the RAG indexing capstone: a document corpus is
  * chunked ([[graft.text.CorpusClean.chunkByTokens]]), every chunk gets an
  * embedding, and an eval-sized query set retrieves its top-k chunks WITH
  * PROVENANCE (`doc_id`, `chunk_idx`, token offset) — the shape a retrieval
  * index actually serves, one level finer than the document-granular ANN
  * family in [[Ann]].
  *
  * Scale design: the brute-force scorer here is the EXACT baseline — one
  * narrow scan of the chunk table against a broadcast query set, per-query
  * top-k collapsed map-side (WindowGroupLimit pushes the k-bound below the
  * exchange, so the shuffle carries ≤ k × partitions rows per query, never
  * the corpus). The query side must be eval-sized by contract and that
  * contract is ENFORCED on the measured count — a silently-shuffled
  * corpus×corpus cartesian is the 100 TB failure mode, so an oversized
  * query set fails loudly and points at the indexed path ([[Ann.writeIvf]] /
  * [[Ann.writeIvfPq]] over the chunk table) instead.
  */
object Retrieval {

  /** Deterministic, engine-portable stand-in embedding: dimension `i` is a
    * 4-nibble fold of `md5(text || ':' || salt || ':' || i)` reduced mod
    * 1000 — integer-valued, so every downstream inner product is EXACT in
    * both Spark and a SQL oracle (no float rounding anywhere). This is the
    * fixture/testing embedding that makes the retrieval MECHANICS
    * (chunking, scoring, ranking, provenance) hash-checkable end-to-end; a
    * real model embedding plugs into the same `array<long>`-shaped column
    * contract (cast upstream) without touching the scorer.
    */
  def hashEmbedding(text: Column, dim: Int, salt: String): Column = {
    require(dim >= 1, "dim must be >= 1")
    transform(sequence(lit(0), lit(dim - 1)), i =>
      conv(substring(md5(concat(text, lit(s":$salt:"), i.cast("string"))),
        1, 4), 16, 10).cast("long") % 1000)
  }

  /** Exact integer inner product of two `array<long>` columns. */
  def innerProduct(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Top-`k` chunks per query by inner product (maximum-inner-product
    * retrieval — the scoring real dense retrievers use pre-normalization).
    * `chunks` carries `(doc_id, chunk_idx, chunk_start, vecCol)`, `queries`
    * carries `(query_id, vecCol)`. Output: one row per (query, rank):
    * `(query_id, rank, doc_id, chunk_idx, chunk_start, score)` — ties
    * broken by (doc_id, chunk_idx) for determinism.
    */
  def topKChunks(chunks: DataFrame, queries: DataFrame, k: Int,
                 vecCol: String = "vec",
                 maxQueries: Long = 1000000L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val q = queries.select(col("query_id"), col(vecCol).as("qv"))
    val nq = q.count()
    require(nq <= maxQueries,
      s"query set has $nq rows > maxQueries=$maxQueries — a broadcast " +
        "top-k scan is the wrong plan at that size; build an IVF/PQ index " +
        "over the chunk table (graft.ann.Ann) instead")
    val scored = chunks
      .join(broadcast(q))
      .select(col("query_id"), col("doc_id"), col("chunk_idx"),
        col("chunk_start"),
        innerProduct(col(vecCol), col("qv")).as("score"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("score").desc, col("doc_id"), col("chunk_idx"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "doc_id", "chunk_idx", "chunk_start",
        "score")
  }

  /** The full capstone: chunk the corpus (token windows), embed chunks and
    * queries with [[hashEmbedding]], retrieve top-`k` per query. Documents
    * with NULL text produce no chunks (nothing to retrieve); a query row's
    * vector embeds its full `textCol`.
    */
  def retrieveChunks(docs: DataFrame, queries: DataFrame, k: Int,
                     chunkTokens: Int = 32, overlapTokens: Int = 8,
                     dim: Int = 4, salt: String = "emb",
                     textCol: String = "text"): DataFrame = {
    val chunks = graft.text.CorpusClean
      .chunkByTokens(docs, chunkTokens, overlapTokens, textCol = textCol)
      .where(col("chunk").isNotNull)
      .select(col("doc_id"), col("chunk_idx"), col("chunk_start"),
        hashEmbedding(col("chunk"), dim, salt).as("vec"))
    val q = queries.select(col("query_id"),
      hashEmbedding(col(textCol), dim, salt).as("vec"))
    topKChunks(chunks, q, k)
  }
}
