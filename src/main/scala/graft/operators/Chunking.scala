package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document chunking — the context-window-preparation operator every
  * LLM training/RAG pipeline runs: split each document into
  * fixed-token-budget chunks with overlap, preserving token offsets so
  * chunks can be traced back to their source span.
  *
  * Entirely row-local array compute (sequence → slice → array_join):
  * a map-only pass with zero shuffles before the output sort, so it
  * pipelines into the parquet scan at any scale. Chunk text is
  * re-joined from the token slice, which guarantees offsets and text
  * agree by construction.
  */
object Chunking {

  /** Tokens per chunk and step between chunk starts (overlap =
    * ChunkSize - ChunkStep). */
  val ChunkSize = 32
  val ChunkStep = 24

  /** q48: overlapping token-window chunks with offsets and per-chunk
    * stats. The last chunk of each doc may be short (the tail), but a
    * doc always yields at least one chunk. */
  def q48Chunk(documents: DataFrame): DataFrame =
    documents
      .withColumn("toks", split(col("text"), " "))
      .withColumn("c", explode(expr(
        s"""transform(
           |  sequence(0, int(greatest(ceil((size(toks) - $ChunkSize) / cast($ChunkStep AS double)), 0))),
           |  i -> struct(
           |    i AS chunk_id,
           |    i * $ChunkStep AS tok_start,
           |    slice(toks, i * $ChunkStep + 1, $ChunkSize) AS ctoks))""".stripMargin)))
      .select(
        col("doc_id"), col("c.chunk_id").as("chunk_id"),
        col("c.tok_start").as("tok_start"),
        size(col("c.ctoks")).as("n_tokens"),
        md5(array_join(col("c.ctoks"), " ")).as("chunk_md5"))
      .orderBy("doc_id", "chunk_id")

  def q48Sql: String =
    s"""WITH tok AS (SELECT doc_id, regexp_split_to_array(text, ' ') AS a FROM documents),
       |c AS (SELECT doc_id, i.x AS chunk_id, i.x * $ChunkStep AS tok_start,
       |        a[(i.x * $ChunkStep + 1):(i.x * $ChunkStep + $ChunkSize)] AS ctoks
       |      FROM tok, (SELECT unnest(range(0, 100)) AS x) i
       |      WHERE i.x <= greatest(ceil((len(a) - $ChunkSize) / cast($ChunkStep AS double)), 0))
       |SELECT doc_id, chunk_id, tok_start, len(ctoks) AS n_tokens,
       |  md5(array_to_string(ctoks, ' ')) AS chunk_md5
       |FROM c ORDER BY doc_id, chunk_id""".stripMargin
}
