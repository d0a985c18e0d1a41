package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the context-window preparation step
  * of both training-data packing and retrieval indexing: split each
  * document's token stream into fixed-size windows advancing by `stride`
  * tokens (overlap = size − stride keeps boundary context in two chunks).
  *
  * Entirely native array expressions (`sequence` → `explode` → `slice`),
  * no UDFs: the explode is the 1→N row expansion (output volume = the
  * chunk table, the ANSWER — not an intermediate blow-up), per-row work
  * is O(doc length), and nothing shuffles until the caller aggregates.
  * The same projection runs unchanged in Structured Streaming.
  */
object Chunker {

  /** One row per (doc, chunk): chunk index, its token count, first/last
    * token and an order-weighted length checksum (`Σ (pos+1)·len(tok)`
    * inside the chunk — any token shifted, dropped or truncated moves
    * it). A document shorter than `size` yields exactly one (possibly
    * short) chunk; empty documents yield none.
    */
  def chunkTokens(docs: DataFrame, id: Column, text: Column,
                  size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride <= size, got size=$size stride=$stride")
    val toks = docs.select(id.as("doc_id"),
      TextAnalysis.tokens(text).as("__ck_toks"))
    val n = org.apache.spark.sql.functions.size(col("__ck_toks"))
    // last chunk index = ceil((n - size) / stride) clamped at 0 (the tail
    // window still starts below n because stride <= size). Spark's `/` is
    // double division; the intermediate integers are far below 2^53, so
    // floor(double) is the exact integer ceiling-by-offset.
    val lastStart = greatest(lit(0L),
      floor(((n - lit(size)).cast("double") + lit(stride - 1)) / lit(stride))
        .cast("long"))
    toks.filter(n > 0)
      .select(col("doc_id"), col("__ck_toks"),
        explode(sequence(lit(0L), lastStart)).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        slice(col("__ck_toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(size)).as("__ck_chunk"))
      .select(col("doc_id"), col("chunk_idx"),
        org.apache.spark.sql.functions.size(col("__ck_chunk")).cast("long")
          .as("n_tokens"),
        element_at(col("__ck_chunk"), 1).as("first_token"),
        element_at(col("__ck_chunk"), -1).as("last_token"),
        aggregate(
          zip_with(col("__ck_chunk"),
            sequence(lit(1), org.apache.spark.sql.functions.size(col("__ck_chunk"))),
            (t, p) => p.cast("long") * length(t).cast("long")),
          lit(0L), (acc, x) => acc + x).as("len_checksum"))
  }
}
