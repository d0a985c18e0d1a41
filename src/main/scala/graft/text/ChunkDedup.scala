package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level chunk deduplication — the token-stream analogue of the
  * line/paragraph dedup step in web-corpus curation (drop every line that
  * recurs verbatim across the corpus: navigation bars, cookie banners,
  * license headers), for documents whose text carries no newline structure:
  * the normalized token stream splits into fixed-width non-overlapping
  * chunks, each chunk's corpus-wide occurrence count (its df) is computed,
  * and documents are rebuilt WITHOUT the chunks whose df exceeds `maxDf` —
  * a duplicated passage disappears from every copy, exactly like duplicated
  * lines do.
  *
  * Scale shape (the whole point): explode is linear in tokens; the df
  * aggregation groups on the chunk's 8-byte hash with map-side partial
  * combine (a chunk shared by a million docs arrives pre-counted per
  * partition); the df attach is a 1:1 equi-join enrichment per chunk
  * OCCURRENCE — a hot chunk is a fan-out AQE handles, never an m² pair
  * blowup; the rebuild groups by doc_id, whose group size is bounded by the
  * document's own length. No corpus-wide sort, no window, no driver data.
  * Chunk identity uses the chunk STRING's hash (normalized tokens joined by
  * one space), so hash equality mirrors string equality modulo 2⁻⁶⁴
  * collisions — the standard gram-oracle contract.
  */
object ChunkDedup {

  /** A token-ARRAY column cut into `w`-token chunks (strings, last chunk
    * possibly short). `tk` must be a materialized attribute, not an
    * inlined tokenizer subtree: higher-order functions do no common-
    * subexpression elimination, so an inlined `tokens(text)` here would
    * re-run split/lower/trim once per chunk (the langId pitfall).
    */
  def chunksOfTokens(tk: Column, w: Int): Column = {
    val nChunks = ceil(size(tk).cast("double") / w).cast("int")
    when(size(tk) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(tk, i * w + 1, lit(w)), " ")))
  }

  /** (doc_id, n_chunks, n_kept, text_clean): the document rebuilt from the
    * chunks whose corpus-wide occurrence count is ≤ `maxDf`, in original
    * order. `maxDf = 1` is classic line-dedup (a passage that appears
    * twice anywhere is boilerplate and drops from all copies); raise it to
    * tolerate benign repetition. A document whose every chunk is
    * boilerplate survives with empty `text_clean` — the caller decides
    * whether to drop it (its `n_kept = 0` is the signal).
    */
  def dedupChunks(docs: DataFrame, id: Column, text: Column,
                  w: Int = 16, maxDf: Long = 1L): DataFrame = {
    val base = graft.CachePool.persist(
      docs.select(id.as("doc_id"), TextAnalysis.tokens(text).as("__cd_tk"))
        .select(col("doc_id"), chunksOfTokens(col("__cd_tk"), w).as("__cd_ch")))
    val exploded = base
      .select(col("doc_id"), posexplode(col("__cd_ch")).as(Seq("pos", "chunk")))
      .withColumn("__cd_h", xxhash64(col("chunk")))
    val chunkDf = exploded.groupBy("__cd_h").agg(count(lit(1)).as("chunk_df"))
    val kept = exploded.join(chunkDf, "__cd_h").filter(col("chunk_df") <= maxDf)
    val rebuilt = kept.groupBy("doc_id").agg(
      count(lit(1)).as("n_kept"),
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          s => s("chunk")),
        " ").as("text_clean"))
    base.select(col("doc_id"), size(col("__cd_ch")).as("n_chunks"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_chunks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
      .orderBy("doc_id")
  }
}
