package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic duplicate planting for dedup operator verification.
  *
  * The synthetic `documents` / `embeddings` tables contain no duplicates, so
  * dedup queries union the table with perturbed copies of a fixed subset:
  *  - every 7th doc gets an EXACT duplicate (case/whitespace noise only —
  *    found by [[ExactDedup]] after normalization),
  *  - every 5th doc gets a NEAR duplicate (a few appended tokens — found by
  *    MinHash / SimHash / Jaccard, not by exact dedup).
  * Mirrored 1:1 by the DuckDB oracle CTE in SparkEntry.
  */
object DedupData {

  val ExactIdOffset = 1000000L
  val NearIdOffset  = 2000000L
  val NearSuffix    = " zz extra trailing tokens appended"

  def withPlantedDups(docs: DataFrame): DataFrame = {
    val base = docs.select("doc_id", "text", "lang", "source")
    val exact = base.filter(col("doc_id") % 7 === 0)
      .select(
        (col("doc_id") + ExactIdOffset).as("doc_id"),
        concat(lit("  "), upper(col("text")), lit("  ")).as("text"),
        col("lang"), col("source"))
    val near = base.filter(col("doc_id") % 5 === 0)
      .select(
        (col("doc_id") + NearIdOffset).as("doc_id"),
        concat(col("text"), lit(NearSuffix)).as("text"),
        col("lang"), col("source"))
    base.unionByName(exact).unionByName(near)
  }

  /** Exactly 8 whitespace tokens ⇒ one boilerplate window fingerprint at
    * w = 8, shared by every doc carrying the footer.
    */
  val BoilerFooter = "standard footer boilerplate text shared across many documents"

  /** Plants a shared boilerplate run: every 3rd doc gets [[BoilerFooter]]
    * appended — a single window fingerprint with document frequency ≈ n/3,
    * the input class `Fingerprint.sharedRunPairs`' `maxRunDf` cutoff
    * exists for. Applied AFTER [[withPlantedDups]] so the footer rides on
    * planted ids too. Mirrored by [[BoilerCte]].
    */
  def withBoilerplate(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(" " + BoilerFooter)))
        .otherwise(col("text")))

  /** Embedding near-dups: scaled copies (same direction ⇒ cosine ≈ 1). */
  def withPlantedVecDups(vecs: DataFrame): DataFrame = {
    val base = vecs.select("vec_id", "embedding", "label")
    val dups = base.filter(col("vec_id") % 5 === 0)
      .select(
        (col("vec_id") + ExactIdOffset).as("vec_id"),
        transform(col("embedding"), x => x * lit(0.5f)).as("embedding"),
        col("label"))
    base.unionByName(dups)
  }

  /** DuckDB CTE mirroring [[withPlantedDups]] (tables: documents). */
  val DocsCte: String =
    """WITH docs AS (
      |  SELECT doc_id, text, lang, source FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000, concat('  ', upper(text), '  '), lang, source
      |  FROM documents WHERE doc_id % 7 = 0
      |  UNION ALL
      |  SELECT doc_id + 2000000, concat(text, ' zz extra trailing tokens appended'), lang, source
      |  FROM documents WHERE doc_id % 5 = 0
      |)
      |""".stripMargin

  /** DuckDB CTE mirroring [[withBoilerplate]] over the `docs` CTE —
    * append after [[DocsCte]]; reads from `bdocs`.
    */
  val BoilerCte: String =
    s""", bdocs AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN concat(text, ' $BoilerFooter')
       |         ELSE text END AS text,
       |    lang, source
       |  FROM docs
       |)
       |""".stripMargin

  /** DuckDB CTE mirroring [[withPlantedVecDups]] (tables: embeddings). */
  val VecsCte: String =
    """WITH vecs AS (
      |  SELECT vec_id, embedding, label FROM embeddings
      |  UNION ALL
      |  SELECT vec_id + 1000000, list_transform(embedding, x -> x * 0.5::FLOAT), label
      |  FROM embeddings WHERE vec_id % 5 = 0
      |)
      |""".stripMargin
}
