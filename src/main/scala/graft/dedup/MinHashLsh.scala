package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection, expressed entirely as Catalyst
  * plans: shingle → per-shingle xxhash64 → p-permutation minhash signature →
  * b-band bucket keys → equi-join on (band, bucket) → candidate pairs →
  * signature-estimated Jaccard filter.
  *
  * Scale design: the signature is computed in ONE pass per document (nested
  * higher-order functions, no per-permutation shuffle). The only shuffle is
  * the band-bucket equi-join — partitionable on the bucket key and saltable
  * on skewed buckets; AQE's skew-join handles the rest. Nothing touches the
  * driver.
  */
object MinHashLsh {

  /** Canonical tokenizer — delegates to [[graft.text.TextAnalysis.tokens]]
    * so dedup signatures and text analytics NEVER tokenize differently
    * (the planted-dup invariants depend on a single token stream).
    */
  def tokens(text: Column): Column = graft.text.TextAnalysis.tokens(text)

  /** Word k-shingles as strings — the readable reference form; hot paths
    * use [[shingleHashes]] (rolling hash over token hashes) instead, which
    * avoids this form's O(tokens × k) concat+re-tokenize cost.
    */
  def shingles(toks: Column, k: Int): Column =
    when(size(toks) < k, array(concat_ws(" ", toks)))
      .otherwise(transform(
        sequence(lit(0), size(toks) - k),
        i => concat_ws(" ", slice(toks, i + 1, lit(k)))))

  /** Distinct 64-bit shingle hashes (the document's feature set): the
    * SET form of [[bagShingleHashes]].
    */
  def shingleHashes(text: Column, k: Int): Column =
    array_distinct(bagShingleHashes(text, k))

  /** MinHash signature: element s = min over shingles of xxhash64(h, s).
    * One native O(shingles × p) loop (graft.functions.MinHashSignature),
    * bit-identical to the built-in `xxhash64(h, s)` values. The HOF
    * formulations are 10-50× slower: interpreted evaluation, a temp array
    * per fold step, and (in the transposed form) the whole shingling
    * pipeline re-evaluated once per permutation.
    */
  def signature(hashes: Column, p: Int): Column =
    graft.functions.TextHashExprs.minhashSignature(hashes, p)

  /** Signature-estimated Jaccard: fraction of equal signature components. */
  def estimatedJaccard(sigA: Column, sigB: Column, p: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v
    ).cast("double") / p

  /** (id, signature) per document. */
  def signatures(docs: DataFrame, id: Column, text: Column, k: Int, p: Int): DataFrame =
    docs.select(id.as("mh_id"), signature(shingleHashes(text, k), p).as("sig"))

  /** Shingle hashes as a BAG (no distinct) — the multiset of k-gram
    * occurrences: hash each token once, then roll a k-window polynomial
    * over the token hashes (graft.functions.WindowPolyHash) — O(tokens)
    * end to end. The string route (build each k-gram with concat_ws, hash
    * it) re-evaluates the tokenizer inside every shingle's lambda and
    * re-hashes k tokens' worth of characters per shingle: O(tokens × k)
    * with big constants.
    */
  def bagShingleHashes(text: Column, k: Int): Column =
    graft.functions.TextHashExprs.windowPolyHash(
      transform(tokens(text), t => xxhash64(t)), k, 1099511628211L)

  /** Weighted (integer-frequency) MinHash signatures: each gram occurrence
    * becomes a distinct instance hash
    * (graft.functions.BagInstanceHashes), so the signature estimates the
    * WEIGHTED Jaccard Σmin(count)/Σmax(count) — repeated boilerplate
    * counts once per occurrence. Same one-pass O(occurrences × p) cost
    * shape as the unweighted form.
    */
  def weightedSignatures(docs: DataFrame, id: Column, text: Column, k: Int, p: Int): DataFrame =
    docs.select(id.as("mh_id"),
      signature(graft.functions.TextHashExprs.bagInstanceHashes(
        bagShingleHashes(text, k)), p).as("sig"))

  /** Candidate pairs (idA < idB) sharing ≥1 LSH band bucket, with the
    * signature-estimated Jaccard attached. p must equal bands × rowsPerBand.
    *
    * The band self-join runs through
    * [[graft.operators.SkewJoin.boundedSelfPairs]]: a bucket hotter than
    * `hotBucketThreshold` rows (the realistic 100 TB failure mode — a
    * boilerplate band every doc shares) is tiled into group-pair cells so no
    * single task owns the bucket's quadratic pair work. Cold buckets take
    * the plain equi-join path; results are identical either way.
    */
  def candidatePairs(docs: DataFrame, id: Column, text: Column,
                     k: Int = 3, bands: Int = 16, rowsPerBand: Int = 4,
                     hotBucketThreshold: Int = 4096): DataFrame =
    candidatePairsFromSigs(signatures(docs, id, text, k, p = bands * rowsPerBand),
      bands, rowsPerBand, hotBucketThreshold)

  /** LSH banding + candidate scoring over any (mh_id, sig) frame — shared
    * by the unweighted and weighted variants.
    */
  def candidatePairsFromSigs(sigFrame: DataFrame,
                             bands: Int, rowsPerBand: Int,
                             hotBucketThreshold: Int): DataFrame = {
    val p = bands * rowsPerBand
    // Persist the signatures: boundedSelfPairs scans the banded frame five
    // times (key histogram + two join sides per path). Without the
    // materialization boundary, ProjectionCollapse inlines the
    // O(shingles × p) signature expression into every consumer. With it,
    // the signature is computed exactly once per document (also the right
    // call at 100 TB: signatures are ~500 bytes/doc, tiny next to the text
    // they summarize). Caller releases via CachePool.releaseAll().
    val sigs = graft.CachePool.persist(sigFrame)
    graft.operators.SkewJoin
      .boundedSelfPairs(banded(sigs, bands, rowsPerBand),
        Seq("band", "bucket"), col("mh_id"), col("sig"),
        hotBucketThreshold)
      // dedup the pair BEFORE scoring: a true near-dup shares many of its
      // 16 bands, and the interpreted estimate would otherwise run once
      // per shared band instead of once per pair.
      .groupBy("id_a", "id_b")
      .agg(first("pay_a").as("sig_a"), first("pay_b").as("sig_b"))
      .select(col("id_a"), col("id_b"),
        estimatedJaccard(col("sig_a"), col("sig_b"), p).as("est_jaccard"))
  }

  /** Explode a (mh_id, sig) frame into one row per LSH band: bucket =
    * xxhash64 of the band's signature slice, salted by the band index.
    * The single home of the banding convention — both the self-join and
    * the cross-snapshot paths route through here.
    */
  private def banded(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
      col("mh_id"), col("sig"),
      posexplode(transform(
        sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band")
      .withColumnRenamed("col", "bucket")

  private def thresholded(pairs: DataFrame, threshold: Double): DataFrame =
    pairs.filter(col("est_jaccard") >= threshold)
      .select("id_a", "id_b", "est_jaccard")
      .orderBy("id_a", "id_b")

  /** Near-duplicate pairs: candidates whose estimated Jaccard ≥ threshold. */
  def nearDuplicates(docs: DataFrame, id: Column, text: Column,
                     threshold: Double = 0.5, k: Int = 3,
                     bands: Int = 16, rowsPerBand: Int = 4,
                     hotBucketThreshold: Int = 4096): DataFrame =
    thresholded(
      candidatePairs(docs, id, text, k, bands, rowsPerBand, hotBucketThreshold),
      threshold)

  /** Weighted near-duplicate pairs: like [[nearDuplicates]] but the
    * estimate is of the frequency-WEIGHTED Jaccard (Σmin/Σmax of gram
    * counts) — a doc that repeats another's boilerplate 10× no longer
    * looks identical to one that contains it once. Same banding, same
    * bounded self-join, same cost shape.
    */
  def nearDuplicatesWeighted(docs: DataFrame, id: Column, text: Column,
                             threshold: Double = 0.5, k: Int = 3,
                             bands: Int = 16, rowsPerBand: Int = 4,
                             hotBucketThreshold: Int = 4096): DataFrame =
    thresholded(
      candidatePairsFromSigs(
        weightedSignatures(docs, id, text, k, p = bands * rowsPerBand),
        bands, rowsPerBand, hotBucketThreshold),
      threshold)

  /** Cross-snapshot near-duplicate detection: which NEW docs near-duplicate
    * the EXISTING corpus — the incremental crawl-refresh shape (the
    * near-dup analogue of the Bloom exact path in `sources`/q_bloom_dedup).
    * Both sides band independently and meet in a TWO-SIDED equi-join on
    * (band, bucket): the corpus never pairs with itself (no quadratic term
    * in corpus size — only new×old candidates materialize), and a
    * boilerplate bucket hot on both sides is an ordinary skewed join key
    * that AQE splits (two distinct sides make hot keys splittable; only
    * SELF-joins need the triangle tiling). At steady state the corpus
    * signature frame is the maintained snapshot — computed once per doc
    * ever, not once per incoming batch.
    *
    * Output: (new_id, old_id, est_jaccard ≥ threshold), ordered.
    */
  def crossSnapshotNearDuplicates(newDocs: DataFrame, oldDocs: DataFrame,
                                  id: Column, text: Column,
                                  threshold: Double = 0.5, k: Int = 3,
                                  bands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val p = bands * rowsPerBand
    def side(docs: DataFrame, s: String): DataFrame =
      banded(graft.CachePool.persist(signatures(docs, id, text, k, p)),
          bands, rowsPerBand)
        .select(col("mh_id").as(s"${s}_id"), col("sig").as(s"${s}_sig"),
          col("band"), col("bucket"))
    side(newDocs, "new").join(side(oldDocs, "old"), Seq("band", "bucket"))
      // collapse shared bands to one row per (new, old) pair BEFORE the
      // interpreted Jaccard estimate — a true near-dup shares many bands
      .groupBy("new_id", "old_id")
      .agg(first("new_sig").as("sa"), first("old_sig").as("sb"))
      // compute the interpreted p-element fold ONCE per pair, then filter
      .withColumn("est_jaccard", estimatedJaccard(col("sa"), col("sb"), p))
      .filter(col("est_jaccard") >= threshold)
      .select("new_id", "old_id", "est_jaccard")
      .orderBy("new_id", "old_id")
  }
}
