package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.TextHashExpressions.{minhash_signature, simhash64, simhash64_portable}

/** Distributed near-duplicate detection pipelines (north-star §2.9).
  *
  * MinHash+LSH is the fully-scalable path: per-document work is linear
  * (one signature pass), and the only pairwise work happens inside LSH
  * band buckets — no O(n²) stage anywhere, so the same plan runs at 100 TB
  * with the band join hash-partitioned on (band index, band hash).
  *
  * Parameters (H=32 hashes, 16 bands × 2 rows) put the S-curve midpoint at
  * jaccard ≈ (1/16)^(1/2) ≈ 0.25 with P(candidate) ≈ 1 − 3e−8 at j=0.8, so
  * verified output ≥ 0.5 equals the brute-force answer with near-certainty
  * — which is what makes the DuckDB brute-force oracle usable.
  */
object DedupOps {
  val NumHashes = 32
  val Bands = 16
  val RowsPerBand: Int = NumHashes / Bands

  /** Whitespace-collapsed lowercase form — single normalization used by
    * every text-dedup operator (must stay in sync with the oracle SQL). */
  def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  def tokens(c: Column): Column = split(normText(c), " ")

  /** (id, distinct word-3-gram shingle set) — THE feature space every
    * dedup operator scores in (MinHash, SimHash, and the exact-Jaccard
    * truth all share it; a mismatch would make their numbers
    * incomparable). One linear pass per doc; docs with <3 tokens have
    * no shingle and drop out. */
  def shingled(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col(idCol),
              array_distinct(expr(
                """transform(sequence(1, size(toks) - 2),
                     i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))""")).as("shingles"))

  /** doc_id + distinct word-3-gram shingle set + MinHash signature. */
  def signatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    shingled(docs, idCol, textCol)
      .select(col(idCol), col("shingles"),
              minhash_signature(col("shingles"), NumHashes).as("sig"))

  /** (id, band_idx, band_hash) rows for LSH bucketing — one row per band
    * per doc; signature arrays never leave the map side.
    *
    * Public because this relation is PERSISTABLE: it is derivable once at
    * append time (it's a pure function of the signature), so an
    * append-only corpus can keep it as a store alongside the signatures
    * and hand it to [[incrementalNearDupsBanded]] — the nightly job then
    * re-hashes nothing. */
  def banded(sigs: DataFrame, idCol: String): DataFrame =
    sigs.select(
      col(idCol),
      posexplode(expr(
        s"transform(sequence(0, ${Bands - 1}), b -> xxhash64(slice(sig, b * $RowsPerBand + 1, $RowsPerBand)))"))
        .as(Seq("band_idx", "band_hash")))

  /** Candidate pairs from LSH banding: docs sharing ≥1 band bucket.
    * Output: (a_id, b_id) distinct, a < b. Only (id, band) tuples are
    * shuffled — signature arrays and shingle sets never explode.
    */
  def lshCandidates(sigs: DataFrame, idCol: String): DataFrame = {
    val bd = banded(sigs, idCol)
    val a = bd.select(col(idCol).as("a_id"), col("band_idx"), col("band_hash"))
    val b = bd.select(col(idCol).as("b_id"), col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Full MinHash+LSH near-dup pipeline with exact-jaccard verification of
    * the candidates. Output: (a_id, b_id, jac) with jac ≥ `threshold`.
    */
  def minhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      threshold: Double): DataFrame = {
    val sigs = signatures(docs, idCol, textCol).cache()
    val cands = lshCandidates(sigs, idCol)
    val sa = sigs.select(col(idCol).as("a_id"), col("shingles").as("a_sh"))
    val sb = sigs.select(col(idCol).as("b_id"), col("shingles").as("b_sh"))
    cands.join(sa, "a_id").join(sb, "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
         size(array_union(col("a_sh"), col("b_sh")))).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** Incremental near-dup for append-only corpora: pair a NEW batch of
    * documents against an existing signature store (plus the batch itself)
    * WITHOUT regenerating the store's own pairwise space — the nightly
    * complement of [[minhashNearDups]].
    *
    * `storeSigs` is the persisted output of [[signatures]] over everything
    * ingested so far (append `signatures(batch)` to it after each run —
    * the store grows O(corpus), each run costs O(batch)). Every emitted
    * pair has at least one endpoint in `batch` and is reported once with
    * a_id < b_id (the [[minhashNearDups]] convention). Union with the
    * store's historical pairs ≡ a full [[minhashNearDups]] over
    * store ∪ batch (proven in DedupOpsSpec).
    *
    * Scale: the band join is hash-partitioned on (band_idx, band_hash)
    * with the BATCH side — one day of ingest, orders of magnitude smaller
    * than the corpus — on the build side; AQE broadcasts it when it fits.
    * The 100 TB store streams through as (id, band) longs; its shingle
    * sets are only fetched for the candidate ids in the verify join.
    */
  def incrementalNearDups(storeSigs: DataFrame, batch: DataFrame, idCol: String,
                          textCol: String, threshold: Double): DataFrame = {
    // one-shot form: re-bands the store from its signatures. The nightly
    // loop should persist banded() alongside the store and call
    // [[incrementalNearDupsBanded]] with caller-managed signature caching
    // instead — this cache is per-query-scoped and LRU-evicted.
    val batchSigs = signatures(batch, idCol, textCol).cache()
    incrementalNearDupsBanded(
      storeSigs.select(idCol, "shingles"),
      banded(storeSigs.select(col(idCol), col("sig")), idCol),
      batchSigs, idCol, threshold)
  }

  /** [[incrementalNearDups]] against a PRE-BANDED store — the zero-rehash
    * nightly form. `storeBands` is the persisted [[banded]] relation over
    * every signature ingested so far (append `banded(batchSigs)` after
    * each run, exactly like the signature store itself); `storeShingles`
    * needs only (id, shingles) — the store's `sig` column is never read,
    * and with both relations in parquet the night's plan touches: the
    * band store as (id, band) longs, the batch's own signature pass, and
    * shingle fetches for candidate ids only.
    *
    * `batchSigs` = [[signatures]] over the batch, computed ONCE by the
    * caller (who should cache/persist it around the run — it is also the
    * night's append to the signature store, so computing it here would
    * double the work and strand the cache).
    */
  def incrementalNearDupsBanded(storeShingles: DataFrame, storeBands: DataFrame,
                                batchSigs: DataFrame, idCol: String,
                                threshold: Double): DataFrame = {
    val batchBands = banded(batchSigs, idCol)
    val a = storeBands.unionByName(batchBands)
      .select(col(idCol).as("a_id"), col("band_idx"), col("band_hash"))
    val b = batchBands
      .select(col(idCol).as("b_id"), col("band_idx"), col("band_hash"))
    val cands = a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a_id") =!= col("b_id"))
      // batch-internal pairs show up in both orientations — normalize
      .select(least(col("a_id"), col("b_id")).as("a_id"),
              greatest(col("a_id"), col("b_id")).as("b_id"))
      .distinct()
    val sh = storeShingles.select(col(idCol), col("shingles"))
      .unionByName(batchSigs.select(col(idCol), col("shingles")))
    val sa = sh.select(col(idCol).as("a_id"), col("shingles").as("a_sh"))
    val sb = sh.select(col(idCol).as("b_id"), col("shingles").as("b_sh"))
    cands.join(sa, "a_id").join(sb, "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
         size(array_union(col("a_sh"), col("b_sh")))).as("jac"))
      .filter(col("jac") >= threshold)
  }

  /** SimHash near-dup: 64-bit sketch per doc, 4×16-bit LSH bands, verified
    * by Hamming distance ≤ maxHamming. Output: (a_id, b_id, hamming).
    *
    * Features are the SAME distinct word-3-gram shingles MinHash and the
    * exact-Jaccard truth use ([[shingled]]) — unigram-token features
    * score near-random against a shingle-Jaccard target (every document
    * shares the common words, compressing all Hamming distances into one
    * band; measured P 0.38 / R 0.65 in the r8 DEDUP_QUALITY artifact),
    * while shingle features put SimHash's cosine geometry over the set
    * space the decision is actually made in. The streaming
    * `nearDupSuppress` gate intentionally keeps the cheaper raw-token
    * sketch: it dedups on sketch EQUALITY (Hamming 0) as a pre-gate, with
    * this batch path as the authoritative complement.
    *
    * @param portable derive shingle hashes from md5 (bit-identical to
    *   `md5_number_lower` in SQL engines → oracle-checkable) instead of the
    *   faster engine-native xxh64.
    */
  def simhashNearDups(docs: DataFrame, idCol: String, textCol: String,
                      maxHamming: Int, portable: Boolean = false): DataFrame = {
    val sim = if (portable) simhash64_portable _ else simhash64 _
    // cache the one-row-per-doc (id, sig) relation, the [[minhashNearDups]]
    // discipline: without it the self-join plans the sketch subtree on
    // BOTH sides, and the join-key isnotnull pushed beneath the generator
    // re-evaluates the full shingle+sketch expression with the token
    // array inlined — every shingle element access re-splits the whole
    // text (measured 30× at sf0.1). 16 bytes/doc, per-query-scoped.
    val sigs = shingled(docs, idCol, textCol)
      .select(col(idCol), sim(col("shingles")).as("sig"))
      .cache()
    val banded = sigs.select(col(idCol), col("sig"),
      posexplode(expr(
        "transform(sequence(0, 3), b -> shiftright(sig, b * 16) & 65535)"))
        .as(Seq("band_idx", "band_val")))
    val a = banded.select(col(idCol).as("a_id"), col("sig").as("a_sig"),
                          col("band_idx"), col("band_val"))
    val b = banded.select(col(idCol).as("b_id"), col("sig").as("b_sig"),
                          col("band_idx"), col("band_val"))
    a.join(b, Seq("band_idx", "band_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
              expr("bit_count(a_sig ^ b_sig)").cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
