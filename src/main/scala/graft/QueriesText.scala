package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis / deduplication / multimodal operator surface over the
  * `documents` table (north-star extension, SURVEY.md §2.9).
  *
  * Everything here is pure `org.apache.spark.sql.functions` — codegen'd,
  * shuffle-minimal, and scale-ready:
  *   - per-document operators (stats, lang-id, token count, fingerprint)
  *     are narrow map-only transformations: zero shuffles, pushdown-safe;
  *   - exact dedup is one hash-partitioned aggregation on the fingerprint;
  *   - near-dup jaccard prunes candidates by cheap blocking keys
  *     (lang, source, length bucket) BEFORE the pairwise join, so the
  *     self-join never goes quadratic in the corpus: pairs are bounded per
  *     block. At 100 TB the blocking key simply gets finer (MinHash bands
  *     in [[QueriesDedup]] are the fully-scalable variant).
  */
object QueriesText {
  import Tables._

  /** Whitespace-collapsed, lowercased canonical text form. NOTE (r16):
    * the word-explode paths tokenize as `split(lower(text), "\\s+")` +
    * the existing non-empty filter instead of splitting this collapsed
    * form on " " — same token multiset (\s+ runs only ever produce empty
    * fields at the string's ends, which the filter drops) for one regex
    * pass instead of two and no intermediate string. Kept here for the
    * sites that hash/emit the canonical STRING itself. */
  private def normText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  val queries: Map[String, (SparkSession, String) => DataFrame] =
    baseQueries ++ indexingQueries

  private lazy val baseQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Token / char / punctuation / stopword statistics — quality-scoring
    // raw signals for a training-data pipeline.
    "text_stats" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"), col("text"),
        // one byte pass for all three signals (r16; QualityExprSpec
        // proves bit-equality with the regex forms)
        org.apache.spark.sql.graft.QualityExpressions
          .quality_signals(col("text")).as("q"))
      .select(
        col("doc_id"),
        length(col("text")).cast(LongType).as("n_chars_calc"),
        col("q.n_tokens").cast(LongType).as("n_tokens"),
        col("q.n_punct").cast(LongType).as("n_punct"),
        col("q.n_the").cast(LongType).as("n_the"),
        (col("q.n_the").cast(DoubleType) / col("q.n_tokens")).as("stop_ratio"))),

    // Composite quality score — the filter stage of a training-data
    // pipeline: length band + punctuation ratio + stopword presence fold
    // into one keep/drop signal. Pure integer/ratio arithmetic → exact
    // cross-engine determinism.
    "text_quality_score" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
          // one byte pass for all three signals (r16; QualityExprSpec)
          org.apache.spark.sql.graft.QualityExpressions
            .quality_signals(col("text")).as("q"))
        .select(col("doc_id"),
          col("q.n_tokens").as("n_tokens"),
          col("q.n_punct").as("n_punct"),
          col("q.n_the").as("n_the"))
        .select(col("doc_id"),
          (when(col("n_tokens").between(20, 1000), 1).otherwise(0) +
           when(col("n_punct") * 10 < col("n_tokens"), 1).otherwise(0) +
           when(col("n_the") > 0, 1).otherwise(0)).as("quality_score"))
        .withColumn("keep", (col("quality_score") >= 2).cast(IntegerType))),

    // Heuristic language ID: charset probe for CJK, stopword probes for
    // de/fr/es, default en. Deterministic CASE cascade, map-only.
    "text_lang_id" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        col("lang"),
        when(col("text").rlike("[\\x{4e00}-\\x{9fff}]"), "zh")
          .when(instr(col("text"), " und ") > 0 || instr(col("text"), " der ") > 0, "de")
          .when(instr(col("text"), " le ") > 0 || instr(col("text"), " une ") > 0, "fr")
          .when(instr(col("text"), " el ") > 0 || instr(col("text"), " los ") > 0, "es")
          .otherwise("en").as("pred_lang"))
        .withColumn("is_match", (col("pred_lang") === col("lang")).cast(IntegerType))),

    // BPE-ish token counting: word pieces | digit runs | single symbols.
    "text_token_count" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        expr("regexp_count(text, '[a-z]+|[0-9]+|[^a-z0-9\\\\s]')").cast(LongType).as("n_bpe_tokens"),
        expr("regexp_count(text, '[0-9]+')").cast(LongType).as("n_digit_runs"))),

    // Content fingerprint of the canonical text form (md5 = portable
    // across engines; the engine-native 64-bit variant is xxhash64).
    // md5 is the portable oracle-checkable fingerprint; the engine-native
    // 64-bit path (xxhash64) is exercised in DedupSpec.
    "text_fingerprint" -> ((s, d) =>
      documents(s, d).select(
        col("doc_id"),
        md5(normText(col("text"))).as("fp"))),

    // Exact dedup: one aggregation keyed by the fingerprint. min() picks
    // the canonical doc deterministically.
    "dedup_exact" -> ((s, d) =>
      documents(s, d)
        .groupBy(md5(normText(col("text"))).as("fp"))
        .agg(count(lit(1)).as("n_dups"), min(col("doc_id")).as("canonical_id"))),

    // Near-dup by n-gram (token-set) jaccard with blocking:
    // candidates = same (lang, source, n_chars/100); pairwise only inside
    // blocks. Joins hash-partition on the blocking key — no quadratic blowup.
    "dedup_ngram_jaccard" -> ((s, d) => {
      def side(p: String) = documents(s, d).select(
        col("lang"), col("source"),
        expr("n_chars DIV 100").as("len_bucket"), // integer div: portable, no rounding-mode drift
        col("doc_id").as(s"${p}_id"),
        array_distinct(split(normText(col("text")), " ")).as(s"${p}_toks"))
      side("a").join(side("b"), Seq("lang", "source", "len_bucket"))
        .filter(col("a_id") < col("b_id"))
        .select(col("a_id"), col("b_id"),
          (size(array_intersect(col("a_toks"), col("b_toks"))).cast(DoubleType) /
           size(array_union(col("a_toks"), col("b_toks")))).as("jac"))
        .filter(col("jac") >= 0.6)
    }),

    // MinHash+LSH near-dup (graft.operators.DedupOps): linear signature
    // pass + band-bucket join — no O(n²) stage. With 16 bands × 2 rows the
    // miss probability at the planted-dup jaccard (≈0.8) is ~3e-8, so the
    // verified output ≥0.5 equals the DuckDB brute-force oracle.
    "dedup_minhash_lsh" -> ((s, d) =>
      graft.operators.DedupOps.minhashNearDups(documents(s, d), "doc_id", "text", 0.5)),

    // SimHash 64-bit sketch over the SHARED word-3-gram shingle space
    // (same features as MinHash and the exact-Jaccard truth — r9 change;
    // unigram features measured P 0.38 / R 0.65 against that truth) +
    // 4×16-bit banding, Hamming-verified. Gate at hamming ≤ 12: the
    // measured operating sweep (DEDUP_QUALITY.json) holds P 1.0 through
    // 12 while recall rises 0.846→0.885; precision only falls past 12
    // (0.85 at 16), so 12 is the knee. The portable (md5-shingle-hash)
    // variant is bit-identical to the SQL reimplementation over
    // md5_number_lower → full hash oracle; the faster engine-native xxh64
    // variant is cross-validated in DedupSpec.
    "dedup_simhash" -> ((s, d) =>
      graft.operators.DedupOps.simhashNearDups(documents(s, d), "doc_id", "text", 12,
        portable = true)),

    // Corpus bigram frequencies: word-2-gram explode + count, top 20 with
    // a total order (count desc, bigram asc) for determinism. The explode
    // is a narrow flatMap; the count is one shuffle on the bigram.
    "text_bigram_freq" -> ((s, d) =>
      documents(s, d)
        // same token array as split(normText, " ") — \s+ runs only ever
        // produce empty fields at the ends, which array_remove drops —
        // for one regex pass instead of two (r16)
        .select(array_remove(split(lower(col("text")), "\\s+"), "").as("toks"))
        .filter(size(col("toks")) >= 2)
        .select(explode(expr(
          """transform(sequence(1, size(toks) - 1),
               i -> concat_ws(' ', toks[i-1], toks[i]))""")).as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram"))
        .limit(20)),

    // Group-level signatures via the custom ElementwiseMinAgg aggregate:
    // min-over-rows of a MinHash-style signature IS the signature of the
    // union of the underlying sets, so one keyed aggregation produces
    // per-group sketches (hierarchical dedup's building block). Signature
    // values here derive from md5 so DuckDB can replay the whole thing;
    // emitted as CSV so the driver can hash it (arrays don't sort in its
    // checker).
    "agg_elementwise_min" -> ((s, d) =>
      documents(s, d)
        .select(col("lang"), expr(
          """transform(sequence(0, 7), i ->
               pmod(cast(conv(substr(md5(concat(cast(doc_id as string), ':', cast(i as string))), 1, 15), 16, 10) as bigint), 1000000))""")
          .as("sig"))
        .groupBy("lang")
        .agg(org.apache.spark.sql.graft.AggExpressions.elementwise_min(col("sig"))
               .as("min_sig"))
        .select(col("lang"),
          expr("array_join(transform(min_sig, x -> cast(x as string)), ',')")
            .as("min_sig_csv"))),

    // Gopher-style repetition/shape signals: duplicate-3-gram ratio, mean
    // word length, symbol ratio — the filters large text-corpus curation
    // actually runs (repetitive docs are boilerplate/spam). Map-only.
    "text_gopher_signals" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), normText(col("text")).as("norm"))
        .select(col("doc_id"), col("norm"), split(col("norm"), " ").as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("doc_id"),
          size(col("toks")).cast(LongType).as("n_words"),
          (length(regexp_replace(col("norm"), " ", "")).cast(DoubleType) /
            size(col("toks"))).as("mean_word_len"),
          (expr("regexp_count(norm, '[^a-z0-9 ]')").cast(DoubleType) /
            length(col("norm"))).as("symbol_ratio"),
          expr("""1.0 - CAST(size(array_distinct(transform(sequence(1, size(toks) - 2),
                    i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1])))) AS DOUBLE)
                  / (size(toks) - 2)""").as("dup_3gram_ratio"))),

    // PII scrubbing: emails and long digit runs replaced by placeholder
    // tokens — the redaction pass of a training-data pipeline. Patterns are
    // portable across Java regex and RE2.
    "text_redact_pii" -> ((s, d) =>
      documents(s, d).select(col("doc_id"),
        regexp_replace(
          regexp_replace(col("text"),
            "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
          "[0-9]{7,}", "<NUM>").as("redacted"))),

    // Reproducible train/val/test split (90/5/5): membership is a pure
    // function of md5(doc_id) — identical on every run, every engine, any
    // parallelism (rand()-based splits are none of these). Map-only.
    "text_train_test_split" -> ((s, d) =>
      graft.operators.Sampling.trainValTestSplit(
        documents(s, d).select("doc_id"), "doc_id")),

    // Per-language mixture rebalancing: each stratum keeps its own
    // deterministic fraction (md5-bucket membership — replays, backfills
    // and the oracle agree row-for-row). The rates ride a broadcast join,
    // so the corpus scan stays map-only at any stratum cardinality.
    "text_sample_stratified" -> ((s, d) =>
      graft.operators.Sampling.stratifiedSample(
        documents(s, d).select("lang", "doc_id", "source"), "lang", "doc_id",
        Map("en" -> 0.5, "de" -> 1.0, "fr" -> 0.8, "es" -> 0.8, "zh" -> 0.2))),

    // Benchmark decontamination: drop/flag training docs sharing any word
    // 8-gram with the eval split (deterministic md5 holdout ~1/16 of the
    // corpus). The eval shingle set is tiny relative to the corpus —
    // benchmark suites are millions of shingles, not billions — so it
    // BROADCASTS and the corpus-side probe is a map-only semi-join: the
    // 100 TB train corpus reaches the probe without shuffling — the
    // (doc_id, shingle) distinct that keeps n_hits well-defined (number
    // of distinct contaminated 8-grams) runs AFTER the semi-join, so its
    // exchange carries only the rare contaminated rows (the semi-join is
    // a per-shingle membership filter, so it commutes with the distinct).
    "text_decontaminate" -> ((s, d) => {
      val docs = documents(s, d)
      val isEval = substring(md5(col("doc_id").cast(StringType)), 1, 1) === "0"
      val words = split(col("text"), " ")
      def shingles(df: DataFrame) = df.select(
        col("doc_id"),
        explode(when(size(words) >= 8,
            transform(sequence(lit(1), size(words) - lit(7)),
              i => array_join(slice(words, i, lit(8)), " ")))
          .otherwise(array())).as("shingle"))
      val evalSh = shingles(docs.filter(isEval)).select("shingle").distinct()
      val hits = shingles(docs.filter(!isEval))
        .join(broadcast(evalSh), Seq("shingle"), "left_semi")
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      docs.filter(!isEval).select("doc_id", "source")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).cast(IntegerType).as("contaminated"))
    }),

    // Bloom-prefiltered decontamination: same contract as
    // `text_decontaminate`, but the corpus probes a BLOOM of the eval
    // shingle set before the exact membership join. Why: at 100 TB the
    // eval suite can reach hundreds of millions of distinct 8-grams —
    // gigabytes as broadcast strings, ~180 MB as a 1%-FP bloom — and the
    // bloom keeps the corpus-side scan map-only while the exact confirm
    // join (which removes the false positives) sees only bloom-positive
    // rows: true hits + a ~1% trickle. One-sided error means the result is
    // EXACTLY the unfiltered pipeline's — the oracle is the same SQL.
    //
    // The bloom reaches the probe as a SCALAR SUBQUERY inside a plain
    // Filter (the same shape Spark's InjectRuntimeFilter emits) rather
    // than a crossJoin(broadcast(...)): a cross-join probe is a join node,
    // and PushDownLeftSemiAntiJoin rewrites semi ⋈ cross so the exact
    // confirm runs BELOW the bloom — correct, but the prefilter then
    // guards nothing. No pushdown rule crosses a Filter, so the subquery
    // form pins probe-before-confirm (asserted in PlanAuditSpec).
    "text_decontaminate_bloom" -> ((s, d) => {
      import org.apache.spark.sql.graft.BloomExpressions.{bloom_build, bloom_might_contain}
      val docs = documents(s, d)
      val isEval = substring(md5(col("doc_id").cast(StringType)), 1, 1) === "0"
      val words = split(col("text"), " ")
      def shingles(df: DataFrame) = df.select(
        col("doc_id"),
        explode(when(size(words) >= 8,
            transform(sequence(lit(1), size(words) - lit(7)),
              i => array_join(slice(words, i, lit(8)), " ")))
          .otherwise(array())).as("shingle"))
      val evalSh = shingles(docs.filter(isEval)).select("shingle").distinct()
      val bf = evalSh.agg(bloom_build(col("shingle"), numBits = 1 << 17).as("__bf")).scalar()
      // the confirm join carries NO broadcast hint: this variant exists
      // for the regime where the eval set is too big to broadcast as
      // strings, so the confirm is a shuffle semi-join of the tiny
      // bloom-positive trickle (AQE still broadcasts when it does fit)
      val hits = shingles(docs.filter(!isEval))
        .filter(bloom_might_contain(bf, col("shingle")))
        .join(evalSh, Seq("shingle"), "left_semi") // FP removal
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("n_hits"))
      docs.filter(!isEval).select("doc_id", "source")
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), col("source"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          (coalesce(col("n_hits"), lit(0L)) > 0).cast(IntegerType).as("contaminated"))
    }),

    // DSIR-style importance sampling (hashed unigram features): score each
    // doc by the fraction of its tokens landing in target-enriched md5
    // hash buckets (target = English slice), keep docs scoring ≥ 0.5.
    // Enrichment compares exact integer cross-products and the score is a
    // ratio of two exact counts — no log/ratio summation whose float
    // ordering could diverge from the oracle. Two corpus scans (fit +
    // score, the DSIR minimum); the fit collapses to ≤256 bucket rows
    // map-side and the enriched set broadcasts (see
    // [[graft.operators.Sampling.importanceWeights]]).
    "text_importance_sample" -> ((s, d) => {
      val scored = graft.operators.Sampling.importanceWeights(
        documents(s, d).select("doc_id", "lang", "text"),
        "text", "doc_id", col("lang") === "en")
      scored.select(col("doc_id"), col("n_words"), col("n_enriched"),
          round(col("n_enriched").cast(DoubleType) / col("n_words"), 6).as("imp_r"))
        .withColumn("kept", (col("imp_r") >= 0.5).cast(IntegerType))
    }),

    // Token-budget mixture weights: per-source sampling weight to hit a
    // uniform-across-sources token mixture at half the corpus's total
    // token budget — the "how much of each source do I keep" step after
    // quality filtering. ONE corpus scan: the totals come from an
    // unpartitioned window over the already-aggregated per-source rows
    // (rows = #sources, bounded), not from a second aggregation branch —
    // a totals-via-self-join would re-scan the corpus because column
    // pruning makes the two aggregate subtrees non-reusable (asserted in
    // PlanAuditSpec). Weight arithmetic mirrors the oracle
    // operation-for-operation so the doubles are bit-equal.
    "text_mixture_weights" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      documents(s, d)
        .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("n_tokens"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          least(lit(1.0),
            sum(col("n_tokens")).over(w) / count(lit(1)).over(w) / lit(2.0)
              / col("n_tokens"))
            .as("weight"))
    }),

    // Budget → sampled corpus, end-to-end: the mixture weights above
    // APPLIED as per-source deterministic sampling rates (md5-bucket
    // membership, the `stratifiedSample` mechanism) — the full "token
    // budget in, curated subset out" step as ONE pipeline. The weight
    // table is #sources rows and broadcasts; the corpus-side filter is
    // map-only, so the 100 TB scan shuffles nothing. Weight arithmetic
    // mirrors `text_mixture_weights` op-for-op and the bucket threshold
    // rounds (not truncates), so membership is engine-exact.
    "text_mixture_apply" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val docs = documents(s, d)
      val weights = docs
        .select(col("source"), size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .groupBy("source")
        .agg(sum("n_tok").as("n_tokens"))
        .select(col("source"),
          least(lit(1.0),
            sum(col("n_tokens")).over(w) / count(lit(1)).over(w) / lit(2.0)
              / col("n_tokens"))
            .as("__w"))
      docs.select("doc_id", "source")
        .join(broadcast(weights), Seq("source"))
        .filter(graft.operators.Sampling.hashBucket(col("doc_id"), 10000) <
                round(col("__w") * 10000).cast(LongType))
        .select("doc_id", "source")
    }),

    // Cluster-representative selection: each near-dup cluster keeps its
    // HIGHEST-quality member (tie → smallest id) — what curation actually
    // ships, rather than the min-id canonical. One map-side-combinable
    // max_by aggregation per cluster + a semi-join back (no window, no
    // per-cluster sort); the oracle replays it as arg_max over the
    // transitive-closure clusters.
    "dedup_keep_best" -> ((s, d) => {
      val docs = documents(s, d)
      // one byte pass for all three signals (r16; QualityExprSpec)
      val scored = docs
        .select(col("doc_id"),
          org.apache.spark.sql.graft.QualityExpressions
            .quality_signals(col("text")).as("q"))
        .select(col("doc_id"),
          (when(col("q.n_tokens").between(20, 1000), 1).otherwise(0) +
           when(col("q.n_punct") * 10 < col("q.n_tokens"), 1).otherwise(0) +
           when(col("q.n_the") > 0, 1).otherwise(0))
            .as("quality_score"))
      val pairs = graft.operators.DedupOps.minhashNearDups(docs, "doc_id", "text", 0.5)
        .select("a_id", "b_id")
      val labels = graft.operators.DedupClusters.clusterLabels(docs, "doc_id", pairs)
      graft.operators.DedupClusters.keepBestPerCluster(
        scored, "doc_id", labels, "quality_score")
    }),

    // Greedy sequence packing for training-batch assembly: per-source
    // prefix token counts assign each doc the pack whose budget window
    // its PREVIOUS cumulative total falls in — deterministic (unique
    // doc_id order), one window shuffle on source; a 100 TB run
    // sub-buckets giant sources (e.g. by ingest day) to keep the
    // per-partition sequential scan bounded.
    "text_pack_sequences" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("source").orderBy("doc_id")
      documents(s, d)
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast(LongType).as("n_tok"))
        .withColumn("pack_id",
          floor((sum(col("n_tok")).over(w) - col("n_tok")) / lit(256.0)).cast(LongType))
    }),

    // Append-only incremental dedup: the nightly batch (odd doc ids here)
    // pairs against the signature STORE of everything already ingested
    // (even ids) — each run costs O(batch), never regenerating the
    // corpus's own pairwise space. Union with historical pairs ≡ the full
    // minhashNearDups run (DedupSpec); the oracle is the brute-force
    // jaccard restricted to batch-touching pairs.
    "dedup_incremental" -> ((s, d) => {
      val docs = documents(s, d)
      // the store's signature relation feeds BOTH the band derivation and
      // the verify join's shingle fetch — cache it like minhashNearDups
      // caches its own sigs (r16; per-query-scoped, LRU-evicted; the real
      // nightly job reads the store from parquet instead)
      val storeSigs = graft.operators.DedupOps.signatures(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text").cache()
      graft.operators.DedupOps.incrementalNearDups(
        storeSigs, docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", 0.5)
    }),

    // The zero-rehash nightly form: the store arrives PRE-BANDED — its
    // (id, band_idx, band_hash) relation was derived once at append time
    // and persisted, so tonight's job never touches the store's sig
    // column (DedupSpec proves the scan schema). Same semantics as
    // dedup_incremental, hence the same oracle.
    "dedup_incremental_banded" -> ((s, d) => {
      val docs = documents(s, d)
      // both signature relations are multi-consumer (bands + shingle
      // fetches) — cache them per the incrementalNearDupsBanded contract
      // ("computed ONCE by the caller, who should cache/persist it")
      val storeSigs = graft.operators.DedupOps.signatures(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text").cache()
      val batchSigs = graft.operators.DedupOps.signatures(
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text").cache()
      graft.operators.DedupOps.incrementalNearDupsBanded(
        storeSigs.select("doc_id", "shingles"),
        graft.operators.DedupOps.banded(storeSigs, "doc_id"),
        batchSigs, "doc_id", 0.5)
    }),

    // Near-dup pairs → dedup CLUSTERS: connected components by alternating
    // large-star/small-star (DedupClusters) over the MinHash pair list;
    // every doc gets cluster_id = min doc_id of its component (singletons
    // label themselves). O(log n) rounds of pure (src,dst) shuffles; the
    // DuckDB oracle replays it as a recursive-CTE transitive closure.
    "dedup_clusters" -> ((s, d) => {
      val docs = documents(s, d)
      val pairs = graft.operators.DedupOps
        .minhashNearDups(docs, "doc_id", "text", 0.5)
        .select("a_id", "b_id")
      graft.operators.DedupClusters.clusterLabels(docs, "doc_id", pairs)
    }),

    // Cross-document repeated-passage detection (the corpus-level
    // complement of the WITHIN-doc gopher repetition signals): for each
    // doc, the fraction of its word 8-gram shingles that also occur in at
    // least one OTHER document. Shingle generation is a map-only HOF
    // (sequence→transform→slice, codegen'd, no UDF). r16 shape (guide
    // §2.3/§2.4): the per-doc `array_distinct` replaces the old global
    // (doc_id, shingle) DISTINCT — the pair set is identical because doc
    // ids differ across docs — deleting one corpus-wide exchange; the
    // explicit `repartition(shingle)` then feeds BOTH the ndocs count and
    // the probe side, so the scan+shingle subtree runs ONCE and the
    // second consumer is a ReusedExchange (the old groupBy+join shape
    // re-scanned the corpus and re-hashed every shingle for the probe).
    // Join (not window) on the shingle key keeps the hot-shingle skew
    // streaming + AQE-splittable at 100 TB. Shuffles carry
    // xxhash64(shingle) — 8 bytes; a 64-bit collision could only merge
    // two distinct shingles into one count bucket (odds ~n²/2^65; the
    // sf0.01 hash gate confirms none at test scale).
    "text_crossdoc_dup" -> ((s, d) => {
      import org.apache.spark.sql.graft.TextHashExpressions.word_gram_hashes
      val ds = documents(s, d).select(
          col("doc_id"),
          explode(array_distinct(word_gram_hashes(col("text"), 8))).as("shingle"))
        .repartition(col("shingle"))
      val freq = ds.groupBy("shingle").agg(count(lit(1)).as("ndocs"))
      ds.join(freq, "shingle")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_shingles"),
             count(when(col("ndocs") >= 2, 1)).as("n_dup"),
             (count(when(col("ndocs") >= 2, 1)).cast(DoubleType) /
              count(lit(1))).as("dup_frac"))
    }),

    // Repeated-span detection — the exact-substring complement to
    // document-level dedup (the "dedup repeated n-gram spans" stage of a
    // training-data pipeline: boilerplate, licenses, templates repeat
    // VERBATIM across a web corpus even when whole documents differ).
    // Suffix arrays don't distribute; the Spark-native equivalent:
    // (1) every 8-gram with its word position (map-only HOF shingling),
    // (2) one corpus-wide count keyed by gram — a gram occurring ≥2
    //     times ANYWHERE (other docs or the same doc) is duplicated,
    // (3) join positions back on gram (AQE reuses the gram exchange),
    // (4) gaps-and-islands per doc merges runs of adjacent duplicated
    //     positions into MAXIMAL spans (pos − row_number constancy), so
    //     a 50-word verbatim block reports once, not 43 times;
    // (5) a SECOND interval-merge pass over the span word-ranges: two
    //     islands 1–6 gram positions apart extend (+7) into OVERLAPPING
    //     word ranges, so spans merge while s ≤ running max(e) of the
    //     predecessors — after which spans are disjoint and the sum of
    //     span lengths IS the union (dup_words can never exceed the
    //     document's word count).
    // Output: per-doc span count, total duplicated words, longest span.
    // The gram string never reaches the output (positions do), so the
    // gram-keyed count and join shuffle xxhash64(gram) — 8 bytes instead
    // of an 8-word string, the 100 TB shuffle-payload form. A 64-bit
    // collision could only merge two distinct grams' counts (marking a
    // unique gram duplicated at odds ~n²/2^65); the oracle replays the
    // STRING pipeline and the sf0.01 hash gate confirms identity.
    "text_repeated_spans" -> ((s, d) => {
      import org.apache.spark.sql.graft.TextHashExpressions.word_gram_hashes
      // r16 (guide §2.4 + step-4 "no interpreted expressions in the hot
      // path"): `word_gram_hashes` computes every 8-gram's xxh64 in one
      // zero-copy pass (bit-identical to the old slice/array_join HOF —
      // TextHashSpec), and `repartition(gram)` feeds both the frequency
      // count and the probe side of the join, so the scan+shingle subtree
      // runs ONCE and the probe is a ReusedExchange.
      val grams = documents(s, d).select(
          col("doc_id"),
          posexplode(word_gram_hashes(col("text"), 8)))
        .select(col("doc_id"), (col("pos") + lit(1)).cast(LongType).as("pos"),
          col("col").as("gram"))
        .repartition(col("gram"))
      val freq = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      val dup = grams.join(freq.filter(col("cnt") >= 2), "gram")
        .select("doc_id", "pos")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val spans = dup
        .withColumn("grp", col("pos") - row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(min("pos").as("s"), (max(col("pos")) + lit(7)).as("e"))
      // interval-merge: a span overlapping any predecessor's word range
      // (s ≤ running max e) joins its group; groups collapse to disjoint
      // maximal word intervals. Same doc-keyed window partitioning as
      // the island pass — no extra shuffle.
      val wPrev = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("s")
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val wRun = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("s")
      val merged = spans
        .withColumn("fresh",
          when(col("s") <= max("e").over(wPrev), lit(0)).otherwise(lit(1)))
        .withColumn("mg", sum("fresh").over(wRun))
        .groupBy("doc_id", "mg")
        .agg(min("s").as("s"), max("e").as("e"))
      merged.groupBy("doc_id").agg(
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s") + lit(1)).as("dup_words"),
        max(col("e") - col("s") + lit(1)).as("max_span"))
    }),

    // The REMOVAL companion to `text_repeated_spans`: rebuild each
    // document with its duplicated spans stripped (what a training-data
    // pipeline actually does with detected boilerplate). Word positions
    // covered by any maximal span drop; survivors rejoin in order. Same
    // two bounded shuffles as the detector plus one doc-keyed join of
    // word positions against the (few) spans per doc — never a
    // corpus×corpus term. Docs without spans pass through verbatim;
    // fully-duplicated docs come out empty (kept, n_kept = 0).
    "text_strip_repeated" -> ((s, d) => {
      val wordsArr = split(col("text"), " ")
      val docs = documents(s, d)
      val words = docs.select(col("doc_id"),
        posexplode(wordsArr).as(Seq("wpos0", "word")))
        .select(col("doc_id"), (col("wpos0") + lit(1)).cast(LongType).as("wpos"),
          col("word"))
      val grams = docs.select(
          col("doc_id"),
          // one-pass hashed grams + repartition-for-reuse, same rationale
          // as text_repeated_spans
          posexplode(org.apache.spark.sql.graft.TextHashExpressions
            .word_gram_hashes(col("text"), 8)))
        .select(col("doc_id"), (col("pos") + lit(1)).cast(LongType).as("pos"),
          col("col").as("gram"))
        .repartition(col("gram"))
      val freq = grams.groupBy("gram").agg(count(lit(1)).as("cnt"))
      val dup = grams.join(freq.filter(col("cnt") >= 2), "gram")
        .select("doc_id", "pos")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("pos")
      val spans = dup
        .withColumn("grp", col("pos") - row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(min("pos").as("s"), (max(col("pos")) + lit(7)).as("e"))
        .select("doc_id", "s", "e")
      val covered = words.join(spans, Seq("doc_id"))
        .filter(col("wpos").between(col("s"), col("e")))
        .select("doc_id", "wpos").distinct()
      words.join(covered, Seq("doc_id", "wpos"), "left_anti")
        .groupBy("doc_id")
        .agg(
          array_join(transform(
            sort_array(collect_list(struct(col("wpos"), col("word")))),
            x => x.getField("word")), " ").as("clean_text"),
          count(lit(1)).as("n_kept"))
        .join(docs.select("doc_id"), Seq("doc_id"), "right_outer")
        .select(col("doc_id"),
          coalesce(col("clean_text"), lit("")).as("clean_text"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"))
    }),

    // Per-source document cap — the standard anti-domination guard in
    // web-corpus curation (no single domain/source may exceed k docs).
    // "Uniformly at random but deterministic" = keep the k largest md5
    // ranks: a pure function of doc_id, so replays/backfills keep the
    // same survivors. Runs on the custom heap top-k physical operator
    // (one shuffle on source, NO sort — O(n log k) per partition); the
    // oracle replays it as the row_number window idiom over the same
    // md5 rank.
    "text_cap_per_source" -> ((s, d) => {
      val ranked = documents(s, d)
        .withColumn("__rk", md5(col("doc_id").cast(StringType)))
      org.apache.spark.sql.graft.TopKPerGroupOp
        .topKPerGroup(ranked, Seq("source"), "__rk", 10)
        .select("source", "doc_id")
    }),

    // Heavy-hitter word frequencies through the count-min sketch
    // aggregate (functions/SketchExpressions.scala): one 4×4096 counter
    // matrix summarizes the whole corpus — the shuffle carries ONE 128 KiB
    // array instead of one row per distinct term, and the per-term probe
    // is a broadcast of that single row. At this vocabulary the geometry
    // is collision-free so estimates EQUAL exact counts and the DuckDB
    // exact-count oracle hash-checks the sketch path end-to-end (CmsSpec
    // proves the one-sided >= property under forced collisions).
    "agg_cms_word_freq" -> ((s, d) => {
      import org.apache.spark.sql.graft.SketchExpressions
      val words = documents(s, d).select(explode(split(col("text"), " ")).as("word"))
      val sk = words.agg(SketchExpressions.cms_sketch(col("word")).as("sk"))
      words.distinct()
        .crossJoin(broadcast(sk))
        .select(col("word"),
          SketchExpressions.cms_estimate(col("sk"), col("word")).as("est_count"))
    }),

    // Multimodal plumbing: opaque binary payload + typed metadata. The
    // payload here is the utf-8 encoding of text (a deterministic stand-in
    // for image/audio bytes); content-hash dedup + size audit are the real
    // operators and are byte-level, not text-level.
    "multimodal_hash" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"),
                encode(col("text"), "UTF-8").as("payload"),
                col("source"))
        .select(col("doc_id"),
                md5(col("payload")).as("content_hash"),
                length(col("payload")).cast(LongType).as("n_bytes"),
                col("source")))
  )

  /** Offline indexing / context-window-prep operators (separate map only
    * to keep the main literal under scalac's method-size comfort zone).
    */
  private lazy val indexingQueries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Inverted-index build: word → document frequency + sorted postings.
    // One explode + distinct + hash-partitioned agg — the textbook
    // offline-search shape. At 100 TB the partitioning unit is the TERM
    // (each reducer owns a vocabulary slice), and the two degenerate tails
    // are handled structurally: a df floor drops hapax noise (kept here at
    // 3, the IR default), and stop-word postings — the only lists that
    // grow with the corpus instead of the topic — would be doc-sharded
    // into segment-local lists by the same groupBy keyed on
    // (word, doc_id mod S). collect_list buffers one posting list per
    // term, bounded by that sharding, never by corpus size.
    "text_inverted_index" -> ((s, d) => {
      val pairs = documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .distinct()
      pairs.groupBy("word")
        .agg(count(lit(1)).as("df"),
          array_join(transform(array_sort(collect_list(col("doc_id"))),
            x => x.cast(StringType)), ",").as("postings"))
        .filter(col("df") >= 3)
    }),

    // Context-window chunking: fixed 200-char windows on a 150-char
    // stride (50-char overlap so no boundary sentence is lost) — the prep
    // step that turns documents into training/RAG-sized pieces. Map-only:
    // sequence + explode + substring, zero shuffles, and chunk count is
    // derived arithmetic so the plan is one narrow projection over the
    // scan at any corpus size. Token-budgeted chunking swaps length() for
    // the BPE-ish regexp_count used by `text_token_count`.
    "text_chunk_overlap" -> ((s, d) =>
      documents(s, d)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L),
            greatest(lit(0L),
              floor((length(col("text")) - 1) / lit(150.0)).cast(LongType))))
            .as("chunk_idx"))
        .select(col("doc_id"), col("chunk_idx"),
          expr("substring(text, CAST(chunk_idx * 150 + 1 AS INT), 200)")
            .as("chunk"))),

    // Rarity scoring: per-document profile of how rare its vocabulary is
    // globally (min document-frequency + count of near-hapax terms) — the
    // complement of `text_gopher_signals`' within-doc shape checks and a
    // cheap OOD/garbage detector (gibberish → every "word" is rare).
    // Two hash-partitioned aggs on the word key plus one join that
    // re-uses the same partitioning; exact integer outputs end-to-end.
    // At 100 TB the df table is Zipf-small relative to the corpus and the
    // join stays shuffle-on-word with map-side combine on both inputs.
    "text_rarity_score" -> ((s, d) => {
      val words = documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .distinct()
      val dfreq = words.groupBy("word").agg(count(lit(1)).as("df"))
      words.join(dfreq, "word")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_distinct_words"),
          min(col("df")).as("min_df"),
          sum(when(col("df") <= 2, 1L).otherwise(0L)).as("n_rare"))
    }),

    // Unigram-LM commonness score: per document, the corpus-frequency
    // mass of its tokens — Σ tf(w)·c(w,doc) and its per-token mean. The
    // integer-exact complement of a perplexity filter (CCNet-style): LOW
    // mean_tf = rare/garbled vocabulary, HIGH = boilerplate-common. All
    // sums are integers (order-independent, engine-exact); the single
    // double division per doc is IEEE-exact in both engines. Shape: the
    // term-frequency table is Zipf-small, both aggs are map-side
    // combinable, and the join re-uses the word-hash partitioning — at
    // 100 TB this is two corpus scans' work on one shuffle key.
    "text_commonness_score" -> ((s, d) => {
      val perDoc = documents(s, d)
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("doc_id", "word").agg(count(lit(1)).as("c"))
      val tf = perDoc.groupBy("word").agg(sum(col("c")).as("tf"))
      perDoc.join(tf, "word")
        .groupBy("doc_id")
        .agg(sum(col("c")).as("n_tokens"),
          sum(col("c") * col("tf")).as("tf_mass"),
          (sum(col("c") * col("tf")).cast(DoubleType) / sum(col("c")))
            .as("mean_tf"))
    }),

    // Length-proportional document sampling: keep with probability
    // min(n_chars, 400)/400 — a fixed row budget spends itself on token
    // MASS instead of document count (short fragments are mostly noise;
    // long docs carry the training signal). Exact integer membership
    // test, map-only, pushdown-friendly; replays and the oracle agree
    // row-for-row at any parallelism.
    "text_sample_weighted" -> ((s, d) =>
      graft.operators.Sampling.weightedSample(
        documents(s, d).select("doc_id", "source", "n_chars"),
        "doc_id", "n_chars", cap = 400L)),

    // Per-source vocabulary statistics (Heaps'-law corpus QA): token
    // volume, distinct vocabulary, and hapax count per source — a source
    // whose hapax share balloons is OCR noise/gibberish; one whose
    // vocabulary flatlines is template spam. One (source, word) agg (map-
    // side combinable; vocabulary is Zipf-small per source) + a source-
    // keyed rollup. Exact integers end-to-end.
    "text_vocab_stats" -> ((s, d) => {
      val wf = documents(s, d)
        .select(col("source"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("source", "word").agg(count(lit(1)).as("c"))
      wf.groupBy("source").agg(
        sum("c").as("n_tokens"),
        count(lit(1)).as("n_distinct_words"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
    }),

    // Heavy hitters per language via the SpaceSaving sketch: top-10
    // words WITHOUT an unbounded word-keyed groupBy — the shuffle
    // carries one ≤512-entry summary per language, whatever the
    // vocabulary size. This corpus' vocabulary sits far under capacity,
    // so the sketch is in its EXACT regime (no eviction, plain count
    // merge — deterministic) and the oracle checks true counts; above
    // capacity only the spec-proven SpaceSaving bounds hold.
    "agg_topk_words" -> ((s, d) => {
      import org.apache.spark.sql.graft.TopKSketch
      documents(s, d)
        .select(col("lang"),
          explode(split(lower(col("text")), "\\s+")).as("word"))
        .filter(col("word") =!= "")
        .groupBy("lang")
        .agg(TopKSketch.topk_sketch(col("word"), 512).as("sk"))
        .select(col("lang"), posexplode(col("sk")))
        .filter(col("pos") < 10)
        .select(col("lang"), col("col.item").as("word"),
          col("col.est").as("cnt"),
          (col("pos") + 1).cast(LongType).as("rnk"))
    })
  )

  val oracleSql: Map[String, String] = Map(
    "text_stats" ->
      """SELECT doc_id,
          length(text) AS n_chars_calc,
          len(regexp_split_to_array(text, '\s+')) AS n_tokens,
          length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
          len(regexp_extract_all(text, '\bthe\b')) AS n_the,
          CAST(len(regexp_extract_all(text, '\bthe\b')) AS DOUBLE)
            / len(regexp_split_to_array(text, '\s+')) AS stop_ratio
        FROM documents""",

    "text_quality_score" ->
      """WITH sig AS (
          SELECT doc_id,
            len(regexp_split_to_array(text, '\s+')) AS n_tokens,
            length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS n_punct,
            len(regexp_extract_all(text, '\bthe\b')) AS n_the
          FROM documents)
        SELECT doc_id,
          (CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END +
           CASE WHEN n_punct * 10 < n_tokens THEN 1 ELSE 0 END +
           CASE WHEN n_the > 0 THEN 1 ELSE 0 END) AS quality_score,
          CAST((CASE WHEN n_tokens BETWEEN 20 AND 1000 THEN 1 ELSE 0 END +
           CASE WHEN n_punct * 10 < n_tokens THEN 1 ELSE 0 END +
           CASE WHEN n_the > 0 THEN 1 ELSE 0 END) >= 2 AS INT) AS keep
        FROM sig""",

    "text_lang_id" ->
      """SELECT doc_id, lang,
          CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
               WHEN position(' und ' IN text) > 0 OR position(' der ' IN text) > 0 THEN 'de'
               WHEN position(' le ' IN text) > 0 OR position(' une ' IN text) > 0 THEN 'fr'
               WHEN position(' el ' IN text) > 0 OR position(' los ' IN text) > 0 THEN 'es'
               ELSE 'en' END AS pred_lang,
          CAST(CASE WHEN regexp_matches(text, '[\x{4e00}-\x{9fff}]') THEN 'zh'
               WHEN position(' und ' IN text) > 0 OR position(' der ' IN text) > 0 THEN 'de'
               WHEN position(' le ' IN text) > 0 OR position(' une ' IN text) > 0 THEN 'fr'
               WHEN position(' el ' IN text) > 0 OR position(' los ' IN text) > 0 THEN 'es'
               ELSE 'en' END = lang AS INT) AS is_match
        FROM documents""",

    "text_token_count" ->
      """SELECT doc_id,
          len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS n_bpe_tokens,
          len(regexp_extract_all(text, '[0-9]+')) AS n_digit_runs
        FROM documents""",

    "text_fingerprint" ->
      """SELECT doc_id,
          md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
        FROM documents""",

    "dedup_exact" ->
      """SELECT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp,
          COUNT(*) AS n_dups, MIN(doc_id) AS canonical_id
        FROM documents GROUP BY 1""",

    "dedup_ngram_jaccard" ->
      """WITH t AS (
          SELECT lang, source, n_chars // 100 AS len_bucket,
                 doc_id,
                 list_distinct(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS toks
          FROM documents)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(a.toks, b.toks))) AS jac
        FROM t a JOIN t b
          ON a.lang = b.lang AND a.source = b.source
         AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.toks, b.toks)) AS DOUBLE)
            / len(list_distinct(list_concat(a.toks, b.toks))) >= 0.6""",

    "dedup_minhash_lsh" ->
      """WITH t AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(toks) - 2),
                   i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
          FROM t WHERE len(toks) >= 3)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5""",

    "dedup_keep_best" ->
      """WITH RECURSIVE t AS (
          SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
          FROM t WHERE len(toks) >= 3),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
        walk(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u),
        comp AS (
          SELECT u AS id, LEAST(MIN(v), u) AS cluster_id FROM walk GROUP BY u),
        lab AS (
          SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
          FROM documents d LEFT JOIN comp c ON d.doc_id = c.id),
        q AS (
          SELECT doc_id,
            (CASE WHEN len(regexp_split_to_array(text, '\s+')) BETWEEN 20 AND 1000 THEN 1 ELSE 0 END +
             CASE WHEN (length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g'))) * 10
                       < len(regexp_split_to_array(text, '\s+')) THEN 1 ELSE 0 END +
             CASE WHEN len(regexp_extract_all(text, '\bthe\b')) > 0 THEN 1 ELSE 0 END) AS quality_score
          FROM documents),
        best AS (
          SELECT l.cluster_id, max(q.quality_score) AS best_score
          FROM q JOIN lab l ON q.doc_id = l.doc_id
          GROUP BY 1),
        win AS (
          SELECT l.cluster_id, min(q.doc_id) AS doc_id
          FROM q JOIN lab l ON q.doc_id = l.doc_id
          JOIN best b ON b.cluster_id = l.cluster_id AND q.quality_score = b.best_score
          GROUP BY 1)
        SELECT q.doc_id, q.quality_score FROM q JOIN win ON q.doc_id = win.doc_id""",

    "text_pack_sequences" ->
      """WITH tok AS (
          SELECT source, doc_id, len(string_split(text, ' ')) AS n_tok FROM documents)
        SELECT source, doc_id, n_tok,
          CAST(floor((CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT)
                      - n_tok) / 256.0) AS BIGINT) AS pack_id
        FROM tok""",

    "dedup_incremental" ->
      """WITH t AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(toks) - 2),
                   i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
          FROM t WHERE len(toks) >= 3)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
          AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5""",

    "dedup_incremental_banded" ->
      """WITH t AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents),
        sh AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(len(toks) - 2),
                   i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
          FROM t WHERE len(toks) >= 3)
        SELECT a.doc_id AS a_id, b.doc_id AS b_id,
          CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) AS jac
        FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE (a.doc_id % 2 = 1 OR b.doc_id % 2 = 1)
          AND CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
            / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5""",

    "text_bigram_freq" ->
      """WITH t AS (
          SELECT string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents),
        b AS (
          SELECT unnest(list_transform(range(len(toks) - 1),
                   i -> toks[i+1] || ' ' || toks[i+2])) AS bigram
          FROM t WHERE len(toks) >= 2)
        SELECT bigram, COUNT(*) AS n FROM b
        GROUP BY 1 ORDER BY n DESC, bigram LIMIT 20""",

    "agg_elementwise_min" ->
      """WITH s AS (
          SELECT lang, doc_id,
            list_transform(range(8), i ->
              CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)), 1, 15)) AS BIGINT) % 1000000) AS sig
          FROM documents),
        u AS (SELECT lang, unnest(range(8)) AS pos, unnest(sig) AS v FROM s),
        m AS (SELECT lang, pos, MIN(v) AS mv FROM u GROUP BY 1, 2)
        SELECT lang, string_agg(CAST(mv AS VARCHAR), ',' ORDER BY pos) AS min_sig_csv
        FROM m GROUP BY lang""",

    "text_gopher_signals" ->
      """WITH t AS (
          SELECT doc_id,
                 trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS norm,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents)
        SELECT doc_id,
          CAST(len(toks) AS BIGINT) AS n_words,
          CAST(length(replace(norm, ' ', '')) AS DOUBLE) / len(toks) AS mean_word_len,
          CAST(len(regexp_extract_all(norm, '[^a-z0-9 ]')) AS DOUBLE) / length(norm) AS symbol_ratio,
          1.0 - CAST(len(list_distinct(list_transform(range(len(toks) - 2),
                  i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))) AS DOUBLE)
                / (len(toks) - 2) AS dup_3gram_ratio
        FROM t WHERE len(toks) >= 3""",

    "text_redact_pii" ->
      """SELECT doc_id,
          regexp_replace(
            regexp_replace(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
            '[0-9]{7,}', '<NUM>', 'g') AS redacted
        FROM documents""",

    "text_train_test_split" ->
      """WITH b AS (
          SELECT doc_id,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 100 AS bucket
          FROM documents)
        SELECT doc_id, bucket,
          CASE WHEN bucket < 90 THEN 'train'
               WHEN bucket < 95 THEN 'val'
               ELSE 'test' END AS split
        FROM b""",

    "text_sample_stratified" ->
      """WITH b AS (
          SELECT lang, doc_id, source,
                 CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000 AS bkt
          FROM documents)
        SELECT lang, doc_id, source FROM b
        WHERE bkt < CASE lang WHEN 'de' THEN 10000 WHEN 'en' THEN 5000
                              WHEN 'fr' THEN 8000 WHEN 'es' THEN 8000
                              WHEN 'zh' THEN 2000 ELSE 0 END""",

    "text_decontaminate" ->
      """WITH sh AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(string_split(text, ' ')) - 6),
                        i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS shingle
          FROM documents),
        ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
        ev AS (SELECT DISTINCT shingle FROM ds
               WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
        hits AS (
          SELECT doc_id, count(*) AS n_hits FROM ds
          WHERE shingle IN (SELECT shingle FROM ev)
            AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
          GROUP BY 1)
        SELECT d.doc_id, d.source,
               COALESCE(h.n_hits, 0) AS n_hits,
               CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <> '0'""",

    // The bloom prefilter is exact-after-confirm, so the oracle is the
    // same SQL as text_decontaminate.
    "text_decontaminate_bloom" ->
      """WITH sh AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(string_split(text, ' ')) - 6),
                        i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS shingle
          FROM documents),
        ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
        ev AS (SELECT DISTINCT shingle FROM ds
               WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'),
        hits AS (
          SELECT doc_id, count(*) AS n_hits FROM ds
          WHERE shingle IN (SELECT shingle FROM ev)
            AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <> '0'
          GROUP BY 1)
        SELECT d.doc_id, d.source,
               COALESCE(h.n_hits, 0) AS n_hits,
               CASE WHEN COALESCE(h.n_hits, 0) > 0 THEN 1 ELSE 0 END AS contaminated
        FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
        WHERE substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1) <> '0'""",

    "text_importance_sample" ->
      """WITH bw AS (
          SELECT doc_id, lang = 'en' AS tgt,
                 CAST(('0x' || substr(md5(w), 1, 15)) AS BIGINT) % 256 AS bucket
          FROM (SELECT doc_id, lang, unnest(string_split(text, ' ')) AS w
                FROM documents)),
        dist AS (
          SELECT bucket, count(*) AS n_all, count(*) FILTER (tgt) AS n_tgt
          FROM bw GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_all) AS BIGINT) AS tot_all,
                 CAST(sum(n_tgt) AS BIGINT) AS tot_tgt
          FROM dist),
        enr AS (
          SELECT bucket FROM dist CROSS JOIN tot
          WHERE CAST(n_tgt AS HUGEINT) * tot_all > CAST(n_all AS HUGEINT) * tot_tgt)
        SELECT doc_id, count(*) AS n_words,
               count(e.bucket) AS n_enriched,
               round(CAST(count(e.bucket) AS DOUBLE) / count(*), 6) AS imp_r,
               CASE WHEN round(CAST(count(e.bucket) AS DOUBLE) / count(*), 6) >= 0.5
                    THEN 1 ELSE 0 END AS kept
        FROM bw LEFT JOIN enr e ON bw.bucket = e.bucket
        GROUP BY doc_id""",

    "text_mixture_weights" ->
      """WITH tok AS (
          SELECT source, len(string_split(text, ' ')) AS n_tok FROM documents),
        per AS (
          SELECT source, count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS n_tokens
          FROM tok GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 count(*) AS n_sources
          FROM per)
        SELECT source, n_docs, n_tokens,
               LEAST(1.0, total_tokens / n_sources / 2.0 / n_tokens) AS weight
        FROM per CROSS JOIN tot""",

    "text_mixture_apply" ->
      """WITH per AS (
          SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
          FROM documents GROUP BY 1),
        tot AS (
          SELECT CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
                 count(*) AS n_sources
          FROM per),
        w AS (
          SELECT source, LEAST(1.0, total_tokens / n_sources / 2.0 / n_tokens) AS wt
          FROM per CROSS JOIN tot)
        SELECT d.doc_id, d.source
        FROM documents d JOIN w ON d.source = w.source
        WHERE CAST(('0x' || substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000
              < round(wt * 10000)""",

    "dedup_clusters" ->
      """WITH RECURSIVE t AS (
          SELECT doc_id, string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS toks
          FROM documents),
        sh AS (
          SELECT doc_id, list_distinct(list_transform(range(len(toks) - 2),
            i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3])) AS shingles
          FROM t WHERE len(toks) >= 3),
        pairs AS (
          SELECT a.doc_id AS a_id, b.doc_id AS b_id
          FROM sh a JOIN sh b ON a.doc_id < b.doc_id
          WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
              / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.5),
        edges AS (
          SELECT a_id AS u, b_id AS v FROM pairs
          UNION SELECT b_id, a_id FROM pairs),
        walk(u, v) AS (
          SELECT u, v FROM edges
          UNION
          SELECT w.u, e.v FROM walk w JOIN edges e ON w.v = e.u),
        comp AS (
          SELECT u AS id, LEAST(MIN(v), u) AS cluster_id FROM walk GROUP BY u)
        SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.id""",

    // Reimplements the portable SimHash bit-for-bit: features = distinct
    // word-3-gram shingles (the shared dedup feature space), feature hash
    // = md5_number_lower (last 8 md5 bytes, LE), per-bit ±1 vote, bit_or
    // of winning bits, 4×16-bit band self-join, Hamming ≤ 8 verify.
    "dedup_simhash" ->
      """WITH w AS (
          SELECT doc_id,
                 string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ') AS ws
          FROM documents),
        toks AS (
          SELECT DISTINCT doc_id,
                 unnest(list_transform(range(1, len(ws) - 1),
                        i -> array_to_string(ws[i:i+2], ' '))) AS tok
          FROM w
          WHERE len(ws) >= 3),
        bits AS (
          SELECT doc_id, b.j,
                 SUM(CASE WHEN (md5_number_lower(tok) >> b.j) & 1 = 1 THEN 1 ELSE -1 END) AS acc
          FROM toks CROSS JOIN range(64) b(j)
          GROUP BY doc_id, b.j),
        sig AS (
          SELECT doc_id,
                 bit_or(CASE WHEN acc > 0 THEN 1::UBIGINT << j ELSE 0::UBIGINT END) AS sig
          FROM bits GROUP BY doc_id),
        banded AS (
          SELECT doc_id, sig, b.i AS band_idx, (sig >> (16 * b.i)) & 65535 AS band_val
          FROM sig CROSS JOIN range(4) b(i)),
        pairs AS (
          SELECT DISTINCT a.doc_id AS a_id, b2.doc_id AS b_id,
                 CAST(bit_count(xor(a.sig, b2.sig)) AS BIGINT) AS hamming
          FROM banded a JOIN banded b2
            ON a.band_idx = b2.band_idx AND a.band_val = b2.band_val
           AND a.doc_id < b2.doc_id)
        SELECT a_id, b_id, hamming FROM pairs WHERE hamming <= 12""",

    "text_crossdoc_dup" ->
      """WITH sh AS (
          SELECT doc_id,
                 unnest(list_transform(range(1, len(string_split(text, ' ')) - 6),
                        i -> array_to_string(string_split(text, ' ')[i:i+7], ' '))) AS shingle
          FROM documents),
        ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
        freq AS (SELECT shingle, count(*) AS ndocs FROM ds GROUP BY 1)
        SELECT doc_id, count(*) AS n_shingles,
               count(CASE WHEN ndocs >= 2 THEN 1 END) AS n_dup,
               CAST(count(CASE WHEN ndocs >= 2 THEN 1 END) AS DOUBLE)/count(*) AS dup_frac
        FROM ds JOIN freq USING (shingle)
        GROUP BY 1""",

    "text_repeated_spans" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id,
                     unnest(range(1, len(ws) - 6)) AS pos,
                     unnest(list_transform(range(1, len(ws) - 6),
                            i -> array_to_string(ws[i:i+7], ' '))) AS gram
              FROM w),
        freq AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
        dup AS (SELECT doc_id, pos FROM g JOIN freq USING (gram) WHERE cnt >= 2),
        isl AS (SELECT doc_id, pos,
                       pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                FROM dup),
        spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
                  FROM isl GROUP BY doc_id, grp),
        marked AS (SELECT doc_id, s, e,
                          CASE WHEN s <= max(e) OVER (PARTITION BY doc_id ORDER BY s
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                               THEN 0 ELSE 1 END AS fresh
                   FROM spans),
        grouped AS (SELECT doc_id, s, e,
                           sum(fresh) OVER (PARTITION BY doc_id ORDER BY s) AS mg
                    FROM marked),
        merged AS (SELECT doc_id, min(s) AS s, max(e) AS e
                   FROM grouped GROUP BY doc_id, mg)
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(e - s + 1) AS BIGINT) AS dup_words,
               CAST(max(e - s + 1) AS BIGINT) AS max_span
        FROM merged GROUP BY doc_id""",

    "text_strip_repeated" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        g AS (SELECT doc_id,
                     unnest(range(1, len(ws) - 6)) AS pos,
                     unnest(list_transform(range(1, len(ws) - 6),
                            i -> array_to_string(ws[i:i+7], ' '))) AS gram
              FROM w),
        freq AS (SELECT gram, count(*) AS cnt FROM g GROUP BY 1),
        dup AS (SELECT doc_id, pos FROM g JOIN freq USING (gram) WHERE cnt >= 2),
        isl AS (SELECT doc_id, pos,
                       pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
                FROM dup),
        spans AS (SELECT doc_id, min(pos) AS s, max(pos) + 7 AS e
                  FROM isl GROUP BY doc_id, grp),
        words AS (SELECT doc_id,
                         unnest(range(1, len(ws) + 1)) AS wpos,
                         unnest(ws) AS word
                  FROM w),
        kept AS (
          SELECT wd.doc_id, wd.wpos, wd.word
          FROM words wd
          WHERE NOT EXISTS (SELECT 1 FROM spans sp
                            WHERE sp.doc_id = wd.doc_id
                              AND wd.wpos BETWEEN sp.s AND sp.e)),
        rebuilt AS (
          SELECT doc_id,
                 string_agg(word, ' ' ORDER BY wpos) AS clean_text,
                 CAST(count(*) AS BIGINT) AS n_kept
          FROM kept GROUP BY doc_id)
        SELECT d.doc_id,
               coalesce(r.clean_text, '') AS clean_text,
               coalesce(r.n_kept, 0) AS n_kept
        FROM documents d LEFT JOIN rebuilt r USING (doc_id)""",

    "text_cap_per_source" ->
      """SELECT source, doc_id FROM (
          SELECT source, doc_id,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY md5(CAST(doc_id AS VARCHAR)) DESC) AS rn
          FROM documents) t WHERE rn <= 10""",

    "agg_cms_word_freq" ->
      """SELECT word, count(*) AS est_count
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        GROUP BY 1""",

    "multimodal_hash" ->
      """SELECT doc_id, md5(text) AS content_hash,
          octet_length(encode(text)) AS n_bytes, source
        FROM documents""",

    "text_inverted_index" ->
      """WITH e AS (
          SELECT doc_id,
                 unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
          FROM documents),
        w AS (SELECT DISTINCT doc_id, word FROM e WHERE word <> '')
        SELECT word, COUNT(*) AS df,
               string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
        FROM w GROUP BY word HAVING COUNT(*) >= 3""",

    "text_chunk_overlap" ->
      """WITH n AS (
          SELECT doc_id, text,
                 unnest(range(greatest(0, CAST(floor((length(text) - 1) / 150.0) AS BIGINT)) + 1)) AS chunk_idx
          FROM documents)
        SELECT doc_id, chunk_idx,
               substring(text, CAST(chunk_idx * 150 + 1 AS INT), 200) AS chunk
        FROM n""",

    "text_rarity_score" ->
      """WITH e AS (
          SELECT doc_id,
                 unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
          FROM documents),
        w AS (SELECT DISTINCT doc_id, word FROM e WHERE word <> ''),
        f AS (SELECT word, COUNT(*) AS df FROM w GROUP BY 1)
        SELECT w.doc_id, COUNT(*) AS n_distinct_words, MIN(f.df) AS min_df,
               CAST(SUM(CASE WHEN f.df <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_rare
        FROM w JOIN f USING (word) GROUP BY 1""",

    "text_commonness_score" ->
      """WITH e AS (
          SELECT doc_id,
                 unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
          FROM documents),
        pd AS (SELECT doc_id, word, COUNT(*) AS c FROM e WHERE word <> '' GROUP BY 1, 2),
        tf AS (SELECT word, CAST(SUM(c) AS BIGINT) AS tf FROM pd GROUP BY 1)
        SELECT pd.doc_id,
               CAST(SUM(pd.c) AS BIGINT) AS n_tokens,
               CAST(SUM(pd.c * tf.tf) AS BIGINT) AS tf_mass,
               CAST(CAST(SUM(pd.c * tf.tf) AS BIGINT) AS DOUBLE)
                 / CAST(SUM(pd.c) AS BIGINT) AS mean_tf
        FROM pd JOIN tf USING (word) GROUP BY 1""",

    "text_sample_weighted" ->
      """SELECT doc_id, source, n_chars FROM documents
        WHERE (CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10000) * 400
              < LEAST(n_chars, 400) * 10000""",

    "text_vocab_stats" ->
      """WITH e AS (
          SELECT source,
                 unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
          FROM documents),
        wf AS (SELECT source, word, COUNT(*) AS c FROM e WHERE word <> '' GROUP BY 1, 2)
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_distinct_words,
               CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
        FROM wf GROUP BY 1""",

    "agg_topk_words" ->
      """WITH e AS (
          SELECT lang,
                 unnest(string_split(trim(regexp_replace(lower(text), '\s+', ' ', 'g')), ' ')) AS word
          FROM documents),
        c AS (SELECT lang, word, COUNT(*) AS cnt FROM e WHERE word <> '' GROUP BY 1, 2),
        r AS (SELECT lang, word, cnt,
                     row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, word) AS rnk
              FROM c)
        SELECT lang, word, cnt, rnk FROM r WHERE rnk <= 10"""
  )
}
