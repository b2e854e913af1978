package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions._

/** Approximate-nearest-neighbor search paths over an embedding column
  * (north-star §2.9). Two scale strategies:
  *
  *   - IVF (inverted file): partition the corpus by a coarse cell id and
  *     probe only the query's cell — `sim_ivf_label_topk` in
  *     QueriesSimilarity (oracle-checked, uses `label` as the cell).
  *   - SRP-LSH (this file): sign-random-projection signatures bucket the
  *     corpus by a 2^bits hash space; neighbors are searched only inside
  *     the query's bucket (optionally multi-probe by flipping one bit).
  *
  * Both reduce the per-query scan from |corpus| to a cell/bucket, the
  * difference being that SRP needs no trained quantizer. All pairwise
  * work is inside buckets: shuffle keys are (bucket), never payload
  * vectors crossed with everything.
  */
object AnnOps {
  /** Signature table: (vec_id, embedding, bucket). */
  def withBuckets(emb: DataFrame, bits: Int, seed: Long = 42L): DataFrame =
    emb.withColumn("bucket", srp_signature(col("embedding"), bits, seed))

  /** Top-k cosine neighbors per query, searched within the query's SRP
    * bucket. `multiProbe` additionally searches all buckets at Hamming
    * distance 1 (bits+1 probes total) — the standard recall/latency knob.
    */
  def srpTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, bits: Int,
              multiProbe: Boolean = false, seed: Long = 42L): DataFrame = {
    val bucketed = withBuckets(emb, bits, seed)
    val corpus = bucketed.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), col("bucket"))
    val q0 = bucketed.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("bucket"))
    val probes =
      if (!multiProbe) q0
      else q0.withColumn("flip", explode(array((-1 +: (0 until bits)).map(lit): _*)))
        .withColumn("bucket",
          when(col("flip") === -1, col("bucket"))
            .otherwise(expr("bucket ^ (1L << flip)")))
        .drop("flip")
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    corpus.join(probes, Seq("bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
              vec_cosine(col("q_emb"), col("n_emb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Independent hyperplane-set seed for table `t`. SrpSignature mixes
    * `seed ^ (bit << 32) ^ dim`, so *additive* table seeds would give
    * structurally correlated hyperplanes (seed⊕1 is seed with dimension
    * pairs swapped); a full splitmix64 mix over a golden-ratio stride
    * decorrelates the tables. */
  private def tableSeed(seed: Long, t: Int): Long =
    org.apache.spark.sql.graft.TextHashExpressions.mix64(
      seed + 0x9E3779B97F4A7C15L * (t + 1))

  /** Candidate pairs (q_id, n_id) from the union of `tables` independent
    * SRP signature tables — the OR-construction that amplifies LSH
    * recall: a true neighbor that collides with the query in ANY table
    * becomes a candidate, so candidate recall compounds as
    * 1 − (1 − p^bits)^L while each table keeps the selectivity of `bits`
    * bits. Scale shape: ONE narrow pass computes all L signatures
    * (posexplode over an array of signature columns), the candidate join
    * shuffles only (table, bucket) keys — never payload vectors crossed
    * with everything — and the distinct dedups the union before any
    * exact work. */
  def srpMultiCandidates(emb: DataFrame, queryIds: Seq[Long], bits: Int,
                         tables: Int, multiProbe: Boolean = false,
                         seed: Long = 42L): DataFrame = {
    require(tables >= 1)
    val sigs = (0 until tables).map(t =>
      srp_signature(col("embedding"), bits, tableSeed(seed, t)))
    val tagged = emb.select(col("vec_id"),
      posexplode(array(sigs: _*)).as(Seq("tbl", "bucket")))
    val corpus = tagged.select(col("vec_id").as("n_id"), col("tbl"), col("bucket"))
    val q0 = tagged.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("q_id"), col("tbl"), col("bucket"))
    val probes =
      if (!multiProbe) q0
      else q0.withColumn("flip", explode(array((-1 +: (0 until bits)).map(lit): _*)))
        .withColumn("bucket",
          when(col("flip") === -1, col("bucket"))
            .otherwise(expr("bucket ^ (1L << flip)")))
        .drop("flip")
    corpus.join(probes, Seq("tbl", "bucket"))
      .filter(col("q_id") =!= col("n_id"))
      .select("q_id", "n_id").distinct()
  }

  /** Exact-cosine top-k over an explicit (q_id, n_id) candidate table —
    * the rerank stage shared by every candidate-generating ANN path.
    * Cost is |candidates| exact scores, never |corpus| × |queries|. */
  def rerankExact(emb: DataFrame, queryIds: Seq[Long], k: Int,
                  candidates: DataFrame): DataFrame = {
    val qv = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    candidates
      .join(emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb")), Seq("n_id"))
      .join(broadcast(qv), Seq("q_id"))
      .select(col("q_id"), col("n_id"),
              vec_cosine(col("q_emb"), col("n_emb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Multi-table (OR-amplified) SRP-LSH top-k: candidate union across L
    * independent tables, then exact rerank. This is THE production SRP
    * operating mode — single-table SRP ([[srpTopK]]) cannot reach high
    * recall at useful selectivity, while recall here is tunable to any
    * target via L at fixed per-table cost. Candidates grow with `tables`
    * monotonically (table t's buckets are independent of t' < t), so
    * recall is monotone in L — AnnSpec asserts it, and asserts dominance
    * over single-table at equal total bits. */
  def srpMultiTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, bits: Int,
                   tables: Int, multiProbe: Boolean = false,
                   seed: Long = 42L): DataFrame =
    rerankExact(emb, queryIds, k,
      srpMultiCandidates(emb, queryIds, bits, tables, multiProbe, seed))

  /** Trained-quantizer IVF: k-means centroids form the coarse quantizer,
    * each corpus vector is assigned to its nearest centroid (the inverted
    * file), and a query searches only its `nProbe` closest cells — the
    * standard FAISS-style IVF layout, Spark-native: training is one ML
    * job, assignment is a map, search shuffles only (cell) keys.
    *
    * At 100 TB: train on a sample (`fit` here uses the full corpus because
    * test corpora are small), persist `cell` with the corpus so assignment
    * is a one-time cost, and bucket the corpus files by cell so a probe
    * reads only its cells' files. With `nProbe = nCells` the search is
    * exhaustive and exactly equals [[bruteForceTopK]] (AnnSpec asserts it).
    */
  def kmeansIvfTopK(emb: DataFrame, queryIds: Seq[Long], k: Int,
                    nCells: Int, nProbe: Int, seed: Long = 42L): DataFrame =
    // one code path: train then search via the model — the inline and
    // persisted forms cannot diverge because they ARE the same arithmetic
    ivfTopK(emb, ivfTrain(emb, nCells, seed), queryIds, k, nProbe)

  /** Trained IVF coarse quantizer as a value — the index lifecycle the
    * inline [[kmeansIvfTopK]] hides: train ONCE (on a sample at 100 TB),
    * persist the centroid table, [[ivfAssign]] the corpus once at write
    * time (and bucket its files by `cell`), then every query pays only
    * the probe. Round-trips through a plain 2-column parquet table.
    *
    * Centroids stay DOUBLE end-to-end (MLlib trains in double; float
    * truncation here would flip cell assignment for vectors near Voronoi
    * boundaries, so a persisted index could disagree with a fresh one). */
  final case class IvfModel(centroids: Seq[(Int, Seq[Double])])

  def ivfTrain(emb: DataFrame, nCells: Int, seed: Long = 42L): IvfModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = emb.withColumn("fv", array_to_vector(col("embedding")))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("fv")
      .fit(withVec)
    IvfModel(model.clusterCenters.zipWithIndex.toSeq
      .map { case (c, i) => (i, c.toArray.toSeq) })
  }

  def ivfSave(model: IvfModel, path: String,
              spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.centroids.toDF("cell", "c_emb")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def ivfLoad(spark: org.apache.spark.sql.SparkSession, path: String): IvfModel =
    // the cast makes the read format-tolerant: a centroid table persisted
    // by the earlier float layout would otherwise surface boxed Floats
    // through getSeq[Double] and throw on first arithmetic use
    IvfModel(spark.read.parquet(path)
      .select(col("cell"), col("c_emb").cast("array<double>").as("c_emb"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq)

  /** Nearest-centroid (squared-euclidean) cell per vector — MAP-ONLY:
    * the centroid table rides as a literal, scores come from one
    * `transform` pass over it (x·x is constant per row, so comparing
    * c·c − 2·x·c suffices — and each c·c is a driver-side constant
    * baked into the literal), then one argmin fold over the scores;
    * no join, no shuffle — a 100 TB corpus assigns in the write pass.
    * All arithmetic is double precision (matching training); ties
    * resolve to the lowest cell id (MLlib's convention). */
  def ivfAssign(emb: DataFrame, model: IvfModel): DataFrame = {
    val n = model.centroids.size
    val cc = model.centroids.map { case (_, c) => c.map(x => x * x).sum }
    val dot = (j: org.apache.spark.sql.Column) =>
      aggregate(
        zip_with(col("embedding"), element_at(col("__cents"), j + 1),
                 (a, b) => a.cast("double") * b),
        lit(0.0d), (acc, x) => acc + x)
    val score = (j: org.apache.spark.sql.Column) =>
      element_at(col("__cc"), j + 1) - lit(2.0d) * dot(j)
    emb.withColumn("__cents", typedlit(model.centroids.map(_._2)))
      .withColumn("__cc", typedlit(cc))
      .withColumn("__scores",
        transform(sequence(lit(0), lit(n - 1)), j => score(j)))
      .withColumn("cell",
        aggregate(sequence(lit(0), lit(n - 1)),
          struct(lit(-1).as("i"), lit(Double.PositiveInfinity).as("d")),
          (acc, j) => {
            val s = element_at(col("__scores"), j + 1)
            when(s < acc.getField("d"),
                 struct(j.cast("int").as("i"), s.as("d"))).otherwise(acc)
          },
          acc => acc.getField("i")))
      .drop("__cents", "__cc", "__scores")
  }

  /** IVF search against a trained/persisted model: assignment is the
    * map-only [[ivfAssign]] (in production, read back with the corpus),
    * then cell-probe + exact rerank. The probe-ranking centroid table is
    * float (it only ORDERS cells by query-centroid cosine — an
    * approximation knob — while assignment, which defines the index,
    * stays double). */
  def ivfTopK(emb: DataFrame, model: IvfModel, queryIds: Seq[Long],
              k: Int, nProbe: Int): DataFrame =
    ivfTopKAssigned(ivfAssign(emb, model), model, queryIds, k, nProbe)

  /** IVF search over an ALREADY-ASSIGNED corpus (vec_id, embedding,
    * cell) — the production read path: assignment happened once at write
    * time and was persisted with the corpus, so a query (or a probe
    * sweep) pays only the cell probe, never a re-assignment. */
  def ivfTopKAssigned(assigned: DataFrame, model: IvfModel,
                      queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame =
    ivfSearch(assigned.select(col("vec_id"), col("embedding"), col("cell")),
      floatCents(assigned.sparkSession, model), queryIds, k, nProbe)

  /** The probe-ranking centroid table (float — it only ORDERS cells). */
  private def floatCents(spark: org.apache.spark.sql.SparkSession,
                         model: IvfModel): DataFrame = {
    import spark.implicits._
    model.centroids.map { case (i, c) => (i, c.map(_.toFloat)) }
      .toDF("cell", "c_emb")
  }

  /** Persist the assigned corpus PARTITIONED BY CELL — the inverted-file
    * layout on disk. Reading it back and probing ([[ivfTopKAssigned]])
    * lets dynamic partition pruning drop every non-probed cell's files
    * at the scan (AnnSpec asserts the pruning is in the plan): at 100 TB
    * a probe-4-of-1024 query reads ~0.4% of the corpus bytes instead of
    * filtering after a full scan. */
  def ivfWriteIndex(emb: DataFrame, model: IvfModel, path: String): Unit =
    ivfAssign(emb, model).write.partitionBy("cell")
      .mode("overwrite").parquet(path)

  /** Append a batch to a persisted IVF index under the SAME fixed
    * model — the nightly embedding-ingest path. The index root uses an
    * ingest-keyed layout (`path/ingest=K/cell=C/...`): each batch
    * OVERWRITES its own `ingest=$batchId` subtree, so a retried or
    * re-delivered nightly job rewrites identical content instead of
    * appending duplicate rows (a plain parquet append would corrupt the
    * index on the first retry — the same at-least-once contract as
    * [[graft.TextPipeline.saveStateDelta]]). History subtrees are never
    * read or rewritten: nightly cost is O(batch) regardless of index
    * size. Readers `spark.read.parquet(path)` the root — partition
    * discovery yields both `ingest` and `cell` columns and cell pruning
    * works unchanged (assert via the probe plan, AnnSpec). Build the
    * initial index as ingest 0 through this same entry point; with a
    * fixed model, ingests compose — the union equals one
    * [[ivfWriteIndex]] of everything (AnnSpec proves set and search
    * equality, plus retry idempotency). */
  def ivfAppendIndex(emb: DataFrame, model: IvfModel, path: String,
                     batchId: Long): Unit =
    ivfAssign(emb, model).write.partitionBy("cell")
      .mode("overwrite").parquet(s"$path/ingest=$batchId")

  /** Within-cell near-duplicate pairs by exact cosine — the pairing step
    * of [[semanticDedup]]. Input must carry (vec_id, embedding, cell);
    * output is (a_id, b_id, cos) with a_id < b_id. Pairing is bounded
    * per cell (both sides hash-partition on `cell`), never
    * corpus-quadratic — the SemDeDup trade: duplicates whose embeddings
    * straddle a Voronoi boundary are missed, bounded by cluster quality.
    *
    * `maxCellSize` is the skew defense: k-means offers no balance
    * guarantee, and one runaway cell makes its reducer quadratic. Cells
    * over the cap sub-split by an SRP signature (just enough bits to
    * bring the LARGEST cell under the cap — cell sizes come from one
    * aggregation collected driver-side, bounded by the model's cell
    * count like the centroid table itself). Pairs across sub-buckets are
    * forgone — the same trade the cell boundary already makes, and EXACT
    * duplicates are never lost: identical vectors have identical sign
    * patterns, so they land in the same sub-bucket at any bit width.
    *
    * `subBits` is the PARITY-SAFE alternative skew defense for the
    * incremental fold ([[semanticDupPairsIncrement]]): a fixed-width SRP
    * sub-split applied to EVERY cell as a pure per-vector function — no
    * observed-size dependence, so batch and incremental pairings agree by
    * construction (the dynamic cap cannot: a cell small in early folds
    * but over-cap in the final corpus would emit pairs the batch form
    * drops). Mutually exclusive with a finite `maxCellSize`. */
  def semanticDupPairs(assigned: DataFrame, threshold: Double,
                       maxCellSize: Int = Int.MaxValue,
                       roundDp: Option[Int] = None,
                       subBits: Int = 0): DataFrame = {
    require(subBits == 0 || maxCellSize == Int.MaxValue,
      "semanticDupPairs: subBits (deterministic) and maxCellSize (adaptive) are mutually exclusive skew defenses")
    val sized =
      if (subBits > 0) assigned.withColumn("__sub", subSplitCol(subBits))
      else if (maxCellSize == Int.MaxValue) assigned.withColumn("__sub", lit(0L))
      else {
        // one aggregation, collected: the relation is bounded by the
        // model's cell count (thousands), like the centroid table itself
        val sizes = assigned.groupBy("cell").agg(count(lit(1)).as("__n"))
          .collect().map(r => (r.getInt(0), r.getLong(1)))
        val maxN = if (sizes.isEmpty) 0L else sizes.map(_._2).max
        if (maxN <= maxCellSize) assigned.withColumn("__sub", lit(0L))
        else {
          val bits = math.max(1, math.ceil(
            math.log(maxN.toDouble / maxCellSize) / math.log(2)).toInt)
          val big = sizes.collect { case (c, n) if n > maxCellSize => c }.toSeq
          assigned.withColumn("__sub",
            when(col("cell").isInCollection(big),
                 srp_signature(col("embedding"), bits))
              .otherwise(lit(0L)))
        }
      }
    def side(p: String) = sized.select(
      col("cell"), col("__sub"),
      col("vec_id").as(s"${p}_id"), col("embedding").as(s"${p}_emb"))
    val raw = side("a").join(side("b"), Seq("cell", "__sub"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        vec_cosine(col("a_emb"), col("b_emb")).cast("double").as("cos"))
    // roundDp: round the score BEFORE thresholding so pair membership is
    // engine-portable by construction (the oracle-gated composition path)
    roundDp.fold(raw)(dp => raw.withColumn("cos", round(col("cos"), dp)))
      .filter(col("cos") >= threshold)
  }

  /** Fixed-width SRP sub-bucket — a pure per-vector function (identical
    * vectors share every sign bit, so exact dups always co-bucket), the
    * deterministic skew defense batch/incremental parity requires. */
  private def subSplitCol(subBits: Int): org.apache.spark.sql.Column =
    if (subBits <= 0) lit(0L) else srp_signature(col("embedding"), subBits)

  /** Incremental form of [[semanticDupPairs]]: the NEW pairs contributed
    * by a fresh batch against an already-assigned history — (batch ×
    * history) within shared cells plus (batch × batch) — under the SAME
    * fixed coarse quantizer. Ids must be disjoint across batches (the
    * nightly-ingest contract); pair ids normalize to a_id < b_id, so
    * folding batches and unioning the outputs reproduces the batch
    * [[semanticDupPairs]] over the final corpus exactly: within-cell
    * pairs of (old ∪ new) = within-old ∪ old×new ∪ within-new, and the
    * first term is what previous folds already emitted
    * (TextPipelineSpec proves the composed fold end-to-end).
    *
    * `subBits` must match the batch side's: the sub-split is a pure
    * per-vector function, so the same value on both paths preserves the
    * parity argument verbatim (the (cell, __sub) key replaces cell).
    *
    * Scale: the history side arrives cell-partitioned (persisted with
    * the corpus, [[ivfWriteIndex]]); the batch side is small, so the
    * cross term is a broadcast-ish join on `cell` touching only cells
    * the batch lands in — per-night cost is O(batch × avg cell), never
    * O(corpus²). */
  def semanticDupPairsIncrement(oldAssigned: DataFrame, newAssigned: DataFrame,
                                threshold: Double,
                                roundDp: Option[Int] = None,
                                subBits: Int = 0): DataFrame = {
    val oldSide = oldAssigned.withColumn("__sub", subSplitCol(subBits))
      .select(col("cell"), col("__sub"),
        col("vec_id").as("o_id"), col("embedding").as("o_emb"))
    val newSide = newAssigned.withColumn("__sub", subSplitCol(subBits))
      .select(col("cell"), col("__sub"),
        col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val crossRaw = newSide.join(oldSide, Seq("cell", "__sub"))
      .select(least(col("n_id"), col("o_id")).as("a_id"),
        greatest(col("n_id"), col("o_id")).as("b_id"),
        vec_cosine(col("n_emb"), col("o_emb")).cast("double").as("cos"))
    val cross = roundDp.fold(crossRaw)(dp =>
        crossRaw.withColumn("cos", round(col("cos"), dp)))
      .filter(col("cos") >= threshold)
    cross.unionByName(semanticDupPairs(newAssigned, threshold,
      roundDp = roundDp, subBits = subBits))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): SEMANTIC
    * deduplication — drop documents that say the same thing, not just
    * share n-grams. Cluster the embedding space with the IVF coarse
    * quantizer, compare only within-cell pairs by exact cosine, connect
    * pairs ≥ `threshold` into semantic groups, and keep ONE
    * representative per group (the smallest vec_id — the same canonical
    * choice as the MinHash cluster path; feed
    * [[DedupClusters.keepBestPerCluster]] for a quality-based pick).
    *
    * Scale: the quantizer trains on a sample ([[ivfTrain]]); corpus
    * assignment is the map-only [[ivfAssign]] (or comes back persisted
    * from [[ivfWriteIndex]]); within-cell pairing is bounded per cell
    * (~n²/nCells pairs at √n cells); components converge in O(log n)
    * rounds ([[DedupClusters.connectedComponents]]). Returns the kept
    * rows of `emb` (one representative per group + all unique vectors).
    */
  def semanticDedup(emb: DataFrame, model: IvfModel, threshold: Double,
                    maxCellSize: Int = Int.MaxValue): DataFrame = {
    val pairs = semanticDupPairs(ivfAssign(emb, model), threshold, maxCellSize)
      .select("a_id", "b_id")
    val labels = DedupClusters.clusterLabels(emb.select(col("vec_id")), "vec_id", pairs)
    emb.join(labels.filter(col("vec_id") =!= col("cluster_id")).select("vec_id"),
             Seq("vec_id"), "left_anti")
  }

  private def ivfSearch(assigned: DataFrame, cents: DataFrame,
                        queryIds: Seq[Long], k: Int, nProbe: Int): DataFrame =
    ivfSearchAgainst(assigned, assigned, cents, queryIds, k, nProbe)

  /** Cell-probe search with SEPARATE query and candidate relations: the
    * query vectors resolve from `querySide` (never filtered — a query may
    * itself fail a candidate predicate and must still search), candidates
    * from `corpusSide`. Both must carry (vec_id, embedding, cell). */
  private def ivfSearchAgainst(querySide: DataFrame, corpusSide: DataFrame,
                               cents: DataFrame, queryIds: Seq[Long],
                               k: Int, nProbe: Int): DataFrame = {
    val q = querySide.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val wProbe = Window.partitionBy("q_id").orderBy(col("cdist"), col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .select(col("q_id"), col("q_emb"), col("cell"),
              (lit(1.0) - vec_cosine(col("q_emb"), col("c_emb"))).as("cdist"))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select("q_id", "q_emb", "cell")

    val corpus = corpusSide.select(col("vec_id").as("n_id"),
      col("embedding").as("n_emb"), col("cell"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    corpus.join(probes, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
              vec_cosine(col("q_emb"), col("n_emb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** FILTERED vector search — top-k among only the corpus rows satisfying
    * `pred` (a metadata predicate over whatever extra columns `assigned`
    * carries: language, source, quality score, date…). Pre-filtering, the
    * scale-correct strategy for a cell-partitioned index: the predicate is
    * applied to the candidate side BEFORE the cell join, so on a persisted
    * index ([[ivfWriteIndex]] layout) it is pushed into the parquet scan
    * of only the probed cells — post-filtering the top-k instead would
    * return fewer than k rows whenever the filter is selective. The query
    * side stays UNFILTERED: a query vector that itself fails `pred` still
    * searches. With nProbe = nCells this is exactly brute force over the
    * filtered corpus (AnnSpec); for selective predicates raise nProbe —
    * survivors concentrate in fewer cells, the standard pre-filter ANN
    * recall trade. */
  def ivfTopKFilteredAssigned(assigned: DataFrame, model: IvfModel,
                              queryIds: Seq[Long], k: Int, nProbe: Int,
                              pred: org.apache.spark.sql.Column): DataFrame =
    ivfSearchAgainst(
      assigned.select(col("vec_id"), col("embedding"), col("cell")),
      assigned.filter(pred)
        .select(col("vec_id"), col("embedding"), col("cell")),
      floatCents(assigned.sparkSession, model), queryIds, k, nProbe)

  // ---- PCA dimensionality reduction -----------------------------------
  //
  // Scan cost of every vector operator here — brute force, IVF cell
  // scans, SemDeDup's within-cell pairing — is linear in the embedding
  // WIDTH. PCA buys that width down with a measurable (ANN_RECALL.json)
  // recall cost: train once on a sample, then a MAP-ONLY projection
  // rewrites the corpus (the same train-once / persist / apply-per-batch
  // lifecycle as the IVF and PQ models). Projected vectors are ordinary
  // Array[Float] embeddings, so the whole ANN/dedup surface composes
  // with them unchanged.

  /** `components`: outDim principal rows × inDim, orthonormal, variance-
    * descending; `mean`: the training mean subtracted before projection
    * (classical PCA — Spark ML's own `transform` skips the centering,
    * which shifts every projection by a constant vector). */
  case class PcaModel(mean: Seq[Double], components: Seq[Seq[Double]]) {
    def inDim: Int = mean.size
    def outDim: Int = components.size
  }

  /** Fit PCA via Spark ML (covariance eigendecomposition on the d×d
    * gram — one distributed pass, driver-side eigen of a small matrix).
    * At 100 TB fit on a sample: the covariance of a uniform few-million-
    * row sample is statistically indistinguishable for this purpose,
    * exactly like [[pqTrain]]'s codebooks. */
  def pcaTrain(emb: DataFrame, outDim: Int): PcaModel = {
    import org.apache.spark.ml.feature.PCA
    import org.apache.spark.ml.functions.array_to_vector
    val prepared = emb
      .select(array_to_vector(col("embedding").cast("array<double>")).as("fv"))
    val model = new PCA().setK(outDim).setInputCol("fv").setOutputCol("pc")
      .fit(prepared)
    val d = model.pc.numRows
    val mean = prepared
      .select(org.apache.spark.ml.functions.vector_to_array(col("fv")).as("a"))
      .select((0 until d).map(i => avg(element_at(col("a"), i + 1))): _*)
      .head().toSeq.map(_.asInstanceOf[Double])
    // pc is column-major d×outDim; transpose to outDim rows of length d
    val comps = (0 until model.pc.numCols).map { j =>
      (0 until d).map(i => model.pc(i, j)).toSeq
    }
    PcaModel(mean, comps)
  }

  /** Project the embedding column onto the model's principal axes —
    * MAP-ONLY (mean and components ride as literals; one `zip_with`
    * centering pass + outDim dot folds per row, all codegen'd HOFs, no
    * shuffle). Replaces `embedding` with the outDim-wide Array[Float];
    * every other column passes through, so the result feeds
    * [[ivfTrain]]/[[bruteForceTopK]]/[[semanticDupPairs]] directly. */
  def pcaProject(emb: DataFrame, model: PcaModel): DataFrame =
    emb
      .withColumn("__mean", typedlit(model.mean))
      .withColumn("__comps", typedlit(model.components))
      .withColumn("__centered",
        zip_with(col("embedding"), col("__mean"),
          (a, b) => a.cast("double") - b))
      .withColumn("embedding",
        transform(col("__comps"), c =>
          aggregate(zip_with(col("__centered"), c, (a, b) => a * b),
            lit(0.0d), (acc, x) => acc + x).cast("float")))
      .drop("__mean", "__comps", "__centered")

  def pcaSave(model: PcaModel, path: String,
              spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    // row -1 = the mean; rows 0..outDim-1 = the components, in order
    ((-1, model.mean) +: model.components.zipWithIndex.map(_.swap))
      .toDF("row", "vals")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def pcaLoad(spark: org.apache.spark.sql.SparkSession, path: String): PcaModel = {
    val rows = spark.read.parquet(path)
      .select(col("row"), col("vals").cast("array<double>").as("vals"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1)
    PcaModel(rows.head._2, rows.tail.map(_._2).toSeq)
  }

  /** Product quantization: trained per-subspace codebooks. `centroids` is
    * the flattened [m·k] table (index mi·k + j), each entry a subDim-long
    * centroid of the NORMALIZED corpus' mi-th slice. */
  case class PqModel(m: Int, k: Int, subDim: Int,
                     centroids: Seq[Seq[Float]])

  /** L2-normalize the embedding column in place (cosine on raw vectors ==
    * dot on normalized ones — the trick that makes inner-product ADC rank
    * by cosine). */
  private def normalized(emb: DataFrame): DataFrame =
    emb.withColumn("embedding", expr(
      """transform(embedding, x -> CAST(x / sqrt(
           aggregate(embedding, 0D, (a, y) -> a + CAST(y AS DOUBLE) * y)) AS FLOAT))"""))

  /** Train PQ codebooks: m independent k-means fits, one per subspace
    * slice of the normalized corpus. At 100 TB: fit on a sample (the
    * codebook needs thousands of rows, not billions) and persist the
    * model; training cost is m small ML jobs, independent of corpus size.
    */
  def pqTrain(emb: DataFrame, m: Int, k: Int, seed: Long = 42L): PqModel =
    pqTrainOn(normalized(emb), m, k, seed)

  /** [[pqTrain]] over an already-prepared vector column (no
    * normalization) — the entry point residual encoding needs: IVF
    * residuals must NOT be re-normalized or the reconstruction
    * q·c + q·r stops telescoping to q·x. */
  private[operators] def pqTrainOn(prepared: DataFrame, m: Int, k: Int,
                                   seed: Long): PqModel = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val dim = prepared.select(size(col("embedding"))).head().getInt(0)
    require(dim % m == 0, s"dim $dim not divisible into $m subspaces")
    val sub = dim / m
    val prep = prepared.cache()
    val cents = (0 until m).flatMap { mi =>
      val sliced = prep.select(
        array_to_vector(expr(s"slice(embedding, ${mi * sub + 1}, $sub)")).as("fv"))
      new KMeans().setK(k).setSeed(seed + mi).setFeaturesCol("fv")
        .fit(sliced).clusterCenters.toSeq
        .map(_.toArray.map(_.toFloat).toSeq)
    }
    prep.unpersist()
    PqModel(m, k, sub, cents)
  }

  /** Persist PQ codebooks as one flattened parquet table (row idx =
    * mi·k + j, matching [[PqModel.centroids]]); m/k/subDim ride along as
    * columns so the load needs no sidecar. The float entries are the
    * model — PQ is a deliberately quantized code, unlike the IVF coarse
    * quantizer whose doubles define cell boundaries — so the round-trip
    * is bit-exact and a 100 TB corpus trains its codebooks once instead
    * of per run. */
  def pqSave(model: PqModel, path: String,
             spark: org.apache.spark.sql.SparkSession): Unit = {
    import spark.implicits._
    model.centroids.zipWithIndex
      .map { case (c, i) => (i, model.m, model.k, model.subDim, c) }
      .toDF("idx", "m", "k", "sub_dim", "c_emb")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  def pqLoad(spark: org.apache.spark.sql.SparkSession, path: String): PqModel = {
    val rows = spark.read.parquet(path)
      .select("idx", "m", "k", "sub_dim", "c_emb").collect()
    require(rows.nonEmpty, s"pqLoad: no codebook rows at $path")
    val head = rows.head
    PqModel(head.getInt(1), head.getInt(2), head.getInt(3),
      rows.sortBy(_.getInt(0)).map(_.getSeq[Float](4)).toSeq)
  }

  /** Encode the corpus: each vector becomes m small codes (nearest
    * centroid per subspace) — m·log2(k) bits instead of dim·32. The
    * argmin runs as built-in array HOFs over the broadcast codebook
    * literal; one narrow map, encoded once, reused by every query batch.
    */
  def pqEncode(emb: DataFrame, model: PqModel): DataFrame =
    pqEncodeOn(normalized(emb), model).select(col("vec_id"), col("codes"))

  /** [[pqEncode]] over an already-prepared vector column (residuals). */
  private[operators] def pqEncodeOn(prepared: DataFrame, model: PqModel): DataFrame = {
    val withCents = prepared
      .withColumn("__cent", typedlit(model.centroids))
    val codesSql =
      s"""transform(sequence(0, ${model.m - 1}, 1), mi ->
            array_position(
              transform(slice(__cent, mi * ${model.k} + 1, ${model.k}), c ->
                aggregate(
                  zip_with(slice(embedding, mi * ${model.subDim} + 1, ${model.subDim}), c,
                           (a, b) -> CAST(a - b AS DOUBLE) * (a - b)),
                  0D, (acc, x) -> acc + x)),
              array_min(
                transform(slice(__cent, mi * ${model.k} + 1, ${model.k}), c ->
                  aggregate(
                    zip_with(slice(embedding, mi * ${model.subDim} + 1, ${model.subDim}), c,
                             (a, b) -> CAST(a - b AS DOUBLE) * (a - b)),
                    0D, (acc, x) -> acc + x)))) - 1)"""
    // keeps the input's other columns (IVF-PQ threads `cell` through)
    withCents
      .withColumn("codes", expr(codesSql).cast("array<int>"))
      .drop("__cent", "embedding")
  }

  /** PQ top-k with asymmetric distance computation (ADC) + exact rerank —
    * the FAISS-style memory-scale path. The corpus is scanned as codes
    * only (m bytes/vector, a 32× compression at m=8 over 64 f32 dims):
    * each query precomputes an m·k inner-product table against the
    * codebook, the approximate score of a corpus vector is m table
    * lookups, the top rerank·k ADC candidates are joined back to the raw
    * vectors for exact cosine, and the final top-k is exact over that
    * pool. rerank·k = |corpus| degenerates to brute force (spec-proven);
    * small rerank keeps the exact pass a few-hundred-row join per query.
    */
  /** Per-query ADC lookup table: inner product of each query subvector
    * (from the `embedding` column) against every codebook entry (from the
    * `__cent` literal) — one flat [m·k] double array per query row. */
  private def qtabExpr(model: PqModel): org.apache.spark.sql.Column = expr(
    s"""flatten(transform(sequence(0, ${model.m - 1}, 1), mi ->
          transform(slice(__cent, mi * ${model.k} + 1, ${model.k}), c ->
            aggregate(
              zip_with(slice(embedding, mi * ${model.subDim} + 1, ${model.subDim}), c,
                       (a, b) -> CAST(a AS DOUBLE) * b),
              0D, (acc, x) -> acc + x))))""")

  /** ADC score of a `codes` row against a `qtab` row: m table lookups. */
  private def adcLookupExpr(model: PqModel): org.apache.spark.sql.Column = expr(
    s"""aggregate(sequence(0, ${model.m - 1}, 1), 0D, (acc, mi) ->
          acc + element_at(qtab, mi * ${model.k} + element_at(codes, mi + 1) + 1))""")

  def pqTopK(emb: DataFrame, queryIds: Seq[Long], k: Int, model: PqModel,
             rerank: Int = 4): DataFrame = {
    require(rerank >= 1)
    val codes = pqEncode(emb, model)
    val q = normalized(emb.filter(col("vec_id").isInCollection(queryIds)))
      .withColumn("__cent", typedlit(model.centroids))
      .withColumn("qtab", qtabExpr(model))
      .select(col("vec_id").as("q_id"), col("qtab"))
    val adc = codes.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("vec_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        adcLookupExpr(model).as("adc_score"))
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc_score").desc, col("n_id"))
    val candidates = adc.withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= k * rerank)
      .select("q_id", "n_id")
    rerankExact(emb, queryIds, k, candidates)
  }

  // ---- IVF-PQ (residual ADC inside probed cells) ----------------------
  //
  // The FAISS-style composition that makes PQ work at 100 TB: plain
  // [[pqTopK]] still ADC-scans the WHOLE corpus per query (cheap per row,
  // but O(corpus) rows touched); IVF-PQ stores each vector as its cell +
  // a PQ code of its RESIDUAL from the cell centroid, so a query scans
  // only its nProbe cells' code files and scores them as
  //   q̂·x̂ ≈ q̂·c  +  Σ_mi qtab[mi][code_mi]        (q̂·(c + r) telescopes)
  // with q̂·c computed once per (query, probed cell). Residual encoding
  // matters: residual variance is far below raw variance on clustered
  // data, so the same m·k codebook quantizes much finer.

  final case class IvfPqModel(ivf: IvfModel, pq: PqModel)

  /** Residual column for an assigned, NORMALIZED corpus: x̂ − c(x̂),
    * kept float (the codebooks are float anyway). */
  private def residualCol(ivf: IvfModel): org.apache.spark.sql.Column =
    zip_with(col("embedding"),
      element_at(typedlit(ivf.centroids.map(_._2)), col("cell") + lit(1)),
      (a, b) => (a.cast("double") - b).cast("float"))

  /** Train the coarse quantizer on the normalized corpus, then PQ
    * codebooks on the residuals. At 100 TB both fits run on a sample. */
  def ivfPqTrain(emb: DataFrame, nCells: Int, m: Int, k: Int,
                 seed: Long = 42L): IvfPqModel = {
    val norm = normalized(emb).cache()
    val ivf = ivfTrain(norm, nCells, seed)
    val resid = ivfAssign(norm, ivf)
      .select(col("vec_id"), residualCol(ivf).as("embedding"))
    val pq = pqTrainOn(resid, m, k, seed)
    norm.unpersist()
    IvfPqModel(ivf, pq)
  }

  def ivfPqSave(model: IvfPqModel, path: String,
                spark: org.apache.spark.sql.SparkSession): Unit = {
    ivfSave(model.ivf, s"$path/ivf", spark)
    pqSave(model.pq, s"$path/pq", spark)
  }

  def ivfPqLoad(spark: org.apache.spark.sql.SparkSession, path: String): IvfPqModel =
    IvfPqModel(ivfLoad(spark, s"$path/ivf"), pqLoad(spark, s"$path/pq"))

  /** Encode the corpus for IVF-PQ serving: (vec_id, cell, codes) — the
    * persistable inverted file. Partition the output files by `cell`
    * ([[ivfWriteIndex]]) and a probe reads only its cells' files. */
  def ivfPqEncode(emb: DataFrame, model: IvfPqModel): DataFrame = {
    val assigned = ivfAssign(normalized(emb), model.ivf)
    pqEncodeOn(
      assigned.select(col("vec_id"), col("cell"), residualCol(model.ivf).as("embedding")),
      model.pq)
      .select("vec_id", "cell", "codes")
  }

  /** IVF-PQ top-k: probe the query's nProbe best cells (by q̂·c), ADC-score
    * only those cells' codes, exact-rerank the top rerank·k. With
    * nProbe = nCells and rerank covering the corpus this degenerates to
    * brute force (spec-proven). `codes` defaults to encoding in-flight;
    * pass a persisted [[ivfPqEncode]] table in production. */
  def ivfPqTopK(emb: DataFrame, model: IvfPqModel, queryIds: Seq[Long],
                k: Int, nProbe: Int, rerank: Int = 4,
                codes: Option[DataFrame] = None): DataFrame = {
    require(nProbe >= 1 && rerank >= 1)
    val spark = emb.sparkSession
    import spark.implicits._
    val corpus = codes.getOrElse(ivfPqEncode(emb, model))
      .select(col("vec_id").as("n_id"), col("cell"), col("codes"))
    val q = normalized(emb.filter(col("vec_id").isInCollection(queryIds)))
      .withColumn("__cent", typedlit(model.pq.centroids))
      .withColumn("qtab", qtabExpr(model.pq))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("qtab"))
    val cents = model.ivf.centroids.toDF("cell", "c_emb")
    val wProbe = Window.partitionBy("q_id").orderBy(col("qc").desc, col("cell"))
    val probes = q.crossJoin(broadcast(cents))
      .withColumn("qc",
        aggregate(zip_with(col("q_emb"), col("c_emb"), (a, b) => a.cast("double") * b),
                  lit(0.0d), (acc, x) => acc + x))
      .withColumn("rn", row_number().over(wProbe))
      .filter(col("rn") <= nProbe)
      .select("q_id", "qtab", "cell", "qc")
    val wAdc = Window.partitionBy("q_id").orderBy(col("adc_score").desc, col("n_id"))
    val candidates = corpus.join(probes, Seq("cell"))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        (col("qc") + adcLookupExpr(model.pq)).as("adc_score"))
      .withColumn("rn", row_number().over(wAdc))
      .filter(col("rn") <= k * rerank)
      .select("q_id", "n_id")
    rerankExact(emb, queryIds, k, candidates)
  }

  /** Recall of `approx` against exact `truth` (both (q_id, n_id) top-k
    * tables): |approx ∩ truth| / |truth|. One semi join + two counts —
    * no driver-side set arithmetic, so it scales to any query batch. */
  def recallAt(approx: DataFrame, truth: DataFrame): Double = {
    val total = truth.count()
    if (total == 0) 1.0
    else truth.join(approx, Seq("q_id", "n_id"), "left_semi").count().toDouble / total
  }

  /** Exact brute-force top-k (ground truth for recall measurement). */
  def bruteForceTopK(emb: DataFrame, queryIds: Seq[Long], k: Int): DataFrame = {
    val q = emb.filter(col("vec_id").isInCollection(queryIds))
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
    val c = emb.select(col("vec_id").as("n_id"), col("embedding").as("n_emb"))
    val w = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id"))
    c.crossJoin(broadcast(q))
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
              vec_cosine(col("q_emb"), col("n_emb")).as("cos"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }
}
