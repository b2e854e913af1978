package graft

import graft.operators.AnnOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.srp_signature

class AnnSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()
  private val queries = (0L until 20L).toSeq

  test("SRP signatures are deterministic and bounded by the bit width") {
    val sigs = AnnOps.withBuckets(emb, bits = 8).select("bucket").distinct()
      .collect().map(_.getLong(0))
    assert(sigs.forall(s => s >= 0 && s < 256))
    val again = AnnOps.withBuckets(emb, bits = 8).select("bucket").distinct()
      .collect().map(_.getLong(0))
    assert(sigs.sorted.toSeq === again.sorted.toSeq)
  }

  test("identical vectors share a bucket; a negated vector lands elsewhere") {
    val v = Seq((1L, Array.fill(16)(0.5f)), (2L, Array.fill(16)(0.5f)),
                (3L, Array.fill(16)(-0.5f))).toDF("vec_id", "embedding")
    val b = AnnOps.withBuckets(v, bits = 16).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("bucket")).toMap
    assert(b(1L) === b(2L))
    assert(b(1L) !== b(3L)) // 16 sign bits all flip for the negation
  }

  test("SRP neighbors all share the query's bucket (single-probe contract)") {
    val res = AnnOps.srpTopK(emb, queries, k = 3, bits = 6)
    val bucketOf = AnnOps.withBuckets(emb, bits = 6)
      .select("vec_id", "bucket").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val violations = res.select("q_id", "n_id").collect()
      .filterNot(r => bucketOf(r.getLong(0)) == bucketOf(r.getLong(1)))
    assert(violations.isEmpty)
  }

  test("multi-probe recall ≥ single-probe recall vs brute-force truth") {
    def recall(approx: Map[Long, Set[Long]], truth: Map[Long, Set[Long]]): Double = {
      val hits = truth.map { case (q, t) => (approx.getOrElse(q, Set.empty) & t).size }.sum
      hits.toDouble / truth.values.map(_.size).sum
    }
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = toMap(AnnOps.bruteForceTopK(emb, queries, 3))
    val single = recall(toMap(AnnOps.srpTopK(emb, queries, 3, bits = 6)), truth)
    val multi = recall(toMap(AnnOps.srpTopK(emb, queries, 3, bits = 6, multiProbe = true)), truth)
    assert(multi >= single)
    assert(multi > 0.0) // finds at least some true neighbors on random data
  }

  test("multi-table SRP candidates are monotone in table count (recall can only grow)") {
    // tables 0..L-1 are a prefix of tables 0..L'-1 under the same seed, so
    // the candidate union grows with L — the OR-construction's guarantee
    def pairs(tables: Int): Set[(Long, Long)] =
      AnnOps.srpMultiCandidates(emb, queries, bits = 4, tables = tables)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p1 = pairs(1); val p2 = pairs(2); val p4 = pairs(4)
    assert(p1.subsetOf(p2) && p2.subsetOf(p4))
    val truth = AnnOps.bruteForceTopK(emb, queries, 3).cache()
    val recs = Seq(1, 2, 4, 8).map { l =>
      AnnOps.recallAt(AnnOps.srpMultiTopK(emb, queries, 3, bits = 4, tables = l), truth)
    }
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b }, recs.toString)
  }

  test("multi-table SRP strictly dominates single-table at equal total bits") {
    // 16 total signature bits each way: one 16-bit table demands agreement
    // on all 16 planes (vanishing collision probability); four 4-bit
    // tables need agreement on any one 4-plane set — recall compounds as
    // 1-(1-p^4)^4 vs p^16
    val truth = AnnOps.bruteForceTopK(emb, queries, 3).cache()
    val single = AnnOps.recallAt(AnnOps.srpTopK(emb, queries, 3, bits = 16), truth)
    val multi = AnnOps.recallAt(
      AnnOps.srpMultiTopK(emb, queries, 3, bits = 4, tables = 4), truth)
    assert(multi > single, s"multi=$multi single=$single")
    assert(multi > 0.2, s"multi-table recall $multi") // loose: random data
  }

  test("multi-probe widens each table's candidates (multi-table union is a superset)") {
    def pairs(mp: Boolean): Set[(Long, Long)] =
      AnnOps.srpMultiCandidates(emb, queries, bits = 6, tables = 4, multiProbe = mp)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = pairs(mp = false); val probed = pairs(mp = true)
    assert(single.subsetOf(probed))
    assert(probed.size > single.size) // Hamming-1 probes genuinely add candidates
  }

  test("multi-table SRP neighbors share a bucket with the query in at least one table") {
    val res = AnnOps.srpMultiTopK(emb, queries, k = 3, bits = 4, tables = 4)
    // recompute each table's buckets and check membership
    val perTable = (0 until 4).map { t =>
      // same derivation as AnnOps.tableSeed
      val seed = org.apache.spark.sql.graft.TextHashExpressions.mix64(
        42L + 0x9E3779B97F4A7C15L * (t + 1))
      emb.select(col("vec_id"), srp_signature(col("embedding"), 4, seed).as("b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    }
    val violations = res.select("q_id", "n_id").collect().filterNot { r =>
      perTable.exists(b => b(r.getLong(0)) == b(r.getLong(1)))
    }
    assert(violations.isEmpty)
  }

  test("k-means IVF with nProbe = nCells equals brute force exactly") {
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val ivfAll = AnnOps.kmeansIvfTopK(emb, queries, k = 5, nCells = 8, nProbe = 8)
    val truth = AnnOps.bruteForceTopK(emb, queries, k = 5)
    assert(toSet(ivfAll) === toSet(truth))
  }

  test("k-means IVF probe-1 search stays within probed cells and finds neighbors") {
    def toMap(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect()
        .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val truth = toMap(AnnOps.bruteForceTopK(emb, queries, 5))
    val approx = toMap(AnnOps.kmeansIvfTopK(emb, queries, 5, nCells = 8, nProbe = 2))
    val hits = truth.map { case (q, t) => (approx.getOrElse(q, Set.empty) & t).size }.sum
    val recall = hits.toDouble / truth.values.map(_.size).sum
    assert(recall > 0.3, s"IVF nProbe=2/8 recall $recall") // loose: random data
  }

  test("IVF recall is monotone in nProbe and reaches 1.0 at nProbe = nCells") {
    val truth = AnnOps.bruteForceTopK(emb, queries, 5).cache()
    // adding probed cells only grows the candidate set, and a true top-k
    // neighbor always outranks a false positive — so recall is monotone
    val recs = Seq(1, 2, 4, 8).map { p =>
      AnnOps.recallAt(AnnOps.kmeansIvfTopK(emb, queries, 5, nCells = 8, nProbe = p), truth)
    }
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b }, recs.toString)
    assert(recs.last === 1.0)
  }

  test("filtered IVF search with nProbe = nCells equals brute force over the filtered corpus") {
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val model = AnnOps.ivfTrain(emb, nCells = 8)
    val assigned = AnnOps.ivfAssign(emb, model)
    val pred = col("label") =!= 0
    // queries restricted to pred-satisfying ids so the brute-force truth
    // (whose query side is the filtered corpus) covers the same queries
    val qIn = emb.filter(pred).filter(col("vec_id") < 20)
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    assert(qIn.nonEmpty)
    val got = AnnOps.ivfTopKFilteredAssigned(assigned, model, qIn,
      k = 5, nProbe = 8, pred = pred)
    val truth = AnnOps.bruteForceTopK(emb.filter(pred), qIn, k = 5)
    assert(toSet(got) === toSet(truth))
  }

  test("filtered IVF search: every hit satisfies the predicate; an outside query still searches") {
    val model = AnnOps.ivfTrain(emb, nCells = 8)
    val assigned = AnnOps.ivfAssign(emb, model)
    val pred = col("label") === 1
    // a query vector that itself FAILS the predicate
    val qOut = emb.filter(col("label") =!= 1).select("vec_id")
      .orderBy("vec_id").limit(1).collect().map(_.getLong(0)).toSeq
    val got = AnnOps.ivfTopKFilteredAssigned(assigned, model, qOut,
      k = 3, nProbe = 8, pred = pred)
    val hits = got.select("n_id").collect().map(_.getLong(0)).toSet
    assert(hits.nonEmpty, "query outside the filter must still search")
    val allowed = emb.filter(pred).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(hits.subsetOf(allowed), "no hit may violate the predicate")
  }

  test("PCA: components orthonormal, projected variance descending, save/load exact") {
    val model = AnnOps.pcaTrain(emb, outDim = 8)
    assert(model.inDim === 64 && model.outDim === 8)
    // orthonormal basis
    for (i <- model.components.indices; j <- i until model.components.size) {
      val dot = model.components(i).zip(model.components(j)).map { case (a, b) => a * b }.sum
      val expect = if (i == j) 1.0 else 0.0
      assert(math.abs(dot - expect) < 1e-6, s"basis dot($i,$j)=$dot")
    }
    // per-axis variance of the projection is descending (eigenvalue order)
    val proj = AnnOps.pcaProject(emb, model)
      .select(explode(expr(
        "transform(embedding, (x, i) -> struct(i AS i, CAST(x AS DOUBLE) AS v))")).as("e"))
      .select(col("e.i"), col("e.v"))
      .groupBy("i").agg(var_samp(col("v")).as("var"))
      .orderBy("i").collect().map(_.getDouble(1))
    assert(proj.zip(proj.tail).forall { case (a, b) => a >= b - 1e-9 },
      s"variances not descending: ${proj.toSeq}")
    // persistence round-trips the exact doubles
    val dir = java.nio.file.Files.createTempDirectory("graft_pca_").toString
    AnnOps.pcaSave(model, s"$dir/pca", spark)
    val back = AnnOps.pcaLoad(spark, s"$dir/pca")
    assert(back === model)
  }

  test("PCA projection is centered classical PCA and composes with the ANN surface") {
    val model = AnnOps.pcaTrain(emb, outDim = 4)
    // hand-compute (x - mean)·c for one row; the map-only projection must agree
    val row = emb.filter(col("vec_id") === 0L)
      .select(col("embedding").cast("array<double>")).head().getSeq[Double](0)
    val expected = model.components.map(c =>
      row.zip(model.mean).map { case (x, m) => x - m }.zip(c)
        .map { case (xc, ci) => xc * ci }.sum.toFloat)
    val got = AnnOps.pcaProject(emb, model).filter(col("vec_id") === 0L)
      .select("embedding").head().getSeq[Float](0)
    expected.zip(got).foreach { case (e, g) => assert(math.abs(e - g) < 1e-4f) }
    // projected corpus drives the existing search path unchanged
    val topk = AnnOps.bruteForceTopK(AnnOps.pcaProject(emb, model),
      queries.take(5), k = 3)
    assert(topk.groupBy("q_id").count().collect().forall(_.getLong(1) === 3L))
  }

  test("PCA on a low-rank corpus: 4 of 16 dims retain near-perfect search recall") {
    // the sf corpus is i.i.d. (flat spectrum — PCA's worst case, as
    // ANN_RECALL.json documents); this fixture has genuine structure:
    // rank-4 signal + 1% noise, the shape of real embedding manifolds
    val rnd = new scala.util.Random(7)
    val basis = Array.fill(4, 16)(rnd.nextGaussian())
    val rows = (0L until 200L).map { i =>
      val coef = Array.fill(4)(rnd.nextGaussian())
      val v = Array.tabulate(16) { j =>
        (basis.zip(coef).map { case (b, c) => b(j) * c }.sum +
          0.01 * rnd.nextGaussian()).toFloat
      }
      (i, v)
    }
    val low = rows.toDF("vec_id", "embedding")
    val truth = AnnOps.bruteForceTopK(low, (0L until 10L).toSeq, k = 5)
    val model = AnnOps.pcaTrain(low, outDim = 4)
    val proj = AnnOps.pcaProject(low, model)
    val rec = AnnOps.recallAt(
      AnnOps.bruteForceTopK(proj, (0L until 10L).toSeq, k = 5), truth)
    assert(rec >= 0.9, s"rank-4 corpus at outDim=4 must keep recall, got $rec")
  }

  test("PQ codes are bounded by the codebook and deterministic") {
    val model = AnnOps.pqTrain(emb, m = 8, k = 16)
    assert(model.subDim === 8 && model.centroids.size === 8 * 16)
    val codes = AnnOps.pqEncode(emb, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes.size === 500)
    assert(codes.values.forall(c => c.length == 8 && c.forall(x => x >= 0 && x < 16)))
    val again = AnnOps.pqEncode(emb, model).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    assert(codes === again)
  }

  test("PQ with rerank covering the corpus equals brute force; recall monotone in rerank") {
    val model = AnnOps.pqTrain(emb, m = 8, k = 16)
    val truth = AnnOps.bruteForceTopK(emb, queries, 5).cache()
    // rerank pool = whole corpus → the exact rerank IS brute force
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val full = AnnOps.pqTopK(emb, queries, 5, model, rerank = 100)
    assert(toSet(full) === toSet(truth))
    // the ADC top-N candidate pool grows with rerank (fixed deterministic
    // order), so recall is monotone
    val recs = Seq(1, 4, 16).map { r =>
      AnnOps.recallAt(AnnOps.pqTopK(emb, queries, 5, model, rerank = r), truth)
    }
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b }, recs.toString)
    assert(recs.last > 0.5, recs.toString)
  }

  test("persisted IVF model: save/load round-trip and map-only assignment reproduce the inline search") {
    val model = AnnOps.ivfTrain(emb, nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_model").toString
    AnnOps.ivfSave(model, s"$dir/centroids", spark)
    val loaded = AnnOps.ivfLoad(spark, s"$dir/centroids")
    // double centroids round-trip parquet bit-exactly — no quantization
    assert(loaded === model)
    def resultSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val inline = resultSet(AnnOps.kmeansIvfTopK(emb, queries, k = 5, nCells = 8, nProbe = 3))
    val viaModel = resultSet(AnnOps.ivfTopK(emb, loaded, queries, k = 5, nProbe = 3))
    assert(viaModel === inline)
  }

  test("double-precision ivfAssign agrees with MLlib transform (statistical, not bit-exact)") {
    // both sides compute squared-euclidean argmin over the same double
    // centers; only summation ORDER differs, so a disagreement needs two
    // centroids within ~1e-13 of each other — possible in principle,
    // vanishing in practice. Assert ≥99% agreement instead of equality
    // so the suite isn't hostage to one boundary tie on a new corpus.
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val withVec = emb.withColumn("fv", array_to_vector(col("embedding")))
    val ml = new KMeans().setK(8).setSeed(42L).setFeaturesCol("fv").fit(withVec)
    val viaMl = ml.transform(withVec).select(col("vec_id"), col("prediction"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val model = AnnOps.ivfTrain(emb, nCells = 8, seed = 42L)
    val viaAssign = AnnOps.ivfAssign(emb, model).select("vec_id", "cell")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val agree = viaMl.count { case (id, c) => viaAssign(id) == c }
    assert(agree >= (viaMl.size * 0.99).toInt, s"$agree/${viaMl.size} agree")
  }

  test("persisted PQ model: save/load round-trip reproduces pqTopK exactly") {
    val model = AnnOps.pqTrain(emb, m = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("pq_model").toString
    AnnOps.pqSave(model, s"$dir/codebooks", spark)
    val loaded = AnnOps.pqLoad(spark, s"$dir/codebooks")
    assert(loaded === model) // float codebooks round-trip bit-exactly
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(toSet(AnnOps.pqTopK(emb, queries, 5, loaded, rerank = 4)) ===
           toSet(AnnOps.pqTopK(emb, queries, 5, model, rerank = 4)))
  }

  test("IVF-PQ with full probes and corpus-covering rerank equals brute force") {
    val model = AnnOps.ivfPqTrain(emb, nCells = 8, m = 8, k = 16)
    def toSet(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id", "rn").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val truth = AnnOps.bruteForceTopK(emb, queries, k = 5)
    val all = AnnOps.ivfPqTopK(emb, model, queries, k = 5, nProbe = 8, rerank = 100)
    assert(toSet(all) === toSet(truth))
  }

  test("IVF-PQ recall is monotone in nProbe (pool-covering rerank); save/load reproduces results") {
    val model = AnnOps.ivfPqTrain(emb, nCells = 8, m = 8, k = 16)
    val truth = AnnOps.bruteForceTopK(emb, queries, 5).cache()
    // rerank large enough to cover every probed candidate → recall is the
    // probed-cell coverage, which grows with nProbe (a small fixed rerank
    // would NOT be monotone: a larger pool can push a true neighbor out
    // of the ADC top-rerank·k)
    val recs = Seq(1, 2, 4, 8).map { p =>
      AnnOps.recallAt(AnnOps.ivfPqTopK(emb, model, queries, 5, p, rerank = 100), truth)
    }
    assert(recs.zip(recs.tail).forall { case (a, b) => a <= b }, recs.toString)
    assert(recs.last === 1.0)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_model").toString
    AnnOps.ivfPqSave(model, dir, spark)
    val loaded = AnnOps.ivfPqLoad(spark, dir)
    assert(loaded === model)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(AnnOps.ivfPqTopK(emb, loaded, queries, 5, 3, 8)) ===
           pairs(AnnOps.ivfPqTopK(emb, model, queries, 5, 3, 8)))
  }

  test("IVF-PQ serves from a persisted code table identically to in-flight encoding") {
    val model = AnnOps.ivfPqTrain(emb, nCells = 8, m = 8, k = 16)
    val dir = java.nio.file.Files.createTempDirectory("ivfpq_codes").toString + "/codes"
    AnnOps.ivfPqEncode(emb, model).write.partitionBy("cell").parquet(dir)
    val persisted = spark.read.parquet(dir)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(AnnOps.ivfPqTopK(emb, model, queries, 5, 3, 8, codes = Some(persisted))) ===
           pairs(AnnOps.ivfPqTopK(emb, model, queries, 5, 3, 8)))
  }

  test("cell-partitioned IVF index: probe join prunes partitions dynamically; results match") {
    val model = AnnOps.ivfTrain(emb, nCells = 8)
    val dir = java.nio.file.Files.createTempDirectory("ivf_index").toString + "/idx"
    AnnOps.ivfWriteIndex(emb, model, dir)
    val assigned = spark.read.parquet(dir)
    val res = AnnOps.ivfTopKAssigned(assigned, model, queries, k = 5, nProbe = 2)
    res.collect() // DPP shows up in the executed plan
    val p = res.queryExecution.executedPlan.toString
    assert(p.toLowerCase.contains("dynamicpruning"), p)
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(res) === pairs(AnnOps.ivfTopK(emb, model, queries, 5, 2)))
  }

  test("ivfAppendIndex: nightly ingests compose to one full index; retry idempotent; search identical") {
    val model = AnnOps.ivfTrain(emb, nCells = 4)
    val dir = java.nio.file.Files.createTempDirectory("ivf_append").toString + "/idx"
    // initial build as ingest 0, then a "nightly" batch as ingest 1
    AnnOps.ivfAppendIndex(emb.filter(col("vec_id") % 2 === 1), model, dir, batchId = 0)
    AnnOps.ivfAppendIndex(emb.filter(col("vec_id") % 2 === 0), model, dir, batchId = 1)
    def readBack() = spark.read.parquet(dir)
      .select(col("vec_id"), col("embedding"), col("cell").cast("int").as("cell"))
    // the ingested index holds exactly the full assignment (same cells)
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "cell").collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val full = cells(AnnOps.ivfAssign(emb, model))
    assert(cells(readBack()) === full)
    // a RETRIED nightly ingest (at-least-once delivery) rewrites its own
    // subtree with identical content — no duplicate rows, same index
    AnnOps.ivfAppendIndex(emb.filter(col("vec_id") % 2 === 0), model, dir, batchId = 1)
    assert(readBack().count() === full.size)
    assert(cells(readBack()) === full)
    // and serves probes identically to an index written in one shot
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs(AnnOps.ivfTopKAssigned(readBack(), model, queries, k = 5, nProbe = 2))
      === pairs(AnnOps.ivfTopK(emb, model, queries, 5, 2)))
  }

  test("srp_signature agrees between codegen and interpreted eval") {
    val df = emb.limit(100).select(col("vec_id"), srp_signature(col("embedding"), 16).as("s"))
    val viaCodegen = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaInterp = df.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      assert(viaCodegen === viaInterp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }
}
