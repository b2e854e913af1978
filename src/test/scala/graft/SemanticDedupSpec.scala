package graft

import graft.operators.AnnOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions.vec_cosine

/** SemDeDup contracts: exact duplicates collapse to one representative
  * (the smallest id), a single-cell configuration reproduces global
  * brute-force semantic dedup, and the result is partition-invariant.
  */
class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf0001).cache()

  test("injected exact duplicates collapse to the original representative") {
    val base = emb.limit(200)
    val copies = base.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"), col("label"))
    val model = AnnOps.ivfTrain(base, nCells = 8)
    val kept = AnnOps.semanticDedup(base.unionByName(copies), model, threshold = 0.9999)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // every copy shares its original's embedding → same cell, cosine 1 →
    // the pair clusters and the smaller (original) id is the representative
    val originals = base.select("vec_id").collect().map(_.getLong(0)).toSet
    assert(kept.intersect(originals.map(_ + 100000L)).isEmpty,
      "no injected copy may survive")
    assert(originals.subsetOf(kept), "every original must survive")
  }

  test("one cell reproduces global brute-force semantic dedup") {
    val sub = emb.limit(300).cache()
    // a single-cell model assigns everything to cell 0 regardless of the
    // centroid (MLlib requires k ≥ 2, so build it directly)
    val dim = sub.select(size(col("embedding"))).first().getInt(0)
    val model = AnnOps.IvfModel(Seq((0, Seq.fill(dim)(0.0))))
    val kept = AnnOps.semanticDedup(sub, model, threshold = 0.5)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    // brute-force reference: all pairs ≥ threshold, min-id components
    def side(p: String) = sub.select(col("vec_id").as(s"${p}_id"),
      col("embedding").as(s"${p}_emb"))
    val pairs = side("a").crossJoin(side("b"))
      .filter(col("a_id") < col("b_id"))
      .filter(vec_cosine(col("a_emb"), col("b_emb")).cast("double") >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) }
    val ids = sub.select("vec_id").collect().map(_.getLong(0))
    val want = ids.filter(id => find(id) == id).toSet
    assert(kept === want)
  }

  test("result is invariant under input repartitioning") {
    val model = AnnOps.ivfTrain(emb, nCells = 8)
    def run(parts: Int) =
      AnnOps.semanticDedup(emb.repartition(parts), model, threshold = 0.6)
        .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(run(2) === run(17))
  }

  test("a cell-size cap above every cell size changes nothing") {
    val model = AnnOps.ivfTrain(emb, nCells = 8)
    val uncapped = AnnOps.semanticDedup(emb, model, threshold = 0.6)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val capped = AnnOps.semanticDedup(emb, model, threshold = 0.6,
        maxCellSize = 1000000)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(capped === uncapped)
  }

  test("skew cap sub-splits a giant cell but never separates exact duplicates") {
    // adversarial skew: EVERY vector in one cell (single-centroid model)
    val base = emb.limit(400)
    val copies = base.select((col("vec_id") + 100000L).as("vec_id"),
      col("embedding"), col("label"))
    val dim = base.select(size(col("embedding"))).first().getInt(0)
    val one = AnnOps.IvfModel(Seq((0, Seq.fill(dim)(0.0))))
    val assigned = AnnOps.ivfAssign(base.unionByName(copies), one)
    // the cap forces SRP sub-splitting (800 rows in one cell, cap 100)…
    val pairs = AnnOps.semanticDupPairs(assigned, threshold = 0.9999,
        maxCellSize = 100)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // …yet every (original, copy) exact-dup pair survives: identical
    // vectors have identical SRP signs at any bit width
    val ids = base.select("vec_id").collect().map(_.getLong(0))
    ids.foreach { id =>
      assert(pairs.contains((id, id + 100000L)),
        s"exact-dup pair for $id lost by the skew sub-split") }
    // and the sub-split actually bounded the pairing: the all-pairs count
    // for an unsplit 800-row cell would be 319600; SRP buckets cut the
    // candidate space well below that
    val candidateCount = AnnOps.semanticDupPairs(assigned, threshold = -1.0,
        maxCellSize = 100).count()
    assert(candidateCount < 319600L / 2,
      s"sub-split did not reduce pairing work: $candidateCount")
  }
}
