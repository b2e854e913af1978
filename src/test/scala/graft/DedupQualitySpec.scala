package graft

import graft.operators.DedupOps

/** The dedup-quality measurement harness itself must be trustworthy:
  * exact-Jaccard truth values are checked by hand on a planted corpus,
  * and the PR arithmetic is pinned at its edges. */
class DedupQualitySpec extends SparkSpec {
  import spark.implicits._

  test("exact-Jaccard truth matches hand-computed values; minhash P=1 and catches planted pairs") {
    // doc2 = doc1 verbatim (jac 1.0); doc3 changes the last 2 of 40 words
    // (38 shared-prefix trigrams minus the 2 straddling the edit = 36
    // shared, 40 in the union → jac 0.9); doc4 is disjoint vocabulary
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val mod = ((1 to 38).map(i => s"w$i") ++ Seq("x1", "x2")).mkString(" ")
    val far = (100 to 140).map(i => s"z$i").mkString(" ")
    val docs = Seq((1L, base), (2L, base), (3L, mod), (4L, far))
      .toDF("doc_id", "text")
    val truth = DedupQuality.exactJaccardPairs(docs, "doc_id", "text", 0.5)
    val tm = truth.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(tm.keySet === Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(tm((1L, 2L)) === 1.0)
    assert(math.abs(tm((1L, 3L)) - 0.9) < 1e-12)

    // verified MinHash output is a SUBSET of truth → precision exactly 1;
    // at jac >= 0.9 the 16x2 banding misses with P ~ 1e-11 → recall 1
    val pr = DedupQuality.pairPR(
      DedupOps.minhashNearDups(docs, "doc_id", "text", 0.5), truth)
    assert(pr.precision === 1.0)
    assert(pr.recall === 1.0)
    assert(pr.nTruth === 3 && pr.nPredicted === 3 && pr.nHit === 3)

    // PR edges: empty prediction → precision 1 (vacuous), recall 0;
    // empty truth → recall 1 (vacuous)
    val empty = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val prEmpty = DedupQuality.pairPR(empty, truth)
    assert(prEmpty.precision === 1.0 && prEmpty.recall === 0.0)
    val prNoTruth = DedupQuality.pairPR(truth.select("a_id", "b_id"),
      DedupQuality.exactJaccardPairs(docs, "doc_id", "text", 1.1))
    assert(prNoTruth.recall === 1.0)
  }
}
