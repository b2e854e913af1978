package graft

import org.apache.spark.sql.SparkSession
import graft.operators.AnnOps

/** Measured ANN quality artifact: recall@10 of each approximate search
  * path against exact brute force, over the embeddings table.
  *
  * Reports SRP-LSH at bits ∈ {8, 12, 16} with and without Hamming-1
  * multi-probe, k-means IVF at nProbe ∈ {1, 2, 4} of 16 cells, and PQ
  * (m=8, k=16 — 32× compression) at rerank ∈ {1, 4, 16} — the latency
  * and memory knobs a user actually turns. Recall is computed with the
  * distributed [[AnnOps.recallAt]] semi join (no driver-side sets).
  * Output: one JSON line on stdout plus `ann_recall.json` (or $ANN_OUT).
  *
  * Reading the numbers: the synthetic embeddings are i.i.d. random, i.e.
  * near-orthogonal — the worst case for any locality-sensitive scheme
  * (there is barely any locality to be sensitive to), so absolute SRP
  * recall is low here and would be far higher on real embedding
  * manifolds. The artifact's value is the trends, which the spec also
  * asserts: multi-probe strictly helps SRP at every bit width, fewer
  * bits trade precision for recall, and IVF recall climbs with nProbe
  * toward the proven nProbe = nCells == brute-force fixpoint.
  *
  * Usage: runMain graft.AnnRecall [sfDir]
  */
object AnnRecall {
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

    val k = 10
    val emb = Tables.embeddings(spark, sfDir).cache()
    val queryIds = emb.select("vec_id").orderBy("vec_id").limit(50)
      .collect().map(_.getLong(0)).toSeq
    val truth = AnnOps.bruteForceTopK(emb, queryIds, k).cache()
    truth.count()

    def r4(v: Double) = math.rint(v * 1e4) / 1e4
    val srp = for {
      bits <- Seq(8, 12, 16)
      multi <- Seq(false, true)
    } yield {
      val rec = AnnOps.recallAt(AnnOps.srpTopK(emb, queryIds, k, bits, multi), truth)
      (s"srp_bits${bits}${if (multi) "_multiprobe" else ""}", r4(rec))
    }
    val nCells = 16
    val ivf = Seq(1, 2, 4).map { nProbe =>
      val rec = AnnOps.recallAt(
        AnnOps.kmeansIvfTopK(emb, queryIds, k, nCells, nProbe), truth)
      (s"ivf_cells${nCells}_probe$nProbe", r4(rec))
    }

    val pqModel = AnnOps.pqTrain(emb, m = 8, k = 16)
    val pq = Seq(1, 4, 16).map { r =>
      val rec = AnnOps.recallAt(AnnOps.pqTopK(emb, queryIds, k, pqModel, r), truth)
      (s"pq_m8_k16_rerank$r", r4(rec))
    }

    val all = srp ++ ivf ++ pq
    val entries = all.map { case (n, v) => s"\"$n\":$v" }.mkString(",")
    val json =
      s"""{"metric":"ann_recall_at_$k","queries":${queryIds.size},"corpus":${emb.count()},"sf":"$sfDir","recall":{$entries}}"""
    println(json)
    val out = sys.env.getOrElse("ANN_OUT", "ann_recall.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
