package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("portable token hash equals DuckDB md5_number_lower (pinned vector)") {
    import org.apache.spark.unsafe.types.UTF8String
    // DuckDB 1.0: SELECT md5_number_lower('hello') → 10575884659879408057
    // (last 8 md5 bytes, little-endian). This pin is what makes the
    // dedup_simhash SQL oracle bit-exact.
    assert(org.apache.spark.sql.graft.TextHashExpressions
      .md5TokenHash(UTF8String.fromString("hello")) ===
      java.lang.Long.parseUnsignedLong("10575884659879408057"))
  }

  test("portable simhash variant is deterministic and near-dup-consistent") {
    // one appended tail token → 1 extra shingle (jaccard 58/59 ≈ 0.98).
    // Everything here is deterministic (md5 feature hashes on pinned
    // strings): this vector sketches to Hamming 5 with one clean band,
    // so the 4×16 banding surfaces it and the verify keeps it. The
    // banding GUARANTEE is only Hamming ≤ 3 (pigeonhole — 3 flipped
    // bits cannot cover 4 bands); looser pairs surface probabilistically
    // and the DEDUP_QUALITY artifact measures that recall honestly.
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 60).map(i => s"tok$i") :+ "x").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup)).toDF("doc_id", "text")
    val pairs = DedupOps.simhashNearDups(docs, "doc_id", "text", 12, portable = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("LSH finds planted near-identical docs and skips unrelated ones") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val nearDup = ((1 to 58).map(i => s"tok$i") ++ Seq("x", "y")).mkString(" ")
    val other = (100 to 160).map(i => s"zz$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = DedupOps.minhashNearDups(docs, "doc_id", "text", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("LSH candidates cover all high-jaccard pairs on real docs (recall)") {
    val docs = Tables.documents(spark, sf0001)
    // ground truth: brute-force shingle jaccard ≥ 0.5
    val sigs = DedupOps.signatures(docs, "doc_id", "text").cache()
    val a = sigs.select(col("doc_id").as("a_id"), col("shingles").as("a_sh"))
    val b = sigs.select(col("doc_id").as("b_id"), col("shingles").as("b_sh"))
    val truth = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
         size(array_union(col("a_sh"), col("b_sh")))).as("jac"))
      .filter(col("jac") >= 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val found = DedupOps.minhashNearDups(docs, "doc_id", "text", 0.5)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(found === truth) // exact: b=16, r=2 ⇒ P(miss at j≥0.8) ≈ 3e-8
  }

  test("simhash near-dups: deterministic across two runs") {
    val docs = Tables.documents(spark, sf0001)
    val r1 = DedupOps.simhashNearDups(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val r2 = DedupOps.simhashNearDups(docs, "doc_id", "text", 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(r1 === r2)
  }

  test("incremental batch dedup ∪ historical pairs equals the full run") {
    val docs = Tables.documents(spark, sf0001)
    val store = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val storeSigs = DedupOps.signatures(store, "doc_id", "text")
    val inc = pairSet(DedupOps.incrementalNearDups(storeSigs, batch, "doc_id", "text", 0.5))
    val hist = pairSet(DedupOps.minhashNearDups(store, "doc_id", "text", 0.5))
    val full = pairSet(DedupOps.minhashNearDups(docs, "doc_id", "text", 0.5))
    // every incremental pair touches the batch; none re-reports store-only pairs
    assert(inc.forall { case (a, b) => a % 2 == 1 || b % 2 == 1 })
    assert(inc.intersect(hist).isEmpty)
    // the append-only decomposition loses nothing vs recomputing from scratch
    assert(hist ++ inc === full)
    assert(inc.nonEmpty)
  }

  test("pre-banded store path: equals full recompute, store sig column never read") {
    val docs = Tables.documents(spark, sf0001)
    val store = docs.filter(col("doc_id") % 2 === 0)
    val batch = docs.filter(col("doc_id") % 2 === 1)
    def pairSet(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // persist the store exactly as the nightly job would: signatures +
    // the banded relation, derived ONCE at append time
    val dir = java.nio.file.Files.createTempDirectory("graft_banded_store").toString
    val storeSigs = DedupOps.signatures(store, "doc_id", "text")
    storeSigs.write.parquet(s"$dir/sigs")
    DedupOps.banded(storeSigs, "doc_id").write.parquet(s"$dir/bands")
    val sigStore = spark.read.parquet(s"$dir/sigs")
    val bandStore = spark.read.parquet(s"$dir/bands")

    val batchSigs = DedupOps.signatures(batch, "doc_id", "text").cache()
    try {
      val inc = DedupOps.incrementalNearDupsBanded(
        sigStore.select("doc_id", "shingles"), bandStore, batchSigs, "doc_id", 0.5)
      // zero re-hash proof: no parquet scan in the plan materializes the
      // store's `sig` column (bands come from the persisted relation)
      val schemas = """ReadSchema: struct<[^>]*>""".r
        .findAllIn(inc.queryExecution.executedPlan.toString).toSeq
      assert(schemas.nonEmpty)
      assert(!schemas.exists(s => s.contains("<sig:") || s.contains(",sig:")),
        schemas.mkString("\n"))
      // decomposition proof, now over the persisted pre-banded store
      val hist = pairSet(DedupOps.minhashNearDups(store, "doc_id", "text", 0.5))
      val full = pairSet(DedupOps.minhashNearDups(docs, "doc_id", "text", 0.5))
      val incPairs = pairSet(inc)
      assert(incPairs.nonEmpty)
      assert(incPairs.intersect(hist).isEmpty)
      assert(hist ++ incPairs === full)
    } finally { batchSigs.unpersist(); () }
  }

  test("simhash recalls most minhash-confirmed near-dups (cross-validation)") {
    // SimHash is a lossy 64-bit sketch: a jaccard≈0.8 pair can land above
    // any fixed Hamming radius, so assert a recall bound, not containment.
    val docs = Tables.documents(spark, sf0001)
    val mh = DedupOps.minhashNearDups(docs, "doc_id", "text", 0.8)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sh = DedupOps.simhashNearDups(docs, "doc_id", "text", 12)
      .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(mh.nonEmpty)
    val recall = (mh intersect sh).size.toDouble / mh.size
    assert(recall >= 0.75, s"simhash recall $recall; missing: ${mh -- sh}")
  }
}
