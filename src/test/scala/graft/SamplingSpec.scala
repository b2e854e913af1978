package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf0001).select("doc_id").cache()

  test("split is exhaustive, disjoint, and stable across runs") {
    val s1 = Sampling.trainValTestSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val s2 = Sampling.trainValTestSplit(docs, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(s1 === s2)
    assert(s1.size === docs.count())
    assert(s1.values.toSet.subsetOf(Set("train", "val", "test")))
  }

  test("split proportions land near 90/5/5") {
    val counts = Sampling.trainValTestSplit(docs, "doc_id")
      .groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(counts("train") / n > 0.8 && counts("train") / n < 0.97, counts.toString)
    assert(counts.getOrElse("val", 0L) + counts.getOrElse("test", 0L) > 0)
  }

  test("deterministic sample keeps a key-stable subset of the right size") {
    val a = Sampling.sampleDeterministic(docs, "doc_id", 0.3)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.sampleDeterministic(docs, "doc_id", 0.3)
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
    val frac = a.size / docs.count().toDouble
    assert(frac > 0.2 && frac < 0.4, s"got $frac")
    // monotone: a smaller fraction is a subset of a larger one
    val smaller = Sampling.sampleDeterministic(docs, "doc_id", 0.1)
      .collect().map(_.getLong(0)).toSet
    assert(smaller.subsetOf(a))
  }

  test("non-exact rates round the bucket threshold instead of truncating") {
    // 0.29 * 10000 = 2899.999… in binary floats; a truncating cast keeps
    // one bucket too few and diverges from any oracle that rounds
    val withBucket = docs.withColumn("b", Sampling.hashBucket(col("doc_id"), 10000))
    val want = withBucket.filter(col("b") < 2900).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val direct = Sampling.sampleDeterministic(docs, "doc_id", 0.29)
      .collect().map(_.getLong(0)).toSet
    assert(direct === want)
    val d = Tables.documents(spark, sf0001).select("doc_id", "lang")
    val strat = Sampling.stratifiedSample(d, "lang", "doc_id",
      d.select("lang").distinct().collect().map(r => r.getString(0) -> 0.29).toMap)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val wantStrat = d.withColumn("b", Sampling.hashBucket(col("doc_id"), 10000))
      .filter(col("b") < 2900).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(strat === wantStrat)
  }

  test("weighted sample keeps rows proportionally to capped weight") {
    // weight w in a 10000-key universe: expect ~ w/cap of each weight level
    val df = (1L to 10000L).map(i => (i, (i % 4 + 1) * 100L)).toDF("k", "w")
    val kept = Sampling.weightedSample(df, "k", "w", cap = 400L)
      .groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // each weight level has 2500 keys; P(keep) = w/400
    Seq(100L, 200L, 300L, 400L).foreach { w =>
      val expect = 2500.0 * w / 400.0
      assert(math.abs(kept(w) - expect) < 150, s"w=$w kept=${kept(w)} expect=$expect")
    }
    // weights at/above the cap are always kept
    assert(kept(400L) === 2500L)
    // deterministic: the same call yields the same membership
    val again = Sampling.weightedSample(df, "k", "w", cap = 400L)
      .agg(sum("k")).collect()(0).getLong(0)
    val first = Sampling.weightedSample(df, "k", "w", cap = 400L)
      .agg(sum("k")).collect()(0).getLong(0)
    assert(again === first)
  }

  test("stratified sampling honors per-stratum rates") {
    val d = Tables.documents(spark, sf0001).select("doc_id", "lang")
    val out = Sampling.stratifiedSample(d, "lang", "doc_id",
      Map("en" -> 1.0, "de" -> 0.0))
    val langs = out.select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(langs.contains("en") && !langs.contains("de"))
    // en fully kept
    val enTotal = d.filter(col("lang") === "en").count()
    assert(out.filter(col("lang") === "en").count() === enTotal)
  }

  test("importance weights separate a disjoint-vocabulary target perfectly") {
    // Target docs draw from vocab A, the rest from vocab B: every A-bucket
    // is target-enriched (and no B-bucket is), so target docs must score
    // n_enriched = n_words and background docs 0 — modulo md5 bucket
    // collisions between the two vocabs, which we rule out by checking.
    def bucketOf(w: String): Long = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16) % 256
    }
    // pick words greedily so no bucket is shared within or across vocabs
    val picked = scala.collection.mutable.LinkedHashMap[String, Long]()
    val seen = scala.collection.mutable.Set[Long]()
    for (w <- (1 to 400).iterator.flatMap(i => Seq(s"alpha$i", s"beta$i")) if picked.size < 40) {
      val bkt = bucketOf(w)
      if (!seen(bkt)) { seen += bkt; picked(w) = bkt }
    }
    val (a, b) = picked.keys.toSeq.splitAt(20)
    val docsDf = ((1 to 30).map(i => (i.toLong, "tgt", a((i * 7) % 20) + " " + a((i * 3) % 20) + " " + a(i % 20))) ++
      (31 to 60).map(i => (i.toLong, "bg", b((i * 7) % 20) + " " + b((i * 3) % 20) + " " + b(i % 20))))
      .toDF("id", "grp", "text")
    val got = Sampling.importanceWeights(docsDf, "text", "id", col("grp") === "tgt")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    (1 to 30).foreach { i => val (n, e) = got(i.toLong); assert(e === n, s"target doc $i") }
    (31 to 60).foreach { i => val (_, e) = got(i.toLong); assert(e === 0L, s"background doc $i") }
  }

  test("importance weights are deterministic under repartitioning") {
    val d = Tables.documents(spark, sf0001).select("doc_id", "lang", "text")
    def run(parts: Int) =
      Sampling.importanceWeights(d.repartition(parts), "text", "doc_id", col("lang") === "en")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(run(2) === run(11))
  }
}
