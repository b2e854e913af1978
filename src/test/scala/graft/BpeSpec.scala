package graft

import org.apache.spark.sql.functions._
import graft.operators.Bpe

/** Distributed BPE vs an independent single-threaded reference
  * implementation (written here, from the algorithm definition — NOT a
  * refactor of the production code): same merge rules in the same
  * order, and encode is lossless and consistent with the rules. */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  // ---- reference implementation (driver-side, Vector-based) ----------

  private def refApply(syms: Vector[String], a: String, b: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** (merges, final per-word symbols) with the production tie-break:
    * highest pair mass, then lexicographic (a, b). */
  private def refTrain(wordFreq: Map[String, Long], numMerges: Int,
                       minPair: Long = 2L)
      : (Seq[(String, String)], Map[String, Vector[String]]) = {
    var hist: Map[String, (Vector[String], Long)] = wordFreq.map {
      case (w, f) => w -> ((w.map(_.toString).toVector :+ "</w>", f))
    }
    val rules = Seq.newBuilder[(String, String)]
    var done = false
    var r = 0
    while (r < numMerges && !done) {
      val counts = collection.mutable.Map.empty[(String, String), Long]
      hist.valuesIterator.foreach { case (syms, f) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), c) => (-c, a, b) }.headOption
      best match {
        case Some(((a, b), c)) if c >= minPair =>
          rules += ((a, b))
          hist = hist.map { case (w, (syms, f)) => w -> ((refApply(syms, a, b), f)) }
          r += 1
        case _ => done = true
      }
    }
    (rules.result(), hist.map { case (w, (syms, _)) => w -> syms })
  }

  private val corpus = Seq(
    "low low low low low",
    "lower lower widest widest widest",
    "newest newest newest newest newest newest",
    "the newest gadget is the widest yet",
    "low lower newest widest").toDF("text")

  private def driverWordFreq(rows: Seq[String]): Map[String, Long] =
    rows.flatMap(_.toLowerCase.split("\\s+")).filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap

  test("train matches the reference implementation rule-for-rule, in order") {
    val wf = driverWordFreq(corpus.as[String].collect().toSeq)
    val (expected, _) = refTrain(wf, 20)
    val model = Bpe.train(corpus, "text", 20)
    assert(model.merges === expected)
    assert(model.merges.nonEmpty && model.merges.toSet.size === model.merges.size,
      "no rule may repeat: applying a rule removes its pair")
  }

  test("early stop: no pair above minPairCount ends training before numMerges") {
    val tiny = Seq("ab", "cd").toDF("text") // every pair has mass 1
    val model = Bpe.train(tiny, "text", 10, minPairCount = 2L)
    assert(model.merges.isEmpty)
    // and with minPairCount=1 it keeps merging until words are single tokens
    val m1 = Bpe.train(tiny, "text", 10, minPairCount = 1L)
    assert(m1.merges.nonEmpty && m1.merges.size <= 6)
  }

  test("encode agrees with the reference's final symbol table and is lossless") {
    val wf = driverWordFreq(corpus.as[String].collect().toSeq)
    val n = 15
    val (rules, refSyms) = refTrain(wf, n)
    val model = Bpe.train(corpus, "text", n)
    assert(model.merges === rules)

    val docs = corpus.withColumn("doc_id", monotonically_increasing_id())
    val enc = Bpe.encode(docs, "text", model, Seq("doc_id"))
      .join(docs, "doc_id")
      .select("text", "tokens").as[(String, Seq[String])].collect()

    enc.foreach { case (text, tokens) =>
      val ws = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
      // token stream = concatenation of each word's reference encoding
      val expected = ws.toSeq.flatMap(w => refSyms(w))
      assert(tokens === expected, s"encode mismatch for '$text'")
      // lossless: stripping </w> boundaries reproduces the words
      val decoded = tokens.mkString("").split(java.util.regex.Pattern.quote("</w>"))
        .filter(_.nonEmpty).toSeq
      assert(decoded === ws.toSeq)
    }
  }

  test("encode handles unseen words (char fallback) and empty text") {
    val model = Bpe.train(corpus, "text", 10)
    val docs = Seq((1L, "zzyx newest"), (2L, ""), (3L, "low")).toDF("doc_id", "text")
    val out = Bpe.encode(docs, "text", model, Seq("doc_id"))
      .orderBy("doc_id").as[(Long, Seq[String])].collect()
    // unseen word falls back to (possibly partially merged) chars — still lossless
    assert(out(0)._2.mkString("").startsWith("z"))
    assert(out(0)._2.mkString("").split(java.util.regex.Pattern.quote("</w>"))
      .filter(_.nonEmpty).toSeq === Seq("zzyx", "newest"))
    assert(out(1)._2 === Seq.empty[String], "empty text → empty tokens, row kept")
    assert(out(2)._2.mkString("") === "low</w>")
  }

  test("token counts with the trained tokenizer over the documents table") {
    val docs = Tables.documents(spark, sf0001)
    val model = Bpe.train(docs, "text", 30, maxVocab = 5000)
    assert(model.merges.size === 30, "sf0.001 corpus has ≥30 viable merges")
    val enc = Bpe.encode(docs, "text", model, Seq("doc_id"))
    val n = enc.agg(sum(size(col("tokens")))).head().getLong(0)
    val words = docs.select(explode(split(lower(col("text")), "\\s+")).as("w"))
      .filter(col("w") =!= "").count()
    val chars = docs.agg(sum(length(regexp_replace(lower(col("text")), "\\s+", ""))))
      .head().getLong(0)
    // tokens per word ∈ (1, chars-per-word + 1): merges compress below
    // the char ceiling but cannot beat one token per word
    assert(n > words && n < chars + words,
      s"token count $n outside ($words, ${chars + words})")
  }
}
