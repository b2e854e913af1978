package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.QualityExpressions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class QualityExprSpec extends SparkSpec {
  import spark.implicits._

  // the composed built-in form the expression replaces — the r15-audited
  // quality-gate signals, verbatim
  private def builtinSignals(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"),
      size(split(col("text"), "\\s+")).as("n_tokens"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[.,!?;:]", ""))).as("n_punct"),
      expr("regexp_count(text, '\\\\bthe\\\\b')").as("n_the"))

  private def onePassSignals(df: org.apache.spark.sql.DataFrame) =
    df.select(col("id"), quality_signals(col("text")).as("q"))
      .select(col("id"), col("q.n_tokens").as("n_tokens"),
        col("q.n_punct").as("n_punct"), col("q.n_the").as("n_the"))

  private def check(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
    val want = builtinSignals(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val got = onePassSignals(df).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(got === want)
  }

  test("quality_signals matches the three built-in regex signals on corners") {
    check(Seq(
      "the quick brown fox. the end!",
      "",                                 // split("") = [""] → n_tokens 1
      "   ",                              // leading+trailing ws only
      " the ",                            // boundaries at both ends
      "the",                              // whole string is the match
      "then theater breathe the.the,the", // word-boundary non-matches + punct-bounded matches
      "a\tb\ncd\fe\rf",             // every ASCII \s class member
      "double  space\t\ttabs and the\n\nnewlines: yes; ok?!",
      "ünïcode the wörds — em-dash is non-word so éthe theé thé",
      "🎉the🎉 multi-byte boundaries the",
      "_the the_ 0the the0 the_the",      // word chars block the boundary
      "x" * 5000 + " the " + "y" * 5000))
  }

  test("quality_signals matches the built-ins generatively") {
    // alphabet loaded with separators, punctuation, 'the' fragments,
    // word/non-word boundary material and multi-byte chars
    val piece = Gen.oneOf(
      "the", "th", "he", "t", " ", "  ", "\t", "\n", ".", ",", "!", "?",
      ";", ":", "_", "a", "Z", "9", "é", "ü", "🎉", "-", "'", "\"", "e",
      "theo", "othe", "lathe", "the the")
    val textGen = Gen.listOf(piece).map(_.mkString)
    val prop = Prop.forAll(Gen.listOfN(40, textGen)) { texts: List[String] =>
      check(texts); true
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(20), prop)
    assert(res.passed, res.status.toString)
  }

  test("quality_signals on the real corpus equals the built-ins") {
    val docs = Tables.documents(spark, sf0001).select(
      col("doc_id").as("id"), col("text"))
    val want = builtinSignals(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    val got = onePassSignals(docs).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3))).toMap
    assert(got === want)
  }
}
