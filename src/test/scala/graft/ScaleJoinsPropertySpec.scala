package graft

import graft.operators.ScaleJoins
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property: for ANY fact multiset, dim multiset, and salt width, the
  * salted join is multiset-equal to the plain inner join — salting must
  * be pure plumbing, never a semantics change.
  */
class ScaleJoinsPropertySpec extends SparkSpec {
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Int)]] =
    Gen.listOfN(30, Gen.zip(Gen.chooseNum(0L, 5L), Gen.chooseNum(0, 99)))
  private val dimGen: Gen[List[(Long, String)]] =
    Gen.listOf(Gen.zip(Gen.chooseNum(0L, 6L), Gen.oneOf("x", "y")))
  private val saltGen: Gen[Int] = Gen.chooseNum(1, 9)

  test("salted join ≡ plain join for arbitrary inputs and salt widths") {
    val prop = Prop.forAll(rowsGen, dimGen, saltGen) { (facts, dims, salt) =>
      val f = facts.toDF("k", "payload")
      val d = dims.toDF("k", "label")
      val plain = f.join(d, Seq("k"))
      val salted = ScaleJoins.saltedJoin(f, d, "k", salt)
      plain.exceptAll(salted).isEmpty && salted.exceptAll(plain).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("point-in-interval join ≡ naive join for arbitrary intervals and widths") {
    val pointsGen = Gen.listOfN(40, Gen.chooseNum(0L, 400L))
    val intervalsGen = Gen.listOfN(8,
      Gen.zip(Gen.chooseNum(0L, 350L), Gen.chooseNum(1L, 120L)))
    val widthGen = Gen.chooseNum(1L, 200L)
    val prop = Prop.forAll(pointsGen, intervalsGen, widthGen) { (ps, ivs, w) =>
      val facts = ps.zipWithIndex.map { case (p, i) => (i.toLong, p) }.toDF("fid", "p")
      val intervals = ivs.zipWithIndex
        .map { case ((lo, len), i) => (i.toLong, lo, lo + len) }
        .toDF("iv_id", "lo", "hi")
      val naive = facts.crossJoin(intervals)
        .filter(org.apache.spark.sql.functions.col("p") >=
                  org.apache.spark.sql.functions.col("lo") &&
                org.apache.spark.sql.functions.col("p") <
                  org.apache.spark.sql.functions.col("hi"))
        .select("fid", "iv_id")
      val bucketed = ScaleJoins
        .pointInIntervalJoin(facts, "p", intervals, "lo", "hi", w)
        .select("fid", "iv_id")
      naive.exceptAll(bucketed).isEmpty && bucketed.exceptAll(naive).isEmpty
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(12), prop)
    assert(res.passed, res.status.toString)
  }
}
