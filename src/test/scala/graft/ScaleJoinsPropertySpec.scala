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
}
