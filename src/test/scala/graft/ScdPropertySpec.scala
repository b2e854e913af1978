package graft

import java.sql.Timestamp
import graft.operators.Scd
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the SCD2 engine (SURVEY §5.2): for ANY sequence of
  * snapshots, the history keeps disjoint abutting intervals, at most one
  * open version per key, and replaying a snapshot is a fixpoint.
  */
class ScdPropertySpec extends SparkSpec {
  import spark.implicits._

  private val attrs = Seq("attr")
  private def ts(day: Int) = Timestamp.valueOf(f"2021-03-$day%02d 00:00:00")

  private val snapshotGen: Gen[Map[String, String]] = for {
    keys <- Gen.someOf(Seq("k1", "k2", "k3", "k4"))
    vals <- Gen.listOfN(keys.size, Gen.oneOf("a", "b", "c"))
  } yield keys.zip(vals).toMap

  private def toDf(snap: Map[String, String]): DataFrame =
    snap.toSeq.toDF("key", "attr")

  private def applyAll(snaps: List[Map[String, String]]): DataFrame =
    snaps.zipWithIndex.foldLeft(Option.empty[DataFrame]) {
      case (hist, (snap, i)) =>
        Some(Scd.scd2Apply(spark, hist, toDf(snap), "key", attrs, ts(i + 1))
          .localCheckpoint())
    }.get

  test("SCD2 invariants hold for arbitrary snapshot sequences") {
    val prop = Prop.forAll(Gen.listOfN(3, snapshotGen)) { snaps0 =>
      val snaps = snaps0.map(s => if (s.isEmpty) Map("k1" -> "a") else s)
      val hist = applyAll(snaps)

      val openPerKey = hist.filter(col("effective_to") === Scd.SentinelTs)
        .groupBy("key").count().filter(col("count") > 1).count() == 0

      val overlaps = hist.alias("a").join(hist.alias("b"), "key")
        .filter(col("a.effective_from") < col("b.effective_from") &&
                col("a.effective_to") >= col("b.effective_from"))
        .count() == 0

      // active rows == last snapshot exactly
      val active = Scd.activeAt(hist, ts(snaps.size + 1)).select("key", "attr")
      val last = toDf(snaps.last)
      val activeMatches = active.exceptAll(last).isEmpty && last.exceptAll(active).isEmpty

      // replay of the last snapshot is a fixpoint
      val replay = Scd.scd2Apply(spark, Some(hist), toDf(snaps.last), "key", attrs,
        ts(snaps.size + 1))
      val fixpoint = replay.count() == hist.count()

      openPerKey && overlaps && activeMatches && fixpoint
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }
}
