package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.{DayCount, DecayScore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

/** Streaming decayed-engagement state (EventStreams.decayScoreTrack):
  * parity with the exact batch fold under per-user anchoring, 20-day
  * pruning, and idempotence under micro-batch re-delivery.
  */
class DecayStreamSpec extends SparkSpec {
  import spark.implicits._
  private implicit val s: org.apache.spark.sql.SparkSession = spark

  /** Exact batch reference: per-user anchor = own max day, hard 20-day cut. */
  private def batchScores(rows: Seq[DayCount]): Map[Long, Long] =
    rows.groupBy(_.user_id).map { case (u, rs) =>
      // last write per day wins, matching replace semantics
      val byDay = rs.groupBy(_.epoch_day).map { case (d, v) => d -> v.last.n }
      val anchor = byDay.keys.max
      u -> byDay.iterator
        .filter { case (d, _) => anchor - d <= 19 }
        .map { case (d, n) => n << (19L - (anchor - d)).toInt }.sum
    }

  private def lastScores(table: String): Map[Long, Long] = {
    val rows = spark.table(table).as[DecayScore].collect()
    rows.groupBy(_.user_id).map { case (u, rs) =>
      u -> rs.maxBy(_.as_of_day).score_x524288
    }
  }

  private def drain(in: MemoryStream[DayCount], name: String): Unit = {
    val q = EventStreams.decayScoreTrack(in.toDS()).toDF()
      .writeStream.format("memory").queryName(name)
      .outputMode("update").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("stream state equals the exact batch fold, including 20-day pruning") {
    val in = MemoryStream[DayCount](spark)
    val batch1 = Seq(
      DayCount(1, 100, 3), DayCount(1, 101, 5),
      DayCount(2, 100, 7),
      DayCount(3, 50, 9)) // will fall out of user 3's window later
    val batch2 = Seq(
      DayCount(1, 119, 2),  // gap 19 from day 100: day 100 still in
      DayCount(2, 121, 1),  // gap 21 from day 100: day 100 pruned
      DayCount(3, 80, 4))   // day 50 pruned (gap 30)
    in.addData(batch1: _*)
    drain(in, "decay1")
    in.addData(batch2: _*)
    drain(in, "decay1")
    val got = lastScores("decay1")
    val want = batchScores(batch1 ++ batch2)
    assert(got === want)
    // spot-check the arithmetic: user 1 at anchor 119 has
    // 3<<0 (gap 19) + 5<<1 (gap 18) + 2<<19 (gap 0)
    assert(want(1) === (3L << 0) + (5L << 1) + (2L << 19))
    // user 2's day-100 count is fully expired, not shift-leaked
    assert(want(2) === (1L << 19))
  }

  test("micro-batch re-delivery is idempotent (replace semantics)") {
    val in = MemoryStream[DayCount](spark)
    val data = Seq(DayCount(9, 10, 4), DayCount(9, 11, 6))
    in.addData(data: _*)
    drain(in, "decay2")
    val first = lastScores("decay2")
    in.addData(data: _*) // upstream rollup re-delivers the same days
    drain(in, "decay2")
    assert(lastScores("decay2") === first)
    assert(first(9) === (4L << 18) + (6L << 19))
  }
}
