package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.sources.WarehouseFs

/** Optimistic concurrency over the manifest CAS: a DML that loses the
  * race REBASES onto the winner when the two commits are provably
  * disjoint (both commit, serial-equivalent content) and refuses loudly
  * on true overlap. The interleavings are forced deterministically
  * through `WarehouseFs.casTestHook`, which runs the competing DML
  * exactly between the loser's data write and its first commit attempt
  * — thread timing would make these specs flaky. */
class WarehouseConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable() =
    s"${java.nio.file.Files.createTempDirectory("graft_conc_")}/t"

  /** Range-clustered 8-file fixture (1000 ids per file), bloom on id. */
  private def publishFixture(t: String): Unit =
    WarehouseFs.publishVersioned(
      spark.range(8000)
        .select(col("id"), concat(lit("u"), col("id")).as("user"),
          (col("id") % 7).as("grp")),
      t, keepVersions = 8, bloomIndexCols = Seq("id"))

  private def fixtureDf(t: String) = {
    // deterministic range layout: repartitionByRange samples, so build
    // the 8-file split explicitly for stable file-per-key reasoning
    spark.range(8000)
      .withColumn("bucket", (col("id") / 1000).cast("int"))
      .repartition(8, col("bucket")).drop("bucket")
  }

  private def state(t: String): Map[Long, String] =
    WarehouseFs.readTable(spark, t).get.select("id", "user")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  test("disjoint concurrent deletes BOTH commit as versions N+1 and N+2, serial content") {
    val t = tmpTable(); publishFixture(t)
    // loser deletes from one file; the racing winner deletes from another
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.deleteWhere(spark, t, "id", Seq(5000L, 5007L), keepVersions = 8))
    WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
    assert(WarehouseFs.casTestHook.isEmpty, "the hook must have fired")
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L,
      "winner commits v2, rebased loser commits v3")
    val s = state(t)
    assert(!s.contains(100L) && !s.contains(5000L) && !s.contains(5007L))
    assert(s.size === 8000 - 3)
    assert(s(101L) === "u101" && s(5001L) === "u5001")
    // time travel: v2 is the winner-only state
    assert(WarehouseFs.readTableVersion(spark, t, 2).get
      .filter(col("id") === 100L).count() === 1)
    // the change feed across the rebased commit is exactly the loser's delta
    val feed = WarehouseFs.changeFeed(spark, t, Seq("id"), 2, 3).get
      .select("id", "_change_type").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(feed === Set((100L, "delete")))
  }

  test("overlapping concurrent deletes refuse: the loser read a file the winner rewrote") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.deleteWhere(spark, t, "id", Seq(101L), keepVersions = 8))
    val e = intercept[IllegalStateException] {
      WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
    }
    assert(e.getMessage.contains("concurrent write conflict"))
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 2L,
      "only the winner committed")
    val s = state(t)
    assert(!s.contains(101L) && s.contains(100L) && s.size === 7999)
    // re-running the refused DML against the current version succeeds —
    // the serial execution the refusal asked for
    WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
    assert(!state(t).contains(100L))
  }

  test("delete vs concurrent append: bloom probe decides — matching refuses, non-matching rebases") {
    val t = tmpTable(); publishFixture(t)
    // the winner appends a row whose id the loser is deleting: the
    // loser's predicate may match the added file → refuse
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.appendRows(
        Seq((42L, "fresh42", 0L)).toDF("id", "user", "grp"), t,
        keepVersions = 8))
    val e = intercept[IllegalStateException] {
      WarehouseFs.deleteWhere(spark, t, "id", Seq(42L), keepVersions = 8)
    }
    assert(e.getMessage.contains("may hold rows matching"))
    // …and an append of unrelated keys rebases fine
    val t2 = tmpTable(); publishFixture(t2)
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.appendRows(
        Seq((90001L, "fresh", 0L)).toDF("id", "user", "grp"), t2,
        keepVersions = 8))
    WarehouseFs.deleteWhere(spark, t2, "id", Seq(42L), keepVersions = 8)
    assert(WarehouseFs.currentVersion(spark, t2).get._1 === 3L)
    val s2 = state(t2)
    assert(!s2.contains(42L) && s2.contains(90001L) && s2.size === 8000)
  }

  test("merge-on-read delete rebases over a disjoint CoW delete; masks compose with a racing MoR delete") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.deleteWhere(spark, t, "id", Seq(5000L), keepVersions = 8))
    WarehouseFs.deleteWhereVectors(spark, t, "id", Seq(100L), keepVersions = 8)
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L)
    val s = state(t)
    assert(!s.contains(100L) && !s.contains(5000L) && s.size === 7998)
    assert(WarehouseFs.hasDeletionVectors(spark, t))
    // two MoR deletes racing: pure mask commits compose by union even
    // on the SAME file — the loser carries the winner's delta refs
    val t2 = tmpTable(); publishFixture(t2)
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.deleteWhereVectors(spark, t2, "id", Seq(101L), keepVersions = 8))
    WarehouseFs.deleteWhereVectors(spark, t2, "id", Seq(100L), keepVersions = 8)
    assert(WarehouseFs.currentVersion(spark, t2).get._1 === 3L)
    val s2 = state(t2)
    assert(!s2.contains(100L) && !s2.contains(101L) && s2.size === 7998)
    assert(WarehouseFs.deletionVectorRows(spark, t2) === 2L)
  }

  test("concurrent blind appends always compose: both land, no refusal, nothing lost") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.appendRows(
        Seq((90001L, "w1", 0L)).toDF("id", "user", "grp"), t, keepVersions = 8))
    WarehouseFs.appendRows(
      Seq((90002L, "w2", 0L)).toDF("id", "user", "grp"), t, keepVersions = 8)
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L,
      "an append reads nothing — the loser must rebase over ANY winner")
    val s = state(t)
    assert(s(90001L) === "w1" && s(90002L) === "w2" && s.size === 8002)
    // and an append rebases over a racing DML too (delete elsewhere)
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8))
    WarehouseFs.appendRows(
      Seq((90003L, "w3", 0L)).toDF("id", "user", "grp"), t, keepVersions = 8)
    val s2 = state(t)
    assert(!s2.contains(100L) && s2(90003L) === "w3" && s2.size === 8002)
  }

  test("a racing full publish refuses the DML: every file it read was replaced") {
    // (an ALTER ADD COLUMNS race is benign by design — it commits no
    // manifest, and additive evolution NULL-fills old-width files — so
    // the schema guard in the arbitration only fires for racing
    // publishes, which rule 1 catches first anyway)
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.casTestHook = Some(() =>
      WarehouseFs.publishVersioned(
        spark.range(50).select(col("id"), lit("w").as("user"),
          lit(0L).as("grp")),
        t, keepVersions = 8, bloomIndexCols = Seq("id")))
    val e = intercept[IllegalStateException] {
      WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
    }
    assert(e.getMessage.contains("concurrent write conflict"))
    assert(state(t).size === 50, "the full publish stands; the DML refused")
  }

  test("a streaming graft-sink micro-batch racing ad-hoc DML rebases: both commit") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the routine 100 TB collision: a continuous CoW upsert sink, a
    // nightly ETL, and an operator's ad-hoc DML all writing one table —
    // before optimistic rebase the sink batch threw and the stream died
    val t = tmpTable(); publishFixture(t)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val ms = MemoryStream[(Long, String, Long)]
    val q = ms.toDF().toDF("id", "user", "grp")
      .writeStream.format("graft")
      .option("table", t).option("keyCol", "id")
      .option("keepVersions", "8")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_sinkrace_").toString)
      .start()
    try {
      WarehouseFs.casTestHook = Some(() =>
        WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8))
      ms.addData((90001L, "stream", 0L))
      q.processAllAvailable()
      assert(WarehouseFs.casTestHook.isEmpty, "the race must have fired")
      assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L,
        "ad-hoc DML commits v2, the rebased sink batch commits v3")
      val s = state(t)
      assert(!s.contains(100L) && s(90001L) === "stream" && s.size === 8000)
    } finally {
      q.stop()
      WarehouseFs.casTestHook = None
    }
  }

  /** ScalaCheck interleaving property over the driver-side model: any
    * (winner, loser) pair of single-file delete/update ops either BOTH
    * commit with content ≡ serial winner-then-loser (file-disjoint), or
    * the loser refuses and the state is winner-only (file-overlapping).
    * Either way the table equals the model — no lost or duplicated
    * rows under any generated interleaving. */
  test("property: racing DML pairs are serial-equivalent or refused (never silently wrong)") {
    sealed trait Op { def fileIdx: Int; def keys: Seq[Long] }
    case class Del(fileIdx: Int, offs: Seq[Long]) extends Op {
      def keys: Seq[Long] = offs.map(o => fileIdx * 1000L + o)
    }
    case class Upd(fileIdx: Int, offs: Seq[Long], tag: String) extends Op {
      def keys: Seq[Long] = offs.map(o => fileIdx * 1000L + o)
    }
    val offsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 999L)).map(_.distinct.take(3))
    def opGen(fileIdx: Int): Gen[Op] = Gen.oneOf(
      offsGen.map(Del(fileIdx, _)),
      Gen.zip(offsGen, Gen.alphaLowerStr.map(_.take(4)))
        .map { case (o, s) => Upd(fileIdx, o, s) })
    val pairGen = for {
      fw <- Gen.chooseNum(0, 7)
      fl <- Gen.chooseNum(0, 7)
      w <- opGen(fw)
      l <- opGen(fl)
      // where the winner strikes: before the loser's first commit
      // attempt (casTestHook) or INSIDE the exists-check → publish
      // window (casWindowHook) — the lost-update window itself
      window <- Gen.oneOf(false, true)
    } yield (w, l, window)
    def run(t: String, op: Op): Unit = op match {
      case Del(_, _) =>
        WarehouseFs.deleteWhere(spark, t, "id", op.keys, keepVersions = 10)
      case Upd(_, _, tag) =>
        WarehouseFs.updateWhere(spark, t, "id", op.keys,
          Map("user" -> lit(tag)), keepVersions = 10)
    }
    def apply(m: Map[Long, String], op: Op): Map[Long, String] = op match {
      case Del(_, _) => m -- op.keys
      case Upd(_, _, tag) =>
        op.keys.foldLeft(m)((acc, k) =>
          if (acc.contains(k)) acc.updated(k, tag) else acc)
    }
    val prop = Prop.forAll(pairGen) { case (winner, loser, window) =>
      val t = tmpTable()
      WarehouseFs.publishVersioned(
        fixtureDf(t).select(col("id"), concat(lit("u"), col("id")).as("user"),
          (col("id") % 7).as("grp")),
        t, keepVersions = 10, bloomIndexCols = Seq("id"))
      val m0 = (0L until 8000L).map(k => k -> s"u$k").toMap
      if (window) WarehouseFs.casWindowHook = Some(() => run(t, winner))
      else WarehouseFs.casTestHook = Some(() => run(t, winner))
      val refused =
        try { run(t, loser); false }
        catch { case _: IllegalStateException => true }
      WarehouseFs.casTestHook = None
      WarehouseFs.casWindowHook = None
      val expected =
        if (refused) apply(m0, winner)
        else apply(apply(m0, winner), loser)
      val got = state(t)
      import Prop.propBoolean
      // the fixture hash-partitions buckets (repartition(8, bucket)):
      // two bucket values can collide into ONE physical file, where a
      // refusal is the CORRECT outcome — disjointness is at the
      // physical-file level, i.e. the hash-partition level
      def partOf(b: Int): Int = {
        val h = org.apache.spark.sql.catalyst.expressions.Murmur3Hash(
          Seq(org.apache.spark.sql.catalyst.expressions.Literal(b)), 42)
          .eval(null).asInstanceOf[Int]
        ((h % 8) + 8) % 8
      }
      val serialBoth = partOf(winner.fileIdx) != partOf(loser.fileIdx)
      ((got == expected) :| s"state mismatch (refused=$refused, window=$window)") &&
        ((!serialBoth || !refused) :|
          "file-disjoint ops must both commit (not refuse)")
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8),
      prop)
    assert(res.passed, res.status.toString)
  }
}
