package graft

import graft.operators.IncrementalAgg
import graft.sources.WarehouseFs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Property tests for the version-diff change feed: for ANY two table
  * states, (1) applying the feed to the old version reconstructs the new
  * one exactly, (2) each change class contains exactly the keys set
  * arithmetic predicts (updates as pre+post pairs), and (3) folding the
  * feed into a retractable aggregate state equals bootstrapping the new
  * version — the CDC ⇄ view-maintenance contract end to end, not just on
  * hand-picked fixtures.
  */
class ChangeFeedPropertySpec extends SparkSpec {
  import spark.implicits._

  // a table state: key → (group, value); nulls exercised via value 0 → None
  private val stateGen: Gen[Map[Long, (String, Option[Long])]] = for {
    keys <- Gen.someOf(1L to 6L)
    grps <- Gen.listOfN(keys.size, Gen.oneOf("g1", "g2"))
    vals <- Gen.listOfN(keys.size, Gen.chooseNum(0L, 3L))
  } yield keys.zip(grps.zip(vals.map(v => if (v == 0L) None else Some(v)))).toMap

  private def toDf(st: Map[Long, (String, Option[Long])]): DataFrame =
    st.toSeq.map { case (k, (g, v)) => (k, g, v) }.toDF("k", "g", "v")

  private def rowSet(df: DataFrame): Set[(Long, String, Option[Long])] =
    df.select("k", "g", "v").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet

  test("change feed reconstructs, classifies, and folds for arbitrary version pairs") {
    val prop = Prop.forAll(stateGen, stateGen) { (s1, s2) =>
      val v1 = if (s1.isEmpty) Map(1L -> ("g1", Option(1L))) else s1
      val v2 = if (s2.isEmpty) Map(2L -> ("g2", Option(2L))) else s2
      val t = s"${java.nio.file.Files.createTempDirectory("graft_cfp_")}/t"
      WarehouseFs.publishVersioned(toDf(v1), t, keepVersions = 5)
      WarehouseFs.publishVersioned(toDf(v2), t, keepVersions = 5)
      val feed = WarehouseFs.changeFeed(spark, t, Seq("k"), 1, 2).get
        .localCheckpoint()

      // (1) apply-reconstruct
      val gone = feed.filter(col("_change_type").isin("delete", "update_preimage"))
        .select("k")
      val recon = toDf(v1).join(gone, Seq("k"), "left_anti").unionByName(
        feed.filter(col("_change_type").isin("insert", "update_postimage"))
          .drop("_change_type"))
      val reconstructs = rowSet(recon) == rowSet(toDf(v2))

      // (2) class membership from key-set arithmetic
      val classes = feed.select("k", "_change_type").collect()
        .groupBy(_.getString(1)).view
        .mapValues(_.map(_.getLong(0)).toSet).toMap.withDefaultValue(Set.empty[Long])
      val expIns = v2.keySet -- v1.keySet
      val expDel = v1.keySet -- v2.keySet
      val expUpd = (v1.keySet & v2.keySet).filter(k => v1(k) != v2(k))
      val classified = classes("insert") == expIns &&
        classes("delete") == expDel &&
        classes("update_preimage") == expUpd &&
        classes("update_postimage") == expUpd

      // (3) retraction fold ≡ bootstrap of the target
      val aggs = Seq(("v", "sum"), ("v", "count"))
      def stateSet(df: DataFrame) =
        df.select("g", "sum_v", "count_v", "n_rows").collect()
          .map(r => (r.getString(0),
            if (r.isNullAt(1)) None else Some(r.getLong(1)),
            r.getLong(2), r.getLong(3))).toSet
      val folded = IncrementalAgg.mergeChanges(
        Some(IncrementalAgg.bootstrapRetractable(toDf(v1), Seq("g"), aggs)),
        feed, Seq("g"), aggs)
      val foldMatches =
        stateSet(folded) == stateSet(
          IncrementalAgg.bootstrapRetractable(toDf(v2), Seq("g"), aggs))

      reconstructs && classified && foldMatches
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  // --- file-granular diff ≡ brute-force snapshot diff -------------------

  private sealed trait CowOp
  private case class CowDelete(keys: Seq[Long]) extends CowOp
  private case class CowUpsert(rows: Seq[(Long, Long)]) extends CowOp
  private case class CowUpdate(keys: Seq[Long], add: Long) extends CowOp

  private val cowKey = Gen.chooseNum(0L, 23L)
  private val cowOpGen: Gen[CowOp] = Gen.oneOf(
    Gen.nonEmptyListOf(cowKey).map(ks => CowDelete(ks.distinct)),
    Gen.nonEmptyListOf(Gen.zip(cowKey, Gen.chooseNum(0L, 99L)))
      .map(rs => CowUpsert(rs.distinctBy(_._1))),
    Gen.zip(Gen.nonEmptyListOf(cowKey), Gen.chooseNum(1L, 9L))
      .map { case (ks, a) => CowUpdate(ks.distinct, a) })

  test("file-granular feeds over CoW chains equal the brute-force snapshot diff") {
    // every DML here produces a FILE-LIST manifest sharing files with its
    // predecessor — exactly the layout where the r9 diff reads only the
    // non-shared files. The feed must still equal what two FULL snapshot
    // reads + set arithmetic predict, class by class, value by value.
    val prop = Prop.forAll(Gen.listOfN(3, cowOpGen)) { ops =>
      val t = s"${java.nio.file.Files.createTempDirectory("graft_cfg_")}/t"
      WarehouseFs.publishVersioned(
        (0L until 16L).map(k => (k, k * 7L)).toDF("k", "v")
          .repartitionByRange(4, col("k")),
        t, keepVersions = 10, bloomIndexCols = Seq("k"), zoneMapCols = Seq("k"))
      ops.foreach {
        case CowDelete(ks) =>
          WarehouseFs.deleteWhere(spark, t, "k", ks, keepVersions = 10)
        case CowUpsert(rows) =>
          WarehouseFs.upsertRows(rows.toDF("k", "v"), t, "k", keepVersions = 10)
        case CowUpdate(ks, a) =>
          WarehouseFs.updateWhere(spark, t, "k", ks,
            Map("v" -> (col("v") + lit(a))), keepVersions = 10)
      }
      def snap(v: Long): Map[Long, Long] =
        WarehouseFs.readTableVersion(spark, t, v).get.collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val versions = WarehouseFs.listVersions(spark, t)
      versions.zip(versions.tail).forall { case (a, b) =>
        val sa = snap(a); val sb = snap(b)
        val expected =
          (sb.keySet -- sa.keySet).map(k => (k, sb(k), "insert")) ++
          (sa.keySet -- sb.keySet).map(k => (k, sa(k), "delete")) ++
          (sa.keySet & sb.keySet).filter(k => sa(k) != sb(k)).flatMap(k =>
            Seq((k, sa(k), "update_preimage"), (k, sb(k), "update_postimage")))
        val got = WarehouseFs.changeFeed(spark, t, Seq("k"), a, b).get
          .select("k", "v", "_change_type").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
        got == expected
      }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(8), prop)
    assert(res.passed, res.status.toString)
  }
}
