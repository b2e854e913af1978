package graft

import graft.sources.WarehouseFs
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Model-based property test for the SQL MERGE clause fold
  * ([[org.apache.spark.sql.graft.GraftMergeCommand]]): ANY generated
  * sequence of conditional WHEN MATCHED UPDATE/DELETE clauses (plus an
  * optional gated WHEN NOT MATCHED INSERT) must match a driver-side
  * model that applies ANSI first-match-wins semantics literally — for
  * each matched (target, source) pair, the FIRST clause whose guard
  * holds acts and the rest never see the row; unmatched source rows
  * insert iff the gate holds. This walks the clause-composition space
  * the hand-written GraftCatalogSpec cases sample. */
class SqlMergePropertySpec extends SparkSpec {
  import spark.implicits._

  private val wh = "/tmp/graft_catalog_warehouse"

  /** Guard `(s.s % m) = r` (onSource) or `(t.v % m) = r`. */
  private case class Guard(onSource: Boolean, m: Int, r: Int) {
    def sql: String = if (onSource) s"(s.s % $m) = $r" else s"(t.v % $m) = $r"
    def eval(tv: Long, ss: Long): Boolean =
      (if (onSource) ss else tv) % m == r
  }
  private sealed trait Clause { def guard: Option[Guard] }
  private case class Upd(guard: Option[Guard], add: Long) extends Clause
  private case class Del(guard: Option[Guard]) extends Clause

  private val guardGen: Gen[Guard] = for {
    onSource <- Gen.oneOf(true, false)
    m <- Gen.chooseNum(2, 3)
    r <- Gen.chooseNum(0, m - 1)
  } yield Guard(onSource, m, r)

  private val clauseGen: Gen[Clause] = Gen.oneOf(
    Gen.zip(guardGen, Gen.chooseNum(1L, 5L)).map { case (g, a) => Upd(Some(g), a) },
    guardGen.map(g => Del(Some(g))))

  private case class Scenario(clauses: List[Clause], lastUnconditional: Boolean,
                              insert: Option[Option[Guard]],
                              src: List[(Long, Long)]) {
    def effectiveClauses: List[Clause] =
      if (clauses.nonEmpty && lastUnconditional)
        clauses.init :+ (clauses.last match {
          case Upd(_, a) => Upd(None, a)
          case Del(_) => Del(None)
        })
      else clauses
  }

  private val scenarioGen: Gen[Scenario] = for {
    clauses <- Gen.listOfN(3, clauseGen).map(_.take(3))
    n <- Gen.chooseNum(0, 3)
    lastUncond <- Gen.oneOf(true, false)
    ins <- Gen.option(Gen.option(guardGen).map(g => g))
    // guarantee at least one clause overall (mergeIntoKeys requires it)
    src <- Gen.nonEmptyListOf(
      Gen.zip(Gen.chooseNum(0L, 29L), Gen.chooseNum(0L, 99L)))
      .map(_.distinctBy(_._1))
  } yield {
    val cs = clauses.take(n)
    val s0 = Scenario(cs, lastUncond, ins, src)
    if (cs.isEmpty && ins.isEmpty) s0.copy(insert = Some(None)) else s0
  }

  private def mergeSql(t: String, sc: Scenario): String = {
    val matched = sc.effectiveClauses.map {
      case Upd(g, a) =>
        s"WHEN MATCHED${g.fold("")(x => s" AND ${x.sql}")} " +
          s"THEN UPDATE SET v = s.s + $a"
      case Del(g) =>
        s"WHEN MATCHED${g.fold("")(x => s" AND ${x.sql}")} THEN DELETE"
    }
    val ins = sc.insert.map { g =>
      s"WHEN NOT MATCHED${g.fold("")(x => s" AND ${x.sql}")} " +
        "THEN INSERT (k, v) VALUES (s.k, s.v)"
    }
    (Seq(s"MERGE INTO graft.$t t USING sqlmerge_src s ON t.k = s.k") ++
      matched ++ ins).mkString("\n")
  }

  private def model(init: Map[Long, Long], sc: Scenario): Map[Long, Long] = {
    val srcMap = sc.src.toMap
    val kept = init.flatMap { case (k, v) =>
      srcMap.get(k) match {
        case None => Some(k -> v)
        case Some(s) =>
          sc.effectiveClauses.find(_.guard.forall(_.eval(v, s))) match {
            case None => Some(k -> v)            // no clause fired
            case Some(Upd(_, a)) => Some(k -> (s + a))
            case Some(Del(_)) => None
          }
      }
    }
    val inserts = sc.insert match {
      case None => Map.empty[Long, Long]
      case Some(gate) => srcMap.view
        .filterKeys(k => !init.contains(k))
        .filter { case (_, s) => gate.forall(_.eval(0L, s)) }
        .toMap
    }
    kept ++ inserts
  }

  test("any SQL MERGE clause composition matches the ANSI first-match-wins model") {
    val prop = Prop.forAll(scenarioGen) { sc =>
      // an insert gate may reference only SOURCE columns — regenerate
      // target-side insert gates as source-side (the refusal is covered
      // by GraftCatalogSpec; the property walks the supported space)
      val sc2 = sc.copy(insert = sc.insert.map(_.map(g =>
        g.copy(onSource = true))))
      val t = s"sqlmp_${java.util.UUID.randomUUID().toString.take(8)}"
      val init = (0L until 20L).map(k => (k, k * 10L))
      WarehouseFs.publishVersioned(
        init.toDF("k", "v").repartitionByRange(4, col("k")),
        s"$wh/$t", keepVersions = 3, bloomIndexCols = Seq("k"))
      // source carries (k, v, s): v for INSERT *-by-name parity, s as
      // the condition/value input
      sc2.src.map { case (k, s) => (k, s, s) }.toDF("k", "v", "s")
        .createOrReplaceTempView("sqlmerge_src")
      spark.sql(mergeSql(t, sc2))
      val got = spark.table(s"graft.$t").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = model(init.toMap, sc2.copy(
        src = sc2.src.map { case (k, s) => (k, s) }))
      val ok = got == want
      if (!ok) println(s"MISMATCH\nsql=${mergeSql(t, sc2)}\n" +
        s"src=${sc2.src}\ngot=$got\nwant=$want")
      ok
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }
}
