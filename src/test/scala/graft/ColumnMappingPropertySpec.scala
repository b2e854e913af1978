package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.sources.WarehouseFs

/** Model-based contract for column mapping: ANY generated sequence of
  * schema evolutions (rename, drop, additive add) interleaved with DML
  * (update, append) keeps the table equal to a driver-side model that
  * applies the same operations to an in-memory map — names, values,
  * null-fills, and physical-spelling resolution all included. This is
  * the property that makes the mapping trustworthy beyond the
  * hand-picked spec scenarios: a wrong physical resolution, a dropped
  * column resurfacing, or a write landing under the wrong spelling
  * breaks model equality on some generated sequence. */
class ColumnMappingPropertySpec extends SparkSpec {

  private def tmpTable() =
    s"${java.nio.file.Files.createTempDirectory("graft_mapprop_")}/t"

  // the model: column order + per-row values keyed by id (id never
  // renames/drops in generated sequences — the DML key must survive)
  private case class Model(cols: Seq[String],
                           rows: Map[Long, Map[String, Any]])

  private sealed trait Op
  private case class Rename(from: Int, toSuffix: String) extends Op
  private case class Drop(idx: Int) extends Op
  private case class Add(suffix: String) extends Op
  private case class Update(idCount: Int, col: Int, tag: String) extends Op
  private case class Append(start: Long, n: Int) extends Op

  test("property: random evolve+DML sequences keep the table ≡ the model") {
    val opGen: Gen[Op] = Gen.frequency(
      3 -> Gen.zip(Gen.chooseNum(0, 5), Gen.identifier.map(_.take(4)))
        .map { case (i, s) => Rename(i, s) },
      2 -> Gen.chooseNum(0, 5).map(Drop(_)),
      2 -> Gen.identifier.map(s => Add(s.take(4))),
      3 -> Gen.zip(Gen.chooseNum(1, 3), Gen.chooseNum(0, 5),
        Gen.identifier.map(_.take(4)))
        .map { case (n, c, t) => Update(n, c, t) },
      2 -> Gen.zip(Gen.chooseNum(0, 2), Gen.chooseNum(1, 3))
        .map { case (s, n) => Append(9000L + s * 100, n) })
    val seqGen = Gen.listOfN(5, opGen)

    val prop = Prop.forAll(seqGen) { ops =>
      val t = tmpTable()
      // base: id + two value columns, 40 rows
      WarehouseFs.publishVersioned(
        spark.range(40).select(col("id"),
          concat(lit("a"), col("id")).as("c_a"),
          concat(lit("b"), col("id")).as("c_b")),
        t, keepVersions = 16, bloomIndexCols = Seq("id"))
      var model = Model(Seq("id", "c_a", "c_b"),
        (0L until 40L).map(i =>
          i -> Map[String, Any]("id" -> i, "c_a" -> s"a$i", "c_b" -> s"b$i"))
          .toMap)
      var renameCount = 0

      def valueCols = model.cols.filterNot(_ == "id")
      def pick(i: Int): Option[String] =
        if (valueCols.isEmpty) None else Some(valueCols(i % valueCols.length))

      ops.foreach {
        case Rename(i, sfx) =>
          pick(i).foreach { from =>
            renameCount += 1
            val to = s"r${renameCount}_$sfx"
            if (!model.cols.contains(to)) {
              WarehouseFs.alterRenameColumn(spark, t, from, to)
              model = Model(model.cols.map(c => if (c == from) to else c),
                model.rows.map { case (k, r) =>
                  k -> (r - from + (to -> r(from))) })
            }
          }
        case Drop(i) =>
          // keep at least one value column so updates stay meaningful
          if (valueCols.length > 1) pick(i).foreach { c =>
            try {
              WarehouseFs.alterDropColumn(spark, t, c)
              model = Model(model.cols.filterNot(_ == c),
                model.rows.map { case (k, r) => k -> (r - c) })
            } catch {
              // re-ADD-after-drop tombstone collisions are a REFUSAL
              // contract, not a model transition — surface elsewhere
              case _: IllegalArgumentException => ()
            }
          }
        case Add(sfx) =>
          val c = s"n_$sfx"
          if (!model.cols.contains(c)) {
            try {
              WarehouseFs.alterAddColumns(spark, t,
                org.apache.spark.sql.types.StructType(Seq(
                  org.apache.spark.sql.types.StructField(c,
                    org.apache.spark.sql.types.StringType))))
              model = Model(model.cols :+ c,
                model.rows.map { case (k, r) => k -> (r + (c -> null)) })
            } catch {
              // the name may collide with a dropped spelling (tombstone)
              case _: IllegalArgumentException => ()
            }
          }
        case Update(n, ci, tag) =>
          pick(ci).foreach { c =>
            val ids = model.rows.keys.toSeq.sorted.take(n)
            if (ids.nonEmpty) {
              WarehouseFs.updateWhere(spark, t, "id", ids,
                Map(c -> lit(tag)), keepVersions = 16)
              model = Model(model.cols, model.rows.map { case (k, r) =>
                k -> (if (ids.contains(k)) r.updated(c, tag) else r) })
            }
          }
        case Append(start, n) =>
          val fresh = (start until start + n)
            .filterNot(model.rows.contains)
          if (fresh.nonEmpty) {
            val rows = fresh.map { id =>
              org.apache.spark.sql.Row.fromSeq(model.cols.map {
                case "id" => id
                case c => s"$c-$id"
              })
            }
            val schema = org.apache.spark.sql.types.StructType(
              model.cols.map(c => org.apache.spark.sql.types.StructField(c,
                if (c == "id") org.apache.spark.sql.types.LongType
                else org.apache.spark.sql.types.StringType,
                nullable = true)))
            WarehouseFs.appendRows(
              spark.createDataFrame(
                spark.sparkContext.parallelize(rows.toSeq, 1), schema),
              t, keepVersions = 16)
            model = Model(model.cols, model.rows ++ fresh.map(id =>
              id -> model.cols.map(c =>
                c -> (if (c == "id") (id: Any) else s"$c-$id")).toMap))
          }
      }

      val df = WarehouseFs.readTable(spark, t).get
      val gotCols = df.columns.toSeq
      val got = df.collect().map { r =>
        r.getLong(r.fieldIndex("id")) ->
          gotCols.map(c => c -> r.get(r.fieldIndex(c))).toMap
      }.toMap
      import Prop.propBoolean
      ((gotCols == model.cols) :|
        s"schema mismatch: got $gotCols, model ${model.cols}") &&
        ((got == model.rows) :| {
          val diff = (got.keySet ++ model.rows.keySet).iterator
            .filter(k => got.get(k) != model.rows.get(k)).take(3).map(k =>
              s"$k: got=${got.get(k)} model=${model.rows.get(k)}").mkString("; ")
          s"row mismatch after $ops — $diff"
        })
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(6),
      prop)
    assert(res.passed, res.status.toString)
  }
}
