package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode}
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.StructType

/** The warehouse as a registered Spark data source: versioned manifest
  * tables readable with `spark.read.format("graft")` (and writable with
  * `df.write.format("graft")`), or attachable from pure SQL —
  *
  * {{{
  * CREATE TEMPORARY VIEW tx USING graft OPTIONS (table '/wh/tx')
  * SELECT * FROM tx WHERE user_id = 42        -- bloom file pruning
  * SELECT * FROM tx WHERE day BETWEEN 10 AND 12  -- zone file pruning
  * }}}
  *
  * Pushdown: Catalyst hands the relation its filters
  * ([[PrunedFilteredScan]]); equality / IN conjuncts drive the bloom
  * index, bounded ranges drive the zone map, and the surviving
  * predicate set re-applies on the pruned read — Spark ALSO
  * re-evaluates every filter above the relation (none are declared
  * handled), so index pruning is strictly a file-skip optimization and
  * bloom false positives stay invisible. Column pruning maps straight
  * onto the parquet scan's `ReadSchema`.
  *
  * Options: `table` (path, required), `version` (time travel).
  *
  * Scale notes: the V1 row-based boundary costs one InternalRow→Row→
  * InternalRow round-trip, which is noise for the point-lookup and
  * narrow-range reads this surface exists for; full-table analytics
  * should read the manifest directly ([[WarehouseFs.readTable]] /
  * [[graft.GraftSession]] attach), which stays fully columnar. A
  * `SaveMode.Append`-free overwrite write publishes a new version via
  * [[WarehouseFs.publishVersioned]] (bloom/zone columns via
  * `bloomIndexCols` / `zoneMapCols` comma-lists). */
class GraftSource extends RelationProvider with CreatableRelationProvider
    with StreamSinkProvider with DataSourceRegister {
  override def shortName(): String = "graft"

  /** `writeStream.format("graft")`: each micro-batch upserts into a
    * versioned table through the copy-on-write path (the declarative
    * face of [[graft.streaming.EventStreams.upsertSinkCoW]]) — per-batch
    * write cost is O(files touched by the batch's keys) on a
    * bloom-indexed table, never the snapshot rewrite. Update and Append
    * modes both land as upserts (at-least-once: replays re-put the same
    * key/value pairs, so the sink is value-idempotent provided each
    * batch carries one row per key — dedupe upstream with
    * `dropDuplicates`/`latestPerKey`). Stats refresh is skipped per
    * batch; run a scheduled publish/compaction to re-profile. */
  override def createSink(sqlContext: SQLContext,
                          parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(partitionColumns.isEmpty,
      "graft sink: row-level CoW needs an unpartitioned table")
    val table = tableOf(parameters)
    val keyCol = parameters.getOrElse("keyCol",
      throw new IllegalArgumentException("graft sink: option 'keyCol' required"))
    val keep = parameters.get("keepVersions").map(_.toInt).getOrElse(2)
    new org.apache.spark.sql.execution.streaming.Sink {
      override def addBatch(batchId: Long, data: DataFrame): Unit = {
        val pinned = org.apache.spark.sql.graft.StreamingInternal.asBatch(data)
        pinned.persist()
        try {
          if (!pinned.isEmpty)
            WarehouseFs.upsertRows(pinned, table, keyCol, keep,
              refreshStats = false)
        } finally pinned.unpersist()
      }
      override def toString: String = s"GraftCoWSink($table, key=$keyCol)"
    }
  }

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("table",
      throw new IllegalArgumentException("graft source: option 'table' required"))

  override def createRelation(sqlContext: SQLContext,
                              parameters: Map[String, String]): BaseRelation =
    GraftRelation(sqlContext, tableOf(parameters),
      parameters.get("version").map(_.toLong))

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
                              parameters: Map[String, String],
                              data: DataFrame): BaseRelation = {
    val table = tableOf(parameters)
    def cols(k: String) = parameters.get(k)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    val exists = WarehouseFs.currentVersion(data.sparkSession, table).isDefined
    mode match {
      case SaveMode.ErrorIfExists if exists =>
        throw new IllegalStateException(s"graft source: $table already exists")
      case SaveMode.Ignore if exists => // leave as-is
      case SaveMode.Append if exists =>
        // versions are full snapshots; a silent append-as-overwrite would
        // drop data. Row-level addition is upsertRows/mergeInto territory.
        throw new UnsupportedOperationException(
          "graft source: Append is not a snapshot semantics — publish a " +
            "new version (Overwrite) or use WarehouseFs.upsertRows/mergeInto")
      case _ =>
        WarehouseFs.publishVersioned(data, table,
          partitionBy = cols("partitionBy"),
          keepVersions = parameters.get("keepVersions").map(_.toInt).getOrElse(2),
          collectStats = parameters.get("collectStats").exists(_.toBoolean),
          bloomIndexCols = cols("bloomIndexCols"),
          zoneMapCols = cols("zoneMapCols"))
    }
    GraftRelation(sqlContext, table, None)
  }
}

case class GraftRelation(sqlContext: SQLContext, table: String,
                         version: Option[Long])
    extends BaseRelation with PrunedFilteredScan {
  private def spark = sqlContext.sparkSession

  override val schema: StructType =
    (version match {
      case Some(v) => WarehouseFs.readTableVersion(spark, table, v)
      case None => WarehouseFs.readTable(spark, table)
    }).getOrElse(throw new IllegalArgumentException(
      s"graft source: $table${version.fold("")(v => s"@v$v")} is not a " +
        "committed versioned table")).schema

  /** (point-equality probes, bounded-range probes) extractable from the
    * pushed conjunction — ONLY top-level conjuncts participate (a
    * disjunction can't prune per-branch without union semantics), and
    * unsupported shapes simply don't prune. Public so tests can pin the
    * translation. */
  def indexProbes(filters: Array[Filter])
      : (Map[String, Seq[Any]], Map[String, (Any, Any)]) = {
    val flat = filters.flatMap {
      case And(l, r) => Seq(l, r)
      case f => Seq(f)
    }
    val point = flat.collect {
      case EqualTo(a, v) if v != null => a -> Seq(v)
      case In(a, vs) if vs.nonEmpty && !vs.contains(null) => a -> vs.toSeq
    }.groupBy(_._1)
      // two point conjuncts on one column must BOTH hold → value-set ∩
      .map { case (c, ps) => c -> ps.map(_._2.toSet).reduce(_ intersect _).toSeq }
      .filter(_._2.nonEmpty)
    val los = flat.collect {
      case GreaterThan(a, v) => a -> v
      case GreaterThanOrEqual(a, v) => a -> v
      case EqualTo(a, v) if v != null => a -> v
    }.groupBy(_._1).map { case (c, vs) =>
      val bs = vs.map(_._2).toSeq; c -> bs.max(boundOrdering(bs)) }
    val his = flat.collect {
      case LessThan(a, v) => a -> v
      case LessThanOrEqual(a, v) => a -> v
      case EqualTo(a, v) if v != null => a -> v
    }.groupBy(_._1).map { case (c, vs) =>
      val bs = vs.map(_._2).toSeq; c -> bs.min(boundOrdering(bs)) }
    val ranges = los.keySet.intersect(his.keySet)
      .map(c => c -> ((los(c), his(c)))).toMap
    (point, ranges)
  }

  /** Tightest-bound selection among multiple inequality conjuncts on
    * one column happens in the VALUE's type — numerics numerically
    * (`id > 3 AND id > 25` probes lo = 25, not the lexicographic 3),
    * same-class `Comparable`s (strings, dates, timestamps) natively —
    * with a lexicographic last resort that is still safe: the chosen
    * bound is looser-or-equal and the exact filters re-apply above. */
  private def boundOrdering(vs: Seq[Any]): Ordering[Any] = {
    def num(a: Any): Option[BigDecimal] = a match {
      case n: java.lang.Number =>
        scala.util.Try(BigDecimal(n.toString)).toOption // NaN/Inf → None
      case _ => None
    }
    if (vs.forall(num(_).isDefined)) Ordering.by((a: Any) => num(a).get)
    else if (vs.map(_.getClass).distinct.size == 1 &&
             vs.head.isInstanceOf[Comparable[_]])
      new Ordering[Any] {
        def compare(x: Any, y: Any): Int =
          x.asInstanceOf[Comparable[Any]].compareTo(y)
      }
    else Ordering.by((_: Any).toString)
  }

  /** Best-effort Filter→Column for re-applying pushed predicates inside
    * the pruned read (row-group pushdown + fewer rows over the V1 row
    * boundary); None for shapes we leave to Spark's re-evaluation. */
  private def toColumn(f: Filter): Option[org.apache.spark.sql.Column] = f match {
    case EqualTo(a, v) => Some(col(a) === lit(v))
    case In(a, vs) => Some(col(a).isin(vs.toSeq: _*))
    case GreaterThan(a, v) => Some(col(a) > lit(v))
    case GreaterThanOrEqual(a, v) => Some(col(a) >= lit(v))
    case LessThan(a, v) => Some(col(a) < lit(v))
    case LessThanOrEqual(a, v) => Some(col(a) <= lit(v))
    case IsNull(a) => Some(col(a).isNull)
    case IsNotNull(a) => Some(col(a).isNotNull)
    case And(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc && rc
    case Or(l, r) => for { lc <- toColumn(l); rc <- toColumn(r) } yield lc || rc
    case Not(c) => toColumn(c).map(!_)
    case _ => None
  }

  override def buildScan(requiredColumns: Array[String],
                         filters: Array[Filter]): RDD[Row] = {
    val (point, ranges) = indexProbes(filters)
    val (pruned, _, _) = WarehouseFs
      .prunedScan(spark, table, point, ranges, version)
      .getOrElse(throw new IllegalStateException(
        s"graft source: $table vanished between schema and scan"))
    val filtered = filters.flatMap(toColumn).foldLeft(pruned)(_.filter(_))
    val projected =
      if (requiredColumns.isEmpty)
        // COUNT(*)-style scans: Spark wants bare rows, any column does
        filtered.select(lit(1).as("one")).drop("one")
      else filtered.select(requiredColumns.map(col).toSeq: _*)
    projected.rdd
  }
}
