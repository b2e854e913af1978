package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Alias
import org.apache.spark.sql.catalyst.plans.logical.{DeleteFromTable, LogicalPlan, MergeIntoTable, Project, UpdateTable, V2WriteCommand}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.sources.{GraftCatalogTable, GraftTable, WarehouseFs}

/** Deletion-vector reconciliation for the DSv2 read path.
  *
  * The `graft` DSv2 scan hands the pruned file set straight to Spark's
  * vectorized parquet scan — which cannot apply a (file, row-position)
  * mask. For the (transient, OPTIMIZE-bounded) window where a version
  * carries deletion vectors, this resolution rule swaps the relation
  * for the API read's masked plan ([[WarehouseFs.readTable]] /
  * `readTableVersion`, which anti-join each masked file's positions
  * away), re-anchored under the relation's own attribute ids so every
  * reference above keeps resolving. Versions without vectors — the
  * steady state — never match, and the DSv2 scan keeps its index
  * pruning, committed stats, and aggregate pushdown untouched.
  *
  * The trade is honest: a DV'd version's SQL scan loses bloom/zone FILE
  * pruning (filters still push into parquet row groups through the V1
  * file relation) until `OPTIMIZE` folds the masks into a clean
  * rewrite — the same maintenance cadence that bounds the mask chain
  * itself. Never rewrites a WRITE/DML target relation: those statements
  * are claimed whole by [[GraftDmlRule]] / the write builders, and the
  * DML verbs do their own masked reads. */
class GraftDvReadRule(spark: SparkSession) extends Rule[LogicalPlan] {

  private def graftTarget(plan: LogicalPlan): Option[(String, Option[Long])] =
    plan match {
      case r: DataSourceV2Relation => r.table match {
        case t: GraftCatalogTable => Some((t.path, t.pinned))
        case t: GraftTable => Some((t.tablePath, t.pinnedVersion))
        case _ => None
      }
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // relations in WRITE position stay: the DML/write machinery owns them
    val writeTargets = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[LogicalPlan, java.lang.Boolean]())
    plan.foreach {
      case c: V2WriteCommand => c.table.foreach(writeTargets.add)
      case d: DeleteFromTable => d.table.foreach(writeTargets.add)
      case u: UpdateTable => u.table.foreach(writeTargets.add)
      case m: MergeIntoTable => m.targetTable.foreach(writeTargets.add)
      case _ =>
    }
    plan.resolveOperators {
      case r: DataSourceV2Relation if !writeTargets.contains(r) &&
          graftTarget(r).exists { case (path, pinned) =>
            WarehouseFs.hasDeletionVectors(spark, path, pinned) } =>
        val (path, pinned) = graftTarget(r).get
        val masked = pinned match {
          case Some(v) => WarehouseFs.readTableVersion(spark, path, v).get
          case None => WarehouseFs.readTable(spark, path).get
        }
        val analyzed = masked.queryExecution.analyzed
        // graft the masked plan under the relation's own attribute ids
        Project(r.output.map { a =>
          val src = analyzed.output.find(_.name == a.name).getOrElse(
            throw new IllegalStateException(
              s"graft DV read: masked read of $path lacks column ${a.name}"))
          Alias(src, a.name)(exprId = a.exprId)
        }, analyzed)
    }
  }
}
