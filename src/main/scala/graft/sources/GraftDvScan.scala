package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.connector.metric.{CustomMetric, CustomTaskMetric}
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.PartitionedFile
import org.apache.spark.sql.execution.vectorized.{OnHeapColumnVector, WritableColumnVector}
import org.apache.spark.sql.types._
import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

/** Deletion-vector masking INSIDE the DSv2 scan.
  *
  * A version carrying a merge-on-read mask used to surrender the whole
  * DSv2 fast path to a V1 anti-join plan (bloom/zone file pruning,
  * committed statistics and aggregate pushdown all lost for the MoR
  * window). This wrapper keeps the pruned, columnar parquet scan and
  * applies the (file, row-position) mask per task instead — the
  * Delta/Iceberg position-delete posture, built from two public Spark
  * mechanisms:
  *
  *   - the parquet readers materialize TRUE file row indexes (row-group
  *     and page skipping accounted for) when the read schema carries the
  *     `ParquetFileFormat.ROW_INDEX_TEMPORARY_COLUMN_NAME` long column —
  *     the same mechanism `_metadata.row_index` rides on (the builder
  *     appends it to the delegate's data schema);
  *   - the delegate's partition GROUPING is preserved exactly: a
  *     partition containing any masked split becomes a
  *     [[GraftDvMaskedPartition]] carrying per-split position arrays
  *     aligned with its files (a file's row indexes are file-global, so
  *     every split of a masked file shares its array by reference), and
  *     the reader factory chains one wrapped reader per split — the
  *     same per-split reader opens the delegate itself performs. A
  *     large masked file keeps its split parallelism; a task never
  *     ships another partition's mask; the row-index → position
  *     membership test is one binary search per row.
  *
  * Partitions with no masked split pay only a zero-copy column strip;
  * batches that lose rows take a selective copy into fresh on-heap
  * vectors (atomic types — a table with nested columns falls back to
  * row-based reads for the MoR window, still masked, still
  * file-pruned). Values are exactly the V1 masked read's: the mask
  * entries and the row indexes both derive from parquet row positions
  * of immutable files. */
case class GraftDvScan(delegate: Scan, fullSchema: StructType, idxPos: Int,
                       maskByFile: Map[String, Array[Long]]) extends Scan {

  private val outSchema = StructType(fullSchema.fields.patch(idxPos, Nil, 1))

  override def readSchema(): StructType = outSchema
  override def description(): String =
    s"graft-dv(maskedFiles=${maskByFile.size}, ${delegate.description()})"
  override def supportedCustomMetrics(): Array[CustomMetric] =
    delegate.supportedCustomMetrics()
  override def reportDriverMetrics(): Array[CustomTaskMetric] =
    delegate.reportDriverMetrics()

  // a nested-typed column cannot take the selective columnar copy: force
  // the row path for the (OPTIMIZE-bounded) MoR window — still masked,
  // still file-pruned, only columnar exec lost, and only for such tables
  override def columnarSupportMode(): Scan.ColumnarSupportMode =
    if (outSchema.fields.forall(f => GraftDvScan.copyable(f.dataType)))
      delegate.columnarSupportMode()
    else Scan.ColumnarSupportMode.UNSUPPORTED

  override def toBatch: Batch =
    new GraftDvBatch(delegate.toBatch, fullSchema, idxPos, maskByFile)
}

/** One delegate [[FilePartition]] whose files include at least one
  * masked split: `masks(i)` is the sorted masked-position array of
  * `delegate.files(i)`'s file (null for a clean split). The mask ships
  * with the task — never broadcast — and the delegate's grouping (and
  * with it split parallelism over large masked files) is untouched. */
case class GraftDvMaskedPartition(delegate: FilePartition,
                                  masks: Array[Array[Long]])
    extends InputPartition {
  override def preferredLocations(): Array[String] =
    delegate.preferredLocations()
}

/** Shared path arithmetic for scan-side file matching: recover a
  * planned [[PartitionedFile]]'s URI-spelled root-relative path by the
  * same first-occurrence version-dir surgery the deletion-vector
  * entries (and [[graft.sources.WarehouseFs.relUriSpelling]]) use. */
private[graft] object GraftScanPaths {
  def relOf(pf: PartitionedFile, dirs: Set[String]): Option[String] = {
    val p = pf.filePath.urlEncoded
    dirs.iterator.flatMap { d =>
      val m = s"/$d/"
      val i = p.indexOf(m)
      if (i < 0) None else Some(d + "/" + p.substring(i + m.length))
    }.nextOption()
  }
}

/** The runtime-filtered batch behind [[SupportsRuntimeV2Filtering]]:
  * keeps only planned files in `survivors` (URI-spelled root-relative
  * set from the index re-probe with the JOIN-side values). A file whose
  * rel path cannot be recovered is KEPT — runtime pruning is strictly a
  * file-skip optimization and must never lose rows. */
private[graft] class GraftRuntimeFilteredBatch(inner: Batch,
                                               survivors: Set[String],
                                               allDirs: Set[String],
                                               onPlanned: (Int, Int) => Unit = null)
    extends Batch {
  private def keep(pf: PartitionedFile): Boolean =
    GraftScanPaths.relOf(pf, allDirs).forall(survivors.contains)

  private lazy val partitions: Array[InputPartition] = {
    val raw = inner.planInputPartitions()
    rawCount = raw.length
    raw.flatMap {
      case g: GraftDvMaskedPartition =>
        val keptIdx =
          g.delegate.files.indices.filter(i => keep(g.delegate.files(i)))
        if (keptIdx.isEmpty) None
        else if (keptIdx.length == g.delegate.files.length) Some(g)
        else Some(GraftDvMaskedPartition(
          FilePartition(g.delegate.index,
            keptIdx.map(g.delegate.files).toArray),
          keptIdx.map(g.masks).toArray))
      case fp: FilePartition =>
        val kept = fp.files.filter(keep)
        if (kept.isEmpty) None
        else if (kept.length == fp.files.length) Some(fp)
        else Some(FilePartition(fp.index, kept))
      case other => Some(other) // unknown shape: never prune blindly
    }
  }

  /** (kept, planned) partition counts — reported to `onPlanned` the
    * first time Spark plans this batch, so the evidence derives from
    * the ONE planning pass instead of a second driver-side re-plan. */
  private lazy val evidence: Unit =
    if (onPlanned != null) onPlanned(partitions.length, rawCount)
  @volatile private var rawCount: Int = 0

  override def planInputPartitions(): Array[InputPartition] = {
    partitions; evidence; partitions
  }
  override def createReaderFactory(): PartitionReaderFactory =
    inner.createReaderFactory()
}

class GraftDvBatch(inner: Batch, fullSchema: StructType, idxPos: Int,
                   maskByFile: Map[String, Array[Long]]) extends Batch {

  private def relOf(pf: PartitionedFile, dirs: Set[String]): Option[String] =
    GraftScanPaths.relOf(pf, dirs)

  private lazy val partitions: Array[InputPartition] = {
    val raw = inner.planInputPartitions()
    if (maskByFile.isEmpty) raw
    else {
      val dirs = maskByFile.keysIterator.map(_.takeWhile(_ != '/')).toSet
      raw.map {
        case fp: FilePartition =>
          val masks = fp.files.map(f =>
            relOf(f, dirs).flatMap(maskByFile.get).orNull)
          if (masks.forall(_ == null)) fp: InputPartition
          else GraftDvMaskedPartition(fp, masks): InputPartition
        case other => throw new IllegalStateException(
          "graft DV scan: expected FilePartitions under a masked version, " +
            s"got ${other.getClass.getName}")
      }
    }
  }

  override def planInputPartitions(): Array[InputPartition] = partitions

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftDvReaderFactory(inner.createReaderFactory(), fullSchema, idxPos)
}

class GraftDvReaderFactory(inner: PartitionReaderFactory,
                           fullSchema: StructType, idxPos: Int)
    extends PartitionReaderFactory {

  private def unwrap(p: InputPartition): InputPartition = p match {
    case g: GraftDvMaskedPartition => g.delegate
    case other => other
  }

  private def singleSplit(g: GraftDvMaskedPartition, i: Int): FilePartition =
    FilePartition(g.delegate.index, Array(g.delegate.files(i)))

  override def supportColumnarReads(p: InputPartition): Boolean =
    inner.supportColumnarReads(unwrap(p))

  // a masked partition chains one wrapped reader per split, each with
  // its OWN file's mask — the same per-split reader opens the
  // delegate's FilePartitionReader performs internally, so file row
  // indexes never collide across files sharing one partition. Clean
  // partitions take a single wrapper that only strips the row-index
  // column (mask = null).
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    p match {
      case g: GraftDvMaskedPartition =>
        new GraftDvChainedReader[InternalRow](g.delegate.files.length, i =>
          new GraftDvRowReader(inner.createReader(singleSplit(g, i)),
            g.masks(i), fullSchema, idxPos))
      case other =>
        new GraftDvRowReader(inner.createReader(other), null,
          fullSchema, idxPos)
    }

  override def createColumnarReader(p: InputPartition)
      : PartitionReader[ColumnarBatch] =
    p match {
      case g: GraftDvMaskedPartition =>
        new GraftDvChainedReader[ColumnarBatch](g.delegate.files.length, i =>
          new GraftDvColumnarReader(
            inner.createColumnarReader(singleSplit(g, i)),
            g.masks(i), fullSchema, idxPos))
      case other =>
        new GraftDvColumnarReader(inner.createColumnarReader(other), null,
          fullSchema, idxPos)
    }
}

/** Sequential chain of per-split readers over one masked partition.
  * Metrics accumulate across finished splits so the scan's custom
  * metrics match a single-reader partition's. */
private[graft] class GraftDvChainedReader[T](n: Int,
    mk: Int => PartitionReader[T]) extends PartitionReader[T] {

  private var i = 0
  private var cur: PartitionReader[T] = if (n > 0) mk(0) else null
  private val finished =
    scala.collection.mutable.ArrayBuffer.empty[Array[CustomTaskMetric]]

  override def next(): Boolean = {
    while (cur != null) {
      if (cur.next()) return true
      finished += cur.currentMetricsValues()
      cur.close()
      i += 1
      cur = if (i < n) mk(i) else null
    }
    false
  }
  override def get(): T = cur.get()
  override def close(): Unit =
    if (cur != null) { cur.close(); cur = null }
  override def currentMetricsValues(): Array[CustomTaskMetric] = {
    val live =
      if (cur != null) cur.currentMetricsValues() else Array.empty[CustomTaskMetric]
    if (finished.isEmpty) live
    else (finished.flatten ++ live).groupBy(_.name()).map { case (nm, ms) =>
      val total = ms.map(_.value()).sum
      new CustomTaskMetric {
        override def name(): String = nm
        override def value(): Long = total
      }: CustomTaskMetric
    }.toArray
  }
}

/** Row-path wrapper: drop masked rows (binary search per row on the
  * file's sorted positions), project away the row-index column. */
private[graft] class GraftDvRowReader(
    inner: PartitionReader[InternalRow], mask: Array[Long],
    fullSchema: StructType, idxPos: Int)
    extends PartitionReader[InternalRow] {

  private val proj = UnsafeProjection.create(
    fullSchema.indices.filterNot(_ == idxPos).map(i =>
      BoundReference(i, fullSchema(i).dataType, fullSchema(i).nullable)))
  private var cur: InternalRow = _

  override def next(): Boolean = {
    while (inner.next()) {
      val r = inner.get()
      if (mask == null ||
          java.util.Arrays.binarySearch(mask, r.getLong(idxPos)) < 0) {
        cur = proj(r)
        return true
      }
    }
    false
  }
  override def get(): InternalRow = cur
  override def close(): Unit = inner.close()
  override def currentMetricsValues(): Array[CustomTaskMetric] =
    inner.currentMetricsValues()
}

/** Columnar-path wrapper. Unmasked batches (every clean file, and a
  * masked file's batches that happen to contain no masked row) pass
  * through as a zero-copy column subset; batches that lose rows take a
  * selective copy into fresh on-heap vectors sized to the survivors. */
private[graft] class GraftDvColumnarReader(
    inner: PartitionReader[ColumnarBatch], mask: Array[Long],
    fullSchema: StructType, idxPos: Int)
    extends PartitionReader[ColumnarBatch] {

  private val outSchema = StructType(fullSchema.fields.patch(idxPos, Nil, 1))
  private var allocated: ColumnarBatch = null
  private var cur: ColumnarBatch = null

  override def next(): Boolean = {
    val has = inner.next()
    if (has) cur = transform(inner.get())
    has
  }
  override def get(): ColumnarBatch = cur

  private def transform(b: ColumnarBatch): ColumnarBatch = {
    val n = b.numRows()
    var survivors: Array[Int] = null
    if (mask != null && n > 0) {
      val idxVec = b.column(idxPos)
      // row indexes ascend within a batch: a sparse mask misses most
      // batches entirely, and the [first, last] window check skips the
      // per-row search for all of them
      val lo = idxVec.getLong(0)
      val hi = idxVec.getLong(n - 1)
      val overlaps = lo <= mask(mask.length - 1) && hi >= mask(0) && {
        val p = java.util.Arrays.binarySearch(mask, lo)
        val from = if (p >= 0) p else -(p + 1)
        from < mask.length && mask(from) <= hi
      }
      if (overlaps) {
        val keep = new Array[Int](n)
        var k = 0
        var i = 0
        while (i < n) {
          if (java.util.Arrays.binarySearch(mask, idxVec.getLong(i)) < 0) {
            keep(k) = i; k += 1
          }
          i += 1
        }
        if (k < n) survivors = java.util.Arrays.copyOf(keep, k)
      }
    }
    if (survivors == null) {
      // zero-copy strip of the row-index column
      val cols = Array.tabulate[ColumnVector](b.numCols() - 1)(j =>
        b.column(if (j < idxPos) j else j + 1))
      new ColumnarBatch(cols, n)
    } else {
      closeAllocated()
      val vecs = OnHeapColumnVector.allocateColumns(
        math.max(1, survivors.length), outSchema)
      var j = 0
      var src = 0
      while (src < b.numCols()) {
        if (src != idxPos) {
          GraftDvScan.copyRows(b.column(src), outSchema(j).dataType,
            survivors, vecs(j))
          j += 1
        }
        src += 1
      }
      allocated =
        new ColumnarBatch(vecs.map(v => v: ColumnVector), survivors.length)
      allocated
    }
  }

  private def closeAllocated(): Unit =
    if (allocated != null) { allocated.close(); allocated = null }

  override def close(): Unit = { closeAllocated(); inner.close() }
  override def currentMetricsValues(): Array[CustomTaskMetric] =
    inner.currentMetricsValues()
}

object GraftDvScan {

  /** Types the selective columnar copy handles — the full set the
    * vectorized parquet reader produces for FLAT schemas. */
  private[graft] def copyable(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | ShortType | IntegerType | DateType |
         LongType | TimestampType | TimestampNTZType | FloatType |
         DoubleType | StringType | BinaryType => true
    case _: DecimalType => true
    case _: YearMonthIntervalType => true
    case _: DayTimeIntervalType => true
    case _ => false
  }

  /** Copy `sel`'s rows of `src` into `dst` (pre-sized), by type. */
  private[graft] def copyRows(src: ColumnVector, dt: DataType,
                              sel: Array[Int],
                              dst: WritableColumnVector): Unit = {
    val n = sel.length
    var i = 0
    def nullOr(put: Int => Unit): Unit = {
      while (i < n) {
        if (src.isNullAt(sel(i))) dst.putNull(i) else put(sel(i))
        i += 1
      }
    }
    dt match {
      case BooleanType => nullOr(s => dst.putBoolean(i, src.getBoolean(s)))
      case ByteType => nullOr(s => dst.putByte(i, src.getByte(s)))
      case ShortType => nullOr(s => dst.putShort(i, src.getShort(s)))
      case IntegerType | DateType | _: YearMonthIntervalType =>
        nullOr(s => dst.putInt(i, src.getInt(s)))
      case LongType | TimestampType | TimestampNTZType |
           _: DayTimeIntervalType =>
        nullOr(s => dst.putLong(i, src.getLong(s)))
      case FloatType => nullOr(s => dst.putFloat(i, src.getFloat(s)))
      case DoubleType => nullOr(s => dst.putDouble(i, src.getDouble(s)))
      case d: DecimalType =>
        nullOr(s => dst.putDecimal(i, src.getDecimal(s, d.precision, d.scale),
          d.precision))
      case StringType => nullOr { s =>
        val bytes = src.getUTF8String(s).getBytes
        dst.putByteArray(i, bytes, 0, bytes.length); ()
      }
      case BinaryType => nullOr { s =>
        val bytes = src.getBinary(s)
        dst.putByteArray(i, bytes, 0, bytes.length); ()
      }
      case other => throw new IllegalStateException(
        s"graft DV scan: unexpected columnar type $other")
    }
  }
}
