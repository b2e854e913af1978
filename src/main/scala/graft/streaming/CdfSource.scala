package graft.streaming

import org.apache.spark.sql.{DataFrame, Row, SQLContext}
import org.apache.spark.sql.execution.streaming.{Offset => V1Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSourceProvider}
import org.apache.spark.sql.types.{LongType, StringType, StructType}

import graft.sources.WarehouseFs

/** Structured-Streaming CHANGE-FEED source over a versioned warehouse
  * table: `spark.readStream.format("graft-cdf")` yields the row-level
  * deltas of every new committed version — the streaming face of
  * [[WarehouseFs.changeFeed]], the same surface a transaction-log
  * lakehouse exposes as "read change feed as a stream".
  *
  * Offsets ARE version numbers, so the source needs no log of its own:
  * `getOffset` polls the table's current committed version (one tiny
  * manifest-dir listing — no data I/O), and a micro-batch (v₁, v₂]
  * unions the per-step feeds v→v+1, each stamped `_commit_version`.
  * Per-step (not endpoint-diff) feeds mean a consumer sees every
  * intermediate state exactly as the table's own history recorded it.
  *
  * Scale: each step's feed is ONE key-partitioned full-outer join over
  * only the files NOT shared between the step's two manifests (see
  * [[WarehouseFs.changeFeed]] — carried files are bit-identical and
  * cannot produce feed rows), so a step costs O(files the DML touched),
  * the micro-batch never rescans history, and polling costs metadata
  * only.
  * The table's `keepVersions` must exceed the stream's worst-case lag
  * in versions; a GC'd step fails loudly rather than silently skipping
  * history.
  *
  * Options: `table` (path), `keyCols` (comma-separated), optional
  * `maxVersionsPerTrigger` (catch-up rate limit: a lagging stream
  * drains at most this many versions per micro-batch instead of
  * unioning every pending version's feed into one giant plan; content
  * across the drain is identical — per-step feeds never depended on
  * batch boundaries), optional
  * `startingVersion` (first version whose ARRIVAL the stream reports;
  * default = versions committed after stream start) or
  * `startingTimestamp` (resolved to the earliest retained version
  * committed at or after the instant — [[CdfSource.startingVersionOf]]). A
  * `startingVersion` equal to the table's EARLIEST retained version —
  * typically 1, whose "previous" v₀ never existed — delivers that
  * version's full content as `insert` rows (initial-snapshot
  * semantics) and streams incrementally from there; one below the
  * earliest retained version fails fast at source creation. The
  * resolved starting floor is committed into the checkpoint's metadata
  * dir on first start, so restarts — including a replay of the very
  * first batch — resume against the original floor, not a re-derived
  * one. */
class CdfSourceProvider extends StreamSourceProvider with DataSourceRegister {
  override def shortName(): String = "graft-cdf"

  private def tableOf(parameters: Map[String, String]): String =
    parameters.getOrElse("table",
      throw new IllegalArgumentException("graft-cdf: option 'table' required"))

  // `commitTimestamp=false` restores the pre-`_commit_timestamp` feed
  // schema: adding the column was a BREAKING change for streams
  // restarted from existing checkpoints into schema-enforcing or
  // position-binding sinks — such streams opt out; new streams get the
  // stamp by default
  private def withCommitTs(parameters: Map[String, String]): Boolean =
    !parameters.get("commitTimestamp").exists(_.equalsIgnoreCase("false"))

  override def sourceSchema(sqlContext: SQLContext,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (shortName(), CdfSource.feedSchema(sqlContext, tableOf(parameters),
      withCommitTs(parameters),
      keyless = !parameters.get("keyCols").exists(_.trim.nonEmpty)))

  override def createSource(sqlContext: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source = {
    // keyCols absent/empty → the KEYLESS feed: the stream diffs on the
    // stable `_row_id` (row tracking required — [[CdfSource]] validates
    // at construction) and the output carries the id column
    val keyCols = parameters.get("keyCols")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Nil)
    val maxVersions = parameters.get("maxVersionsPerTrigger").map { s =>
      val n = s.trim.toLongOption.getOrElse(throw new IllegalArgumentException(
        s"graft-cdf: maxVersionsPerTrigger must be a positive integer, got '$s'"))
      require(n >= 1L,
        s"graft-cdf: maxVersionsPerTrigger must be ≥ 1, got $n")
      n
    }
    new CdfSource(sqlContext, tableOf(parameters), keyCols,
      CdfSource.startingVersionOf(sqlContext, tableOf(parameters), parameters),
      Some(metadataPath), maxVersions,
      commitTs = withCommitTs(parameters))
  }
}

object CdfSource {
  /** Base table columns + the feed columns (`_commit_timestamp` gated
    * by the `commitTimestamp` source option — see the provider note).
    * A KEYLESS stream additionally carries `_row_id` — the stable
    * identity its consumers apply changes by. */
  def feedSchema(sqlContext: SQLContext, table: String,
                 commitTs: Boolean = true,
                 keyless: Boolean = false): StructType = {
    val data = WarehouseFs.readTable(sqlContext.sparkSession, table).getOrElse(
      throw new IllegalArgumentException(
        s"graft-cdf: $table is not a versioned table")).schema
    val base = (if (keyless) data.add("_row_id", LongType, nullable = true)
                else data)
      .add("_change_type", StringType, nullable = false)
      .add("_commit_version", LongType, nullable = false)
    if (!commitTs) base
    else base.add("_commit_timestamp",
      org.apache.spark.sql.types.TimestampType, nullable = false)
  }

  /** Accepted `startingTimestamp` spellings → epoch millis: raw epoch
    * millis, ISO-8601 with an offset/`Z` (`2021-03-01T00:00:00Z`, exact
    * instant), ISO-8601 `T` without a zone and the legacy space form
    * (`2021-03-01[T ]00:00:00[.f]`, the JVM's zone), and date-only
    * (`2021-03-01`, local midnight). Anything else fails with a message
    * naming the option and these forms — not a raw parse stack. */
  def parseInstantMillis(s0: String): Long = {
    val s = s0.trim
    def attempt[A](f: => A): Option[A] =
      try Some(f) catch { case _: RuntimeException => None }
    s.toLongOption
      .orElse(attempt(java.time.Instant.parse(s).toEpochMilli))
      .orElse(attempt(java.time.LocalDateTime.parse(s.replace(' ', 'T'))
        .atZone(java.time.ZoneId.systemDefault()).toInstant.toEpochMilli))
      .orElse(attempt(java.time.LocalDate.parse(s)
        .atStartOfDay(java.time.ZoneId.systemDefault()).toInstant.toEpochMilli))
      .orElse(attempt(java.sql.Timestamp.valueOf(s).getTime))
      .getOrElse(throw new IllegalArgumentException(
        s"graft-cdf: cannot parse option startingTimestamp '$s0' — accepted " +
          "forms: epoch millis, 'yyyy-MM-dd', 'yyyy-MM-dd HH:mm:ss[.f]', " +
          "ISO-8601 with 'T' (optionally zoned, e.g. 2021-03-01T00:00:00Z)"))
  }

  /** Resolve the starting-point options: `startingVersion` verbatim, or
    * `startingTimestamp` ([[parseInstantMillis]] spellings) as the
    * EARLIEST retained version committed at or
    * after the instant — commit instants come from the manifest bodies
    * ([[WarehouseFs.describeHistory]]), so a store migration cannot
    * shift the resolution. A timestamp past the latest retained commit
    * refuses loudly (asking to start "after the end" is almost always a
    * mis-typed instant, not a request for an empty stream); so does
    * passing both options. Restarts never re-resolve — the committed
    * floor in the checkpoint wins ([[CdfSource]]). */
  def startingVersionOf(sqlContext: SQLContext, table: String,
                        parameters: Map[String, String]): Option[Long] = {
    val sv = parameters.get("startingVersion")
    val st = parameters.get("startingTimestamp")
    require(sv.isEmpty || st.isEmpty,
      "graft-cdf: startingVersion and startingTimestamp are mutually exclusive")
    sv.map(_.toLong).orElse(st.map { s =>
      val tsMillis = parseInstantMillis(s)
      val hist = WarehouseFs.describeHistory(sqlContext.sparkSession, table)
      hist.find(_._2.getTime >= tsMillis).map(_._1).getOrElse(
        throw new IllegalArgumentException(
          s"graft-cdf: no retained commit of $table at or after " +
            s"startingTimestamp $s (retained commits: " +
            s"${hist.map(h => s"v${h._1}@${h._2}").mkString(", ")})"))
    })
  }
}

/** Makes `spark.readStream.table("graft.t")` (and
  * `readStream.format(…).table`) work: the analyzer resolves a
  * streaming read of a graft catalog table to a [[StreamingRelationV2]]
  * that declares no streaming capability; this rule rewrites it onto
  * the registered v1 `graft-cdf` source — streaming a graft table IS
  * streaming its change feed (base columns + `_change_type` +
  * `_commit_version`, the lakehouse-CDF convention). Key columns come
  * from a reader option (`.option("keyCols", …)`) or the table's
  * stored `keyCols` property; `startingVersion` passes through.
  * Offsets (= versions), restart floor, initial-snapshot and retention
  * semantics are exactly the v1 source's ([[CdfSource]] — the offset
  * model needs no adaptation, which is why the v1 fallback is the
  * honest lowering: a DSv2 `MicroBatchStream` would have to stage each
  * batch's join result to give executors something to read).
  * Installed by [[graft.plans.GraftExtensions]]. */
class GraftStreamTableRule(spark: org.apache.spark.sql.SparkSession)
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
  import org.apache.spark.sql.catalyst.streaming.StreamingRelationV2
  import org.apache.spark.sql.execution.datasources.DataSource
  import org.apache.spark.sql.execution.streaming.runtime.StreamingRelation
  import org.apache.spark.sql.util.CaseInsensitiveStringMap
  import graft.sources.GraftCatalogTable

  private def lower(name: String, path: String, pinned: Option[Long],
                    props: Map[String, String],
                    options: CaseInsensitiveStringMap): LogicalPlan = {
    if (pinned.isDefined)
      throw new UnsupportedOperationException(
        s"graft-cdf: $name is a time-travel read — a stream follows the " +
          "live version chain")
    // keyed when declared; KEYLESS (row-id) when the table is tracked;
    // otherwise refuse naming both enabling steps
    val keyCols = Option(options.get("keyCols")).filter(_.nonEmpty)
      .orElse(props.collectFirst {
        case (k, v) if k.equalsIgnoreCase("keyCols") => v })
      .getOrElse {
        if (graft.sources.WarehouseFs.isRowTracked(spark, path)) ""
        else throw new IllegalArgumentException(
          s"graft-cdf: streaming $name needs either key columns — " +
            "TBLPROPERTIES('keyCols'='…') or .option(\"keyCols\", …) — " +
            "or row tracking (TBLPROPERTIES('rowTracking'='true'), " +
            "stable ids backfill at the next commit) for the keyless " +
            "_row_id feed")
      }
    // readStream.table defaults the catch-up rate limit (the raw source
    // spelling stays unbounded unless asked — its callers pass the
    // option explicitly): a lagging stream must drain in bounded
    // batches, not one plan unioning every pending version's feed
    val opts = Map("table" -> path, "keyCols" -> keyCols,
      "maxVersionsPerTrigger" ->
        Option(options.get("maxVersionsPerTrigger"))
          .getOrElse(GraftStreamTableRule.DefaultMaxVersionsPerTrigger)) ++
      Option(options.get("startingVersion")).map("startingVersion" -> _) ++
      Option(options.get("startingTimestamp")).map("startingTimestamp" -> _)
    StreamingRelation(DataSource(spark, className = "graft-cdf",
      options = opts))
  }

  // NOTE: only the CATALOG spelling reaches the analyzer as a
  // StreamingRelationV2 — `readStream.format("graft")` dies in Spark's
  // own V1 DataSource resolution before any rule can act; the
  // path-table spelling is `readStream.format("graft-cdf")
  // .option("table", path)`, which is the source itself.
  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case StreamingRelationV2(_, _, t: GraftCatalogTable, options, _, _, _, _) =>
      lower(t.name(), t.path, t.pinned, t.props, options)
  }
}

object GraftStreamTableRule {
  /** Default catch-up bound for `readStream.table("graft.t")`: 128
    * versions per micro-batch — a plan of ≤128 per-step feed relations
    * stays well under driver plan-size trouble while a lagging stream
    * still drains quickly (128 commits/batch ≫ any sane commit rate).
    * Override with `.option("maxVersionsPerTrigger", n)`. */
  val DefaultMaxVersionsPerTrigger: String = "128"
}

class CdfSource(sqlContext: SQLContext, table: String, keyCols: Seq[String],
                startingVersion: Option[Long],
                metadataPath: Option[String] = None,
                maxVersionsPerTrigger: Option[Long] = None,
                commitTs: Boolean = true) extends Source {
  private val spark = sqlContext.sparkSession

  // keyless mode diffs on the stable row id — validate the enabling
  // step at construction, not at the first micro-batch
  if (keyCols.isEmpty)
    require(WarehouseFs.isRowTracked(spark, table),
      s"graft-cdf: $table has no key columns and is not row-tracked — " +
        "set TBLPROPERTIES('rowTracking'='true') (the next commit " +
        "backfills stable ids) or pass .option(\"keyCols\", …)")

  override val schema: StructType =
    CdfSource.feedSchema(sqlContext, table, commitTs,
      keyless = keyCols.isEmpty)

  /** Highest version already "seen" before the stream begins (changes
    * OF version v are reported once v commits, so the floor is v−1 of
    * the first reported version), PLUS whether the floor step is an
    * initial SNAPSHOT (the floor version itself is not retained — its
    * "previous" state cannot be diffed) or an incremental delta.
    *
    * Both persist under the stream's own `metadataPath` (inside the
    * checkpoint, tmp→rename committed), so a RESTARTED query replays
    * its first batch against the ORIGINAL floor AND the ORIGINAL step
    * kind — the same pattern FileStreamSource uses for its seen-files
    * log. A persisted record always wins over the options (checkpoint
    * semantics: the stream's identity is fixed at first start), and on
    * restart no retention re-validation runs — a healthy long-running
    * stream must not fail at createSource just because its
    * startingVersion has since been GC'd (it already consumed it). */
  private val (floor: Long, floorIsSnapshot: Option[Boolean]) = {
    // fresh-start derivation — the ONLY place options are consulted and
    // retention is validated
    def computed(): (Long, Option[Boolean]) = startingVersion match {
      case Some(sv) =>
        require(sv >= 1L, s"graft-cdf: startingVersion must be ≥ 1 (got $sv)")
        val retained = WarehouseFs.listVersions(spark, table)
        require(retained.isEmpty || sv >= retained.min,
          s"graft-cdf: startingVersion $sv predates the earliest retained " +
            s"version ${retained.min} of $table — its history is GC'd; start " +
            s"at ${retained.min} (delivered as an initial snapshot) or later")
        // snapshot iff the floor version (sv−1) is not a retained state
        // to diff against (typically sv = earliest retained, floor = v₀)
        (sv - 1L, Some(!retained.contains(sv - 1L)))
      case None =>
        (WarehouseFs.currentVersion(spark, table).map(_._1).getOrElse(0L),
          Some(false))
    }
    def parse(s: String): (Long, Option[Boolean]) = {
      val lines = s.trim.split('\n')
      // legacy single-line records (pre snapshot-flag) carry no kind:
      // None preserves their original best-effort fallback semantics
      (lines(0).trim.toLong,
        lines.drop(1).headOption.map(_.trim == "snapshot"))
    }
    def render(v: (Long, Option[Boolean])): String =
      s"${v._1}\n${if (v._2.contains(true)) "snapshot" else "delta"}"
    metadataPath match {
      case None => computed()
      case Some(mp) =>
        val conf = spark.sessionState.newHadoopConf()
        val dir = new org.apache.hadoop.fs.Path(mp)
        val fs = dir.getFileSystem(conf)
        val f = new org.apache.hadoop.fs.Path(dir, "cdf-floor")
        def readExisting(): (Long, Option[Boolean]) = {
          val in = fs.open(f)
          try parse(new String(
            org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8"))
          finally in.close()
        }
        if (fs.exists(f)) readExisting() // restart: no re-validation
        else {
          val v = computed()
          fs.mkdirs(dir)
          val tmp = new org.apache.hadoop.fs.Path(dir, ".cdf-floor.tmp")
          val out = fs.create(tmp, true)
          try out.write(render(v).getBytes("UTF-8")) finally out.close()
          if (!fs.rename(tmp, f)) readExisting() // benign race: winner rules
          else v
        }
    }
  }

  /** Highest version the engine has asked this source to serve — the
    * rate-limit base. Advanced ONLY by [[getBatch]]: on restart the
    * engine replays/initializes with a getBatch of the recovered range
    * before the next getOffset (the documented v1 contract KafkaSource's
    * own rate limit relies on), so the base can never regress below a
    * committed offset and re-deliver versions. */
  private var servedThrough: Long = floor

  /** Offsets ARE versions, so rate limiting is one `min`: cap the
    * reported offset at `maxVersionsPerTrigger` past the last served
    * version. Without a cap, a stream restarted after a long lag
    * against a high-churn table would union EVERY pending version's
    * feed into one micro-batch — a plan of hundreds of relations and a
    * giant first batch. With it, catch-up drains in bounded batches;
    * content is identical because per-step feeds never depended on the
    * batch boundary. */
  override def getOffset: Option[V1Offset] = {
    val cur = WarehouseFs.currentVersion(spark, table).map(_._1).getOrElse(0L)
    val capped = maxVersionsPerTrigger.fold(cur)(m =>
      math.min(cur, servedThrough + m))
    if (capped > servedThrough) Some(LongOffset(capped)) else None
  }

  private def versionOf(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json().toLong
  }

  override def getBatch(start: Option[V1Offset], end: V1Offset): DataFrame = {
    val to = versionOf(end)
    val from = start.map(versionOf).getOrElse(floor)
    servedThrough = math.max(servedThrough, to)
    val ordered = schema.fieldNames.toSeq
    val steps = (from until to).map { v =>
      // Initial-snapshot semantics (the lakehouse-CDF convention): when
      // the stream's FIRST step starts below retention — `startingVersion`
      // = the table's earliest version, whose "previous" v₀ never
      // existed — deliver that version's full content as inserts instead
      // of failing on a diff against a version that cannot exist. The
      // step KIND was fixed at first start and rides in the checkpoint
      // (`floorIsSnapshot`): a REPLAY of a floor step that was originally
      // a delta must never silently substitute a snapshot (duplicate
      // inserts for a consumer that already processed the delta) — if
      // its history is GC'd by replay time it fails loudly like any
      // mid-stream step. Legacy checkpoints without the kind record keep
      // the old best-effort fallback.
      val snapshotHere = v == floor && floorIsSnapshot.getOrElse(true)
      val feed = WarehouseFs.changeFeed(spark, table, keyCols, v, v + 1)
        .orElse {
          if (snapshotHere)
            // keyless snapshots carry the ids — the consumer's replica
            // seeds under the same identities the deltas will key on
            (if (keyCols.isEmpty)
              WarehouseFs.readWithRowId(spark, table, Some(v + 1))
             else WarehouseFs.readTableVersion(spark, table, v + 1))
              .map(_.withColumn("_change_type", lit("insert")))
          else None
        }
        .getOrElse(throw new IllegalStateException(
          s"graft-cdf: step $v→${v + 1} of $table is no longer retained " +
            s"(retained versions: ${WarehouseFs.listVersions(spark, table)
              .mkString(", ")}) — keepVersions must exceed the stream's lag, " +
            "and startingVersion must be a retained version"))
      // batch-TVF parity: the manifest commit instant rides along, so a
      // stream consumer can join against time-bounded audits without
      // re-resolving versions by hand
      val versioned = feed.withColumn("_commit_version", lit(v + 1L))
      val stamped =
        if (!commitTs) versioned
        else {
          val instantMs = WarehouseFs.commitInstant(spark, table, v + 1)
            .getOrElse(throw new IllegalStateException(
              s"graft-cdf: version ${v + 1} of $table vanished mid-batch"))
          versioned.withColumn("_commit_timestamp",
            lit(new java.sql.Timestamp(instantMs)))
        }
      stamped.select(ordered.map(col): _*)
    }
    org.apache.spark.sql.graft.StreamingInternal.asStreaming(
      steps.reduceOption(_.unionByName(_)).getOrElse(
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)))
  }

  override def stop(): Unit = ()
}
