package graft

import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.functions._

import graft.sources.WarehouseFs

/** The manifest-commit CAS primitive itself — the layer BELOW the
  * optimistic-concurrency arbitration. `casTestHook` fires a competitor
  * before the loser's first exists-check, so those specs never enter
  * the exists-check → publish window; `casWindowHook` fires INSIDE it,
  * proving the primitive (hard link on file://, conditional PUT on a
  * guard-equipped object store) arbitrates where a naive exists+rename
  * pair would let both racers report success and the second silently
  * replace the winner's manifest (POSIX rename semantics). */
class CommitPrimitiveSpec extends SparkSpec {
  import spark.implicits._

  private def tmpTable() =
    s"${java.nio.file.Files.createTempDirectory("graft_cas_")}/t"

  private def localFs: FileSystem =
    new Path("/tmp").getFileSystem(spark.sessionState.newHadoopConf())

  private def publishFixture(t: String): Unit =
    WarehouseFs.publishVersioned(
      spark.range(8000)
        .select(col("id"), concat(lit("u"), col("id")).as("user"),
          (col("id") % 7).as("grp")),
      t, keepVersions = 8, bloomIndexCols = Seq("id"))

  private def state(t: String): Map[Long, String] =
    WarehouseFs.readTable(spark, t).get.select("id", "user")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  // ---- the raw guard ----------------------------------------------------

  test("HadoopCommitGuard: a second commit of the same name is a CAS loss, " +
      "never a replace (the empirical local-rename hazard, closed)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_guard_").toString
    val fs = localFs
    val dest = new Path(s"$dir/00000007")
    assert(WarehouseFs.HadoopCommitGuard.commit(fs, dest,
      "winner".getBytes("UTF-8")))
    // under exists+rename this returned true and REPLACED the winner
    assert(!WarehouseFs.HadoopCommitGuard.commit(fs, dest,
      "usurper".getBytes("UTF-8")))
    val in = fs.open(dest)
    val got = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    assert(got === "winner", "the committed body must be the winner's")
    // no staging debris survives either attempt
    assert(!fs.listStatus(new Path(dir))
      .exists(_.getPath.getName.startsWith(".tmp-")))
  }

  test("HadoopCommitGuard: N simultaneous racers — exactly one success, " +
      "committed body is the winner's") {
    val dir = java.nio.file.Files.createTempDirectory("graft_guard_").toString
    val fs = localFs
    val dest = new Path(s"$dir/00000001")
    val n = 16
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val wins = new AtomicInteger(0)
    val winnerBody = new java.util.concurrent.atomic.AtomicReference[String]()
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            val body = s"body-$i"
            if (WarehouseFs.HadoopCommitGuard.commit(fs, dest,
                body.getBytes("UTF-8"))) {
              wins.incrementAndGet(); winnerBody.set(body)
            }
          }
        })
      }
      start.countDown()
      futures.foreach(_.get(60, TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(wins.get() === 1, "exactly one racer may ever report success")
    val in = fs.open(dest)
    val got = try new String(
      org.apache.hadoop.io.IOUtils.readFullyToByteArray(in), "UTF-8")
      finally in.close()
    assert(got === winnerBody.get())
  }

  test("ConditionalPutCommitGuard contract: the store arbitrates, " +
      "exactly one racer creates the object") {
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    val guard = new WarehouseFs.ConditionalPutCommitGuard(
      (key, body) => store.putIfAbsent(key, body) == null)
    val fs = localFs
    val dest = new Path(
      s"${java.nio.file.Files.createTempDirectory("graft_s3_")}/00000001")
    val n = 16
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val wins = new AtomicInteger(0)
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            if (guard.commit(fs, dest, s"body-$i".getBytes("UTF-8")))
              wins.incrementAndGet()
          }
        })
      }
      start.countDown()
      futures.foreach(_.get(60, TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(wins.get() === 1)
    assert(store.size() === 1, "one full object, visible atomically")
  }

  test("the default guard refuses object-store schemes by name instead " +
      "of narrowing their window") {
    // a local FS wearing an s3a badge: rename semantics are whatever the
    // subclass inherits — the guard must refuse on the SCHEME, before
    // any rename happens
    val fake = new org.apache.hadoop.fs.RawLocalFileSystem {
      override def getScheme: String = "s3a"
    }
    fake.initialize(java.net.URI.create("file:///"),
      spark.sessionState.newHadoopConf())
    val dest = new Path(
      s"${java.nio.file.Files.createTempDirectory("graft_os_")}/00000001")
    val e = intercept[IllegalArgumentException] {
      WarehouseFs.HadoopCommitGuard.commit(fake, dest, "x".getBytes("UTF-8"))
    }
    assert(e.getMessage.contains("ConditionalPutCommitGuard"),
      s"the refusal must name the fix, got: ${e.getMessage}")
  }

  test("TRUE thread-parallel blind appends through the real primitive: " +
      "every append lands exactly once, nothing lost") {
    val t = tmpTable(); publishFixture(t)
    val n = 6
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(n)
    val failures = new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    try {
      val futures = (0 until n).map { i =>
        pool.submit(new Runnable {
          override def run(): Unit = {
            start.await()
            val rows = spark.range(10000L + i * 10, 10000L + i * 10 + 10)
              .select(col("id"), concat(lit("w"), col("id")).as("user"),
                lit(i.toLong).as("grp"))
            // bounded outer retries: MaxCommitAttempts caps the INNER
            // rebase loop; under 6 genuinely parallel writers a loser
            // can exhaust it and must re-run — the documented contract
            var attempts = 0
            var done = false
            while (!done) {
              try { WarehouseFs.appendRows(rows, t, keepVersions = 16); done = true }
              catch {
                case e: IllegalStateException
                    if e.getMessage.contains("manifest races") && attempts < 8 =>
                  attempts += 1
                case other: Throwable => failures.add(other); done = true
              }
            }
          }
        })
      }
      start.countDown()
      futures.foreach(_.get(300, TimeUnit.SECONDS))
    } finally pool.shutdown()
    assert(failures.isEmpty, s"unexpected failures: ${failures}")
    val got = WarehouseFs.readTable(spark, t).get
    assert(got.count() === 8000L + n * 10,
      "every thread's append must land — the CAS may delay, never lose")
    val appended = got.filter(col("id") >= 10000L)
      .select("id").as[Long].collect().sorted.toSeq
    assert(appended === (0 until n).flatMap(i =>
      (10000L + i * 10) until (10000L + i * 10 + 10)).sorted,
      "exactly-once: no appended row lost, none duplicated")
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 1L + n,
      "six appends = six committed versions after the base")
  }

  // ---- the window itself, driven through real DML -----------------------

  test("a competitor committing INSIDE the exists-check→publish window " +
      "loses the loser nothing: CAS loss, rebase, serial content") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.casWindowHook = Some(() =>
      WarehouseFs.deleteWhere(spark, t, "id", Seq(5000L), keepVersions = 8))
    try WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
    finally WarehouseFs.casWindowHook = None
    assert(WarehouseFs.casWindowHook.isEmpty, "the window hook must have fired")
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L,
      "winner commits v2 in the window, the loser detects the loss and " +
        "rebases to v3")
    val s = state(t)
    assert(!s.contains(100L) && !s.contains(5000L) && s.size === 7998)
    // the winner's manifest was never clobbered: v2 is winner-only
    val v2 = WarehouseFs.readTableVersion(spark, t, 2).get
    assert(v2.filter(col("id") === 5000L).count() === 0)
    assert(v2.filter(col("id") === 100L).count() === 1)
  }

  test("publishVersioned racing inside the window fails loudly; the " +
      "in-window winner's state is what readers see") {
    val t = tmpTable()
    publishFixture(t)
    val winnerDf = spark.range(10).select(col("id"),
      lit("winner").as("user"), lit(0L).as("grp"))
    val loserDf = spark.range(20).select(col("id"),
      lit("loser").as("user"), lit(0L).as("grp"))
    WarehouseFs.casWindowHook = Some(() =>
      WarehouseFs.publishVersioned(winnerDf, t, keepVersions = 8))
    val e = intercept[IllegalArgumentException] {
      try WarehouseFs.publishVersioned(loserDf, t, keepVersions = 8)
      finally WarehouseFs.casWindowHook = None
    }
    assert(e.getMessage.contains("lost a concurrent race"))
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 2L)
    assert(WarehouseFs.readTable(spark, t).get.count() === 10,
      "the committed version must be the in-window winner's, not the loser's")
  }

  test("a conditional-PUT guard drives the same DML race end-to-end " +
      "(the pluggable object-store seam)") {
    // fake object store: the map arbitrates (conditional create); the
    // winner writes through to the local fs so readers resolve normally
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    val guard = new WarehouseFs.ConditionalPutCommitGuard((key, body) =>
      if (store.putIfAbsent(key, body) != null) false
      else {
        val p = java.nio.file.Paths.get(java.net.URI.create(key))
        java.nio.file.Files.write(p, body,
          java.nio.file.StandardOpenOption.CREATE_NEW)
        true
      })
    val t = tmpTable(); publishFixture(t)
    val prev = WarehouseFs.commitGuard
    WarehouseFs.commitGuard = guard
    try {
      WarehouseFs.casWindowHook = Some(() =>
        WarehouseFs.deleteWhere(spark, t, "id", Seq(5000L), keepVersions = 8))
      try WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
      finally WarehouseFs.casWindowHook = None
      assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L)
      val s = state(t)
      assert(!s.contains(100L) && !s.contains(5000L) && s.size === 7998)
      assert(store.size() === 2, "v2 and v3 both committed through the store")
    } finally WarehouseFs.commitGuard = prev
  }

  test("MULTI-PROCESS CAS: two JVMs hammering one _versions dir — " +
      "exactly one winner per name over every round, committed body is " +
      "the claimed winner's (kernel-side link(2) arbitration)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mp_cas_").toString
    val rounds = 120
    val javaBin = s"${sys.props("java.home")}/bin/java"
    val cp = sys.props("java.class.path")
    def spawn(id: String): Process =
      new ProcessBuilder(javaBin, "-cp", cp, "graft.CasRaceChild",
        dir, id, rounds.toString)
        .redirectOutput(new java.io.File(s"$dir/child-$id.log"))
        .redirectErrorStream(true).start()
    val pa = spawn("A"); val pb = spawn("B")
    // barrier drops once BOTH processes are live: the races overlap
    java.nio.file.Files.write(java.nio.file.Paths.get(dir, "start"),
      Array.emptyByteArray)
    assert(pa.waitFor(120, TimeUnit.SECONDS) && pb.waitFor(120, TimeUnit.SECONDS),
      "children must finish")
    def logOf(id: String) =
      new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, s"child-$id.log")), "UTF-8")
    assert(pa.exitValue() === 0, s"child A failed:\n${logOf("A")}")
    assert(pb.exitValue() === 0, s"child B failed:\n${logOf("B")}")
    def winsOf(id: String): Set[Int] = {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(
        java.nio.file.Paths.get(dir, s"wins-$id")).asScala
        .filter(_.nonEmpty).map(_.toInt).toSet
    }
    val wa = winsOf("A"); val wb = winsOf("B")
    assert(wa.intersect(wb).isEmpty,
      s"no round may have TWO winners — both claimed ${wa.intersect(wb)}")
    assert(wa.union(wb) === (0 until rounds).toSet,
      "every round must have exactly one winner")
    (0 until rounds).foreach { i =>
      val body = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(dir, f"$i%08d")), "UTF-8")
      val claimed = if (wa(i)) "winner-A" else "winner-B"
      assert(body === claimed,
        s"round $i: committed body must be the claimed winner's, got $body")
    }
    // no staging debris from either process
    assert(!new java.io.File(dir).listFiles()
      .exists(_.getName.startsWith(".tmp-")))
  }

  test("the HTTP If-None-Match reference adapter drives a real DML race " +
      "through an actual HTTP store (ObjectStoreCommit) — exactly-once " +
      "arbitration, outages throw instead of guessing") {
    import java.net.InetSocketAddress
    val store = new ConcurrentHashMap[String, Array[Byte]]()
    @volatile var outage = false
    val srv = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (exch: com.sun.net.httpserver.HttpExchange) => {
      val body = exch.getRequestBody.readAllBytes()
      val key = exch.getRequestURI.getPath
      val code = store.synchronized {
        if (outage) 503
        else if (exch.getRequestMethod == "DELETE") {
          // capability-probe sentinel cleanup path
          store.remove(key)
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(key))
          204
        }
        else if (exch.getRequestHeaders.getFirst("If-None-Match") != "*") 400
        else if (store.containsKey(key)) 412
        else {
          store.put(key, body)
          // the winner's object writes through to the local path, so
          // filesystem readers resolve normally (the store IS the
          // warehouse in production; here it fronts the local fs)
          java.nio.file.Files.write(java.nio.file.Paths.get(key), body,
            java.nio.file.StandardOpenOption.CREATE_NEW)
          201
        }
      }
      exch.sendResponseHeaders(code, -1); exch.close()
    })
    srv.start()
    val endpoint = s"http://127.0.0.1:${srv.getAddress.getPort}"
    val t = tmpTable(); publishFixture(t)
    val prev = WarehouseFs.commitGuard
    WarehouseFs.installCommitGuard(
      graft.sources.ObjectStoreCommit.httpIfNoneMatchGuard(endpoint))
    try {
      WarehouseFs.casWindowHook = Some(() =>
        WarehouseFs.deleteWhere(spark, t, "id", Seq(5000L), keepVersions = 8))
      try WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
      finally WarehouseFs.casWindowHook = None
      assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L,
        "winner commits v2 through HTTP, rebased loser commits v3")
      val s = state(t)
      assert(!s.contains(100L) && !s.contains(5000L) && s.size === 7998)
      assert(store.size() === 2, "v2 and v3 both committed through the store")
      // an outage THROWS — the primitive must never translate a 5xx
      // into a silent loss or a silent win
      outage = true
      val e = intercept[Exception] {
        WarehouseFs.deleteWhere(spark, t, "id", Seq(200L), keepVersions = 8)
      }
      assert(e.getMessage != null && e.getMessage.contains("HTTP 503"),
        s"got: $e")
    } finally {
      WarehouseFs.commitGuard = prev
      srv.stop(0)
    }
  }

  test("an If-None-Match-IGNORING store is refused by the capability " +
      "probe before the first commit — never trusted with a manifest") {
    import java.net.InetSocketAddress
    import scala.jdk.CollectionConverters._
    // a broken store: 200 to every PUT, overwrite or not — against it
    // both racers of a real CAS would believe they won
    val seen = new ConcurrentHashMap[String, Integer]()
    val srv = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", 0), 0)
    srv.createContext("/", (exch: com.sun.net.httpserver.HttpExchange) => {
      exch.getRequestBody.readAllBytes()
      seen.merge(exch.getRequestURI.getPath, 1, (a, b) => a + b)
      exch.sendResponseHeaders(200, -1); exch.close()
    })
    srv.start()
    val endpoint = s"http://127.0.0.1:${srv.getAddress.getPort}"
    val t = tmpTable(); publishFixture(t)
    val prev = WarehouseFs.commitGuard
    WarehouseFs.installCommitGuard(
      graft.sources.ObjectStoreCommit.httpIfNoneMatchGuard(endpoint))
    try {
      val e = intercept[IllegalStateException] {
        WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
      }
      assert(e.getMessage.contains("IGNORES If-None-Match"), s"got: $e")
      // the probe failed BEFORE any manifest reached the store: every
      // request the endpoint ever saw is the probe's own sentinel
      assert(seen.keySet.asScala.forall(_.contains(".graft-cas-probe-")),
        s"manifest leaked to an unvetted store: ${seen.keySet.asScala}")
      // and the table is untouched — v1, the deleted key still present
      assert(WarehouseFs.currentVersion(spark, t).get._1 === 1L)
      assert(state(t).contains(100L))
    } finally {
      WarehouseFs.commitGuard = prev
      srv.stop(0)
    }
  }

  test("two writers sharing a txnAppId cannot double-commit one batchId: " +
      "the publish loop re-verifies the txn floor — free off the base " +
      "manifest, full history after a lost CAS — and skips a landed batch") {
    val t = tmpTable(); publishFixture(t)
    // writer A lands (app, 7)
    WarehouseFs.upsertRows(Seq((100L, "A7", 0L)).toDF("id", "user", "grp"),
      t, "id", keepVersions = 8, refreshStats = false,
      txn = Some(("app", 7L)))
    val v2 = WarehouseFs.currentVersion(spark, t).get._1
    // FREE PATH: a second writer whose in-process floor predates A's
    // commit re-attempts batch 7 — the base manifest's own stamp stops
    // it before any CAS, zero history scan
    WarehouseFs.upsertRows(Seq((100L, "B7-dup", 0L)).toDF("id", "user", "grp"),
      t, "id", keepVersions = 8, refreshStats = false,
      txn = Some(("app", 7L)))
    assert(WarehouseFs.currentVersion(spark, t).get._1 === v2,
      "the duplicate batch must not commit a version")
    assert(WarehouseFs.readTable(spark, t).get.filter(col("id") === 100L)
      .select("user").as[String].head() === "A7",
      "writer A's image must survive the duplicate attempt")
    // RACE PATH: writer B is mid-commit on batch 8 when writer A (same
    // appId, stale-floor twin) lands batch 8 INSIDE B's CAS window —
    // B's rebase must find the floor and skip, not re-land the batch
    WarehouseFs.casWindowHook = Some(() =>
      WarehouseFs.upsertRows(Seq((200L, "A8", 0L)).toDF("id", "user", "grp"),
        t, "id", keepVersions = 8, refreshStats = false,
        txn = Some(("app", 8L))))
    try WarehouseFs.upsertRows(Seq((300L, "B8", 0L)).toDF("id", "user", "grp"),
      t, "id", keepVersions = 8, refreshStats = false,
      txn = Some(("app", 8L)))
    finally WarehouseFs.casWindowHook = None
    val hist = WarehouseFs.describeHistory(spark, t)
    assert(hist.count(_._8 === "app#8") === 1,
      s"exactly ONE commit may carry app#8, got: ${hist.map(_._8)}")
    val after = WarehouseFs.readTable(spark, t).get
    assert(after.filter(col("id") === 200L).select("user").as[String]
      .head() === "A8", "the in-window winner's image stands")
    assert(after.filter(col("id") === 300L).select("user").as[String]
      .head() === "u300",
      "the loser's batch-8 image must not land — the batch was " +
        "already committed under this appId")
    assert(after.count() === 8000, "no duplicate rows from the skip")
  }

  // ---- GC vs in-flight attempt dirs -------------------------------------

  test("GC spares a recent unreferenced attempt dir below curMax " +
      "(the 3-writer rebase window) until the grace expires") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.appendRows(
      Seq((9001L, "x", 0L)).toDF("id", "user", "grp"), t, keepVersions = 8)
    WarehouseFs.appendRows(
      Seq((9002L, "y", 0L)).toDF("id", "user", "grp"), t, keepVersions = 8)
    // a third writer still in flight from v1: its attempt dir targets
    // v2, now below curMax=3
    val fs = localFs
    val zombie = new Path(s"$t/v00000002-feedfacefeedface")
    Seq((1L, "z", 0L)).toDF("id", "user", "grp")
      .write.parquet(zombie.toString)
    WarehouseFs.appendRows(
      Seq((9003L, "w", 0L)).toDF("id", "user", "grp"), t, keepVersions = 8)
    assert(fs.exists(zombie),
      "a recent attempt dir numbered below curMax must survive GC — a " +
        "rebasing loser still references it")
    val savedGrace = WarehouseFs.gcInFlightGraceMs
    WarehouseFs.gcInFlightGraceMs = 0L
    try {
      WarehouseFs.appendRows(
        Seq((9004L, "v", 0L)).toDF("id", "user", "grp"), t, keepVersions = 8)
      assert(!fs.exists(zombie),
        "past the grace window the crashed attempt's zombie collects")
    } finally WarehouseFs.gcInFlightGraceMs = savedGrace
  }

  test("a merge-on-read delete losing INSIDE the window rebases too: " +
      "masks compose through the same primitive") {
    val t = tmpTable(); publishFixture(t)
    WarehouseFs.casWindowHook = Some(() =>
      WarehouseFs.deleteWhereVectors(spark, t, "id", Seq(5000L),
        keepVersions = 8))
    try WarehouseFs.deleteWhereVectors(spark, t, "id", Seq(100L),
      keepVersions = 8)
    finally WarehouseFs.casWindowHook = None
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L)
    val s = state(t)
    assert(!s.contains(100L) && !s.contains(5000L) && s.size === 7998)
    assert(WarehouseFs.hasDeletionVectors(spark, t))
  }

  test("a rebase whose attempt dir was GC'd under it refuses loudly " +
      "instead of committing dangling file refs") {
    val t = tmpTable(); publishFixture(t)
    val fs = localFs
    WarehouseFs.casTestHook = Some { () =>
      // a competitor wins v2…
      WarehouseFs.deleteWhere(spark, t, "id", Seq(5000L), keepVersions = 8)
      // …and a (simulated) third writer's GC collects the loser's
      // still-unreferenced attempt dir before the loser rebases
      // only the dir NO committed manifest owns is the loser's
      val dirInUse = WarehouseFs.currentVersion(spark, t).get._2
        .stripPrefix(s"$t/")
      fs.listStatus(new Path(t))
        .map(_.getPath)
        .filter(p => p.getName.matches("v\\d{8}-[0-9a-f]+") &&
          p.getName != dirInUse)
        .foreach(p => fs.delete(p, true))
    }
    val e = intercept[IllegalArgumentException] {
      try WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
      finally WarehouseFs.casTestHook = None
    }
    assert(e.getMessage.contains("garbage-collected"),
      s"expected the self-verification refusal, got: ${e.getMessage}")
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 2L,
      "only the winner committed; no manifest references deleted files")
    assert(state(t).size === 7999)
    // the refused DML re-runs cleanly
    WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
    assert(state(t).size === 7998)
  }

  test("a commit whose CARRIED dirs were swept mid-flight refuses loudly — " +
      "never a manifest naming missing files (grace window = 0)") {
    val t = tmpTable(); publishFixture(t)
    val fs = localFs
    val savedGrace = WarehouseFs.gcInFlightGraceMs
    WarehouseFs.gcInFlightGraceMs = 0L
    // the in-flight DML carries v1's files by reference; a (simulated)
    // sweeper collects the base dir between the data write and the
    // commit tail — the stalled-past-grace scenario the mtime window
    // cannot protect
    WarehouseFs.casTestHook = Some(() =>
      fs.delete(new Path(s"$t/v00000001"), true))
    val e = intercept[IllegalArgumentException] {
      try WarehouseFs.deleteWhere(spark, t, "id", Seq(100L), keepVersions = 8)
      finally {
        WarehouseFs.casTestHook = None
        WarehouseFs.gcInFlightGraceMs = savedGrace
      }
    }
    assert(e.getMessage.contains("garbage-collected"),
      s"expected the referenced-dirs refusal, got: ${e.getMessage}")
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 1L,
      "nothing committed: no manifest may reference the swept dir")
  }

  test("RESTORE re-verifies the target's dirs right before its commit: " +
      "a concurrently expired target aborts loudly") {
    val t = tmpTable(); publishFixture(t) // v1
    WarehouseFs.deleteWhere(spark, t, "id", Seq(1L), keepVersions = 8) // v2
    WarehouseFs.deleteWhere(spark, t, "id", Seq(2L), keepVersions = 8) // v3
    val fs = localFs
    // simulate a concurrent VACUUM expiring part of the restore TARGET
    // between resolution and commit: v2's own rewrite dir is gone while
    // its manifest briefly lingers — a file-list manifest resolves
    // without listing dirs, so only the pre-commit re-verification
    // stands between this state and a committed dangling reference
    val v2OwnDir = WarehouseFs.readTableVersion(spark, t, 2) // still resolvable
    assert(v2OwnDir.isDefined)
    fs.listStatus(new Path(t)).map(_.getPath)
      .filter(_.getName.matches("v00000002-[0-9a-f]+"))
      .foreach(p => fs.delete(p, true))
    val e = intercept[IllegalArgumentException] {
      WarehouseFs.restoreVersion(spark, t, 2L, keepVersions = 8)
    }
    assert(e.getMessage.contains("garbage-collected"),
      s"expected the referenced-dirs refusal, got: ${e.getMessage}")
    assert(WarehouseFs.currentVersion(spark, t).get._1 === 3L,
      "the failed restore committed nothing")
  }
}
