package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: one JSON line with per-query wall seconds.
  *
  * Before the timed pass, every query runs once against the smallest
  * available scale factor: whole-stage-codegen classes are identical across
  * scale factors (plans depend on shape, not data volume), so this
  * JIT-compiles all generated code cheaply. Without it, queries late in the
  * run measure the C2 compile queue, not the engine — observed 10-40×
  * inflation (e.g. 147 s for a 0.3 s-warm aggregation) on JDK 17.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val warmDir = Seq("/root/testdata/sf0.001", sfDir)
      .find(p => new java.io.File(p).isDirectory).getOrElse(sfDir)
    SparkEntry.queries.foreach { case (_, fn) =>
      try fn(spark, warmDir).count() catch { case _: Throwable => () }
    }

    // Best-of-3 per query: robust against CPU contention on a shared
    // machine (r1 saw a 25× gap between a contended and a quiet run of the
    // same binary). A failed query is reported in `errors`, never as a
    // plausible-looking wall time.
    val reps = sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt
    // self-diagnosis: system load around the run plus per-rep raw times —
    // a contaminated run (other tenants burning the cores) is visible in
    // the artifact itself instead of needing a rerun to adjudicate
    val os = java.lang.management.ManagementFactory.getOperatingSystemMXBean
    val loadBefore = os.getSystemLoadAverage
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      name -> times
    }
    val loadAfter = os.getSystemLoadAverage
    val ok = results.collect { case (k, ts) if ts.nonEmpty => k -> ts }
    val errors = results.collect { case (k, ts) if ts.isEmpty => k }
    // reps of one query should agree; a >3× min-to-max spread means some
    // rep was starved — its min is still reported, but the query is named
    // so a slow total can be traced to contention, not code
    val suspect = ok.collect {
      case (k, ts) if ts.max > ts.min * 3 && ts.max - ts.min > 0.5 => k }
    def r(v: Double) = math.rint(v * 1e4) / 1e4 // 0.1 ms precision keeps the line short
    val qs = ok.map { case (k, ts) => s"\"" + k + "\":" + r(ts.min) }.mkString("{", ",", "}")
    val raws = ok.map { case (k, ts) =>
      s"\"" + k + "\":" + ts.map(r).mkString("[", ",", "]") }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val susp = suspect.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = r(ok.map(_._2.min).sum)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"raw":$raws,"errors":$errs,"suspect":$susp,"load_avg":{"before":${r(loadBefore)},"after":${r(loadAfter)},"cpus":${Runtime.getRuntime.availableProcessors}},"reps":$reps,"sf":"$sfDir"}"""
    println(json)
    // stdout log-tail capture can front-truncate a 100-query JSON line;
    // the file copy is always complete and parseable
    val out = sys.env.getOrElse("BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
