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
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      name -> (if (times.isEmpty) None else Some(times.min))
    }
    val ok = results.collect { case (k, Some(v)) => k -> v }
    val errors = results.collect { case (k, None) => k }
    def r(v: Double) = math.rint(v * 1e4) / 1e4 // 0.1 ms precision keeps the line short
    val qs = ok.map { case (k, v) => s"\"" + k + "\":" + r(v) }.mkString("{", ",", "}")
    val errs = errors.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = r(ok.map(_._2).sum)
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"reps":$reps,"sf":"$sfDir"}"""
    println(json)
    // stdout log-tail capture can front-truncate a 100-query JSON line;
    // the file copy is always complete and parseable
    val out = sys.env.getOrElse("BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
  }
}
