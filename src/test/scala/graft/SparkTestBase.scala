package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session for the whole test JVM (sbt forks a single
  * JVM per Test run; reusing the session keeps the suite fast). */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[8]")
      .appName("graft-tests")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", "/tmp/graft_test_warehouse")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      .config("spark.sql.catalog.graft.warehouse", "/tmp/graft_catalog_warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite
    with org.scalatest.BeforeAndAfterEach {
  lazy val spark: SparkSession = SparkTestBase.spark
  val sf0001 = "/root/testdata/sf0.001"
  val refDir = "/root/reference"

  /** The warehouse's process-global test/deployment seams (commit
    * guard, race hooks) are shared across every suite in the forked
    * JVM: a test that leaks one poisons every LATER suite silently.
    * Fail the leaking test by name here, then reset so the rest of the
    * run stays healthy. */
  override protected def afterEach(): Unit = {
    import graft.sources.WarehouseFs
    try {
      val leaks = Seq(
        (WarehouseFs.casTestHook.isDefined, "casTestHook") -> { () =>
          WarehouseFs.casTestHook = None },
        (WarehouseFs.casWindowHook.isDefined, "casWindowHook") -> { () =>
          WarehouseFs.casWindowHook = None },
        (WarehouseFs.ddlTestHook.isDefined, "ddlTestHook") -> { () =>
          WarehouseFs.ddlTestHook = None },
        ((WarehouseFs.commitGuard ne WarehouseFs.HadoopCommitGuard),
          "commitGuard") -> { () =>
          WarehouseFs.commitGuard = WarehouseFs.HadoopCommitGuard })
      val fired = leaks.collect { case ((true, name), reset) =>
        reset(); name }
      assert(fired.isEmpty,
        s"test leaked process-global warehouse seam(s): " +
          s"${fired.mkString(", ")} — reset them in a finally block")
    } finally super.afterEach()
  }

  /** Run `body` with session confs temporarily set, restoring (or
    * unsetting) the previous values afterwards — the session is shared
    * across suites, so leaked confs would couple unrelated tests. */
  def withConf[T](pairs: (String, String)*)(body: => T): T = {
    val saved = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
