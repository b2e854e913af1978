package graft

import graft.sources.BankJdbc
import org.scalatest.funsuite.AnyFunSuite

/** The JDBC transport can't connect anywhere in this container (offline,
  * no driver jar) — what IS testable is the env gate and the exact option
  * sets the read/write calls would use.
  */
class BankJdbcSpec extends AnyFunSuite {

  private val env = Map(
    "GRAFT_JDBC_URL" -> "jdbc:oracle:thin:@db:1521/bank",
    "GRAFT_JDBC_USER" -> "etl",
    "GRAFT_JDBC_PASSWORD" -> "secret")

  test("fromEnv requires url+user+password; default driver is Oracle thin") {
    assert(BankJdbc.fromEnv(Map.empty).isEmpty)
    assert(BankJdbc.fromEnv(env - "GRAFT_JDBC_PASSWORD").isEmpty)
    val cfg = BankJdbc.fromEnv(env).get
    assert(cfg.url === "jdbc:oracle:thin:@db:1521/bank")
    assert(cfg.driver === "oracle.jdbc.OracleDriver")
    val custom = BankJdbc.fromEnv(env + ("GRAFT_JDBC_DRIVER" -> "org.postgresql.Driver")).get
    assert(custom.driver === "org.postgresql.Driver")
  }

  test("dim read options carry url/dbtable/credentials/fetchsize") {
    val cfg = BankJdbc.fromEnv(env).get
    val o = BankJdbc.readOptions(cfg, "bank.clients")
    assert(o("dbtable") === "bank.clients")
    assert(o("fetchsize") === "10000")
    assert(!o.contains("partitionColumn"))
  }

  test("partitioned fact read splits the key range across N cursors") {
    val cfg = BankJdbc.fromEnv(env).get
    val o = BankJdbc.partitionedReadOptions(cfg, "bank.transactions",
      partitionColumn = "trans_id", lowerBound = 0L, upperBound = 1000000L,
      numPartitions = 32)
    assert(o("partitionColumn") === "trans_id")
    assert(o("lowerBound") === "0" && o("upperBound") === "1000000")
    assert(o("numPartitions") === "32")
  }

  test("write options batch inserts") {
    val cfg = BankJdbc.fromEnv(env).get
    val o = BankJdbc.writeOptions(cfg, "rep_fraud", batchSize = 5000)
    assert(o("dbtable") === "rep_fraud")
    assert(o("batchsize") === "5000")
  }
}
