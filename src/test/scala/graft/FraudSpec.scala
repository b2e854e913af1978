package graft

import java.sql.{Date, Timestamp}
import graft.operators.{FraudDetection, Scd}
import org.apache.spark.sql.functions._

/** One positive fixture per fraud rule + a clean negative
  * (FIXTURES.md §A4): C1 blacklisted passport, C2 expired passport,
  * C3 expired contract, C4 city hop within 1 h, C5 clean.
  */
class FraudSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private def dt(s: String) = Date.valueOf(s)

  private lazy val clients = Seq(
    (1L, "Иванов", "Иван", "Иванович", "1111 111111", dt("2030-01-01"), "+7 111"),
    (2L, "Петров", "Пётр", "Петрович", "2222 222222", dt("2020-01-01"), "+7 222"),
    (3L, "Сидоров", "Сидор", "Сидорович", "3333 333333", dt("2030-01-01"), "+7 333"),
    (4L, "Смирнов", "Семён", "Семёнович", "4444 444444", dt("2030-01-01"), "+7 444"),
    (5L, "Кузнецов", "Кузьма", "Кузьмич", "5555 555555", dt("2030-01-01"), "+7 555"))
    .toDF("client_id", "last_name", "first_name", "patronymic",
          "passport_num", "passport_valid_to", "phone")

  private lazy val accounts = Seq(
    ("ACC1", dt("2030-01-01"), 1L), ("ACC2", dt("2030-01-01"), 2L),
    ("ACC3", dt("2021-01-01"), 3L), ("ACC4", dt("2030-01-01"), 4L),
    ("ACC5", dt("2030-01-01"), 5L))
    .toDF("account", "valid_to", "client")

  private lazy val cards = Seq(
    ("1111 2222 3333 0001 ", "ACC1"), ("1111 2222 3333 0002 ", "ACC2"),
    ("1111 2222 3333 0003 ", "ACC3"), ("1111 2222 3333 0004 ", "ACC4"),
    ("1111 2222 3333 0005 ", "ACC5"))
    .toDF("card_num", "account")

  private lazy val terminalsHist = Scd.scd2Apply(spark, None,
    Seq(("T1", "POS", "Москва", "ул. А"), ("T2", "ATM", "Казань", "ул. Б"))
      .toDF("terminal_id", "terminal_type", "terminal_city", "terminal_address"),
    "terminal_id", Seq("terminal_type", "terminal_city", "terminal_address"),
    ts("2021-03-01 00:00:00"))

  private lazy val transactions = Seq(
    ("X1", ts("2021-03-02 10:00:00"), "1111 2222 3333 0001", "T1"), // C1 blacklisted
    ("X2", ts("2021-03-02 11:00:00"), "1111 2222 3333 0002", "T1"), // C2 expired passport
    ("X3", ts("2021-03-02 12:00:00"), "1111 2222 3333 0003", "T1"), // C3 expired contract
    ("X4", ts("2021-03-02 13:00:00"), "1111 2222 3333 0004", "T1"), // C4 hop leg 1
    ("X5", ts("2021-03-02 13:40:00"), "1111 2222 3333 0004", "T2"), // C4 hop leg 2 (40 min)
    ("X6", ts("2021-03-02 14:00:00"), "1111 2222 3333 0005", "T1")) // C5 clean
    .toDF("trans_id", "trans_date", "card_num", "terminal")
    .withColumn("amt", lit(BigDecimal(100.0)))
    .withColumn("oper_type", lit("PAYMENT"))
    .withColumn("oper_result", lit("SUCCESS"))
    .withColumn("create_date", lit(ts("2021-03-02 23:00:00")))

  private lazy val blacklist = Seq(("1111 111111", dt("2021-03-01")))
    .toDF("passport_num", "entry_dt")

  private lazy val view = FraudDetection.dataView(
    clients, accounts, cards, transactions, terminalsHist,
    ts("2021-03-02 23:30:00")).cache()

  private lazy val rep = FraudDetection.repFraud(view, blacklist, dt("2021-03-02"))
    .cache()

  test("view joins all 6 transactions with FIO and terminal city") {
    assert(view.count() === 6)
    val fio = view.filter(col("client_id") === 1).select("fio").head().getString(0)
    assert(fio === "Иванов Иван Иванович")
  }

  test("rule 1 catches blacklisted (C1) and expired (C2) passports only") {
    val r1 = FraudDetection.blacklistedPassport(view, blacklist)
    assert(r1.select("passport").distinct().collect().map(_.getString(0)).toSet
      === Set("1111 111111", "2222 222222"))
  }

  test("rule 2 catches the expired contract (C3) only") {
    val r2 = FraudDetection.expiredContract(view)
    assert(r2.select("passport").collect().map(_.getString(0)).toSet === Set("3333 333333"))
  }

  test("rule 3 catches the two-city hop (C4) only") {
    val r3 = FraudDetection.cityHop(view)
    assert(r3.select("passport").collect().map(_.getString(0)).toSet === Set("4444 444444"))
  }

  test("clean client C5 appears in no rule; mart has 4 rows") {
    assert(rep.filter(col("passport") === "5555 555555").count() === 0)
    assert(rep.count() === 4)
    assert(rep.columns.toSeq ===
      Seq("event_dt", "passport", "fio", "phone", "event_type", "report_dt"))
  }

  test("faithful OR-join form of rule 1 equals the union rewrite") {
    val rewrite = FraudDetection.blacklistedPassport(view, blacklist)
    val faithful = FraudDetection.blacklistedPassportFaithful(view, blacklist)
    assert(rewrite.exceptAll(faithful).count() === 0)
    assert(faithful.exceptAll(rewrite).count() === 0)
  }

  test("only the terminal dim carries a broadcast hint; big dims follow the threshold") {
    // With auto-broadcast off, only the explicit broadcast(term) hint may
    // survive — clients/accounts/cards must not be force-broadcast (they
    // scale with the customer base; ADVICE r1). AQE is disabled so the
    // plan prints once (no Initial/Final duplication), and the asOf differs
    // from the suite's cached view so the CacheManager can't substitute the
    // broadcast-era cached plan.
    val prevBr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val v = FraudDetection.dataView(clients, accounts, cards, transactions,
        terminalsHist, ts("2021-03-03 12:34:56"))
      val p = v.queryExecution.executedPlan.toString
      assert("BroadcastHashJoin".r.findAllIn(p).size === 1, p)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBr)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
    }
  }

  test("day window: covering window equals no window; disjoint window is empty") {
    val covering = FraudDetection.dataView(clients, accounts, cards, transactions,
      terminalsHist, ts("2021-03-02 23:30:00"),
      Some((dt("2021-03-01"), dt("2021-03-03"))))
    assert(covering.collect().toSet === view.collect().toSet)
    val disjoint = FraudDetection.dataView(clients, accounts, cards, transactions,
      terminalsHist, ts("2021-03-02 23:30:00"),
      Some((dt("2021-03-03"), dt("2021-03-03"))))
    assert(disjoint.count() === 0)
  }

  test("city hop outside one hour is not flagged") {
    val slow = transactions
      .withColumn("trans_date",
        when(col("trans_id") === "X5", ts("2021-03-02 15:30:00")).otherwise(col("trans_date")))
    val v = FraudDetection.dataView(clients, accounts, cards, slow, terminalsHist,
      ts("2021-03-02 23:30:00"))
    assert(FraudDetection.cityHop(v).count() === 0)
  }
}
