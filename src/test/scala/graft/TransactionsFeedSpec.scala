package graft

import graft.sources.BankFeeds
import org.apache.spark.sql.functions._

class TransactionsFeedSpec extends SparkSpec {

  test("day-1 feed: row count and typed columns") {
    val df = BankFeeds.transactions(spark, s"$refDir/transactions_01032021.txt")
    assert(df.count() === 15650)
    assert(df.schema("amt").dataType.typeName.startsWith("decimal"))
    assert(df.schema("trans_date").dataType.typeName === "timestamp")
  }

  test("decimal comma: first day-1 amount is 1046.40") {
    val df = BankFeeds.transactions(spark, s"$refDir/transactions_01032021.txt")
    val amt = df.orderBy("trans_date").select("amt").head().getDecimal(0)
    assert(amt.toPlainString === "1046.40")
  }

  test("whitespace-dirty day-2 rows are trimmed (padded first row parses)") {
    val df = BankFeeds.transactions(spark, s"$refDir/transactions_02032021.txt")
    assert(df.filter(col("trans_date").isNull).count() === 0)
    assert(df.filter(col("amt").isNull).count() === 0)
    // the padded row: "   2021-03-02 00:00:00; 7000,00"
    val r = df.filter(col("trans_date") === "2021-03-02 00:00:00").collect()
    assert(r.nonEmpty && r.exists(_.getDecimal(2).toPlainString == "7000.00"))
  }

  test("card numbers keep inner spaces, lose outer padding") {
    val df = BankFeeds.transactions(spark, s"$refDir/transactions_02032021.txt")
    val cards = df.select("card_num").limit(100).collect().map(_.getString(0))
    assert(cards.forall(c => c == c.trim))
    assert(cards.exists(_.count(_ == ' ') == 3)) // "4513 5880 2369 1799" shape
  }

  test("each file covers exactly one calendar day") {
    val df = BankFeeds.transactions(spark, s"$refDir/transactions_03032021.txt")
    val days = df.select(to_date(col("trans_date"))).distinct().collect()
    assert(days.map(_.get(0).toString).toSeq === Seq("2021-03-03"))
  }

  test("quarantine splits malformed lines instead of failing the load") {
    val dir = java.nio.file.Files.createTempDirectory("graft_feed_")
    val f = dir.resolve("transactions_bad.txt")
    java.nio.file.Files.writeString(f,
      """transaction_id;transaction_date;amount;card_num;oper_type;oper_result;terminal
        |1;2021-03-01 10:00:00;100,50;1111 2222 3333 4444;PAYMENT;SUCCESS;P1
        |2;NOT_A_DATE;200,00;1111 2222 3333 4444;PAYMENT;SUCCESS;P1
        |3;2021-03-01 11:00:00;NOT_AN_AMOUNT;1111 2222 3333 4444;PAYMENT;SUCCESS;P1
        |4;2021-03-01 12:00:00;300,00
        |""".stripMargin)
    val (good, bad) = BankFeeds.transactionsQuarantine(spark, f.toString)
    assert(good.count() === 1)
    assert(good.head().getString(0) === "1")
    assert(bad.count() === 3)
    // quarantined rows keep their raw identity for triage
    assert(bad.filter(col("trans_id") === "2").count() === 1)
  }

  test("quarantine on the real feeds quarantines nothing") {
    val (good, bad) = BankFeeds.transactionsQuarantine(
      spark, s"$refDir/transactions_01032021.txt")
    assert(bad.count() === 0)
    assert(good.count() === 15650)
  }
}
