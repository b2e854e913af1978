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
}
