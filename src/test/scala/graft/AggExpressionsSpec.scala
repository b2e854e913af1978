package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.AggExpressions

class AggExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("elementwise_min equals the explode/groupBy reference implementation") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.tabulate(300)(i =>
      (i % 5, Array.fill(8)(rnd.nextLong() % 100000)))
    // repartition so merge() across partial buffers is exercised
    val df = rows.toDF("g", "sig").repartition(8).cache()

    val viaAgg = df.groupBy("g")
      .agg(AggExpressions.elementwise_min(col("sig")).as("m"))
      .collect().map(r => r.getInt(0) -> r.getSeq[Long](1).toSeq).toMap

    val viaExplode = df
      .select(col("g"), posexplode(col("sig")).as(Seq("pos", "v")))
      .groupBy("g", "pos").agg(min("v").as("mv"))
      .collect().groupBy(_.getInt(0))
      .map { case (g, rs) =>
        g -> rs.sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
      }
    assert(viaAgg === viaExplode)
  }

  test("NULL and empty arrays are ignored; all-NULL group yields NULL") {
    val df = Seq(
      (1, Some(Array(5L, 9L))), (1, None), (1, Some(Array.empty[Long])),
      (2, None)).toDF("g", "sig")
    val out = df.groupBy("g")
      .agg(AggExpressions.elementwise_min(col("sig")).as("m"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    assert(out(1).map(_.asInstanceOf[scala.collection.Seq[Long]].toSeq) === Some(Seq(5L, 9L)))
    assert(out(2) === None)
  }

  test("ragged arrays combine over the common prefix") {
    val df = Seq((1, Array(5L, 9L, 7L)), (1, Array(3L, 11L))).toDF("g", "sig")
    val m = df.groupBy("g")
      .agg(AggExpressions.elementwise_min(col("sig")).as("m"))
      .head().getSeq[Long](1).toSeq
    assert(m === Seq(3L, 9L))
  }

  test("elementwise_min is callable from SQL") {
    GraftSession.attach(spark, sf0001)
    Seq((1, Array(4L, 2L)), (1, Array(1L, 3L))).toDF("g", "sig")
      .createOrReplaceTempView("ew_t")
    val m = spark.sql("SELECT elementwise_min(sig) AS m FROM ew_t GROUP BY g")
      .head().getSeq[Long](0).toSeq
    assert(m === Seq(1L, 2L))
  }

  test("min of MinHash signatures equals the signature of the union") {
    import org.apache.spark.sql.graft.TextHashExpressions.minhash_signature
    val a = "alpha beta gamma delta epsilon"
    val b = "zeta eta theta iota kappa"
    val docs = Seq((1L, a), (2L, b), (3L, a + " " + b)).toDF("id", "text")
      .select(col("id"), minhash_signature(split(col("text"), " "), 16).as("sig"))
    val mergedAB = docs.filter(col("id") < 3)
      .agg(AggExpressions.elementwise_min(col("sig")).as("m"))
      .head().getSeq[Long](0).toSeq
    val unionSig = docs.filter(col("id") === 3)
      .select("sig").head().getSeq[Long](0).toSeq
    assert(mergedAB === unionSig)
  }
}
