package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.VectorExpressions._
import org.apache.spark.sql.graft.TextHashExpressions._

class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(2.0f, 0.0f, 0.0f)),
    (4L, Array(1.0f, 1.0f, 0.0f))).toDF("id", "v")

  test("cosine: orthogonal=0, parallel=1, 45°=~0.7071") {
    val c = vecs.alias("a").crossJoin(vecs.alias("b"))
      .select(col("a.id").as("ai"), col("b.id").as("bi"),
              vec_cosine(col("a.v"), col("b.v")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(c((1L, 2L)) === 0.0)
    assert(c((1L, 3L)) === 1.0)
    assert(math.abs(c((1L, 4L)) - math.sqrt(0.5)) < 1e-6)
  }

  test("dot and norm agree with hand computation") {
    val r = vecs.filter(col("id") === 4)
      .select(vec_dot(col("v"), col("v")), vec_norm(col("v"))).head()
    assert(r.getDouble(0) === 2.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(2.0)) < 1e-6)
  }

  test("codegen and interpreted paths agree on real embeddings") {
    val e = Tables.embeddings(spark, sf0001).limit(50).cache()
    val pairs = e.alias("a").crossJoin(e.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(vec_cosine(col("a.embedding"), col("b.embedding")).as("cos"))
    val viaCodegen = pairs.agg(sum(round(col("cos"), 9))).head().getDouble(0)
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val viaInterp = pairs.agg(sum(round(col("cos"), 9))).head().getDouble(0)
      assert(viaCodegen === viaInterp)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", prev)
  }

  test("zip_with/aggregate HOF dot product agrees with the native expression") {
    // the built-in higher-order-function formulation (f64) vs the codegen'd
    // f32 expression — must agree to f32 precision on real embeddings
    val e = Tables.embeddings(spark, sf0001).limit(100)
    val pairs = e.alias("a").crossJoin(e.alias("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        vec_dot(col("a.embedding"), col("b.embedding")).as("native"),
        expr("""aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE) * y),
                          0D, (acc, v) -> acc + v)""").as("hof"))
    val maxDiff = pairs.select(max(abs(col("native") - col("hof")))).head().getDouble(0)
    assert(maxDiff < 1e-4, s"f32 expression vs f64 HOF diverged: $maxDiff")
  }

  test("minhash signature: equal token sets → equal signatures; length H") {
    val df = Seq(
      (1L, Seq("a", "b", "c")), (2L, Seq("c", "b", "a")), (3L, Seq("x", "y", "z")))
      .toDF("id", "toks")
      .select(col("id"), minhash_signature(col("toks"), 32).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(m(1L) === m(2L))       // set semantics, order-free
    assert(m(1L) !== m(3L))
    assert(m(1L).length === 32)
  }

  test("simhash: identical docs → distance 0; near docs closer than far") {
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val base = (1 to 40).map(i => s"tok$i")
    val df = Seq(
      (1L, base), (2L, base),
      (3L, base.updated(0, "CHANGED").updated(1, "ALSO")),
      (4L, (1 to 40).map(i => s"other$i")))
      .toDF("id", "toks")
      .select(col("id"), simhash64(col("toks")).as("sig"))
    val m = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ham(m(1L), m(2L)) === 0)
    assert(ham(m(1L), m(3L)) < ham(m(1L), m(4L)))
  }

  test("word_gram_hashes is bit-identical to the slice/array_join/xxhash64 HOF") {
    // the one-pass form must replicate the interpreted HOF exactly,
    // including the whitespace corner cases where split-on-" " produces
    // empty words (consecutive / leading / trailing spaces), non-ASCII
    // multi-byte text, and the fewer-than-n-words empty-array guard
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "a b c d e f g h",            // exactly 8 words
      "a b c d e f g",              // 7 words → empty
      "",                           // empty string
      "double  space between words makes empty tokens here ok",
      " leading space and then some more words to pass eight",
      "trailing words that reach at least eight tokens total here ",
      "ünïcode wörds with émojis 🎉 and multi-byte çharacters everywhere padded out",
      "x " * 20)                    // repeated grams
    for (n <- Seq(3, 8)) {
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val words = split(col("text"), " ")
      val want = df.select(col("id"),
        when(size(words) >= n,
            transform(sequence(lit(1), size(words) - lit(n - 1)),
              i => xxhash64(array_join(slice(words, i, lit(n)), " "))))
          .otherwise(array().cast("array<bigint>")).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      val got = df.select(col("id"), word_gram_hashes(col("text"), n).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(got === want, s"n=$n")
    }
  }
}
