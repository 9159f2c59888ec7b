package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SQL registry must be the SAME functions as the Column API — parity
  * checked value-for-value — plus the two wiring paths (register() on a live
  * session, spark.sql.extensions on a fresh one) and the literal-only
  * contract for kernel shape arguments.
  */
class GraftExtensionsSpec extends SparkSpec {

  private val sentence = "the quick brown fox jumps over the lazy dog"

  test("register() exposes kernels to spark.sql with Column-API parity") {
    GraftExtensions.register(spark)
    val viaSql = spark.sql(
      s"""SELECT graft_token_count(t) AS n,
         |       graft_fingerprint(t) AS fp,
         |       graft_minhash(graft_shingles(t, 3), 16) AS sig,
         |       graft_murmur2(encode(t, 'UTF-8')) AS m,
         |       graft_kafka_partition(encode(t, 'UTF-8'), 12) AS p,
         |       graft_stopword_count(graft_tokens(t), 'the,a,of') AS sw,
         |       round(graft_quality_score(t), 6) AS q
         |FROM VALUES ('$sentence') v(t)""".stripMargin).head()

    import spark.implicits._
    val t = Seq(sentence).toDF("t")
    val viaCol = t.select(
      graft.text.TextFunctions.tokenCount(col("t")).as("n"),
      graft.text.TextFunctions.fingerprint(col("t")).as("fp"),
      graft.functions.KFunctions.minhash_sig(
        graft.text.TextFunctions.shingles(col("t"), 3), 16).as("sig"),
      graft.functions.KFunctions.kafka_murmur2(encode(col("t"), "UTF-8")).as("m"),
      graft.functions.KFunctions.kafka_partition(encode(col("t"), "UTF-8"), 12).as("p"),
      graft.functions.KFunctions.string_in_set_count(
        graft.text.TextFunctions.tokens(col("t")), Seq("the", "a", "of")).as("sw"),
      round(graft.text.TextFunctions.qualityScore(col("t")), 6).as("q")).head()

    assert(viaSql.getInt(0) == viaCol.getInt(0))
    assert(viaSql.getLong(1) == viaCol.getLong(1))
    assert(viaSql.getSeq[Long](2) == viaCol.getSeq[Long](2))
    assert(viaSql.getInt(3) == viaCol.getInt(3))
    assert(viaSql.getInt(4) == viaCol.getInt(4))
    assert(viaSql.getInt(5) == viaCol.getInt(5))
    assert(viaSql.getDouble(6) == viaCol.getDouble(6))
  }

  test("URL functions in SQL: normalize, domain key, extraction") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_normalize_url('HTTPS://WWW.Ex.org:443/a/?utm_x=1&b=2#f') AS u,
        |       graft_url_domain('http://www.Ex.org/path') AS d,
        |       graft_extract_urls('see http://a.io/x now') AS us""".stripMargin).head()
    assert(r.getString(0) == "https://www.ex.org/a?b=2")
    assert(r.getString(1) == "ex.org")
    assert(r.getSeq[String](2) == Seq("http://a.io/x"))
  }

  test("HTML extraction and phash in SQL") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_html_text('<p>a</p><script>x<1</script><p>b &amp; c</p>') AS t,
        |       graft_phash('audio', encode('some payload bytes', 'UTF-8')) AS h,
        |       graft_phash('audio', CAST(NULL AS BINARY)) AS hn""".stripMargin).head()
    assert(r.getString(0) == "a\nb & c")
    // SQL answer equals the Column-API answer (one definition)
    import spark.implicits._
    val viaCol = Seq(("audio", "some payload bytes".getBytes("UTF-8")))
      .toDF("mt", "content")
      .select(graft.multimodal.Multimodal.phash(col("mt"), col("content")))
      .head().getLong(0)
    assert(r.getLong(1) == viaCol)
    assert(r.isNullAt(2), "null payload hashes to NULL")
  }

  test("retrieval embedding + inner product in SQL, Column-API parity") {
    GraftExtensions.register(spark)
    val r = spark.sql(
      """SELECT graft_hash_embedding('hello world', 4, 'emb') AS v,
        |       graft_inner_product(array(1L, 2L, 3L), array(4L, 5L, 6L)) AS ip
        |""".stripMargin).head()
    assert(r.getLong(1) == 32L)
    import spark.implicits._
    val viaCol = Seq("hello world").toDF("t")
      .select(graft.ann.Retrieval.hashEmbedding(col("t"), 4, "emb"))
      .as[Seq[Long]].head()
    assert(r.getSeq[Long](0) == viaCol)
  }

  test("kernel shape arguments must be constant-foldable") {
    GraftExtensions.register(spark)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_minhash(graft_shingles(t, 3), n) " +
        "FROM VALUES ('x y z', 4) v(t, n)").collect()
    }
    assert(err.getMessage.contains("constant INT"),
      s"non-literal k must be rejected at analysis time, got: ${err.getMessage}")
  }

  test("spark.sql.extensions wires the same registry into a fresh session") {
    val shared = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // getOrCreate reads spark.sql.extensions from the CONTEXT's SparkConf
    // (where spark-submit --conf puts it) — a builder .config() on an
    // already-running context never lands there, so set it the way a real
    // deployment does and restore after
    val conf = org.apache.spark.graftbridge.TestConfBridge.liveConf(shared.sparkContext)
    conf.set("spark.sql.extensions", "graft.GraftExtensions")
    try {
      val s2 = SparkSession.builder()
        .master("local[4]")
        .getOrCreate()
      // same SparkContext, NEW session object with the extensions applied —
      // never s2.stop(): that would kill the suite-shared context
      assert(s2 ne shared)
      assert(s2.sql("SELECT graft_token_count('a b  c') AS n").head().getInt(0) == 3)
      assert(s2.sql("SELECT graft_cjk_count('汉字 abc') AS n").head().getInt(0) == 2)
    } finally {
      conf.remove("spark.sql.extensions")
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}
