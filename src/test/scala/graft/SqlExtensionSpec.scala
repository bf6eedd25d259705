package graft

import org.apache.spark.sql.graftbridge.FunctionInstaller

/** The SparkSessionExtensions SQL surface: vec_dot / vec_norm / vec_cosine
  * resolve in plain SQL and produce the native-expression results. The shared
  * test session is built `.withExtensions(new GraftExtensions)` (the
  * injection path); FunctionInstaller re-registration (the already-built-
  * session path) must be idempotent on top of it. */
class SqlExtensionSpec extends SparkTestBase {

  test("vec_dot / vec_norm / vec_cosine resolve via the extensions hook") {
    val r = spark.sql(
      """SELECT vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
        |       vec_norm(array(3.0D, 4.0D)) AS n,
        |       round(vec_cosine(array(1.0D, 0.0D), array(1.0D, 1.0D)), 6) AS c
        |""".stripMargin).head()
    assert(r.getDouble(0) === 11.0)
    assert(r.getDouble(1) === 5.0)
    assert(r.getDouble(2) === math.round(math.sqrt(0.5) * 1e6) / 1e6)
  }

  test("float input promotes through the array<double> boundary cast") {
    val d = spark.sql(
      "SELECT vec_dot(CAST(array(1.5, 2.5) AS ARRAY<FLOAT>), array(2.0D, 2.0D)) AS d")
      .head().getDouble(0)
    assert(d === 8.0)
  }

  test("simhash32 resolves in SQL and matches the DataFrame batch signature") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox"), (2L, "pack my box"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("sqlsim_docs")
    val viaSql = spark.sql(
      """SELECT doc_id, simhash32(filter(split(lower(regexp_replace(text,
        |  '[^a-z0-9]+', ' ')), ' '), t -> t <> '')) AS sig
        |FROM sqlsim_docs""".stripMargin)
      .as[(Long, Long)].collect().toMap
    val viaBatch = graft.ext.DedupOps.simhash(docs, col("doc_id"), col("text"))
      .as[(Long, Long)].collect().toMap
    assert(viaSql === viaBatch)
  }

  test("FunctionInstaller registration on a built session is idempotent") {
    FunctionInstaller.install(spark)
    FunctionInstaller.install(spark)
    val d = spark.sql("SELECT vec_dot(array(2.0D), array(3.0D)) AS d").head().getDouble(0)
    assert(d === 6.0)
  }

  test("wrong arity fails analysis with the arity message") {
    val e = intercept[Exception] {
      spark.sql("SELECT vec_dot(array(1.0D))").head()
    }
    assert(e.getMessage.contains("vec_dot expects 2 arguments"))
  }

  test("kmv_agg resolves in SQL and matches the DataFrame sketch") {
    import spark.implicits._
    val df = Seq.tabulate(100)(i => ("s", s"v${i % 25}")).toDF("g", "k")
    df.createOrReplaceTempView("kmv_in")
    val viaSql = spark.sql(
        """SELECT g, kmv_agg(
          |  CAST(conv(substring(md5(CAST(k AS STRING)), 1, 15), 16, 10)
          |    AS BIGINT), 16) AS kmv
          |FROM kmv_in GROUP BY g""".stripMargin)
      .as[(String, Seq[Long])].collect().toMap
    val viaBatch = graft.ext.SketchOps.kmvState(df,
        org.apache.spark.sql.functions.col("g"),
        org.apache.spark.sql.functions.col("k"), 16)
      .as[(String, Seq[Long])].collect().toMap
    assert(viaSql === viaBatch)
    val bad = intercept[Exception] {
      spark.sql("SELECT kmv_agg(1, id) FROM range(2) GROUP BY 1").head()
    }
    assert(bad.getMessage.contains("literal"))
  }
}
