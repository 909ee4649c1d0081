package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.{CosineSimilarityExpr, DotProductExpr, NearestCentroidExpr, VectorOps}

/** Native cosine Expression: registration paths, agreement with the HOF
  * implementation, SQL usability, and error behavior. */
class CosineExprSpec extends SparkSpecBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    CosineSimilarityExpr.register(spark)
    DotProductExpr.register(spark)
    NearestCentroidExpr.register(spark)
  }

  test("GraftExtensions wires the full native surface without error") {
    // extensions apply at session construction; here we drive the hook
    // directly (same code path) — a bad builder arity/shape throws here
    new graft.functions.GraftExtensions()
      .apply(new org.apache.spark.sql.SparkSessionExtensions)
  }

  test("all six native functions are callable from SQL") {
    graft.functions.SignatureExprs.register(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS c,
        |  graft_dot(array(2.0D, 3.0D), array(4.0D, 5.0D)) AS d,
        |  graft_nearest_centroid(array(1.0D), array(5L), array(array(1.0D))) AS nc,
        |  graft_minhash(array('a', 'b'), 4) AS mh,
        |  graft_simhash(array('a', 'b')) AS sh,
        |  graft_hyperplane(array(1.0D, -1.0D), 4) AS hp""".stripMargin)
      .collect().head
    assert(r.getDouble(0) == 1.0)
    assert(r.getDouble(1) == 23.0)
    assert(r.getLong(2) == 5L)
    assert(r.getSeq[Long](3).length == 4)
  }

  test("graft_dot matches the HOF dot product") {
    val emb = load(spark, sf, "embeddings").limit(30)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        call_function("graft_dot",
          col("a.embedding"), col("b.embedding")).as("native"),
        VectorOps.dot(
          VectorOps.asDouble(col("a.embedding")),
          VectorOps.asDouble(col("b.embedding"))).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach(r => assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6))
  }

  test("graft_nearest_centroid picks the argmax-dot cell with id tiebreak") {
    import org.apache.spark.sql.Row
    val rows = spark.sql(
      """SELECT graft_nearest_centroid(array(1.0D, 0.0D),
        |  array(7L, 3L),
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS cell""".stripMargin)
      .collect()
    assert(rows.head.getLong(0) == 7L)
    // tie on dot → smallest cid wins
    val tie = spark.sql(
      """SELECT graft_nearest_centroid(array(0.0D, 0.0D),
        |  array(9L, 2L),
        |  array(array(1.0D, 0.0D), array(0.0D, 1.0D))) AS cell""".stripMargin)
      .collect()
    assert(tie.head.getLong(0) == 2L)
  }

  test("native expression matches the higher-order-function cosine") {
    val emb = load(spark, sf, "embeddings").limit(50)
    val pairs = emb.as("a").crossJoin(emb.as("b"))
      .filter(col("a.vec_id") < col("b.vec_id"))
      .select(
        call_function("graft_cosine",
          col("a.embedding"), col("b.embedding")).as("native"),
        VectorOps.cosine(
          VectorOps.asDouble(col("a.embedding")),
          VectorOps.asDouble(col("b.embedding"))).as("hof"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-6)
    }
  }

  test("usable from plain SQL after registration") {
    load(spark, sf, "embeddings").limit(5)
      .createOrReplaceTempView("emb_sql_test")
    val rows = spark.sql(
      """SELECT vec_id, graft_cosine(embedding, embedding) AS self
        |FROM emb_sql_test""".stripMargin).collect()
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9))
  }

  test("length mismatch fails loudly") {
    val e = intercept[Exception] {
      spark.sql(
        "SELECT graft_cosine(array(1.0F, 2.0F), array(1.0F)) AS c").collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("length mismatch")))
  }

  test("type check rejects non-array args") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(1, 2)").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array") ||
      e.getMessage.contains("DATATYPE_MISMATCH"))
  }
}
