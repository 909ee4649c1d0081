package graft

import org.apache.spark.sql.functions._

import graft.Tables.load
import graft.functions.{CosineSimilarityExpr, VectorOps}

/** Native cosine Expression: registration paths, agreement with the HOF
  * implementation, SQL usability, and error behavior. */
class CosineExprSpec extends SparkSpecBase {

  override def beforeAll(): Unit = {
    super.beforeAll()
    CosineSimilarityExpr.register(spark)
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
