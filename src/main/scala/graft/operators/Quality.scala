package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.load

/** Data-quality validation — the constraint-check report (completeness,
  * uniqueness, referential integrity, domain ranges) a pipeline runs
  * against a table family before shipping it; the Spark-side
  * equivalent of a Deequ-style check suite, expressed as plain
  * aggregates so the whole report is one oracle-gated query.
  *
  * Output is LONG format — (check, n_bad) — so adding a check never
  * changes the schema and a zero row proves the check RAN (absence of
  * a check is distinguishable from absence of violations).
  *
  * Scale: each check is one scan-aggregate or one key-only anti-join;
  * checks on the same table share its scan under one union when the
  * optimizer collapses them, and every join carries keys, not rows.
  * The report output is #checks rows. */
object Quality {

  /** Constraint report over the orders/lineitem/customer/nation family:
    * completeness (nulls), uniqueness (duplicate keys), referential
    * integrity (orphan FKs), and domain checks (quantity/discount
    * ranges). */
  def dataQualityReport(orders: DataFrame, lineitem: DataFrame,
      customer: DataFrame, nation: DataFrame): DataFrame = {
    def check(name: String, df: DataFrame): DataFrame =
      df.select(lit(name).as("check_name"), count(lit(1)).as("n_bad"))
    val dupOrders = orders.groupBy("o_orderkey")
      .agg(count(lit(1)).as("c")).filter(col("c") > 1)
    val orphanLi = lineitem.select(col("l_orderkey"))
      .join(orders.select(col("o_orderkey").as("l_orderkey")),
        Seq("l_orderkey"), "left_anti")
    val orphanCust = customer.select(col("c_nationkey"))
      .join(nation.select(col("n_nationkey").as("c_nationkey")),
        Seq("c_nationkey"), "left_anti")
    val orphanOrders = orders.select(col("o_custkey"))
      .join(customer.select(col("c_custkey").as("o_custkey")),
        Seq("o_custkey"), "left_anti")
    Seq(
      check("orders_null_priority",
        orders.filter(col("o_orderpriority").isNull)),
      check("orders_dup_orderkey", dupOrders),
      check("orders_orphan_custkey", orphanOrders),
      check("lineitem_orphan_orderkey", orphanLi),
      check("lineitem_qty_out_of_range",
        lineitem.filter(col("l_quantity") < 1 || col("l_quantity") > 50)),
      check("lineitem_discount_out_of_range",
        lineitem.filter(col("l_discount") < 0 || col("l_discount") > 0.1)),
      check("customer_orphan_nationkey", orphanCust)
    ).reduce(_.unionAll(_))
  }

  def q96DataQuality(spark: SparkSession, dir: String): DataFrame =
    dataQualityReport(load(spark, dir, "orders"),
      load(spark, dir, "lineitem"), load(spark, dir, "customer"),
      load(spark, dir, "nation"))
      .orderBy("check_name")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q96_data_quality" -> (q96DataQuality _),
  )

  val oracle: Map[String, String] = Map(
    // Same checks as scalar subqueries; NOT IN is safe — the key
    // columns are non-null in this schema (and the anti-join form on
    // the Spark side is null-agnostic anyway).
    "q96_data_quality" ->
      """SELECT * FROM (
        |  SELECT 'orders_null_priority' AS check_name, (
        |    SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL
        |  ) AS n_bad
        |  UNION ALL
        |  SELECT 'orders_dup_orderkey', (
        |    SELECT COUNT(*) FROM (
        |      SELECT o_orderkey FROM orders GROUP BY o_orderkey
        |      HAVING COUNT(*) > 1))
        |  UNION ALL
        |  SELECT 'orders_orphan_custkey', (
        |    SELECT COUNT(*) FROM orders
        |    WHERE o_custkey NOT IN (SELECT c_custkey FROM customer))
        |  UNION ALL
        |  SELECT 'lineitem_orphan_orderkey', (
        |    SELECT COUNT(*) FROM lineitem
        |    WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders))
        |  UNION ALL
        |  SELECT 'lineitem_qty_out_of_range', (
        |    SELECT COUNT(*) FROM lineitem
        |    WHERE l_quantity < 1 OR l_quantity > 50)
        |  UNION ALL
        |  SELECT 'lineitem_discount_out_of_range', (
        |    SELECT COUNT(*) FROM lineitem
        |    WHERE l_discount < 0 OR l_discount > 0.1)
        |  UNION ALL
        |  SELECT 'customer_orphan_nationkey', (
        |    SELECT COUNT(*) FROM customer
        |    WHERE c_nationkey NOT IN (SELECT n_nationkey FROM nation))
        |) ORDER BY check_name""".stripMargin,
  )
}
