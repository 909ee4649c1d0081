package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  // ---------------------------------------------------------------- q162

  /** Q162: BENFORD first-digit audit of order totals — the forensic
    * data-quality check (fabricated or unit-mangled monetary data
    * flattens the leading-digit distribution; organic data follows
    * Benford's log curve). Emits the observed first-digit histogram
    * with exact ppm shares; judging against the Benford curve is the
    * reader's log-table lookup — the GATE carries only integers.
    *
    * Determinism: price → exact DECIMAL → BIGINT cents; the leading
    * digit comes from the BIGINT's decimal rendering (positive BIGINT
    * → identical digit strings in both engines — no float formatting
    * in sight). Scale: one partial-combining 9-row agg + a window
    * total over 9 rows. */
  def q162Benford(spark: SparkSession, dir: String): DataFrame = {
    val wAll = Window.partitionBy()
    load(spark, dir, "orders")
      .select(expr(
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .as("c"))
      .filter(col("c") > 0)
      .select(expr("CAST(substring(CAST(c AS STRING), 1, 1) AS BIGINT)")
        .as("d1"))
      .groupBy("d1").agg(count(lit(1)).as("n"))
      .withColumn("total", sum(col("n")).over(wAll))
      .select(col("d1"), col("n"),
        expr("(n * 1000000) div total").as("share_ppm"))
      .orderBy("d1")
  }

  // ---------------------------------------------------------------- q163

  /** Q163: K-ANONYMITY audit — for the quasi-identifier pair (nation,
    * market segment): at each disclosure threshold k ∈ {2, 5, 10,
    * 25}, how many equivalence classes fall below k and how many
    * ROWS those classes expose. The privacy-risk report a dataset
    * release runs before publishing joins of "harmless" demographic
    * columns — a compliance-audit CLASS nothing else in the surface
    * covers.
    *
    * Scale: one partial-combining QI-class count (classes ≪ rows),
    * then a 4× threshold fan-out over the class frame. All-integer. */
  def q163KAnonymity(spark: SparkSession, dir: String): DataFrame =
    load(spark, dir, "customer")
      .groupBy("c_nationkey", "c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .select(explode(expr("array(2L, 5L, 10L, 25L)")).as("k"),
        col("n"))
      .groupBy("k")
      .agg(count(lit(1)).as("n_classes"),
        expr("CAST(count_if(n < k) AS BIGINT)").as("classes_below"),
        expr("CAST(sum(CASE WHEN n < k THEN n ELSE 0L END) AS BIGINT)")
          .as("rows_exposed"))
      .orderBy("k")

  def q96DataQuality(spark: SparkSession, dir: String): DataFrame =
    dataQualityReport(load(spark, dir, "orders"),
      load(spark, dir, "lineitem"), load(spark, dir, "customer"),
      load(spark, dir, "nation"))
      .orderBy("check_name")

  // ---------------------------------------------------------------- q180

  /** Q180: COLUMN PROFILING — the data-profiling primitive every
    * warehouse onboarding runs (and the input to constraint inference
    * à la q96): per column of the events table, row count, null count,
    * and EXACT distinct cardinality, in long format. Distinct from
    * q96's rule CHECKING: profiling discovers the shape rules are
    * written against.
    *
    * One aggregation pass per column — deliberate: parquet column
    * pruning makes each pass read exactly one column, which is how a
    * 100 TB profiler is actually run (per-column scans parallelize
    * independently; a single multi-countDistinct agg would EXPAND the
    * scan |cols|× through one shuffle instead). The exact-distinct
    * shuffle carries one column's values; the q13 HLL path is the
    * documented approximation when even that is too wide. */
  def profile(df: org.apache.spark.sql.DataFrame,
      cols: Seq[String]): org.apache.spark.sql.DataFrame =
    cols.map { c =>
      df.agg(count(lit(1)).as("n_rows"), count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col("n_nonnull")).as("n_null"),
          col("n_distinct"))
    }.reduce(_ unionByName _)

  def q180Profile(spark: SparkSession, dir: String): DataFrame =
    profile(graft.Tables.events(spark, dir),
      Seq("event_id", "ts", "user_id", "event_type", "value", "props"))
      .orderBy("col_name")

  // ---------------------------------------------------------------- q207

  /** Q207: PARTITION-KEY SKEW AUDIT — for each candidate shuffle key,
    * the numbers an engineer reads BEFORE choosing join/bucket keys at
    * 100 TB: distinct-key count, rows, the hottest key's row count and
    * corpus share (ppm), and the hot/mean ratio in e3 (how many times
    * the mean the hottest reducer would carry). The repo's whole skew
    * playbook (SCALE.md) starts with this measurement; shipping it as
    * a graded query makes the audit itself first-class.
    *
    * Long format: (key_col, n_rows, n_keys, max_cnt, top_share_ppm,
    * skew_x1000 = max_cnt·n_keys·1000 div n_rows — 1000 = perfectly
    * uniform). Per column: one partial-combining count agg + a 1-row
    * rollup; hottest-key selection is an argmax, no sort. */
  def skewAudit(cols: Seq[(String, DataFrame, String)]): DataFrame =
    cols.map { case (name, df, key) =>
      df.select(col(key).cast("long").as("k"))
        .groupBy("k").agg(count(lit(1)).as("c"))
        .agg(sum(col("c")).as("n_rows"), count(lit(1)).as("n_keys"),
          max(col("c")).as("max_cnt"))
        .select(lit(name).as("key_col"), col("n_rows"), col("n_keys"),
          col("max_cnt"),
          expr("(max_cnt * 1000000) div n_rows").as("top_share_ppm"),
          expr("(max_cnt * n_keys * 1000) div n_rows").as("skew_x1000"))
    }.reduce(_ unionByName _).orderBy("key_col")

  def q207SkewAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    skewAudit(Seq(
      ("events.user_id", graft.Tables.events(spark, dir), "user_id"),
      ("lineitem.l_orderkey", li, "l_orderkey"),
      ("lineitem.l_partkey", li, "l_partkey"),
      ("lineitem.l_suppkey", li, "l_suppkey"),
      ("orders.o_custkey", load(spark, dir, "orders"), "o_custkey")))
  }

  // ---------------------------------------------------------------- q215

  /** Q215: FUNCTIONAL-DEPENDENCY AUDIT — for each candidate FD
    * A → B: how many A-values exist, how many of them map to more
    * than one B (violations), and a holds bit. The schema-inference /
    * normalization primitive profilers run to discover real
    * constraints (q96 CHECKS declared constraints; this DISCOVERS
    * which hold) — a violated "key → attribute" FD is a dirty
    * dimension, a held one is a normalization candidate.
    *
    * Values compare as strings (uniform across types). Scale: one
    * partial-combining (A → distinct-B count) aggregate per FD +
    * a 1-row rollup; FDs on the same table share its scan cache. */
  /** Frame-shaped core of q215 (SqlSurface view builder entry): each
    * entry is (fd name, frame, lhs col, rhs col). */
  def fdAudit(fds: Seq[(String, DataFrame, String, String)]): DataFrame =
    fds.map { case (name, df, lhs, rhs) =>
      df.select(col(lhs).cast("string").as("l"),
          col(rhs).cast("string").as("r"))
        .groupBy("l").agg(countDistinct(col("r")).as("nr"))
        .agg(count(lit(1)).as("n_lhs"),
          expr("CAST(count_if(nr > 1) AS BIGINT)").as("n_violating"))
        .select(lit(name).as("fd"), col("n_lhs"), col("n_violating"),
          when(col("n_violating") === 0, 1L).otherwise(0L).as("holds"))
    }.reduce(_ unionByName _).orderBy("fd")

  def q215FdAudit(spark: SparkSession, dir: String): DataFrame = {
    def fd(name: String, df: DataFrame, lhs: String,
        rhs: String) = (name, df, lhs, rhs)
    val li = load(spark, dir, "lineitem")
    fdAudit(Seq(
      fd("customer: c_nationkey->c_mktsegment",
        load(spark, dir, "customer"), "c_nationkey", "c_mktsegment"),
      fd("events: user_id->event_type",
        graft.Tables.events(spark, dir), "user_id", "event_type"),
      fd("lineitem: l_partkey->l_returnflag", li,
        "l_partkey", "l_returnflag"),
      fd("orders: o_custkey->o_orderpriority",
        load(spark, dir, "orders"), "o_custkey", "o_orderpriority"),
      fd("part: p_partkey->p_brand", load(spark, dir, "part"),
        "p_partkey", "p_brand")))
  }

  // ---------------------------------------------------------------- q221

  /** Q221: JOIN-CARDINALITY AUDIT — the EXACT output size of each
    * candidate fact join computed WITHOUT running the join:
    * |L ⋈ₖ R| = Σ_k cntL(k)·cntR(k) over the two per-key count
    * frames. At 100 TB this is how you find the join that would
    * explode BEFORE paying for it (a stats-estimator gives a guess;
    * this gives the number, at the cost of two cheap count aggs and a
    * key-frame join that is |keys|-sized, not |rows|-sized).
    * amplification = join rows per max-side row, in e3.
    *
    * Long format per join: (join_key, left_rows, right_rows,
    * n_matched_keys, join_rows, amp_x1000). */
  def joinCardinality(
      joins: Seq[(String, DataFrame, String, DataFrame, String)])
      : DataFrame =
    joins.map { case (name, l, lk, r, rk) =>
      val lc = l.groupBy(col(lk).cast("long").as("k"))
        .agg(count(lit(1)).as("cl"))
      val rc = r.groupBy(col(rk).cast("long").as("k"))
        .agg(count(lit(1)).as("cr"))
      lc.join(rc, "k")
        .agg(count(lit(1)).as("n_matched_keys"),
          sum(expr("cl * cr")).as("join_rows"))
        .crossJoin(broadcast(l.agg(count(lit(1)).as("left_rows"))))
        .crossJoin(broadcast(r.agg(count(lit(1)).as("right_rows"))))
        .select(lit(name).as("join_key"), col("left_rows"),
          col("right_rows"),
          coalesce(col("n_matched_keys"), lit(0L))
            .as("n_matched_keys"),
          coalesce(col("join_rows"), lit(0L)).as("join_rows"),
          expr("(coalesce(join_rows, 0) * 1000) div " +
            "greatest(left_rows, right_rows)").as("amp_x1000"))
    }.reduce(_ unionByName _).orderBy("join_key")

  def q221JoinCardinality(spark: SparkSession,
      dir: String): DataFrame = {
    val li = load(spark, dir, "lineitem")
    val o = load(spark, dir, "orders")
    joinCardinality(Seq(
      ("customer.c_custkey=orders.o_custkey",
        load(spark, dir, "customer"), "c_custkey", o, "o_custkey"),
      ("lineitem.l_partkey=lineitem.l_partkey", li, "l_partkey",
        li, "l_partkey"),
      ("orders.o_orderkey=lineitem.l_orderkey", o, "o_orderkey",
        li, "l_orderkey"),
      ("part.p_partkey=lineitem.l_partkey",
        load(spark, dir, "part"), "p_partkey", li, "l_partkey")))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q221_join_cardinality" -> (q221JoinCardinality _),
    "q215_fd_audit" -> (q215FdAudit _),
    "q207_skew_audit" -> (q207SkewAudit _),
    "q96_data_quality" -> (q96DataQuality _),
    "q162_benford" -> (q162Benford _),
    "q163_k_anonymity" -> (q163KAnonymity _),
    "q180_profile" -> (q180Profile _),
  )

  val oracle: Map[String, String] = Map(
    // q221: same per-key count frames, same Σ cl·cr (both exact
    // BIGINT — counts per key are far under the overflow line).
    "q221_join_cardinality" -> Seq(
      ("customer.c_custkey=orders.o_custkey", "customer", "c_custkey",
        "orders", "o_custkey"),
      ("lineitem.l_partkey=lineitem.l_partkey", "lineitem",
        "l_partkey", "lineitem", "l_partkey"),
      ("orders.o_orderkey=lineitem.l_orderkey", "orders", "o_orderkey",
        "lineitem", "l_orderkey"),
      ("part.p_partkey=lineitem.l_partkey", "part", "p_partkey",
        "lineitem", "l_partkey"))
      .map { case (name, lt, lk, rt, rk) =>
        s"""SELECT '$name' AS join_key,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $lt) AS left_rows,
           |  (SELECT CAST(COUNT(*) AS BIGINT) FROM $rt) AS right_rows,
           |  CAST(COUNT(*) AS BIGINT) AS n_matched_keys,
           |  COALESCE(CAST(SUM(cl * cr) AS BIGINT), 0) AS join_rows,
           |  (COALESCE(CAST(SUM(cl * cr) AS BIGINT), 0) * 1000) //
           |    greatest((SELECT CAST(COUNT(*) AS BIGINT) FROM $lt),
           |      (SELECT CAST(COUNT(*) AS BIGINT) FROM $rt))
           |    AS amp_x1000
           |FROM (SELECT CAST($lk AS BIGINT) AS k,
           |        COUNT(*) AS cl FROM $lt GROUP BY 1) a
           |JOIN (SELECT CAST($rk AS BIGINT) AS k,
           |        COUNT(*) AS cr FROM $rt GROUP BY 1) b
           |  USING (k)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY join_key"),
    // q215: same string-compared values, same distinct-RHS counting.
    "q215_fd_audit" -> Seq(
      ("customer: c_nationkey->c_mktsegment", "customer",
        "c_nationkey", "c_mktsegment"),
      ("events: user_id->event_type", "events",
        "user_id", "event_type"),
      ("lineitem: l_partkey->l_returnflag", "lineitem",
        "l_partkey", "l_returnflag"),
      ("orders: o_custkey->o_orderpriority", "orders",
        "o_custkey", "o_orderpriority"),
      ("part: p_partkey->p_brand", "part", "p_partkey", "p_brand"))
      .map { case (name, table, lhs, rhs) =>
        s"""SELECT '$name' AS fd,
           |  CAST(COUNT(*) AS BIGINT) AS n_lhs,
           |  CAST(count_if(nr > 1) AS BIGINT) AS n_violating,
           |  CASE WHEN count_if(nr > 1) = 0 THEN CAST(1 AS BIGINT)
           |       ELSE CAST(0 AS BIGINT) END AS holds
           |FROM (
           |  SELECT CAST($lhs AS VARCHAR) AS l,
           |    COUNT(DISTINCT CAST($rhs AS VARCHAR)) AS nr
           |  FROM $table GROUP BY 1)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY fd"),
    // q207: one two-level aggregate per key column, unioned; all
    // integer (counts + cross-multiplied ratios).
    "q207_skew_audit" -> Seq(
      ("events.user_id", "events", "user_id"),
      ("lineitem.l_orderkey", "lineitem", "l_orderkey"),
      ("lineitem.l_partkey", "lineitem", "l_partkey"),
      ("lineitem.l_suppkey", "lineitem", "l_suppkey"),
      ("orders.o_custkey", "orders", "o_custkey"))
      .map { case (name, table, key) =>
        s"""SELECT '$name' AS key_col,
           |  CAST(SUM(c) AS BIGINT) AS n_rows,
           |  CAST(COUNT(*) AS BIGINT) AS n_keys,
           |  CAST(MAX(c) AS BIGINT) AS max_cnt,
           |  (CAST(MAX(c) AS BIGINT) * 1000000) //
           |    CAST(SUM(c) AS BIGINT) AS top_share_ppm,
           |  (CAST(MAX(c) AS BIGINT) * CAST(COUNT(*) AS BIGINT)
           |    * 1000) // CAST(SUM(c) AS BIGINT) AS skew_x1000
           |FROM (SELECT $key, COUNT(*) AS c FROM $table
           |      GROUP BY $key)""".stripMargin
      }.mkString("", "\nUNION ALL\n", "\nORDER BY key_col"),
    // q180: one profiling select per column, unioned — COUNT(DISTINCT)
    // over identical parquet values is engine-exact for every type
    // here (timestamps compare at µs, doubles by IEEE equality).
    "q180_profile" -> Seq("event_id", "ts", "user_id", "event_type",
        "value", "props")
      .map(c => s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
           |  COUNT(*) - COUNT($c) AS n_null,
           |  COUNT(DISTINCT $c) AS n_distinct FROM events""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    // q162: same exact-cents leading digit (positive BIGINT renders
    // identical decimal strings in both engines).
    "q162_benford" ->
      """WITH c AS (
        |  SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |    AS BIGINT) AS c
        |  FROM orders),
        |d AS (
        |  SELECT CAST(substring(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
        |    AS d1, COUNT(*) AS n
        |  FROM c WHERE c > 0 GROUP BY 1),
        |t AS (SELECT d1, n, CAST(SUM(n) OVER () AS BIGINT) AS total
        |      FROM d)
        |SELECT d1, n, (n * 1000000) // total AS share_ppm
        |FROM t ORDER BY d1""".stripMargin,
    // q163: same QI-class counts, same threshold fan-out (UNNEST ≡
    // explode), CASE sums (no FILTER-clause dialect).
    "q163_k_anonymity" ->
      """WITH g AS (
        |  SELECT c_nationkey, c_mktsegment, COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2),
        |f AS (
        |  SELECT CAST(k AS BIGINT) AS k, n
        |  FROM g, UNNEST([2, 5, 10, 25]) AS u(k))
        |SELECT k, COUNT(*) AS n_classes,
        |  CAST(SUM(CASE WHEN n < k THEN 1 ELSE 0 END) AS BIGINT)
        |    AS classes_below,
        |  CAST(SUM(CASE WHEN n < k THEN n ELSE 0 END) AS BIGINT)
        |    AS rows_exposed
        |FROM f GROUP BY k ORDER BY k""".stripMargin,
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
