package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Statistical aggregates, date-part analytics, hierarchical rollup, and
  * a classic shipping-priority join — coverage beyond the §2 minimum
  * that a warehouse user expects day-one.
  */
object Analytics extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact interpolated median, sample stddev, and correlation — the
    * statistical aggregate family (both engines use linear interpolation
    * for continuous quantiles and the n−1 sample variance).
    */
  val qStats: Q = Q(
    "q_stats",
    Some("""SELECT l_returnflag,
            round(quantile_cont(l_quantity, 0.5), 4) AS median_qty,
            round(stddev_samp(l_quantity), 4) AS sd_qty,
            round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
            round(avg(l_discount), 4) AS avg_disc
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(expr("percentile(l_quantity, 0.5)"), 4).as("median_qty"),
          round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qty_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"))
        .orderBy(col("l_returnflag")))

  /** Calendar decomposition of the order date. */
  val qDateParts: Q = Q(
    "q_date_parts",
    Some("""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
            CAST(month(o_orderdate) AS BIGINT) AS mo,
            count(*) AS n_orders,
            round(sum(o_totalprice), 2) AS revenue
            FROM orders
            GROUP BY year(o_orderdate), month(o_orderdate)
            ORDER BY yr, mo"""),
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("revenue"))
        .orderBy(col("yr"), col("mo")))

  /** Hierarchical ROLLUP (subtotals + grand total) — free in Spark,
    * absent from the reference (SURVEY §2.4 note).
    */
  val qRollup: Q = Q(
    "q_rollup",
    Some("""SELECT coalesce(l_returnflag, '(all)') AS flag,
            coalesce(l_linestatus, '(all)') AS status,
            count(*) AS n, round(sum(l_quantity), 2) AS qty
            FROM lineitem
            GROUP BY ROLLUP (l_returnflag, l_linestatus)
            ORDER BY flag, status"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_quantity")), 2).as("qty"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("status"),
          col("n"), col("qty"))
        .orderBy(col("flag"), col("status")))

  /** TPC-H Q3 shape: shipping priority — selective dimension filters on
    * both sides of the fact join, revenue top-k.
    */
  val qShippingPriority: Q = Q(
    "q_shipping_priority",
    Some("""SELECT l_orderkey,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
            max(o_orderpriority) AS o_orderpriority
            FROM customer JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING' AND o_orderdate < TIMESTAMP '1998-01-01'
            GROUP BY l_orderkey
            ORDER BY revenue DESC, l_orderkey
            LIMIT 20"""),
    (s, dir) => {
      val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val l = t(s, dir, "lineitem")
      broadcast(c)
        .join(o, col("c_custkey") === col("o_custkey"))
        .join(l, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"))
        .agg(
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
          max(col("o_orderpriority")).as("o_orderpriority"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(20)
    })

  /** The SQL surface itself: the engine registers the tables as views
    * and executes the EXACT oracle string through spark.sql — one query
    * text, two engines, identical results (≙ the reference's SQL-over-
    * one-file surface, S2, minus the dual-engine split).
    */
  private val sharedSql =
    """SELECT n_name, o_orderpriority, count(*) AS n_orders,
      |round(sum(o_totalprice), 2) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderstatus = 'F'
      |GROUP BY n_name, o_orderpriority
      |ORDER BY n_name, o_orderpriority""".stripMargin

  val qSqlSurface: Q = Q(
    "q_sql_surface",
    Some(sharedSql),
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(sharedSql)
    })

  /** Set operations: INTERSECT (customers in both segments' buyer sets)
    * and EXCEPT (nations with customers but no suppliers).
    */
  val qSetOps: Q = Q(
    "q_set_ops",
    Some("""SELECT 'both' AS op, CAST(n_nationkey AS BIGINT) AS k FROM (
              SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
              INTERSECT
              SELECT n_nationkey FROM nation JOIN supplier ON s_nationkey = n_nationkey)
            UNION ALL
            SELECT 'cust_only', CAST(n_nationkey AS BIGINT) FROM (
              SELECT n_nationkey FROM nation JOIN customer ON c_nationkey = n_nationkey
              EXCEPT
              SELECT n_nationkey FROM nation JOIN supplier ON s_nationkey = n_nationkey)
            ORDER BY op, k"""),
    (s, dir) => {
      val n = t(s, dir, "nation")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val custNations = n.join(c, n("n_nationkey") === c("c_nationkey"))
        .select(n("n_nationkey").cast("long").as("k"))
      val suppNations = n.join(su, n("n_nationkey") === su("s_nationkey"))
        .select(n("n_nationkey").cast("long").as("k"))
      custNations.intersect(suppNations).select(lit("both").as("op"), col("k"))
        .unionByName(
          custNations.except(suppNations).select(lit("cust_only").as("op"), col("k")))
        .orderBy(col("op"), col("k"))
    })

  /** Full CUBE over two grouping dimensions. */
  val qCube: Q = Q(
    "q_cube",
    Some("""SELECT coalesce(l_returnflag, '(all)') AS flag,
            coalesce(l_linestatus, '(all)') AS status,
            count(*) AS n
            FROM lineitem
            GROUP BY CUBE (l_returnflag, l_linestatus)
            ORDER BY flag, status"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"))
        .select(
          coalesce(col("l_returnflag"), lit("(all)")).as("flag"),
          coalesce(col("l_linestatus"), lit("(all)")).as("status"),
          col("n"))
        .orderBy(col("flag"), col("status")))

  /** Pivot (long→wide, the inverse of U2's unpivot): per-status quantity
    * columns. With an explicit value list the pivot is exactly
    * conditional aggregation, which is how the oracle states it.
    */
  val qPivot: Q = Q(
    "q_pivot",
    Some("""SELECT l_returnflag,
            round(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 2) AS qty_f,
            round(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 2) AS qty_o,
            round(sum(CASE WHEN l_linestatus = 'P' THEN l_quantity END), 2) AS qty_p
            FROM lineitem
            GROUP BY l_returnflag
            ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O", "P"))
        .agg(round(sum(col("l_quantity")), 2))
        .select(
          col("l_returnflag"),
          col("F").as("qty_f"), col("O").as("qty_o"), col("P").as("qty_p"))
        .orderBy(col("l_returnflag")))

  /** Explicit GROUPING SETS (mixed granularities in one pass). */
  val qGroupingSets: Q = Q(
    "q_grouping_sets",
    Some("""SELECT coalesce(l_returnflag, '(all)') AS flag,
            coalesce(l_linestatus, '(all)') AS status,
            count(*) AS n
            FROM lineitem
            GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
            ORDER BY flag, status"""),
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql("""SELECT coalesce(l_returnflag, '(all)') AS flag,
               coalesce(l_linestatus, '(all)') AS status,
               count(*) AS n
               FROM lineitem
               GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
               ORDER BY flag, status""")
    })

  /** Null-safe comparison semantics: IS NOT DISTINCT FROM (Spark `<=>`)
    * vs plain equality over nullable values.
    */
  val qNullSemantics: Q = Q(
    "q_null_semantics",
    Some("""SELECT
            CAST(sum(CASE WHEN c_name IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
            CAST(sum(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS unmatched,
            CAST(sum(CASE WHEN c_name IS NOT DISTINCT FROM NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_safe_null
            FROM (SELECT c_name FROM orders LEFT JOIN customer ON o_custkey = c_custkey AND c_acctbal > 9000)"""),
    (s, dir) => {
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      o.join(
        broadcast(c),
        col("o_custkey") === col("c_custkey") && col("c_acctbal") > 9000, "left")
        .agg(
          sum(when(col("c_name").isNotNull, 1).otherwise(0)).cast("long").as("matched"),
          sum(when(col("c_name").isNull, 1).otherwise(0)).cast("long").as("unmatched"),
          sum(when(col("c_name") <=> lit(null), 1).otherwise(0)).cast("long").as("null_safe_null"))
    })

  override def queries: Seq[Q] =
    Seq(qStats, qDateParts, qRollup, qShippingPriority, qSqlSurface, qSetOps, qCube,
      qPivot, qGroupingSets, qNullSemantics)
}
