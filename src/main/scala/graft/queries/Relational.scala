package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.dsl.{BoolSetCompiler, Parser}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational operators from SURVEY.md §2 (scans, projections,
  * filters, joins, aggregations, sorts/top-k), exercised over the driver
  * testdata star schema with DuckDB oracles.
  *
  * Scale notes: only FIXED-cardinality dims (region 5, nation 25) carry
  * broadcast hints; customer/supplier/part scale with SF, so their join
  * strategy is left to statistics/AQE (broadcast at small SF, shuffle
  * join once they outgrow the threshold — a hint would forbid the
  * fallback). Fact-side aggregations rely on Catalyst partial
  * aggregation (map-side combine); top-k compiles to TakeOrderedAndProject
  * (no full sort). Double-valued aggregates are rounded to 2 decimals in
  * BOTH engines so float summation order can't flip the comparison.
  */
object Relational extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** ≙ SURVEY §2.4 A2/A4 + §2.2 P1/P4: filtered scan → groupBy agg →
    * sort. TPC-H Q1 shape over lineitem.
    */
  val q1Agg: Q = Q(
    "q1_agg",
    Some("""SELECT l_returnflag, l_linestatus,
            round(sum(l_quantity), 2) AS sum_qty,
            round(sum(l_extendedprice), 2) AS sum_base_price,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
            round(avg(l_quantity), 2) AS avg_qty,
            count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate < TIMESTAMP '2000-01-01'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus""".stripMargin),
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") < lit("2000-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
            .as("sum_disc_price"),
          round(avg(col("l_quantity")), 2).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")))

  /** ≙ SURVEY §2.5 O1: top-k by a sort column, DESC NULLS LAST, with an
    * explicit key tiebreak so the result set is deterministic across
    * engines. Plans as TakeOrderedAndProject.
    */
  val qTopk: Q = Q(
    "q_topk",
    Some("""SELECT o_orderkey, o_totalprice, o_orderstatus
            FROM orders
            ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
            LIMIT 100"""),
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
        .limit(100))

  /** ≙ SURVEY §2.3 J3/J7: multi-way star join (fact ⋈ broadcast dims) +
    * revenue aggregation. TPC-H Q5 shape.
    */
  val qJoinStar: Q = Q(
    "q_join_star",
    Some("""SELECT n_name,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS DOUBLE)
              / 100 AS revenue,
            count(*) AS n_rows
            FROM lineitem
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
            GROUP BY n_name
            ORDER BY n_name"""),
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val o = t(s, dir, "orders")
      val c = t(s, dir, "customer")
      val su = t(s, dir, "supplier")
      val n = t(s, dir, "nation")
      val r = t(s, dir, "region")
      // broadcast hints ONLY on the fixed-cardinality dims (nation 25,
      // region 5). customer/supplier scale WITH the fact tables, so a
      // forced broadcast is an OOM at the 100 TB grain — statistics/AQE
      // still broadcast them at small SF (PlanSpec pins 5 broadcast
      // joins) and degrade to shuffle joins when they outgrow the
      // threshold, which a hint would forbid.
      //
      // The region predicate is applied TRANSITIVELY before the fact
      // joins via [[graft.operators.Star.pruneFacts]]: r_name='ASIA'
      // names 5 nation keys, and c_nationkey = s_nationkey means
      // non-Asian customers/suppliers can never survive, so both
      // fact-side tables are pre-filtered through a broadcast semi
      // join on the 5-row Asian nation list. Catalyst cannot infer a
      // filter across a join equality, and without this the full fact
      // volume is shuffled three times before the first selective
      // join: at sf100 (600M lineitem) the naive order shuffled ~1.95B
      // rows and took 152 s; filtering the supplier side first cuts
      // lineitem to the Asian-supplier fifth BEFORE the orders and
      // customer exchanges (~1.0B rows shuffled).
      val asian = n
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .filter(r("r_name") === "ASIA")
        .select(n("n_nationkey"), n("n_name"))
      val Seq(suPruned, asianCu) = graft.operators.Star.pruneFacts(asian, "n_nationkey")(
        su -> "s_nationkey", c -> "c_nationkey")
      // n_name enrichment is separate from the prune: the semi join
      // carries no dim columns, so the projected attribute comes from
      // one more broadcast join on the already-pruned (≤1/5) supplier
      val asianSu = suPruned.join(
        broadcast(asian), suPruned("s_nationkey") === asian("n_nationkey"))
      li.join(asianSu, li("l_suppkey") === asianSu("s_suppkey"))
        .join(o, li("l_orderkey") === o("o_orderkey"))
        .join(
          asianCu,
          o("o_custkey") === asianCu("c_custkey") &&
            asianCu("c_nationkey") === asianSu("s_nationkey"))
        .groupBy(asianSu("n_name").as("n_name"))
        .agg(
          // Order-independent money sum: per-row round to integer cents
          // (positive values: HALF_UP == away-from-zero in both engines),
          // EXACT int64 accumulation, one final division. A plain
          // sum(double) is summation-order-nondeterministic; at sf1.0 the
          // accumulated error already exceeds the last rounded cent, and
          // at 100 TB it only grows.
          (sum(round(li("l_extendedprice") * (lit(1) - li("l_discount")) * 100)
            .cast("long")).cast("double") / 100).as("revenue"),
          count(lit(1)).as("n_rows"))
        .orderBy(col("n_name"))
    })

  /** ≙ SURVEY §2.3 J8/J9: left-outer join on a dimension key, nulls kept
    * visible through coalesce.
    */
  val qLeftJoin: Q = Q(
    "q_left_join",
    Some("""SELECT coalesce(c_mktsegment, '(none)') AS segment,
            count(*) AS n_orders,
            round(sum(o_totalprice), 2) AS sum_price
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            GROUP BY coalesce(c_mktsegment, '(none)')
            ORDER BY segment"""),
    (s, dir) =>
      t(s, dir, "orders")
        // customer scales with SF: no broadcast hint (stats/AQE decide)
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"), "left")
        .groupBy(coalesce(col("c_mktsegment"), lit("(none)")).as("segment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
        .orderBy(col("segment")))

  /** ≙ SURVEY §2.4 A1: DISTINCT + ORDER BY. */
  val qDistinctSort: Q = Q(
    "q_distinct_sort",
    Some("SELECT DISTINCT l_quantity AS quantity FROM lineitem ORDER BY quantity"),
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_quantity").as("quantity"))
        .distinct()
        .orderBy(col("quantity")))

  /** ≙ SURVEY §2.4 A3: scalar aggregate (single-row result). */
  val qScalarAgg: Q = Q(
    "q_scalar_agg",
    Some("""SELECT max(o_orderkey) AS max_key, min(o_orderkey) AS min_key,
            count(*) AS n_orders FROM orders"""),
    (s, dir) =>
      t(s, dir, "orders").agg(
        max(col("o_orderkey")).as("max_key"),
        min(col("o_orderkey")).as("min_key"),
        count(lit(1)).as("n_orders")))

  /** ≙ SURVEY §2.4 A7: COUNT(DISTINCT) inside HAVING. */
  val qHavingCountDistinct: Q = Q(
    "q_having_countd",
    Some("""SELECT l_orderkey, count(DISTINCT l_suppkey) AS n_supp,
            round(sum(l_quantity), 2) AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING count(DISTINCT l_suppkey) <= 2
            ORDER BY l_orderkey"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_supp"),
          round(sum(col("l_quantity")), 2).as("sum_qty"))
        .filter(col("n_supp") <= 2)
        .orderBy(col("l_orderkey")))

  /** The flagship: the reference's DSL query shape end-to-end
    * (SURVEY §2.8 + §2.3 J7 + §2.4 A5/A6/A7 + §2.5 O1), mapped onto the
    * star schema: "orders whose part-brand set satisfies a boolean
    * expression", with a price lower bound (≙ magnitude bounds), a
    * distinct-brand count limit (≙ fault-count limit) and top-k by price
    * (≙ rate). Runs through the real lexer → Pratt parser → Column
    * compiler; the oracle is the SQL the reference would have generated.
    */
  val qDslTopk: Q = Q(
    "q_dsl_topk",
    Some("""SELECT o.o_orderkey AS o_orderkey,
            max(o.o_orderstatus) AS o_orderstatus,
            max(o.o_totalprice) AS o_totalprice
            FROM orders o
            JOIN lineitem l ON o.o_orderkey = l.l_orderkey
            JOIN part p ON l.l_partkey = p.p_partkey
            WHERE o.o_totalprice IS NOT NULL AND o.o_totalprice >= 1000.0
            GROUP BY o.o_orderkey
            HAVING count(DISTINCT p.p_brand) <= 20
              AND ((sum(CASE WHEN p.p_brand = 'Brand#1' THEN 1 ELSE 0 END) > 0)
                AND ((sum(CASE WHEN p.p_brand = 'Brand#2' THEN 1 ELSE 0 END) > 0)
                  OR (NOT (sum(CASE WHEN p.p_brand = 'Brand#3' THEN 1 ELSE 0 END) > 0))))
            ORDER BY o_totalprice DESC NULLS LAST, o_orderkey
            LIMIT 100"""),
    (s, dir) => {
      val o = t(s, dir, "orders")
      val l = Tables.loadDistributed(s, dir, "lineitem", "l_orderkey")
      val p = t(s, dir, "part")
      val tree = Parser.parse("Brand#1 & (Brand#2 | !Brand#3)", extraAtomChars = "#")
      val compiled = BoolSetCompiler.compile(tree, col("p_brand"))
      val aggCols =
        Seq(
          max(o("o_orderstatus")).as("o_orderstatus"),
          max(o("o_totalprice")).as("o_totalprice"),
          countDistinct(p("p_brand")).as("__n_brands")) ++ compiled.flagCols
      o.join(l, o("o_orderkey") === l("l_orderkey"))
        // part scales with SF: no broadcast hint (stats/AQE decide)
        .join(p, l("l_partkey") === p("p_partkey"))
        .filter(o("o_totalprice").isNotNull && o("o_totalprice") >= 1000.0)
        .groupBy(o("o_orderkey"))
        .agg(aggCols.head, aggCols.tail: _*)
        .filter(col("__n_brands") <= 20 && compiled.predicate)
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc_nulls_last, col("o_orderkey"))
        .limit(100)
    })

  /** Left-semi join (EXISTS): customers with at least one urgent order. */
  val qSemiJoin: Q = Q(
    "q_semi_join",
    Some("""SELECT c_custkey, c_name FROM customer
            WHERE EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
            ORDER BY c_custkey"""),
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders").filter(col("o_orderpriority") === "1-URGENT")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    })

  /** Left-anti join (NOT EXISTS): parts never sold at a deep discount. */
  val qAntiJoin: Q = Q(
    "q_anti_join",
    Some("""SELECT p_partkey, p_brand FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem
                              WHERE l_partkey = p_partkey AND l_discount > 0.09)
            ORDER BY p_partkey"""),
    (s, dir) => {
      val p = t(s, dir, "part")
      val l = t(s, dir, "lineitem").filter(col("l_discount") > 0.09)
      p.join(l, p("p_partkey") === l("l_partkey"), "left_anti")
        .select(col("p_partkey"), col("p_brand"))
        .orderBy(col("p_partkey"))
    })

  /** Sketch aggregates (HLL distinct, approximate quantiles). Raw sketch
    * estimates are inherently engine-specific (different HLL/t-digest
    * internals), so the portable output is each sketch's error bound
    * verified inside the SAME plan: each engine builds its own sketches
    * AND its own exact companions, and emits 0/1 in-bound flags that
    * hash-match when both engines' sketches behave. The exact distinct is
    * a two-stage distinct-then-count (a second scan + shuffle on short
    * keys), NOT an exact countDistinct alongside the sketches in one agg
    * — that forces an Expand that doubles the input and defeats the point
    * of sketching at scale (round 1's bench charged 200 s to exactly
    * that). Quantile estimates are validated rank-free: the fraction of
    * rows at-or-below the estimate must straddle the target percentile.
    */
  val qApproxSketch: Q = Q(
    "q_approx_sketch",
    Some("""WITH sk AS (
              SELECT l_returnflag,
                     approx_count_distinct(l_partkey) AS approx_parts,
                     approx_quantile(l_quantity, 0.5) AS p50_qty,
                     approx_quantile(l_extendedprice, 0.95) AS p95_price
              FROM lineitem GROUP BY l_returnflag),
            ex AS (
              SELECT l_returnflag, CAST(count(*) AS BIGINT) AS exact_parts
              FROM (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem)
              GROUP BY l_returnflag),
            fr AS (
              SELECT l.l_returnflag,
                     avg(CASE WHEN l.l_quantity <= sk.p50_qty THEN 1.0 ELSE 0.0 END) AS f50,
                     avg(CASE WHEN l.l_extendedprice <= sk.p95_price THEN 1.0 ELSE 0.0 END) AS f95
              FROM lineitem l JOIN sk ON l.l_returnflag = sk.l_returnflag
              GROUP BY l.l_returnflag)
            SELECT sk.l_returnflag,
                   ex.exact_parts,
                   CAST(CASE WHEN abs(approx_parts - exact_parts) <= 0.1 * exact_parts
                        THEN 1 ELSE 0 END AS BIGINT) AS parts_in_bound,
                   CAST(CASE WHEN f50 BETWEEN 0.45 AND 0.55 THEN 1 ELSE 0 END AS BIGINT) AS p50_in_bound,
                   CAST(CASE WHEN f95 BETWEEN 0.92 AND 0.98 THEN 1 ELSE 0 END AS BIGINT) AS p95_in_bound
            FROM sk JOIN ex ON sk.l_returnflag = ex.l_returnflag
                    JOIN fr ON sk.l_returnflag = fr.l_returnflag
            ORDER BY sk.l_returnflag"""),
    (s, dir) => {
      // distribute first: sketch building is per-row-heavy and the
      // single-row-group scan would serialize it on one core
      val li = Tables.loadDistributed(s, dir, "lineitem", "l_orderkey")
      val sk = li
        .groupBy(col("l_returnflag"))
        .agg(
          approx_count_distinct(col("l_partkey"), 0.02).as("approx_parts"),
          percentile_approx(col("l_quantity"), lit(0.5), lit(1000)).as("p50_qty"),
          percentile_approx(col("l_extendedprice"), lit(0.95), lit(1000)).as("p95_price"))
      val ex = li
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("exact_parts"))
      val fr = li
        .join(broadcast(sk), Seq("l_returnflag"))
        .groupBy(col("l_returnflag"))
        .agg(
          avg(when(col("l_quantity") <= col("p50_qty"), 1.0).otherwise(0.0)).as("f50"),
          avg(when(col("l_extendedprice") <= col("p95_price"), 1.0).otherwise(0.0)).as("f95"))
      sk.join(ex, Seq("l_returnflag")).join(fr, Seq("l_returnflag"))
        .select(
          col("l_returnflag"),
          col("exact_parts"),
          when(abs(col("approx_parts") - col("exact_parts")) <= col("exact_parts") * 0.1, 1L)
            .otherwise(0L).as("parts_in_bound"),
          when(col("f50").between(0.45, 0.55), 1L).otherwise(0L).as("p50_in_bound"),
          when(col("f95").between(0.92, 0.98), 1L).otherwise(0L).as("p95_in_bound"))
        .orderBy(col("l_returnflag"))
    })

  override def queries: Seq[Q] = Seq(
    q1Agg, qTopk, qJoinStar, qLeftJoin, qDistinctSort, qScalarAgg,
    qHavingCountDistinct, qDslTopk, qSemiJoin, qAntiJoin, qApproxSketch)
}
