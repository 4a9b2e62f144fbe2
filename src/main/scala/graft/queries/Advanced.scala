package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SQL-surface operators beyond the round-1 packs: full outer join,
  * arg-min/max via struct ordering, exact percentiles, lead/lag/ntile
  * windows, correlation/regression aggregates, exact decimal arithmetic,
  * correlated EXISTS subqueries, broadcast range joins, value-range
  * window frames, string functions, histogram binning, and cross joins.
  *
  * Scale notes per query are inline; the common theme is that every
  * small side broadcasts, every window partitions on a key with bounded
  * group size, and nothing collects to the driver.
  */
object Advanced extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Full outer join: customers ⟗ per-customer order rollups. Customers
    * with no orders keep NULL order columns; order keys missing from the
    * dimension would surface on the other side. Shuffle-hash on the key;
    * neither side is assumed small.
    */
  val qFullOuter: Q = Q(
    "q_full_outer",
    Some("""SELECT coalesce(c.c_custkey, o.o_custkey) AS custkey,
                   c.c_mktsegment AS segment,
                   CAST(coalesce(o.n_orders, 0) AS BIGINT) AS n_orders,
                   round(coalesce(o.total, 0.0), 2) AS total_spend
            FROM customer c
            FULL OUTER JOIN (SELECT o_custkey, count(*) AS n_orders,
                                    sum(o_totalprice) AS total
                             FROM orders GROUP BY o_custkey) o
              ON c.c_custkey = o.o_custkey
            ORDER BY custkey"""),
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), sum(col("o_totalprice")).as("total"))
      c.join(o, c("c_custkey") === o("o_custkey"), "full_outer")
        .select(
          coalesce(c("c_custkey"), o("o_custkey")).as("custkey"),
          c("c_mktsegment").as("segment"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          round(coalesce(col("total"), lit(0.0)), 2).as("total_spend"))
        .orderBy(col("custkey"))
    })

  /** Arg-min/arg-max with a deterministic tiebreak: the extreme order per
    * customer, ordered by (price, orderkey) so ties on price resolve by
    * key. `max(struct(...))` compares lexicographically in both engines —
    * the portable form of max_by when the value alone isn't unique.
    */
  val qMinmaxBy: Q = Q(
    "q_minmax_by",
    Some("""SELECT o_custkey,
                   (max({'p': o_totalprice, 'k': o_orderkey})).k AS best_key,
                   round((max({'p': o_totalprice, 'k': o_orderkey})).p, 2) AS best_price,
                   (min({'p': o_totalprice, 'k': o_orderkey})).k AS worst_key,
                   round((min({'p': o_totalprice, 'k': o_orderkey})).p, 2) AS worst_price
            FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
    (s, dir) => {
      val pk = struct(col("o_totalprice").as("p"), col("o_orderkey").as("k"))
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(max(pk).as("best"), min(pk).as("worst"))
        .select(
          col("o_custkey"),
          col("best.k").as("best_key"),
          round(col("best.p"), 2).as("best_price"),
          col("worst.k").as("worst_key"),
          round(col("worst.p"), 2).as("worst_price"))
        .orderBy(col("o_custkey"))
    })

  /** Exact percentiles (linear interpolation) computed from first
    * principles. Built-in `percentile`/`quantile_cont` interpolate with
    * engine-specific float expressions that can straddle a rounding
    * boundary by one ulp; spelling out the identical IEEE expression on
    * both sides makes the result bit-exact.
    *
    * Scale shape — two-phase selection, no WindowExec: ranking every row
    * with row_number() PARTITION BY l_returnflag would land every row on
    * 3 reducers for a full per-flag sort. Instead: fixed-width value
    * buckets (monotone in v) → per-(flag, bucket, value) counts on a
    * high-cardinality shuffle key → exclusive prefix sums over the tiny
    * (flag × bucket) frame, all expression-level → only the one bucket
    * containing each target rank is resolved, by folding its sorted
    * distinct values until the running count reaches the local rank. Per-
    * group state is bounded by bucket width; q_approx_sketch remains the
    * sketch path.
    */
  val qPercentileExact: Q = Q(
    "q_percentile_exact", {
      // round(x*100)/100, NOT round(x, 2): the two-arg double round
      // disagrees between engines when x*100 lands exactly on .5
      // (DuckDB rounds the float product, Spark the decimal string);
      // the one-arg form spelled identically is bit-portable.
      def q(p: String, v: String, name: String) =
        s"""round(sum(CASE WHEN rnk = CAST(floor($p * (n - 1) + 1) AS BIGINT)
                           THEN $v * (floor($p * (n - 1) + 1) + 1 - ($p * (n - 1) + 1))
                      WHEN rnk = CAST(floor($p * (n - 1) + 1) AS BIGINT) + 1
                           THEN $v * (($p * (n - 1) + 1) - floor($p * (n - 1) + 1))
                      ELSE 0.0 END) * 100) / 100 AS $name"""
      Some(s"""WITH ranked AS (
                 SELECT l_returnflag, l_extendedprice AS v, l_quantity AS vq,
                        row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) AS rnk,
                        row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rnkq,
                        count(*) OVER (PARTITION BY l_returnflag) AS n
                 FROM lineitem)
               SELECT l_returnflag,
                      ${q("0.25", "v", "p25")},
                      ${q("0.50", "v", "p50")},
                      ${q("0.75", "v", "p75")},
                      ${q("0.50", "vq", "med_qty").replace("rnk =", "rnkq =")}
               FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""")
    },
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      // B fixed-width buckets bound the target-bucket collect_list to
      // ~n/B distinct values ONLY under roughly-uniform value spread
      // (true for TPC-H prices/quantities). Under heavy skew (near-
      // constant or heavy-tailed values) one bucket can hold almost the
      // whole group and the resolution step degenerates to the single-
      // task hotspot this rewrite avoids; the scale-out fix there is to
      // re-bucket recursively inside any over-full target bucket (same
      // min/max+floor arithmetic, one extra pass per level) or to take
      // the q_approx_sketch path.
      val B = 256

      // Examined and rejected (r20): pinning `stats` (eager tiny
      // localCheckpoint) + `vfreq` (pinSer) to collapse the duplicated
      // subtrees — the listener-captured FINAL plan shows 15 lineitem
      // scans / 17 shuffle stages with only 3 exchanges reused (column
      // pruning differentiates the copies), so the dedup looked free.
      // Measured (interleaved A/B, controls embedded): pins LOSE ~+15%
      // at sf0.1 (3.03/3.29/3.07 → 3.70/3.37 in clean reps) AND ~+20%
      // at a 10× replica (4.82/4.37 → 5.89/5.14) — the pin serializes
      // a corpus-width frame (vfreq ≈ one row per distinct value) and
      // adds four sequential barriers, while the "duplicated" chains
      // are pruned columnar scans + partial aggs that cost less than
      // the pin's own write+read at BOTH sizes. The duplication scales
      // the same way the pin does, so no crossover is expected.
      def quantiles(valueCol: String, ps: Seq[(String, Double)]): DataFrame = {
        val stats = li.groupBy("l_returnflag").agg(
          count(lit(1)).as("n"),
          min(col(valueCol)).as("vmin"),
          max(col(valueCol)).as("vmax"))

        val bucketed = li
          .select(col("l_returnflag"), col(valueCol).as("v"))
          .join(broadcast(stats), Seq("l_returnflag"))
          .withColumn(
            "bucket",
            when(col("vmax") <= col("vmin"), lit(0L))
              .otherwise(least(
                lit((B - 1).toLong),
                floor((col("v") - col("vmin")) / ((col("vmax") - col("vmin")) / B)))))

        val vfreq = bucketed
          .groupBy("l_returnflag", "bucket", "v")
          .agg(count(lit(1)).as("cnt"))

        val bcum = vfreq
          .groupBy("l_returnflag", "bucket")
          .agg(sum("cnt").as("bcnt"))
          .groupBy("l_returnflag")
          .agg(sort_array(collect_list(struct(col("bucket"), col("bcnt")))).as("bs"))
          .select(
            col("l_returnflag"),
            explode(expr(
              """transform(bs, (x, i) -> named_struct(
                   'bucket', x.bucket, 'bcnt', x.bcnt,
                   'cum_before', aggregate(slice(bs, 1, i), 0L, (a, y) -> a + y.bcnt)))""")).as("bc"))
          .select(col("l_returnflag"), col("bc.bucket"), col("bc.bcnt"), col("bc.cum_before"))

        // h = p(n-1)+1 → the two straddling ranks, weights spelled with
        // the oracle's exact IEEE expressions
        val ranks = stats
          .select(
            col("l_returnflag"), col("n"),
            explode(array(ps.map { case (nm, p) =>
              struct(lit(nm).as("pname"), lit(p).as("p"))
            }: _*)).as("t"))
          .withColumn("h", col("t.p") * (col("n") - 1) + 1)
          .select(
            col("l_returnflag"), col("t.pname").as("pname"),
            explode(array(
              struct(floor(col("h")).as("r"), (floor(col("h")) + 1 - col("h")).as("w")),
              struct((floor(col("h")) + 1).as("r"), (col("h") - floor(col("h"))).as("w")))).as("rw"))
          .select(col("l_returnflag"), col("pname"), col("rw.r").as("r"), col("rw.w").as("w"))

        val targets = ranks
          .join(bcum, Seq("l_returnflag"))
          .filter(col("cum_before") < col("r") && col("r") <= col("cum_before") + col("bcnt"))
          .select(
            col("l_returnflag"), col("pname"), col("r"), col("w"), col("bucket"),
            (col("r") - col("cum_before")).as("lr"))

        val values = vfreq
          .join(broadcast(targets), Seq("l_returnflag", "bucket"))
          .groupBy(col("l_returnflag"), col("pname"), col("w"), col("r"), col("lr"))
          .agg(sort_array(collect_list(struct(col("v"), col("cnt")))).as("vs"))
          .withColumn("val", expr(
            """aggregate(vs,
                 named_struct('c', 0L, 'pick', CAST(NULL AS DOUBLE)),
                 (acc, x) -> IF(acc.pick IS NOT NULL, acc,
                   named_struct('c', acc.c + x.cnt,
                     'pick', IF(acc.c + x.cnt >= lr, x.v, CAST(NULL AS DOUBLE)))),
                 acc -> acc.pick)"""))

        val outCols = ps.map { case (nm, _) =>
          (round(sum(when(col("pname") === nm, coalesce(col("w") * col("val"), lit(0.0)))
            .otherwise(lit(0.0))) * 100) / 100).as(nm)
        }
        values.groupBy(col("l_returnflag")).agg(outCols.head, outCols.tail: _*)
      }

      quantiles("l_extendedprice", Seq(("p25", 0.25), ("p50", 0.50), ("p75", 0.75)))
        .join(quantiles("l_quantity", Seq(("med_qty", 0.50))), Seq("l_returnflag"))
        .select(col("l_returnflag"), col("p25"), col("p50"), col("p75"), col("med_qty"))
        .orderBy(col("l_returnflag"))
    })

  /** Sequential-pattern windows: previous order, day gap, and spend
    * quartile per customer — lag + ntile over a (custkey)-partitioned
    * window with a deterministic (date, key) order.
    */
  val qLeadLag: Q = Q(
    "q_lead_lag",
    Some("""SELECT o_orderkey,
                   lag(o_orderkey) OVER w AS prev_key,
                   date_diff('day', CAST(lag(o_orderdate) OVER w AS DATE),
                             CAST(o_orderdate AS DATE)) AS gap_days,
                   CAST(ntile(4) OVER (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey) AS BIGINT) AS spend_quartile
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
            ORDER BY o_orderkey"""),
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      val wq = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          lag(col("o_orderkey"), 1).over(w).as("prev_key"),
          datediff(to_date(col("o_orderdate")), to_date(lag(col("o_orderdate"), 1).over(w)))
            .cast("long").as("gap_days"),
          ntile(4).over(wq).cast("long").as("spend_quartile"))
        .orderBy(col("o_orderkey"))
    })

  /** Correlation / covariance / least-squares regression aggregates of
    * price against quantity per return flag — single-pass co-moment
    * aggregation in both engines; rounding absorbs accumulation-order
    * noise.
    */
  val qCorrRegr: Q = Q(
    "q_corr_regr",
    Some("""SELECT l_returnflag,
                   round(corr(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qp,
                   round(covar_pop(l_quantity, l_extendedprice), 2) + 0.0 AS covar_p,
                   round(covar_samp(l_quantity, l_extendedprice), 2) + 0.0 AS covar_s,
                   round(regr_slope(l_extendedprice, l_quantity), 2) + 0.0 AS slope,
                   round(regr_intercept(l_extendedprice, l_quantity), 2) + 0.0 AS intercept
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
          round(covar_pop(col("l_quantity"), col("l_extendedprice")), 2).as("covar_p"),
          round(covar_samp(col("l_quantity"), col("l_extendedprice")), 2).as("covar_s"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 2).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("intercept"))
        .orderBy(col("l_returnflag")))

  /** Exact decimal arithmetic: fixed-point sums are order-independent
    * (unlike double sums), so no rounding slack is needed — the cast to
    * double at the end converts one exact decimal value identically in
    * both engines.
    */
  val qDecimalMath: Q = Q(
    "q_decimal_math",
    Some("""SELECT l_returnflag,
                   CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
                   CAST(sum(CAST(l_discount AS DECIMAL(8,4))) AS DOUBLE) AS total_disc,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double").as("revenue"),
          sum(col("l_discount").cast("decimal(8,4)")).cast("double").as("total_disc"),
          count(lit(1)).as("n"))
        .orderBy(col("l_returnflag")))

  private val existsSql =
    """SELECT c_custkey, c_name,
      |       (SELECT CAST(count(*) AS BIGINT) FROM orders o
      |        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000) AS n_big
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
      |                    AND o.o_totalprice < 5000)
      |ORDER BY c_custkey""".stripMargin

  /** Correlated EXISTS / NOT EXISTS plus a correlated scalar subquery —
    * Catalyst rewrites them to semi/anti/aggregate joins; the identical
    * SQL text runs in both engines.
    */
  val qExistsSubq: Q = Q(
    "q_exists_subq",
    Some(existsSql),
    (s, dir) => {
      Tables.registerAll(s, dir)
      s.sql(existsSql)
    })

  private val bands: Seq[(Int, Double, Double)] = Seq(
    (0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0), (3, 30.0, 40.0), (4, 40.0, 1e9))

  /** Range join: quantity bands × lineitem via a non-equi predicate. The
    * band table is tiny and explicitly broadcast, so the plan is a
    * broadcast nested-loop — the right physical choice for interval
    * dimension tables at any fact-side scale.
    */
  val qRangeJoin: Q = Q(
    "q_range_join", {
      val values = bands.map { case (b, lo, hi) => s"($b, $lo, $hi)" }.mkString(", ")
      Some(s"""SELECT b.band_id, CAST(count(*) AS BIGINT) AS n,
                      round(sum(l.l_extendedprice), 2) AS band_revenue
               FROM lineitem l
               JOIN (VALUES $values) AS b(band_id, lo, hi)
                 ON l.l_quantity >= b.lo AND l.l_quantity < b.hi
               GROUP BY b.band_id ORDER BY b.band_id""")
    },
    (s, dir) => {
      val b = s.createDataFrame(bands).toDF("band_id", "lo", "hi")
      val l = t(s, dir, "lineitem")
      l.join(broadcast(b), l("l_quantity") >= b("lo") && l("l_quantity") < b("hi"))
        .groupBy(col("band_id"))
        .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("band_revenue"))
        .orderBy(col("band_id"))
    })

  /** Value-range window frame: 30-day rolling spend per customer. The
    * frame is defined by the day-number value, so the result is
    * deterministic even with same-day orders.
    */
  val qWindowRange: Q = Q(
    "q_window_range",
    Some("""SELECT o_orderkey,
                   round(sum(o_totalprice) OVER (
                     PARTITION BY o_custkey
                     ORDER BY date_diff('day', TIMESTAMP '1970-01-01', o_orderdate)
                     RANGE BETWEEN 30 PRECEDING AND CURRENT ROW), 2) AS rolling_30d
            FROM orders ORDER BY o_orderkey"""),
    (s, dir) => {
      val dayNum = datediff(to_date(col("o_orderdate")), to_date(lit("1970-01-01")))
      val w = Window.partitionBy(col("o_custkey")).orderBy(dayNum).rangeBetween(-30, 0)
      t(s, dir, "orders")
        .select(col("o_orderkey"), round(sum(col("o_totalprice")).over(w), 2).as("rolling_30d"))
        .orderBy(col("o_orderkey"))
    })

  /** String function battery: split_part, translate, lpad, levenshtein,
    * reverse, concat_ws — all codegen'd built-ins with identical
    * semantics in DuckDB.
    */
  val qStringFuncs: Q = Q(
    "q_string_funcs",
    Some("""SELECT p_partkey,
                   split_part(p_name, ' ', 2) AS noun,
                   translate(p_brand, '#', '_') AS brand_slug,
                   lpad(p_brand, 12, '*') AS brand_pad,
                   CAST(levenshtein(p_brand, 'Brand#00') AS BIGINT) AS lev,
                   reverse(p_type) AS type_rev,
                   concat_ws('|', p_brand, p_type) AS brand_type
            FROM part ORDER BY p_partkey"""),
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          // try_element_at: plain element_at throws under ANSI mode on
          // one-word names; coalesce to '' ≡ DuckDB split_part out-of-range.
          coalesce(try_element_at(split(col("p_name"), " "), lit(2)), lit("")).as("noun"),
          translate(col("p_brand"), "#", "_").as("brand_slug"),
          lpad(col("p_brand"), 12, "*").as("brand_pad"),
          levenshtein(col("p_brand"), lit("Brand#00")).cast("long").as("lev"),
          reverse(col("p_type")).as("type_rev"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey")))

  /** Histogram binning: fixed-width price buckets — integer arithmetic,
    * one shuffle, the building block behind approximate distribution
    * profiling of any numeric column.
    */
  val qHistogram: Q = Q(
    "q_histogram",
    Some("""SELECT CAST(floor(l_extendedprice / 10000) AS BIGINT) AS bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   round(avg(l_discount), 4) AS avg_disc
            FROM lineitem GROUP BY 1 ORDER BY 1"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(floor(col("l_extendedprice") / 10000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), round(avg(col("l_discount")), 4).as("avg_disc"))
        .orderBy(col("bucket")))

  /** Cross join: the full region × market-segment grid, left-joined with
    * actual customer counts so empty combinations surface as zeros —
    * the dimension-grid scaffold for coverage reports.
    */
  val qCrossJoin: Q = Q(
    "q_cross_join",
    Some("""WITH grid AS (SELECT r_regionkey, r_name, seg FROM region
                          CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer)),
            counts AS (SELECT n.n_regionkey, c.c_mktsegment AS seg, count(*) AS n_cust
                       FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
                       GROUP BY 1, 2)
            SELECT g.r_name, g.seg, CAST(coalesce(x.n_cust, 0) AS BIGINT) AS n_cust
            FROM grid g LEFT JOIN counts x
              ON g.r_regionkey = x.n_regionkey AND g.seg = x.seg
            ORDER BY g.r_name, g.seg"""),
    (s, dir) => {
      val r = t(s, dir, "region")
      val c = t(s, dir, "customer")
      val n = t(s, dir, "nation")
      val segs = c.select(col("c_mktsegment").as("seg")).distinct()
      val grid = r.crossJoin(broadcast(segs))
      val counts = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(n("n_regionkey"), c("c_mktsegment").as("seg"))
        .agg(count(lit(1)).as("n_cust"))
      grid.join(broadcast(counts),
          grid("r_regionkey") === counts("n_regionkey") && grid("seg") === counts("seg"),
          "left")
        .select(grid("r_name"), grid("seg"), coalesce(col("n_cust"), lit(0L)).as("n_cust"))
        .orderBy(col("r_name"), col("seg"))
    })

  /** Two-phase salted aggregation (operators.Skew): identical result to a
    * plain GROUP BY — which is exactly what the oracle checks — but the
    * hot key's rows fan out over 16 salt buckets before the final
    * re-aggregate, so a heavy-hitter key can't stall one reducer at
    * scale. Counts are salt-invariant; the double sum is rounded like
    * every float aggregate.
    */
  val qSaltedAgg: Q = Q(
    "q_salted_agg",
    Some("""SELECT l_suppkey, round(sum(l_extendedprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem GROUP BY l_suppkey ORDER BY l_suppkey"""),
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val sums = graft.operators.Skew.saltedSum(
        li, Seq("l_suppkey"), "l_extendedprice", "revenue_raw", saltBuckets = 16)
      val counts = graft.operators.Skew.saltedCount(li, Seq("l_suppkey"), "n", saltBuckets = 16)
      sums.join(counts, Seq("l_suppkey"))
        .select(col("l_suppkey"), round(col("revenue_raw"), 2).as("revenue"), col("n"))
        .orderBy(col("l_suppkey"))
    })

  /** Window frame-function battery: first/last/nth value over explicit
    * frames, dense_rank, percent_rank, cume_dist — ordered by the unique
    * (totalprice, orderkey) pair so every rank is deterministic.
    */
  val qFrameFuncs: Q = Q(
    "q_frame_funcs",
    Some("""SELECT o_orderkey,
                   first_value(o_orderkey) OVER w AS cheapest_key,
                   last_value(o_orderkey) OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS priciest_key,
                   nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_key,
                   CAST(dense_rank() OVER w AS BIGINT) AS drank,
                   round(percent_rank() OVER w, 6) AS prank,
                   round(cume_dist() OVER w, 6) AS cdist
            FROM orders
            WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
            ORDER BY o_orderkey"""),
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
      val wFull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          first(col("o_orderkey")).over(w).as("cheapest_key"),
          last(col("o_orderkey")).over(wFull).as("priciest_key"),
          nth_value(col("o_orderkey"), 2).over(wFull).as("second_key"),
          dense_rank().over(w).cast("long").as("drank"),
          round(percent_rank().over(w), 6).as("prank"),
          round(cume_dist().over(w), 6).as("cdist"))
        .orderBy(col("o_orderkey"))
    })

  /** Array set algebra on collected per-customer order-key arrays:
    * intersect/except spelled as portable filter-with-membership (the
    * built-in array_intersect dedups, which engines disagree on), plus
    * slicing and sorted concatenation.
    */
  val qArrayFuncs: Q = Q(
    "q_array_funcs",
    Some("""WITH arr AS (
              SELECT o_custkey,
                     coalesce(list_sort(list(o_orderkey) FILTER (WHERE o_orderstatus = 'F')), []) AS fk,
                     coalesce(list_sort(list(o_orderkey) FILTER (WHERE o_orderstatus <> 'F')), []) AS ok
              FROM orders GROUP BY o_custkey)
            SELECT o_custkey,
                   CAST(coalesce(len(fk), 0) AS BIGINT) AS n_f,
                   CAST(coalesce(len(ok), 0) AS BIGINT) AS n_other,
                   CAST(coalesce(len(list_filter(fk, x -> list_contains(ok, x))), 0) AS BIGINT) AS n_common,
                   CAST(coalesce(len(list_filter(fk, x -> NOT list_contains(ok, x))), 0) AS BIGINT) AS n_f_only,
                   coalesce(array_to_string(fk[1:3], ','), '') AS first_f
            FROM arr ORDER BY o_custkey"""),
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_custkey"))
        .agg(
          sort_array(collect_list(when(col("o_orderstatus") === "F", col("o_orderkey")))).as("fk"),
          sort_array(collect_list(when(col("o_orderstatus") =!= "F", col("o_orderkey")))).as("ok"))
        .select(
          col("o_custkey"),
          size(col("fk")).cast("long").as("n_f"),
          size(col("ok")).cast("long").as("n_other"),
          size(filter(col("fk"), x => array_contains(col("ok"), x))).cast("long").as("n_common"),
          size(filter(col("fk"), x => !array_contains(col("ok"), x))).cast("long").as("n_f_only"),
          array_join(slice(col("fk"), 1, 3), ",").as("first_f"))
        .orderBy(col("o_custkey")))

  /** Calendar arithmetic battery: month addition (both engines clamp
    * 01-31 + 1 month to month-end), last_day, month/quarter truncation,
    * day-of-week (DuckDB counts Sunday=0, Spark Sunday=1 — aligned with
    * +1), ISO week, and day offsets.
    */
  val qDateArith: Q = Q(
    "q_date_arith",
    Some("""SELECT o_orderkey,
                   CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
                   last_day(CAST(o_orderdate AS DATE)) AS month_end,
                   CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
                   CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
                   CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS BIGINT) AS dow,
                   CAST(weekofyear(CAST(o_orderdate AS DATE)) AS BIGINT) AS iso_week,
                   CAST(CAST(o_orderdate AS DATE) + 45 AS DATE) AS plus45d
            FROM orders ORDER BY o_orderkey"""),
    (s, dir) => {
      val d = to_date(col("o_orderdate"))
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          add_months(d, 3).as("plus3m"),
          last_day(d).as("month_end"),
          trunc(d, "month").as("month_start"),
          trunc(d, "quarter").as("quarter_start"),
          dayofweek(d).cast("long").as("dow"),
          weekofyear(d).cast("long").as("iso_week"),
          date_add(d, 45).as("plus45d"))
        .orderBy(col("o_orderkey"))
    })

  /** Scalar math battery: greatest/least, abs, sign, integer mod,
    * sqrt/ln (libm-identical across engines), and null-safe division via
    * nullif — the portable spelling of try_divide.
    */
  val qMathFuncs: Q = Q(
    "q_math_funcs",
    Some("""SELECT l_orderkey, l_linenumber,
                   greatest(l_tax, l_discount) AS max_rate,
                   least(l_tax, l_discount) AS min_rate,
                   abs(l_quantity - 25.0) AS qty_dev,
                   CAST(sign(l_discount - 0.05) AS BIGINT) AS disc_side,
                   CAST(l_orderkey % 7 AS BIGINT) AS key_mod,
                   round(sqrt(l_quantity), 6) AS qty_sqrt,
                   round(ln(l_extendedprice), 6) AS price_ln,
                   round(l_extendedprice / nullif(l_discount, 0.0), 2) AS price_per_disc
            FROM lineitem ORDER BY l_orderkey, l_linenumber, l_extendedprice"""),
    (s, dir) =>
      // Scale shape: range-shuffle the 6 RAW source columns (low-entropy
      // TPC-H values, lz4-friendly) and compute the derived doubles
      // AFTER the sort. Declared derivation-first, the sort exchange
      // carries ~8 high-entropy sqrt/ln doubles per row — poorly
      // compressible, ~2x the scratch, an ENOSPC DNF at the x1000 SF.
      // Catalyst prunes columns below a sort but never defers expression
      // projects past one, so the deferral must be declared.
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
          col("l_extendedprice"), col("l_tax"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .select(
          col("l_orderkey"), col("l_linenumber"),
          greatest(col("l_tax"), col("l_discount")).as("max_rate"),
          least(col("l_tax"), col("l_discount")).as("min_rate"),
          abs(col("l_quantity") - 25.0).as("qty_dev"),
          signum(col("l_discount") - 0.05).cast("long").as("disc_side"),
          (col("l_orderkey") % 7).cast("long").as("key_mod"),
          round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
          round(log(col("l_extendedprice")), 6).as("price_ln"),
          round(col("l_extendedprice") / nullif(col("l_discount"), lit(0.0)), 2).as("price_per_disc")))

  /** Skew-resistant salted join (operators.Skew.saltedJoin): the oracle
    * is the plain inner join + rollup it must equal. Probe rows fan out
    * over 8 salt buckets; the build side replicates ×8 — the pattern for
    * a hot probe key when the build side can't broadcast.
    */
  val qSaltedJoin: Q = Q(
    "q_salted_join",
    Some("""SELECT s_nationkey, round(sum(l_extendedprice), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            GROUP BY s_nationkey ORDER BY s_nationkey"""),
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      val sup = t(s, dir, "supplier").withColumnRenamed("s_suppkey", "l_suppkey")
      graft.operators.Skew.saltedJoin(li, sup, Seq("l_suppkey"), saltBuckets = 8)
        .groupBy(col("s_nationkey"))
        .agg(round(sum(col("l_extendedprice")), 2).as("revenue"), count(lit(1)).as("n"))
        .orderBy(col("s_nationkey"))
    })

  /** Boolean and bitwise aggregates: bool_and/bool_or (SQL EVERY/ANY),
    * count_if, and bit_and/or/xor — order-independent, so exact across
    * engines with no rounding.
    */
  val qBoolBitAggs: Q = Q(
    "q_bool_bit_aggs",
    Some("""SELECT l_returnflag,
                   CAST(bool_and(l_quantity > 0) AS INT) AS all_pos,
                   CAST(bool_or(l_discount > 0.09) AS INT) AS any_deep_disc,
                   CAST(count_if(l_tax > 0.05) AS BIGINT) AS n_high_tax,
                   CAST(bit_and(l_linenumber) AS BIGINT) AS line_band,
                   CAST(bit_or(l_linenumber) AS BIGINT) AS line_bor,
                   CAST(bit_xor(l_linenumber) AS BIGINT) AS line_bxor
            FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          bool_and(col("l_quantity") > 0).cast("int").as("all_pos"),
          bool_or(col("l_discount") > 0.09).cast("int").as("any_deep_disc"),
          count_if(col("l_tax") > 0.05).as("n_high_tax"),
          bit_and(col("l_linenumber")).cast("long").as("line_band"),
          bit_or(col("l_linenumber")).cast("long").as("line_bor"),
          bit_xor(col("l_linenumber")).cast("long").as("line_bxor"))
        .orderBy(col("l_returnflag")))

  /** any_value over a functionally dependent column (1:1 with the group
    * key after the join) — the reference's A4 ANY_VALUE pattern with a
    * result that is deterministic because the dependency makes every
    * candidate identical.
    */
  val qAnyValue: Q = Q(
    "q_any_value",
    Some("""SELECT c.c_custkey, any_value(c.c_name) AS name,
                   CAST(count(*) AS BIGINT) AS n_orders
            FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
            GROUP BY c.c_custkey ORDER BY c.c_custkey"""),
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy(c("c_custkey"))
        .agg(any_value(c("c_name")).as("name"), count(lit(1)).as("n_orders"))
        .orderBy(c("c_custkey"))
    })

  /** Safe conversion and string-position battery: TRY_CAST returning
    * NULL on malformed input (the ingest-hardening primitive), substring
    * position, prefix slicing, and repetition.
    */
  val qConvFuncs: Q = Q(
    "q_conv_funcs",
    Some("""SELECT p_partkey,
                   TRY_CAST(split_part(p_brand, '#', 2) AS BIGINT) AS brand_num,
                   TRY_CAST(p_type AS BIGINT) AS bad_cast,
                   CAST(strpos(p_name, 'widget') AS BIGINT) AS widget_at,
                   left(p_type, 4) AS type4,
                   repeat('-', p_size % 5) AS dashes
            FROM part ORDER BY p_partkey"""),
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          try_element_at(split(col("p_brand"), "#"), lit(2)).cast("long").as("brand_num"),
          expr("TRY_CAST(p_type AS BIGINT)").as("bad_cast"),
          instr(col("p_name"), "widget").cast("long").as("widget_at"),
          substring(col("p_type"), 1, 4).as("type4"),
          expr("repeat('-', CAST(p_size % 5 AS INT))").as("dashes"))
        .orderBy(col("p_partkey")))

  override def queries: Seq[Q] = Seq(
    qFullOuter, qMinmaxBy, qPercentileExact, qLeadLag, qCorrRegr, qDecimalMath,
    qExistsSubq, qRangeJoin, qWindowRange, qStringFuncs, qHistogram, qCrossJoin,
    qSaltedAgg, qFrameFuncs, qArrayFuncs, qDateArith, qMathFuncs, qSaltedJoin,
    qBoolBitAggs, qAnyValue, qConvFuncs)
}
