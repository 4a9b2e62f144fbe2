package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set operations, reshaping, scalar transforms and window functions from
  * SURVEY.md §2.6/§2.7 (+ the weighted branch merge A8 and group-to-
  * collection A9), exercised over the driver testdata with DuckDB oracles.
  */
object Reshape extends QueryPack {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** ≙ U2 (api.py:317): wide→long unpivot. */
  val qUnpivot: Q = Q(
    "q_unpivot",
    Some("""SELECT l_orderkey, l_linenumber, metric, value FROM (
            SELECT l_orderkey, l_linenumber, 'l_quantity' AS metric, l_quantity AS value FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_extendedprice', l_extendedprice FROM lineitem
            UNION ALL
            SELECT l_orderkey, l_linenumber, 'l_tax', l_tax FROM lineitem)
            ORDER BY l_orderkey, l_linenumber, metric"""),
    (s, dir) =>
      // Scale shape: sort the 600M-row WIDE grain first (narrow raw
      // columns), then melt map-side. Sorting after the unpivot would
      // range-shuffle 3x the rows plus a metric-name string per row —
      // ~54 GB of exchange at the x1000 SF (an ENOSPC DNF) for an
      // ordering the melt can produce positionally: each (orderkey,
      // linenumber) is unique, and Expand emits the value columns in
      // listed order, so listing them alphabetically makes the map-side
      // output exactly (key, linenumber, metric)-ordered.
      Tables.loadDistributed(s, dir, "lineitem", "l_orderkey")
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"), col("l_tax"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .unpivot(
          Array(col("l_orderkey"), col("l_linenumber")),
          Array(col("l_extendedprice"), col("l_quantity"), col("l_tax")),
          "metric",
          "value"))

  /** ≙ U3/S5 (api.py:388-398): array flatten via explode — token counts
    * over whitespace-split document text.
    */
  val qExplode: Q = Q(
    "q_explode",
    Some("""SELECT word, count(*) AS n FROM (
              SELECT unnest(string_split(text, ' ')) AS word FROM documents)
            WHERE word <> ''
            GROUP BY word
            ORDER BY n DESC, word
            LIMIT 50"""),
    (s, dir) =>
      Tables.loadDistributed(s, dir, "documents", "doc_id")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("word"))
        .limit(50))

  /** ≙ U1 (api.py:546-562): union of branch subsets then aggregate. */
  val qUnion: Q = Q(
    "q_union",
    Some("""SELECT l_returnflag, count(*) AS n_rows, round(sum(l_quantity), 2) AS sum_qty
            FROM (SELECT * FROM lineitem WHERE l_quantity < 10
                  UNION ALL
                  SELECT * FROM lineitem WHERE l_quantity > 40)
            GROUP BY l_returnflag
            ORDER BY l_returnflag"""),
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_quantity") < 10)
        .unionByName(li.filter(col("l_quantity") > 40))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    })

  /** ≙ A8 (api.py:492-515): weighted branch merge as union-all + Σ(w·x) —
    * the distributed form of the reference's sequential accumulation.
    */
  val qWeightedMerge: Q = Q(
    "q_weighted_merge",
    Some("""SELECT user_id, round(sum(w * value), 4) AS rate
            FROM (SELECT user_id, value, 0.6 AS w FROM events WHERE event_type = 'click'
                  UNION ALL
                  SELECT user_id, value, 0.4 AS w FROM events WHERE event_type = 'view')
            GROUP BY user_id
            ORDER BY user_id"""),
    (s, dir) => {
      val ev = t(s, dir, "events")
      val branches = Seq(
        (0.6, ev.filter(col("event_type") === "click")),
        (0.4, ev.filter(col("event_type") === "view")))
      branches
        .map { case (w, df) => df.select(col("user_id"), (col("value") * lit(w)).as("wv")) }
        .reduce(_.unionByName(_))
        .groupBy(col("user_id"))
        .agg(round(sum(col("wv")), 4).as("rate"))
        .orderBy(col("user_id"))
    })

  /** ≙ U5 (api.py:96-109): first-seen dedup, made deterministic with an
    * explicit order (row_number over the natural sequence).
    */
  val qDedupFirst: Q = Q(
    "q_dedup_first",
    Some("""SELECT l_orderkey, l_partkey, l_quantity FROM (
              SELECT l_orderkey, l_partkey, l_quantity,
                     row_number() OVER (PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey, l_quantity) AS rn
              FROM lineitem)
            WHERE rn = 1
            ORDER BY l_orderkey"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .withColumn(
          "rn",
          // (l_orderkey, l_linenumber) is NOT unique in the synthetic data;
          // tiebreak on every projected column so ties are output-identical.
          row_number().over(Window.partitionBy(col("l_orderkey"))
            .orderBy(col("l_linenumber"), col("l_partkey"), col("l_quantity"))))
        .filter(col("rn") === 1)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
        .orderBy(col("l_orderkey")))

  /** ≙ A9/O3 (nshmdb.py:529-565): group-to-collection with a
    * deterministic element order (sorted collect_list ≙ ORDER BY before
    * assembly), serialized for engine-portable comparison.
    */
  val qCollectSorted: Q = Q(
    "q_collect_sorted",
    Some("""SELECT l_orderkey, string_agg(l_linenumber::VARCHAR, ',' ORDER BY l_linenumber) AS lines
            FROM lineitem
            GROUP BY l_orderkey
            ORDER BY l_orderkey"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(
          array_join(
            transform(array_sort(collect_list(col("l_linenumber"))), _.cast("string")),
            ",").as("lines"))
        .orderBy(col("l_orderkey")))

  /** ≙ F6/F7 (nshmdb.py:559-563): conditional naming via CASE WHEN +
    * string concat of a numeric id.
    */
  val qCaseWhen: Q = Q(
    "q_case_when",
    Some("""SELECT o_orderkey,
            CASE WHEN o_orderstatus = 'F' THEN o_orderpriority
                 ELSE o_orderpriority || ': Section ' || o_orderkey END AS label
            FROM orders
            ORDER BY o_orderkey"""),
    (s, dir) =>
      t(s, dir, "orders")
        .select(
          col("o_orderkey"),
          when(col("o_orderstatus") === "F", col("o_orderpriority"))
            .otherwise(concat(
              col("o_orderpriority"), lit(": Section "), col("o_orderkey").cast("string")))
            .as("label"))
        .orderBy(col("o_orderkey")))

  /** ≙ F1 (nshmdb.py:204-221): searchsorted ceiling-with-clamp as pure
    * relational algebra — smallest stored value ≥ target, else the max.
    */
  val qCeilingClamp: Q = Q(
    "q_ceiling_clamp",
    Some("""SELECT p_brand,
            coalesce(min(CASE WHEN p_size >= 25 THEN p_size END), max(p_size)) AS rounded_size
            FROM part
            GROUP BY p_brand
            ORDER BY p_brand"""),
    (s, dir) =>
      t(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(
          coalesce(
            min(when(col("p_size") >= 25, col("p_size"))),
            max(col("p_size"))).as("rounded_size"))
        .orderBy(col("p_brand")))

  /** Beyond-reference §2.9 extension: ranking + running aggregate window
    * functions (deterministic frame order via unique sort key).
    */
  val qWindow: Q = Q(
    "q_window",
    Some("""SELECT l_suppkey, l_orderkey, l_linenumber,
            row_number() OVER w AS rn,
            round(sum(l_quantity) OVER (PARTITION BY l_suppkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_qty
            FROM lineitem
            WINDOW w AS (PARTITION BY l_suppkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity)
            ORDER BY l_suppkey, rn"""),
    (s, dir) => {
      val w = Window
        .partitionBy(col("l_suppkey"))
        // (suppkey, shipdate, orderkey, linenumber) is NOT unique at
        // sf0.1 — include l_quantity so tied rows are output-identical
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
      t(s, dir, "lineitem")
        .select(
          col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
          row_number().over(w).cast("long").as("rn"),
          round(sum(col("l_quantity")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 2)
            .as("running_qty"))
        .orderBy(col("l_suppkey"), col("rn"))
    })

  /** Event-time bucketing (the batch shape of a streaming tumbling-window
    * aggregation; the streaming module drives the same plan through
    * readStream).
    */
  val qTimeBucket: Q = Q(
    "q_time_bucket",
    Some("""SELECT date_trunc('hour', ts) AS bucket, event_type,
            count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events
            GROUP BY date_trunc('hour', ts), event_type
            ORDER BY bucket, event_type"""),
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
        .orderBy(col("bucket"), col("event_type")))

  /** JSON extraction from the events props column (S6-adjacent:
    * semi-structured parsing pushed through a relational pipeline).
    */
  val qJsonExtract: Q = Q(
    "q_json_extract",
    Some("""SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
            count(*) AS n
            FROM events
            GROUP BY 1
            ORDER BY k_mod"""),
    (s, dir) =>
      Tables.loadDistributed(s, dir, "events", "event_id")
        .select((get_json_object(col("props"), "$.k").cast("long") % 10).as("k_mod"))
        .groupBy(col("k_mod"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("k_mod")))

  /** Batch sessionization (gaps-and-islands over event time): the SQL
    * twin of the streaming `EventStreams.sessionize`, with a DuckDB
    * oracle. Timestamps compare as epoch microseconds — Spark reads the
    * ns source truncated to µs while DuckDB keeps ns, so raw timestamp
    * output would hash-differ.
    */
  val qSessionize: Q = Q(
    "q_sessionize",
    Some("""WITH marked AS (
              SELECT user_id, value, epoch_us(ts) AS ts_us,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)),
            sessions AS (
              SELECT user_id, value, ts_us,
                     sum(new_s) OVER (PARTITION BY user_id ORDER BY ts_us
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
              FROM marked)
            SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
                   count(*) AS n_events,
                   min(ts_us) AS start_us, max(ts_us) AS end_us,
                   round(sum(value), 2) AS total_value
            FROM sessions
            GROUP BY user_id, session_id
            ORDER BY user_id, session_id"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
      val cum = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "events")
        .withColumn("ts_us", unix_micros(col("ts")))
        .withColumn(
          "new_s",
          when(
            col("ts_us") - lag(col("ts_us"), 1).over(w) > 1800000000L ||
              lag(col("ts_us"), 1).over(w).isNull,
            1).otherwise(0))
        .withColumn("session_id", sum(col("new_s")).over(cum))
        .groupBy(col("user_id"), col("session_id"))
        .agg(
          count(lit(1)).as("n_events"),
          min(col("ts_us")).as("start_us"),
          max(col("ts_us")).as("end_us"),
          round(sum(col("value")), 2).as("total_value"))
        .orderBy(col("user_id"), col("session_id"))
    })

  /** Backward as-of join: each purchase matched to the latest same-user
    * click at or before it (graft.operators.AsOf — union + carry-forward
    * window, one shuffle). The oracle uses DuckDB's native ASOF JOIN.
    * Output carries timestamps as epoch µs; only the click *timestamp*
    * is emitted so equal-timestamp click ties cannot differ.
    */
  val qAsof: Q = Q(
    "q_asof",
    Some("""SELECT p.event_id AS event_id, p.user_id AS user_id,
            epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS click_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts >= c.ts
            ORDER BY event_id"""),
    (s, dir) => {
      val ev = t(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("purchase_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("click_us"))
      graft.operators.AsOf.joinBackward(
        purchases, clicks,
        key = "user_id", leftTs = "purchase_us", rightTs = "click_us",
        payloadCols = Seq("click_us"))
        .select(col("event_id"), col("user_id"), col("purchase_us"), col("click_us"))
        .orderBy(col("event_id"))
    })

  /** Forward as-of join: for each purchase, the NEXT click of the same
    * user at-or-after the purchase time — the mirror of [[qAsof]],
    * checked against DuckDB's native forward ASOF (`p.ts <= c.ts`).
    */
  val qAsofForward: Q = Q(
    "q_asof_forward",
    Some("""SELECT p.event_id AS event_id, p.user_id AS user_id,
            epoch_us(p.ts) AS purchase_us, epoch_us(c.ts) AS next_click_us
            FROM (SELECT * FROM events WHERE event_type = 'purchase') p
            ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
              ON p.user_id = c.user_id AND p.ts <= c.ts
            ORDER BY event_id"""),
    (s, dir) => {
      val ev = t(s, dir, "events").withColumn("ts_us", unix_micros(col("ts")))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts_us").as("purchase_us"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("next_click_us"))
      graft.operators.AsOf.joinForward(
        purchases, clicks,
        key = "user_id", leftTs = "purchase_us", rightTs = "next_click_us",
        payloadCols = Seq("next_click_us"))
        .select(col("event_id"), col("user_id"), col("purchase_us"), col("next_click_us"))
        .orderBy(col("event_id"))
    })

  /** Schema-evolving union: unionByName with allowMissingColumns — the
    * append path when a new ingest batch carries added/dropped columns —
    * checked against DuckDB's UNION ALL BY NAME null-fill.
    */
  val qUnionByName: Q = Q(
    "q_union_by_name",
    Some("""SELECT * FROM (
              SELECT o_orderkey AS k, o_totalprice AS price FROM orders WHERE o_orderkey < 50
              UNION ALL BY NAME
              SELECT o_orderkey AS k, o_orderpriority AS priority FROM orders WHERE o_orderkey < 50)
            ORDER BY k, price NULLS FIRST"""),
    (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_orderkey") < 50)
      val a = o.select(col("o_orderkey").as("k"), col("o_totalprice").as("price"))
      val b = o.select(col("o_orderkey").as("k"), col("o_orderpriority").as("priority"))
      a.unionByName(b, allowMissingColumns = true)
        .orderBy(col("k"), col("price").asc_nulls_first)
    })

  /** Positional explode (ordinality): token position survives the
    * flatten — what sequence models need from a tokenized corpus.
    * DuckDB lacks WITH ORDINALITY; the oracle builds (pos, word) structs
    * by comprehension and unnests them.
    */
  val qPosexplode: Q = Q(
    "q_posexplode",
    Some("""SELECT doc_id, CAST(t.p AS BIGINT) AS pos, t.w
            FROM (SELECT doc_id,
                    unnest([{'p': i, 'w': ws[i]} FOR i IN range(1, len(ws) + 1)],
                           recursive := true)
                  FROM (SELECT doc_id,
                          list_filter(string_split(text, ' '), x -> x <> '') AS ws
                        FROM documents WHERE doc_id < 20)) AS t(doc_id, p, w)
            ORDER BY doc_id, pos"""),
    (s, dir) =>
      t(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(filter(split(col("text"), " "), w => w =!= "")))
        .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("w"))
        .orderBy(col("doc_id"), col("pos")))

  /** Semi-structured via the VARIANT type (Spark 4): parse once into the
    * binary variant encoding, then typed path extraction — the
    * open-schema column pattern that replaces per-query JSON string
    * re-parsing at scale. The oracle reads the same paths with plain
    * JSON extraction.
    */
  val qVariant: Q = Q(
    "q_variant",
    Some("""SELECT CAST(json_extract(props, '$.k') AS BIGINT) // 10 AS k_bucket,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_min,
                   CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_max
            FROM events
            GROUP BY 1 ORDER BY 1"""),
    (s, dir) => {
      val k = expr("variant_get(parse_json(props), '$.k', 'long')")
      t(s, dir, "events")
        // floor(k/10), not (k/10).cast: DuckDB `//` floors, Spark's long
        // division truncates toward zero — they diverge on negative k.
        .select(floor(k / 10).cast("long").as("k_bucket"), k.as("k"))
        .groupBy(col("k_bucket"))
        .agg(count(lit(1)).as("n"), min(col("k")).as("k_min"), max(col("k")).as("k_max"))
        .orderBy(col("k_bucket"))
    })

  override def queries: Seq[Q] = Seq(
    qUnpivot, qExplode, qUnion, qWeightedMerge, qDedupFirst, qCollectSorted,
    qCaseWhen, qCeilingClamp, qWindow, qTimeBucket, qJsonExtract, qSessionize, qAsof,
    qAsofForward, qUnionByName, qPosexplode, qVariant)
}
