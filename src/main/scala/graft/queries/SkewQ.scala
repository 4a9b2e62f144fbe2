package graft.queries

import graft.{Q, QueryPack, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew stress gate: every other gate query runs on near-uniform TPC-H-ish
  * keys, which cannot answer the 100×-scale question — what happens when
  * one key owns 20% of the rows (the power-law reality of web/user data).
  * These queries derive a DETERMINISTICALLY SKEWED variant inside the
  * query itself (a key remap both engines spell identically), so the
  * DuckDB oracle replays the exact same hot-key distribution and the
  * hash gate covers the skew-mitigation code paths:
  *
  *  - events: `user_id % 5 = 0 → -42` funnels ~20% of all events into
  *    one hot user;
  *  - lineitem: `l_partkey % 5 = 0 → 1` funnels ~20% of line items onto
  *    one hot part.
  *
  * The salted operators ([[graft.operators.Skew]]) must return results
  * identical to the plain forms — that is what the oracles check — while
  * spreading the hot key across salt buckets ([[graft.SkewBalanceSpec]]
  * asserts the spread itself on deterministic record counts, not timing).
  */
object SkewQ extends QueryPack {

  /** events with 20% of rows remapped onto one hot user. */
  private[graft] def skewedEvents(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")
      .withColumn(
        "user_id",
        when(col("user_id") % 5 === 0, lit(-42L)).otherwise(col("user_id")))

  private val skewedEventsSql =
    "SELECT * REPLACE (CASE WHEN user_id % 5 = 0 THEN -42 ELSE user_id END AS user_id) FROM events"

  /** lineitem with 20% of rows remapped onto one hot part. */
  private[graft] def skewedLineitem(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "lineitem")
      .withColumn(
        "l_partkey",
        when(col("l_partkey") % 5 === 0, lit(1L)).otherwise(col("l_partkey")))

  /** Salted two-phase aggregation under a 20%-hot key: count + sum per
    * user. A plain groupBy sends every hot-user row to ONE reducer; the
    * salted partial/final pair spreads them across 32 sub-keys and must
    * still produce the byte-identical totals the oracle's plain GROUP BY
    * yields. Money sums accumulate in exact integer cents (per-row round,
    * int64 partials, one final division) so the result is summation-order
    * independent at ANY scale factor — the hot group's addend count grows
    * with SF, and a double sum's drift crosses the last rounded cent
    * past ~1M addends.
    */
  val qSkewSaltedAgg: Q = Q(
    "q_skew_salted_agg",
    Some(s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
             FROM ($skewedEventsSql)
             GROUP BY user_id ORDER BY user_id"""),
    (s, dir) =>
      graft.operators.Skew.saltedAgg(skewedEvents(s, dir), Seq("user_id"), saltBuckets = 32)(
        Seq(count(lit(1)).as("pn"),
          sum(round(col("value") * 100).cast("long")).as("pv")),
        Seq(
          sum(col("pn")).cast("long").as("n"),
          (sum(col("pv")).cast("double") / 100).as("sum_value")))
        .orderBy(col("user_id")))

  /** Same hot-key aggregation but with CONTENT-DERIVED salt
    * ([[graft.operators.Skew.contentSalt]] over `event_id`) instead of
    * `rand(seed)`, and the input deliberately `repartition(7)`-ed first:
    * rand-based salt is deterministic per partition, so reshaping the
    * input reshapes the routing — content salt must not care. The oracle
    * is the same plain GROUP BY; [[graft.SkewBalanceSpec]] additionally
    * asserts the per-row salt assignment is identical across different
    * input partitionings (the replayability property itself).
    */
  val qSkewSaltedAggStable: Q = Q(
    "q_skew_salted_agg_stable",
    Some(s"""SELECT user_id, CAST(count(*) AS BIGINT) AS n,
                    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS sum_value
             FROM ($skewedEventsSql)
             GROUP BY user_id ORDER BY user_id"""),
    (s, dir) =>
      graft.operators.Skew.saltedAgg(
        skewedEvents(s, dir).repartition(7), Seq("user_id"), saltBuckets = 32,
        saltBy = Some(graft.operators.Skew.contentSalt(32, col("event_id"))))(
        Seq(count(lit(1)).as("pn"),
          sum(round(col("value") * 100).cast("long")).as("pv")),
        Seq(
          sum(col("pn")).cast("long").as("n"),
          (sum(col("pv")).cast("double") / 100).as("sum_value")))
        .orderBy(col("user_id")))

  /** Salted join under a 20%-hot probe key: the hot part's line items
    * spread over 16 salt buckets (build side replicated ×16 — part-dim
    * sized, fine when the build is far smaller than the probe), then
    * revenue rolls up per brand. Must equal the plain inner join.
    */
  val qSkewSaltedJoin: Q = Q(
    "q_skew_salted_join",
    Some("""WITH li AS (
              SELECT CASE WHEN l_partkey % 5 = 0 THEN 1 ELSE l_partkey END AS l_partkey,
                     l_extendedprice
              FROM lineitem)
            SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(li.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
            FROM li JOIN part p ON p.p_partkey = li.l_partkey
            GROUP BY 1 ORDER BY 1"""),
    (s, dir) => {
      val li = skewedLineitem(s, dir)
        .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
      val build = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      graft.operators.Skew.saltedJoin(li, build, Seq("p_partkey"), saltBuckets = 16)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n"),
          (sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") / 100)
            .as("revenue"))
        .orderBy(col("p_brand"))
    })

  /** Hot-only salted join on the same 20%-hot fixture: hot keys are
    * DETECTED in-plan ([[graft.operators.Skew.hotKeys]], ≥5% row share)
    * and only their rows salt/replicate — the build side is replicated
    * per HOT key, not wholesale ([[graft.operators.Skew.saltedJoinSkewOnly]]),
    * which is the difference between ×16 of 2M build rows and ×16 of
    * one. The result must still equal the plain inner join — same
    * oracle as q_skew_salted_join.
    */
  val qSkewJoinHotOnly: Q = Q(
    "q_skew_join_hotonly",
    Some("""WITH li AS (
              SELECT CASE WHEN l_partkey % 5 = 0 THEN 1 ELSE l_partkey END AS l_partkey,
                     l_extendedprice
              FROM lineitem)
            SELECT p.p_brand, CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(CAST(round(li.l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
            FROM li JOIN part p ON p.p_partkey = li.l_partkey
            GROUP BY 1 ORDER BY 1"""),
    (s, dir) => {
      val li = skewedLineitem(s, dir)
        .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
      val build = Tables.load(s, dir, "part").select(col("p_partkey"), col("p_brand"))
      val hot = graft.operators.Skew.hotKeys(li, Seq("p_partkey"), minShare = 0.05)
      graft.operators.Skew
        .saltedJoinSkewOnly(li, build, Seq("p_partkey"), saltBuckets = 16, hotKeys = hot)
        .groupBy(col("p_brand"))
        .agg(
          count(lit(1)).as("n"),
          (sum(round(col("l_extendedprice") * 100).cast("long")).cast("double") / 100)
            .as("revenue"))
        .orderBy(col("p_brand"))
    })

  /** Gaps-and-islands sessionization where ONE window partition holds
    * 20% of the corpus — the worst case for per-key sequential logic
    * (sessions can't salt: order within the key is the semantics). The
    * gate pins that correctness survives the hot partition; the scale
    * posture is that a session window's state is bounded by the key's
    * rows, and a 20%-hot key is exactly what AQE/`skewedEvents`-style
    * diagnostics (q_key_skew) must surface BEFORE this plan ships.
    */
  val qSkewSessionize: Q = Q(
    "q_skew_sessionize",
    Some(s"""WITH ev AS ($skewedEventsSql),
            marked AS (
              SELECT user_id, value, epoch_us(ts) AS ts_us,
                     CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000
                          OR lag(epoch_us(ts)) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
              FROM ev
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
      skewedEvents(s, dir)
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

  /** Last-touch attribution with the same 20%-hot user: the carry-forward
    * window and the channel rollup both cross the hot partition. The
    * rollup side IS salt-friendly (channel cardinality is tiny), so the
    * final aggregation goes through the salted path as well.
    */
  val qSkewAttribution: Q = Q(
    "q_skew_attribution",
    Some(s"""WITH ev AS ($skewedEventsSql),
            tagged AS (
              SELECT user_id, event_type, value, epoch_us(ts) AS t, event_id,
                     last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS touch
              FROM ev)
            SELECT coalesce(touch, 'none') AS touch,
                   CAST(count(*) AS BIGINT) AS n_purchases,
                   CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100 AS revenue
            FROM tagged WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY touch"""),
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(unix_micros(col("ts")), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val touch = last(
        when(col("event_type") =!= "purchase", col("event_type")),
        ignoreNulls = true).over(w)
      val purchases = skewedEvents(s, dir)
        .withColumn("touch", coalesce(touch, lit("none")))
        .filter(col("event_type") === "purchase")
      graft.operators.Skew.saltedAgg(purchases, Seq("touch"), saltBuckets = 32)(
        Seq(count(lit(1)).as("pn"),
          sum(round(col("value") * 100).cast("long")).as("pv")),
        Seq(
          sum(col("pn")).cast("long").as("n_purchases"),
          (sum(col("pv")).cast("double") / 100).as("revenue")))
        .orderBy(col("touch"))
    })

  override def queries: Seq[Q] =
    Seq(qSkewSaltedAgg, qSkewSaltedAggStable, qSkewSaltedJoin, qSkewJoinHotOnly,
      qSkewSessionize, qSkewAttribution)
}
