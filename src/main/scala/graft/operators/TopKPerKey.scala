package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k entries carried through aggregation: (score, payload)
  * pairs, kept sorted by (score DESC, payload ASC), never more than k.
  */
final case class TopKBuf(entries: Seq[(Double, Long)])

/** Per-key top-k as a typed `Aggregator` with a BOUNDED buffer — the
  * scale-out alternative to `row_number().over(partitionBy(key))`:
  * the window plan sorts every key-partition in full before discarding
  * all but k rows, while this aggregator's partial (map-side) buffers
  * never hold more than k entries, so the shuffle carries k rows per
  * (mapper, key) instead of the whole group. Ordering is total —
  * (score DESC, payload ASC) — so results are deterministic under ties
  * and exactly equal the window formulation.
  *
  * The merge is associative + commutative (merge-sort of two ≤k lists,
  * trimmed to k), which is what lets Catalyst run it as a partial
  * aggregation like any built-in.
  */
final class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {

  // java.lang.Double.compare gives a TOTAL order (NaN greatest, matching
  // Spark's descending sort) — `>` alone would break the sorted-buffer
  // invariant the moment a NaN score appears
  private def better(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  override def zero: TopKBuf = TopKBuf(Vector.empty)

  override def reduce(b: TopKBuf, a: (Double, Long)): TopKBuf = {
    if (b.entries.length >= k && better(b.entries.last, a)) b
    else {
      val (before, after) = b.entries.span(e => better(e, a))
      TopKBuf(((before :+ a) ++ after).take(k))
    }
  }

  override def merge(x: TopKBuf, y: TopKBuf): TopKBuf = {
    val out = Vector.newBuilder[(Double, Long)]
    var (i, j, n) = (0, 0, 0)
    while (n < k && (i < x.entries.length || j < y.entries.length)) {
      val takeX = j >= y.entries.length ||
        (i < x.entries.length && better(x.entries(i), y.entries(j)))
      if (takeX) { out += x.entries(i); i += 1 } else { out += y.entries(j); j += 1 }
      n += 1
    }
    TopKBuf(out.result())
  }

  override def finish(b: TopKBuf): Seq[(Double, Long)] = b.entries

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.product[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
}

object TopKPerKey {

  /** Top-k rows per key: `df` grouped by `keyCol`, ranked by
    * (`scoreCol` DESC, `idCol` ASC). Returns (key, rank, id, score) —
    * the exact rows `row_number() ≤ k` would keep, with no per-key
    * full sort anywhere in the plan.
    *
    * Null scores/ids are DROPPED (the tuple encoder is primitive): in
    * the window form a null score sorts last under `desc` and can only
    * be kept when a group has fewer than k non-null rows — callers
    * needing that semantics should `coalesce` a sentinel first.
    */
  def apply(df: DataFrame, keyCol: String, scoreCol: String, idCol: String, k: Int): DataFrame = {
    val agg = udaf(new TopKAggregator(k))
    df.filter(col(scoreCol).isNotNull && col(idCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(agg(col(scoreCol).cast("double"), col(idCol).cast("long")).as("topk"))
      .select(col(keyCol), posexplode(col("topk")).as(Seq("pos", "entry")))
      .select(
        col(keyCol),
        (col("pos") + 1).cast("long").as("rank"),
        col("entry._2").as(idCol),
        col("entry._1").as(scoreCol))
  }
}
