package graft.similarity

/** Greedy maximal-marginal-relevance selection (Carbonell & Goldstein
  * 1998) over ONE query's bounded candidate set — the per-group kernel
  * q_mmr_diverse runs inside `flatMapGroups` (queries parallelize;
  * this function never sees more than one candidate set).
  *
  * Cross-engine contract (shared with the DuckDB oracle): similarities
  * round to 1e-4 with BigDecimal HALF_UP (≙ DuckDB's
  * half-away-from-zero `round(x, 4)`), the cosine accumulates in
  * dimension order (≙ `list_sum`'s left fold), and score ties break on
  * the lower id (≙ `max {'sc': score, 'id': -id}`).
  */
object Mmr {

  def round4(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(4, java.math.RoundingMode.HALF_UP).doubleValue

  /** Cosine rounded to 1e-4, dimension-order accumulation. */
  def cos4(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) { dot += a(i).toDouble * b(i).toDouble; i += 1 }
    i = 0; while (i < a.length) { na += a(i).toDouble * a(i).toDouble; i += 1 }
    i = 0; while (i < b.length) { nb += b(i).toDouble * b(i).toDouble; i += 1 }
    round4(dot / (math.sqrt(na) * math.sqrt(nb)))
  }

  /** Pick `k` of the candidates `(id, rel, emb)` greedily by
    * λ·rel − μ·max-sim-to-picked (first pick is pure relevance).
    * Returns (id, score-at-selection) in pick order.
    *
    * `mu` is an explicit literal rather than `1 - lambda`: the oracle
    * SQL hardcodes `0.3`, and `1 - 0.7` in double arithmetic is
    * 0.30000000000000004 — a one-ulp coefficient drift that could flip
    * the greedy argmax on near-tied candidates. Both engines must use
    * the identical coefficient literal.
    *
    * Candidates whose score is NaN (e.g. a zero-norm embedding makes
    * cos4 return NaN) are skipped; if no candidate yields a usable
    * score the selection stops early rather than emitting a bogus
    * (-1, -Inf) pick.
    */
  def select(
      cands: Seq[(Long, Double, Array[Float])],
      k: Int,
      lambda: Double = 0.7,
      mu: Double = 0.3): Seq[(Long, Double)] = {
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
    var exhausted = false
    for (_ <- 1 to math.min(k, cands.size) if !exhausted) {
      var bestId = -1L; var bestScore = Double.NegativeInfinity
      var bestEmb: Array[Float] = null
      for ((id, rel, emb) <- cands if !picked.exists(_._1 == id)) {
        val score =
          if (picked.isEmpty) rel
          else lambda * rel - mu * picked.map(p => cos4(emb, p._2)).max
        if (!score.isNaN && (score > bestScore || (score == bestScore && id < bestId))) {
          bestId = id; bestScore = score; bestEmb = emb
        }
      }
      if (bestEmb == null) exhausted = true
      else picked += ((bestId, bestEmb, bestScore))
    }
    picked.map(p => (p._1, p._3)).toSeq
  }
}
