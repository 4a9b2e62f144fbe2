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
    * λ·rel − (1−λ)·max-sim-to-picked (first pick is pure relevance).
    * Returns (id, score-at-selection) in pick order.
    */
  def select(
      cands: Seq[(Long, Double, Array[Float])],
      k: Int,
      lambda: Double = 0.7): Seq[(Long, Double)] = {
    val picked = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float], Double)]
    for (_ <- 1 to math.min(k, cands.size)) {
      var bestId = -1L; var bestScore = Double.NegativeInfinity
      var bestEmb: Array[Float] = null
      for ((id, rel, emb) <- cands if !picked.exists(_._1 == id)) {
        val score =
          if (picked.isEmpty) rel
          else lambda * rel - (1 - lambda) * picked.map(p => cos4(emb, p._2)).max
        if (score > bestScore || (score == bestScore && id < bestId)) {
          bestId = id; bestScore = score; bestEmb = emb
        }
      }
      picked += ((bestId, bestEmb, bestScore))
    }
    picked.map(p => (p._1, p._3)).toSeq
  }
}
