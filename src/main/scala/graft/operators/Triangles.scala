package graft.operators

import graft.text.TextFunctions.md5Hash32
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting over an undirected edge list
  * (columns `a < b`), built from the two standard scale techniques:
  *
  *   - **Degree-ordered orientation**: each edge is directed from its
  *     lower-degree endpoint (ties on id), so every out-adjacency list
  *     is O(√m) and the wedge self-join can never pivot on a superstar
  *     node — the difference between a tractable join and a quadratic
  *     blowup on power-law graphs.
  *   - **DOULION edge sampling** (Tsourakakis et al., KDD 2009): keep
  *     each edge iff a deterministic md5 hash lands under p; count
  *     exactly on the sampled graph; `t/p³` is an unbiased estimate of
  *     the true count, while wedge work shrinks by p². The hash (not
  *     rand()) makes the estimate reproducible across runs and retries.
  *
  * Every stage is an equi-join or hash aggregate on node/edge keys; the
  * two multiply-consumed frames are localCheckpoint'd so the pair-gen
  * join is not re-executed per consumer.
  */
object Triangles {

  /** Deterministic DOULION thinning: keep `keepParts` of `modParts`. */
  def sampleEdges(edges: DataFrame, modParts: Int, keepParts: Int, salt: String): DataFrame =
    edges.filter(
      md5Hash32(concat(lit(salt), col("a").cast("string"), lit(":"), col("b").cast("string")))
        % modParts < keepParts)

  /** Exact count on the given (already sampled or full) edge list.
    * Returns one row: n_edges, max_degree, n_wedges, n_triangles.
    */
  def stats(edges0: DataFrame): DataFrame = {
    val edges = edges0.localCheckpoint(true) // consumed 3×: degrees, orientation, closure
    val deg = edges.select(col("a").as("n")).unionAll(edges.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("d"))
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val oriented = edges
      .join(deg.select(col("n").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("n").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true) // consumed 2×: both wedge sides
    val wedges = oriented.select(col("src"), col("dst").as("x"))
      .join(oriented.select(col("src"), col("dst").as("y")), Seq("src"))
      .filter(col("x") < col("y"))
    val tri = wedges.join(edges,
      edges("a") === least(col("x"), col("y")) && edges("b") === greatest(col("x"), col("y")))
    edges.agg(count(lit(1)).as("n_edges"))
      .crossJoin(broadcast(deg.agg(max(col("d")).cast("long").as("max_degree"))))
      .crossJoin(broadcast(wedges.agg(count(lit(1)).as("n_wedges"))))
      .crossJoin(broadcast(tri.agg(count(lit(1)).as("n_triangles"))))
  }
}
