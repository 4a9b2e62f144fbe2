package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core peeling over an undirected edge list (columns `a < b`): each
  * round drops every node of degree < k and the edges touching it —
  * iterated, the survivors are the k-core, the standard density filter
  * for web/co-occurrence graphs (spam rings and boilerplate clusters
  * live in high cores; low-degree noise peels off first).
  *
  * Scale shape per round: ONE hash aggregation for degrees and two
  * LEFT-SEMI equi-joins against the (node-cardinality) keep set —
  * never an all-pairs structure. Driver-coordinated iteration like
  * [[PageRank]]: the driver carries only per-round counts, and every
  * round `localCheckpoint`s so the plan does not grow with rounds
  * (executor-local blocks here; a reliable checkpoint dir on a
  * cluster). Rounds are PINNED by the caller — the per-round count
  * trace makes convergence (or the lack of it) visible in the output
  * rather than silently assumed.
  */
object KCore {

  /** Peel `rounds` rounds toward the k-core. Returns one row per round:
    * (round, n_nodes = nodes meeting the degree bar that round,
    * n_edges = edges surviving after the drop).
    */
  def peelRounds(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    var cur = Checkpoints.materialize(edges)
    val trace = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    for (r <- 1 to rounds) {
      val deg = cur.select(col("a").as("n")).unionAll(cur.select(col("b").as("n")))
        .groupBy(col("n")).agg(count(lit(1)).as("d"))
      val keep = Checkpoints.materialize(deg.filter(col("d") >= k).select(col("n")))
      cur = Checkpoints.materialize(cur
        .join(keep.withColumnRenamed("n", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("n", "b"), Seq("b"), "left_semi"))
      trace += ((r.toLong, keep.count(), cur.count()))
    }
    trace.toSeq.toDF("round", "n_nodes", "n_edges")
  }

  /** The identical peel unrolled as SQL CTE rounds (the DuckDB oracle):
    * pure integer counting, so the replay is exact. Every CTE is
    * MATERIALIZED — inlined, each round references the previous one ~4
    * times and the expansion is 4^rounds base-table scans.
    */
  def unrolledSql(edgesSql: String, k: Int, rounds: Int): String = {
    val sb = new StringBuilder(s"WITH e0 AS MATERIALIZED ($edgesSql)")
    for (r <- 1 to rounds) sb.append(s""",
      n$r AS MATERIALIZED (
        SELECT n FROM (SELECT a AS n FROM e${r - 1} UNION ALL SELECT b FROM e${r - 1})
        GROUP BY n HAVING count(*) >= $k),
      e$r AS MATERIALIZED (
        SELECT a, b FROM e${r - 1}
        WHERE a IN (SELECT n FROM n$r) AND b IN (SELECT n FROM n$r))""")
    sb.append("\nSELECT * FROM (")
    sb.append((1 to rounds).map(r =>
      s"""SELECT CAST($r AS BIGINT) AS round,
            (SELECT CAST(count(*) AS BIGINT) FROM n$r) AS n_nodes,
            (SELECT CAST(count(*) AS BIGINT) FROM e$r) AS n_edges""").mkString(" UNION ALL "))
    sb.append(") ORDER BY round")
    sb.toString
  }
}
