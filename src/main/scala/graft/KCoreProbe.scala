package graft

import org.apache.spark.sql.SparkSession

/** Per-round attribution probe for q_kcore (round-18 verdict item 1):
  * the one query whose driver-bench trend (2.87 → 3.48 → 4.32 s across
  * r16–r18) outran the ambient control band (1.12×), with the suspected
  * cause being the per-round Spark-job overhead of the six
  * driver-coordinated peel rounds compounding with ambient load.
  *
  * Replays the exact q_kcore peel (same edge build, same k/rounds) with
  * a wall-clock split per round and per phase — edge build, per-round
  * checkpoint+counts — bracketed by the window-quality control queries
  * (BASELINE.md round-18 protocol) so every probe run is normalizable
  * against the floor's controls. Prints one JSON line per rep.
  */
object KCoreProbe {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(3)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .appName("graft-kcore-probe")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = body
      (a, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // Same warmup as Bench so rep-1 JIT noise matches the bench's shape.
    for (w <- Seq("q1_agg", "q_time_bucket"))
      try SparkEntry.queries.get(w).foreach(fn => noop(fn(spark, sfDir)))
      catch { case _: Throwable => () }

    for (rep <- 1 to reps) {
      val ctl = Seq("q_having_countd", "q_dedup_first").map { n =>
        val (_, s) = time(noop(SparkEntry.queries(n)(spark, sfDir)))
        f""""$n":$s%.3f"""
      }
      val (edges, tEdges) =
        time(graft.queries.PipelineQ.kcoreEdges(spark, sfDir))
      val (cur0, tChk0) = time(graft.operators.Checkpoints.materialize(edges))
      var cur = cur0
      val roundsJson = (1 to 6).map { r =>
        val (keep, tKeep) =
          time(graft.operators.Checkpoints.materialize(
            graft.operators.KCore.degreeKeep(cur, 8)))
        val (nxt, tDrop) =
          time(graft.operators.Checkpoints.materialize(
            graft.operators.KCore.dropEdges(cur, keep)))
        cur = nxt
        // same fused single-job count as KCore.peelRounds
        val (counts, tCnt) = time {
          import org.apache.spark.sql.functions.{col, count, lit}
          val m = keep.select(lit("n").as("side"))
            .unionAll(cur.select(lit("e").as("side")))
            .groupBy(col("side")).agg(count(lit(1)).as("c"))
            .collect().map(row => row.getString(0) -> row.getLong(1)).toMap
          (m.getOrElse("n", 0L), m.getOrElse("e", 0L))
        }
        f"""{"r":$r,"chk_keep":$tKeep%.3f,"chk_edges":$tDrop%.3f,""" +
          f""""counts":$tCnt%.3f,"n_nodes":${counts._1},"n_edges":${counts._2}}"""
      }
      println(
        s"""{"rep":$rep,"controls":{${ctl.mkString(",")}},""" +
          f""""edge_build":$tEdges%.3f,"chk0":$tChk0%.3f,""" +
          s""""rounds":[${roundsJson.mkString(",")}]}""")
    }
    spark.stop()
  }
}
