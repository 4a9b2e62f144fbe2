package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: plan-shape summary (shuffles / broadcasts / sort-merge
  * joins / codegen spans) for every registered query, to spot operators
  * that would shuffle or sort more than they should at scale.
  *
  * Usage: java -cp ... graft.PlanAudit [sfDir] [namePrefix]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val prefix = args.drop(1).headOption.getOrElse("")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-plan-audit")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.validate(spark, dir)
    // With AQE on, executedPlan.toString is the AdaptiveSparkPlan's
    // INITIAL plan — comparable round over round, but pre-codegen. The
    // codegen span count comes from a second planning pass with AQE off,
    // whose static plan carries the `*(id)` star prefixes
    // CollapseCodegenStages assigns. (AQE-off also inserts ReusedExchange,
    // so its Exchange counts are NOT comparable — only the star ids are
    // read from it.)
    // A Dataset caches its QueryExecution, so the static plan needs a
    // FRESH frame built under the flipped conf. Each builder runs exactly
    // TWICE (once per planning mode) — the RoundPlans builders run eager
    // checkpoint setup, so per-label rebuilds would multiply that cost.
    def withAqeOff[A](body: => A): A = {
      val conf = spark.sessionState.conf
      val key = "spark.sql.adaptive.enabled"
      val prev = conf.getConfString(key)
      conf.setConfString(key, "false")
      try body finally conf.setConfString(key, prev)
    }
    def planStrings(name: String): Seq[(String, String, String)] =
      if (RoundPlans.plans.contains(name)) {
        // driver-coordinated iterative query: its final frame is only
        // the collected trace (a LocalTableScan) — audit one
        // representative ROUND per distinct per-round shape instead
        // the two passes are zipped POSITIONALLY: per-round labels are
        // not required to be unique, and a keyed map would silently
        // print one round's codegen spans against another's AQE plan
        val aqe = RoundPlans.plans(name)(spark, dir)
          .map { case (l, f) => l -> f.queryExecution.executedPlan.toString }
        val static = withAqeOff(RoundPlans.plans(name)(spark, dir)
          .map { case (_, f) => f.queryExecution.executedPlan.toString })
        require(aqe.length == static.length,
          s"$name: AQE pass emitted ${aqe.length} rounds, static pass ${static.length}")
        aqe.zip(static).map { case ((l, p), s) => (s"$name@$l", p, s) }
      } else {
        val aqe = SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString
        val static = withAqeOff(
          SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString)
        Seq((name, aqe, static))
      }
    val prefixes = prefix.split(',').toSeq
    for (name <- SparkEntry.queries.keys.toSeq.sorted
         if prefixes.exists(name.startsWith)) {
      try planStrings(name).foreach { case (label, p, s) => println(row(label, p, s)) }
      catch {
        case e: Throwable => println(f"$name%-22s ERROR ${e.toString.take(100)}")
      }
    }
    spark.stop()
  }

  private def row(name: String, p: String, staticP: String): String = {
    val shuffles = "Exchange (hash|range)partitioning|Exchange SinglePartition".r.findAllIn(p).length
    val bcast = "BroadcastExchange".r.findAllIn(p).length
    val smj = "SortMergeJoin".r.findAllIn(p).length
    val wsc = "\\*\\((\\d+)\\)".r.findAllMatchIn(staticP).map(_.group(1)).toSet.size
    f"$name%-22s shuffles=$shuffles%-3d bcast=$bcast%-3d smj=$smj%-3d codegenSpans=$wsc"
  }
}
