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
    for (name <- SparkEntry.queries.keys.toSeq.sorted if name.startsWith(prefix)) {
      try {
        if (RoundPlans.plans.contains(name)) {
          // driver-coordinated iterative query: its final frame is only
          // the collected trace (a LocalTableScan) — audit one
          // representative ROUND per distinct per-round shape instead
          for ((label, frame) <- RoundPlans.plans(name)(spark, dir))
            println(row(s"$name@$label", frame.queryExecution.executedPlan.toString))
        } else {
          println(row(name,
            SparkEntry.queries(name)(spark, dir).queryExecution.executedPlan.toString))
        }
      } catch {
        case e: Throwable => println(f"$name%-22s ERROR ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }

  private def row(name: String, p: String): String = {
    val shuffles = "Exchange (hash|range)partitioning|Exchange SinglePartition".r.findAllIn(p).length
    val bcast = "BroadcastExchange".r.findAllIn(p).length
    val smj = "SortMergeJoin".r.findAllIn(p).length
    val wsc = "WholeStageCodegen".r.findAllIn(p).length
    f"$name%-22s shuffles=$shuffles%-3d bcast=$bcast%-3d smj=$smj%-3d codegenSpans=$wsc"
  }
}
