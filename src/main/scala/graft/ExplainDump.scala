package graft

import org.apache.spark.sql.SparkSession

/** Dev tool for the optimization-round deliverables: write the
  * `.explain("formatted")` output of each named query to
  * `<outDir>/<query><suffix>.txt` — the before/after plan evidence the
  * round's OPTIMIZATION notes cite (plans/r19/).
  *
  * Usage: java -cp ... graft.ExplainDump <sfDir> <outDir> <suffix> <q1,q2,...>
  *
  * The session mirrors [[Bench]]'s conf (AQE on, shuffle partitions =
  * SPARK_GRAFT_CPUS) so the captured initial plans match what the bench
  * executes. Queries whose contract function RUNS work eagerly
  * (streaming drains, bucketed-table builds, iterative loops) execute
  * that work here too — the dumped plan is then the plan of the frame
  * the query RETURNS, which for driver-coordinated loops is the
  * collected trace; RoundPlans/PlanAudit stay the per-round audit tools.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val suffix = args(2)
    val names = args(3).split(',').toSeq
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .master(s"local[$cpus]")
      .appName("graft-explain-dump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Tables.validate(spark, dir)
    for (name <- names) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          outDir.resolve(s"$name$suffix.txt"),
          (s"-- $name ($suffix) @ $dir\n" + txt).getBytes("UTF-8"))
        println(s"[explain] wrote $name$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[explain] ERROR $name: ${e.toString.take(200)}")
      }
    }
    spark.stop()
  }
}
