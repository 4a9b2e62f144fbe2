package graft

import org.apache.spark.sql.SparkSession

/** Driver-visible negative-path check for the startup schema contract:
  * builds a deliberately drifted testdata dir (mis-typed column, missing
  * column, missing table), asserts [[Tables.validate]] raises ONE
  * aggregated error naming every problem, then validates the real dir.
  * Exit 0 = the next producer refresh incident is a one-line diagnosis;
  * non-zero = the contract gate itself regressed.
  *
  * Usage: java -cp ... graft.ValidateCheck [realSfDir]
  */
object ValidateCheck {
  def main(args: Array[String]): Unit = {
    val realDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[4]")
      .appName("graft-validate-check")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val bad = java.nio.file.Files.createTempDirectory("validate_check").toString
    // events.ts mis-typed, documents.n_chars missing, lineitem absent
    Seq((1L, "not-a-time", 2L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.parquet(s"$bad/events.parquet")
    Seq((1L, "x", "en", "web"))
      .toDF("doc_id", "text", "lang", "source")
      .write.parquet(s"$bad/documents.parquet")

    val err =
      try { Tables.validate(spark, bad, Seq("events", "documents", "lineitem")); None }
      catch { case e: IllegalStateException => Some(e.getMessage) }
    val problems = Seq("events.ts", "documents.n_chars", "lineitem: missing file")
    err match {
      case None =>
        System.err.println("FAIL: validate accepted a drifted dir"); spark.stop(); sys.exit(1)
      case Some(msg) =>
        val missing = problems.filterNot(msg.contains)
        if (missing.nonEmpty) {
          System.err.println(
            s"FAIL: aggregated error does not name: ${missing.mkString(", ")}\n--\n$msg")
          spark.stop(); sys.exit(1)
        }
        println(s"OK: one aggregated error named all ${problems.size} problems")
    }

    Tables.validate(spark, realDir)
    println(s"OK: $realDir passes the schema contract")
    spark.stop()
  }
}
