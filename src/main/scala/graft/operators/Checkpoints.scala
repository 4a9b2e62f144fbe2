package graft.operators

import org.apache.spark.sql.DataFrame

/** Shared materialization point for driver-coordinated iterative
  * operators ([[KCore]], [[PageRank]], label propagation, logistic
  * regression): truncate the per-round lineage by checkpointing the
  * round's frame.
  *
  * `localCheckpoint` stores executor-LOCAL blocks — gone on executor
  * loss, which on a real cluster aborts a long iteration halfway
  * through. When a reliable checkpoint directory is available (set via
  * `SparkContext.setCheckpointDir` or the `spark.checkpoint.dir` conf)
  * this helper uses a RELIABLE checkpoint instead: the frame lands in
  * fault-tolerant storage and the iteration survives executor churn.
  * Local mode / tests / the bench harness set no dir and keep the
  * (faster, single-JVM-safe) local path.
  */
object Checkpoints {

  /** Eagerly materialize `df` with lineage truncation — reliable when a
    * checkpoint dir is configured, executor-local otherwise.
    */
  def materialize(df: DataFrame): DataFrame = {
    val sc = df.sparkSession.sparkContext
    if (sc.getCheckpointDir.isEmpty)
      sc.getConf.getOption("spark.checkpoint.dir").foreach(sc.setCheckpointDir)
    if (sc.getCheckpointDir.isDefined) df.checkpoint(eager = true)
    else df.localCheckpoint(eager = true)
  }
}
