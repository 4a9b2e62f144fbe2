package graft

/** Both branches of q_triangle_sampled's size-conditional phase
  * barrier (PipelineQ) must produce identical estimates: the barrier
  * only changes WHEN each DOULION wave materializes (serialized, to
  * bound simultaneous shuffle scratch at board scale), never what it
  * computes. The sf0.01 driver gate exercises the overlapped branch
  * (input far below the 4 GiB threshold) and the ×1000 board the
  * phased one; this spec pins the equivalence at test scale.
  */
class TriangleBarrierSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(): Array[org.apache.spark.sql.Row] =
    SparkEntry.queries("q_triangle_sampled")(spark, dir).collect()

  test("phased and overlapped waves agree row-for-row") {
    spark.conf.set("spark.graft.tri.barrier", "never")
    val overlapped =
      try run()
      finally spark.conf.unset("spark.graft.tri.barrier")
    spark.conf.set("spark.graft.tri.barrier", "always")
    val phased =
      try run()
      finally spark.conf.unset("spark.graft.tri.barrier")
    assert(overlapped.length == 1 && phased.length == 1)
    assert(overlapped.toSeq == phased.toSeq)
  }

  test("default threshold keeps the barrier off at test scale") {
    // sf0.001 lineitem is a few hundred KiB — the 4 GiB gate must not
    // engage, or the small-SF bench pays board-scale insurance again.
    val bytes = Tables.load(spark, dir, "lineitem")
      .queryExecution.optimizedPlan.stats.sizeInBytes
    assert(bytes < BigInt(4L << 30))
  }
}
