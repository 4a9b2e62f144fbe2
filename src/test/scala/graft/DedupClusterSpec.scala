package graft

/** Convergence guard for the LSH min-label clustering: the fixed round
  * count baked into q_lsh_clusters must already be a fixpoint on the
  * test corpora — if the graph diameter ever outgrows it, this fails
  * before the oracle gate does.
  */
class DedupClusterSpec extends SparkSpec {

  private def labelsAt(dir: String, rounds: Int): Map[Long, (Long, Long)] =
    queries.Dedup.clusterRun(spark, dir, rounds)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("4 rounds of pointer-jumping label propagation is a fixpoint at sf0.001") {
    val r4 = labelsAt("/root/testdata/sf0.001", 4)
    val r5 = labelsAt("/root/testdata/sf0.001", 5)
    assert(r4 === r5)
    assert(r4.nonEmpty, "expected at least one near-dup cluster in the corpus")
  }

  test("clusters are canonical: cluster_id is the min doc_id of the cluster") {
    val rows = queries.Dedup.clusterRun(spark, "/root/testdata/sf0.001", 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
    }
  }
}
