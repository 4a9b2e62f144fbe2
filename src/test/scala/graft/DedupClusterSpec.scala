package graft

import org.apache.spark.sql.functions._

/** Convergence guards for the LSH min-label clustering.
  *
  * The gate query runs [[queries.Dedup.propagateLabels]] to convergence
  * (driver-side changed==0 check); its oracle unrolls a FIXED 4 rounds.
  * Gate equality therefore requires 4 rounds to be a fixpoint on the
  * test corpora — asserted here with pinned `exactRounds` — while the
  * chain test shows why convergence (not a fixed cap) is the correct
  * default: a component whose diameter exceeds what 4 pointer-jumping
  * rounds can reach is silently mislabeled by the fixed-round form and
  * labeled correctly by the converging one.
  */
class DedupClusterSpec extends SparkSpec {

  private def labelsAt(dir: String, rounds: Int): Map[Long, (Long, Long)] =
    queries.Dedup.clusterRun(spark, dir, exactRounds = Some(rounds))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap

  test("4 rounds of pointer-jumping label propagation is a fixpoint at sf0.001") {
    val r4 = labelsAt("/root/testdata/sf0.001", 4)
    val r5 = labelsAt("/root/testdata/sf0.001", 5)
    assert(r4 === r5)
    assert(r4.nonEmpty, "expected at least one near-dup cluster in the corpus")
  }

  test("converged run equals the 4-round fixpoint at sf0.001") {
    val conv = queries.Dedup.clusterRun(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    assert(conv === labelsAt("/root/testdata/sf0.001", 4))
  }

  test("clusters are canonical: cluster_id is the min doc_id of the cluster") {
    val rows = queries.Dedup.clusterRun(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCluster = rows.groupBy(_._2)
    byCluster.foreach { case (cid, members) =>
      assert(members.map(_._1).min === cid)
    }
  }

  test("converged labels equal union-find components on random bipartite graphs") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 5) {
      val nDocs = 20 + rnd.nextInt(40)
      val nBuckets = 5 + rnd.nextInt(15)
      val membership = (0L until nDocs.toLong)
        .flatMap { d =>
          Seq.fill(1 + rnd.nextInt(2))((d, s"b${rnd.nextInt(nBuckets)}"))
        }
      val (labels, _) =
        queries.Dedup.propagateLabels(membership.toDF("doc_id", "bkey"), maxRounds = 16)
      val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

      // driver-side union-find ground truth over the same bipartite graph
      val parent = scala.collection.mutable.Map[Any, Any]()
      def find(x: Any): Any = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      def union(a: Any, b: Any): Unit = { val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(ra) = rb }
      membership.foreach { case (d, b) => union(d, b) }
      val want = membership.map(_._1).distinct
        .groupBy(d => find(d))
        .values.flatMap { ds => val m = ds.min; ds.map(_ -> m) }
        .toMap

      // propagateLabels only emits docs sharing a non-singleton bucket;
      // compare on the docs it labels — each must carry its component min
      got.foreach { case (d, lbl) =>
        assert(lbl === want(d), s"trial $trial: doc $d in component ${want(d)}, labeled $lbl")
      }
    }
  }

  test("a chain longer than the old fixed cap converges to one component") {
    import spark.implicits._
    // Path graph of 40 docs: bucket i links docs i and i+1, so the
    // component diameter is 39 — beyond the ~2^4 reach of the old fixed
    // 4 rounds, well within the 16-round backstop.
    val n = 40L
    val membership = (0L until n - 1)
      .flatMap(i => Seq((i, s"b$i"), (i + 1, s"b$i")))
      .toDF("doc_id", "bkey")

    val (fixed4, _) =
      queries.Dedup.propagateLabels(membership, maxRounds = 4, exactRounds = Some(4))
    val wrong = fixed4.filter(col("lbl") =!= 0L).count()
    assert(wrong > 0,
      "fixture too shallow: 4 fixed rounds already resolve the chain, " +
        "so it proves nothing about the convergence loop")

    val (converged, rounds) = queries.Dedup.propagateLabels(membership, maxRounds = 16)
    assert(converged.filter(col("lbl") =!= 0L).count() === 0L,
      "every doc in the chain must collapse to the min label 0")
    assert(rounds > 4 && rounds <= 16,
      s"expected convergence after the old cap but within the backstop, got $rounds")
  }
}
