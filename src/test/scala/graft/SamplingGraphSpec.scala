package graft

import org.apache.spark.sql.functions._

/** Statistical / structural properties of the round-6 sampling, sketch,
  * and graph operators — the behavior the DuckDB hash gate cannot see
  * (it pins exact equality; these pin that the algorithms DO the thing
  * they claim).
  */
class SamplingGraphSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("weighted sample over-represents long documents (ES weighting works)") {
    val sampleMean = run("q_weighted_sample")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    val corpusMean = spark.read.parquet(s"$dir/documents.parquet")
      .agg(avg(col("n_chars"))).head.getDouble(0)
    // 100 of 500 docs drawn ∝ n_chars: the sample mean must sit clearly
    // above the corpus mean (length-biased expectation E[w²]/E[w] > E[w])
    assert(sampleMean > corpusMean * 1.05,
      s"sample mean $sampleMean vs corpus mean $corpusMean")
  }

  test("leak-free split: no content fingerprint straddles two splits") {
    val perFp = run("q_split_leakfree") // forces the query itself to run green
    assert(perFp.count() == 3)
    // recompute assignment at row grain and assert the leak-unit invariant
    val d = spark.read.parquet(s"$dir/documents.parquet")
      .select(md5(col("text")).as("fp"),
        (graft.text.TextFunctions.md5Hash32(concat(lit("split2:"), md5(col("text")))) % 10)
          .as("bucket"))
    val straddlers = d.groupBy(col("fp"))
      .agg(countDistinct(col("bucket")).as("nb"))
      .filter(col("nb") > 1)
      .count()
    assert(straddlers == 0)
  }

  test("JL projection concentrates norms (mean ratio near 1, bounded spread)") {
    val stats = run("q_random_projection")
      .agg(avg(col("norm_ratio")).as("mean"),
        min(col("norm_ratio")).as("lo"), max(col("norm_ratio")).as("hi"))
      .head
    val (mean, lo, hi) = (stats.getDouble(0), stats.getDouble(1), stats.getDouble(2))
    // 64→8 dims: E[ratio²]=1; the spread is wide at d_out=8 but must be
    // centered and nowhere degenerate (a sign-matrix bug collapses some
    // vector to ~0 or inflates it far past √(64/8))
    assert(math.abs(mean - 1.0) < 0.15, s"mean $mean")
    assert(lo > 0.2 && hi < 2.5, s"range [$lo, $hi]")
  }

  test("DOULION estimator lands within 3x of the exact triangle count") {
    val est = run("q_triangle_count").head.getAs[Long]("est_triangles")
    // exact count on the UNSAMPLED graph, brute-forced (tiny at sf0.001)
    val items = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val e = items.as("x").join(items.as("y"), "l_orderkey")
      .filter(col("x.l_partkey") < col("y.l_partkey"))
      .select(col("x.l_partkey").as("a"), col("y.l_partkey").as("b")).distinct()
      .cache()
    val exact = e.as("e1").join(e.as("e2"), col("e1.b") === col("e2.a"))
      .join(e.as("e3"),
        col("e1.a") === col("e3.a") && col("e2.b") === col("e3.b"))
      .count()
    assert(exact > 0, "fixture has no triangles — estimator untestable")
    // p=0.1 sampling at this scale is noisy; 3x brackets the estimator
    // while still catching a wrong p³ correction (off by 10x or 100x)
    assert(est > 0 && est < exact * 3 && est > exact / 3,
      s"est $est vs exact $exact")
  }

  test("basketPairs caps a degenerate hot basket instead of going quadratic") {
    import spark.implicits._
    // 50 normal baskets of 4 items + one hot basket with 500 items:
    // uncapped pair-gen emits 500·499/2 = 124750 pairs for the hot key
    val normal = (0 until 50).flatMap(b => (0 until 4).map(i => (b.toLong, (b * 10 + i).toLong)))
    val hot = (0 until 500).map(i => (999L, 100000L + i.toLong))
    val items = (normal ++ hot).toDF("basket", "item")

    val capped = graft.operators.Triangles.basketPairs(items, "basket", "item", maxBasket = 64)
    val cappedPairs = capped.count()
    // only the normal baskets' pairs survive: 50 baskets × C(4,2)
    assert(cappedPairs == 50L * 6, s"got $cappedPairs pairs")
    // none of the hot basket's items appears in any pair
    assert(capped.filter(col("a") >= 100000L || col("b") >= 100000L).count() == 0)

    // the uncapped run would include the quadratic hot-basket blowup
    val uncapped =
      graft.operators.Triangles.basketPairs(items, "basket", "item", maxBasket = 1000000)
    assert(uncapped.count() == 50L * 6 + 500L * 499 / 2)
  }

  test("Triangles.stats bloom cap: raised-fpp and skip paths keep counts exact") {
    import spark.implicits._
    // K6 (20 triangles) plus a 2-edge tail: 17 distinct a<b edges
    val nodes = 0L until 6L
    val clique = for (a <- nodes; b <- nodes if a < b) yield (a, b)
    val edges = (clique ++ Seq((6L, 7L), (7L, 8L))).toDF("a", "b")
    val cols = Seq("n_edges", "max_degree", "n_wedges", "n_triangles")
    val base = graft.operators.Triangles.stats(edges).head
    assert(base.getAs[Long]("n_triangles") == 20L)
    // 8-byte cap over 17 edges → fpp = exp(-64·ln²2/17) ≈ 0.16: the cap
    // binds (fpp raised above 2%) but stays under the 0.25 skip line
    val capped = graft.operators.Triangles.stats(edges, maxBloomBytes = 8L).head
    // 1-byte cap → required fpp ≈ 0.79 > 0.25: sketch skipped outright
    val skipped = graft.operators.Triangles.stats(edges, maxBloomBytes = 1L).head
    // bloom = false (the r19 size gate's small-input branch): no sketch
    // AND no eager driver-side count — same four numbers in-plan
    val gatedOff = graft.operators.Triangles.stats(edges, bloom = false).head
    for (c <- cols) {
      assert(capped.getAs[Long](c) == base.getAs[Long](c), s"capped $c")
      assert(skipped.getAs[Long](c) == base.getAs[Long](c), s"skipped $c")
      assert(gatedOff.getAs[Long](c) == base.getAs[Long](c), s"gatedOff $c")
    }
  }

  test("DOULION thinning commutes with the pair dedup (thin-early ≡ thin-late)") {
    import spark.implicits._
    // overlapping baskets so the same pair co-occurs in SEVERAL baskets —
    // the raw stream then carries real duplicates and the commute claim
    // (thin ∘ distinct = distinct ∘ thin for a pure (a,b) predicate) is
    // exercised on multiplicity > 1, not vacuously
    val items = (0 until 60)
      .flatMap(b => (0 until 4).map(i => (b.toLong, ((b + i) % 20).toLong)))
      .toDF("basket", "item")
    val late = graft.operators.Triangles.sampleEdges(
      graft.operators.Triangles.basketPairs(items, "basket", "item"),
      modParts = 10, keepParts = 3, salt = "tri:")
    val early = graft.operators.Triangles.sampleEdges(
      graft.operators.Triangles.rawBasketPairs(items, "basket", "item"),
      modParts = 10, keepParts = 3, salt = "tri:").distinct()
    val l = late.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val e = early.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(l.nonEmpty, "thinned edge set is empty — fixture too small to test the commute")
    assert(e == l, s"thin-early ${e.size} edges != thin-late ${l.size}")
    // and the raw stream really had duplicates to dedup
    val raw = graft.operators.Triangles.rawBasketPairs(items, "basket", "item").count()
    assert(raw > graft.operators.Triangles.basketPairs(items, "basket", "item").count())
  }

  test("stream-static enrich equals the batch join it claims to converge to") {
    val streamed = run("q_stream_enrich")
    val ev = Tables.load(spark, dir, "events")
    val dim = spark.read.parquet(s"$dir/customer.parquet")
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val batch = ev.join(dim, Seq("user_id"))
      .groupBy(date_trunc("hour", col("ts")).as("bucket"), col("segment"))
      .agg(count(lit(1)).as("n"), (round(sum(col("value")) * 100) / 100).as("sum_value"))
    assert(streamed.count() == batch.count())
    assert(streamed.join(batch, Seq("bucket", "segment", "n", "sum_value")).count()
      == batch.count())
  }
}
