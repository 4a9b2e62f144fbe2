package graft

import graft.queries.PipelineQ
import org.apache.spark.sql.functions._

/** Semantic + plan-shape checks for the round-5 pipeline pack, against
  * brute-force recomputations at sf0.001 (the DuckDB hash gate covers
  * sf0.01; these pin the semantics independently of the oracle SQL).
  */
class PipelineQSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def plan(q: Q): String =
    q.run(spark, dir).queryExecution.executedPlan.toString

  test("q_repetition matches a direct per-doc recomputation") {
    val out = PipelineQ.qRepetition.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r).toMap
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out.nonEmpty)
    for ((docId, row) <- out.take(25)) {
      val words = texts(docId).split(" ").filter(_.nonEmpty)
      val grams = words.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
      assert(row.getLong(1) == words.length.toLong, s"doc $docId n_words")
      def r6(x: Double) = math.round(x * 1e6) / 1e6
      assert(row.getDouble(2) == r6(1.0 - words.distinct.length.toDouble / words.length),
        s"doc $docId dup_word_frac")
      assert(row.getDouble(3) ==
        r6(words.groupBy(identity).values.map(_.length).max.toDouble / words.length),
        s"doc $docId top_word_frac")
      assert(row.getDouble(4) == r6(1.0 - grams.distinct.length.toDouble / grams.length),
        s"doc $docId dup_3gram_frac")
    }
    // every ≥3-word doc is present
    assert(out.size == texts.count(_._2.split(" ").count(_.nonEmpty) >= 3))
  }

  test("q_dsir_weights: en docs dominate the top of the ranking") {
    val out = PipelineQ.qDsirWeights.run(spark, dir).collect()
    assert(out.length == 50)
    // scores are a descending ranking and the target slice scores higher
    // on average than non-target docs (the whole point of the weights)
    val scores = out.map(_.getDouble(2))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    val enShare = out.count(_.getString(1) == "en").toDouble / out.length
    val corpusEnShare = {
      val langs = Tables.load(spark, dir, "documents").select("lang").collect().map(_.getString(0))
      langs.count(_ == "en").toDouble / langs.length
    }
    assert(enShare > corpusEnShare, s"top-50 en share $enShare <= corpus share $corpusEnShare")
  }

  test("q_semdedup: per-label accounting is consistent and victims exist") {
    val out = PipelineQ.qSemDedup.run(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val (n, d, k) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(d + k == n, s"label ${r.getInt(0)}: dropped+kept != total")
      assert(k >= 1, s"label ${r.getInt(0)}: keep-best must keep at least one")
    }
  }

  test("q_simhash_band: all reported pairs within Hamming 3; Hamming-1 recall is total") {
    val out = PipelineQ.qSimhashBand.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.values.forall { case (ham, np) => ham <= 3 && np >= 1 })
    // brute-force simhashes, check the pigeonhole guarantee at the
    // signature-collapse grain: any DOC pair at Hamming ≤ 1 either
    // shares a signature (→ its group's Hamming-0 row must carry it in
    // n_pairs) or spans two signatures sharing an intact 8-bit band
    // (→ the rep pair must be reported with n_pairs = na·nb)
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(col("t")).as("w"))
      .select(col("doc_id"), graft.text.TextFunctions.md5Hash32(col("w")).as("h"))
      .groupBy("doc_id")
      .agg(graft.text.TextFunctions.simhashBitAggs(col("h")).head,
        graft.text.TextFunctions.simhashBitAggs(col("h")).tail: _*)
      .select(col("doc_id"), graft.text.TextFunctions.simhashFromBits().as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val groups = sh.groupBy(_._2).map { case (s, ds) =>
      s -> ((ds.map(_._1).min, ds.length.toLong))
    }
    for ((_, (rep, n)) <- groups if n >= 2)
      assert(out.get((rep, rep)).contains((0L, n * (n - 1) / 2)),
        s"group at rep $rep missing its Hamming-0 mass row")
    for {
      (a, sa) <- sh; (b, sb) <- sh if a < b && sa != sb
      ham = java.lang.Long.bitCount(sa ^ sb) if ham <= 1
      (ra, na) = groups(sa); (rb, nb) = groups(sb)
      key = (math.min(ra, rb), math.max(ra, rb))
    } assert(out.get(key).contains((ham.toLong, na * nb)),
      s"missed Hamming-$ham signature pair via docs ($a,$b) → reps $key")
  }

  test("q_simhash_band equals a driver-side brute-force of the collapsed banding") {
    // EXACTNESS, not recall: rebuild the entire expected output from the
    // brute-forced signatures — group by signature, band the distinct
    // signatures, enumerate band-sharing pairs at Hamming <= 3 with
    // na*nb mass, plus per-group Hamming-0 rows — and require set
    // equality with the query
    val sh = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), graft.text.TextFunctions.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(col("t")).as("w"))
      .select(col("doc_id"), graft.text.TextFunctions.md5Hash32(col("w")).as("h"))
      .groupBy("doc_id")
      .agg(graft.text.TextFunctions.simhashBitAggs(col("h")).head,
        graft.text.TextFunctions.simhashBitAggs(col("h")).tail: _*)
      .select(col("doc_id"), graft.text.TextFunctions.simhashFromBits().as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val groups = sh.groupBy(_._2).map { case (s, ds) =>
      s -> ((ds.map(_._1).min, ds.length.toLong))
    }
    val sigs = groups.keys.toSeq
    def bands(s: Long) = Seq((0, s & 255L), (1, (s >> 8) & 255L))
    val expected = (for {
      sa <- sigs; sb <- sigs if sa < sb
      if bands(sa).intersect(bands(sb)).nonEmpty
      ham = java.lang.Long.bitCount(sa ^ sb).toLong if ham <= 3
      (ra, na) = groups(sa); (rb, nb) = groups(sb)
    } yield (math.min(ra, rb), math.max(ra, rb), ham, na * nb)).toSet ++
      groups.values.collect { case (rep, n) if n >= 2 => (rep, rep, 0L, n * (n - 1) / 2) }
    val got = PipelineQ.qSimhashBand.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
  }

  test("q_interval_sweep matches a driver-side timeline scan") {
    val out = PipelineQ.qIntervalSweep.run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val iv = Tables.load(spark, dir, "events")
      .groupBy("event_type", "user_id")
      .agg(min("ts").as("s"), max("ts").as("e"))
      .collect()
      .map(r => (r.getString(0), r.getTimestamp(2).getTime, r.getTimestamp(3).getTime))
    val expected = iv.groupBy(_._1).map { case (tpe, ivs) =>
      val deltas = ivs.flatMap(i => Seq((i._2, 1), (i._3, -1))).sortBy(d => (d._1, d._2))
      tpe -> deltas.scanLeft(0)(_ + _._2).max.toLong
    }
    assert(out == expected)
  }

  test("q_gaps_islands matches per-customer run-length recomputation") {
    val out = PipelineQ.qGapsIslands.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val byCust = Tables.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("dt"))
      .distinct().collect()
      .map(r => r.getLong(0) -> r.getDate(1).toLocalDate.toEpochDay)
      .groupBy(_._1)
    for ((cust, rows) <- byCust.take(50)) {
      val days = rows.map(_._2).sorted
      val runLens = scala.collection.mutable.ArrayBuffer.empty[Long]
      var cur = 1L
      for (i <- 1 until days.length) {
        if (days(i) == days(i - 1) + 1) cur += 1
        else { runLens += cur; cur = 1 }
      }
      runLens += cur
      val (nDays, nIslands, maxRun) = out(cust)
      assert(nDays == days.length.toLong, s"cust $cust n_order_days")
      assert(nIslands == runLens.length.toLong, s"cust $cust n_islands")
      assert(maxRun == runLens.max, s"cust $cust max_run")
    }
  }

  test("q_market_share: shares in [0,1], components consistent") {
    val out = PipelineQ.qMarketShare.run(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      assert(r.getDouble(1) <= r.getDouble(2) + 1e-9)
      val share = r.getDouble(3)
      assert(share >= 0.0 && share <= 1.0)
    }
  }

  test("q_top_supplier revenue equals the independently computed max") {
    val out = PipelineQ.qTopSupplier.run(spark, dir).collect()
    assert(out.nonEmpty)
    val mx = Tables.load(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg((round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 100) / 100)
        .as("rev"))
      .agg(max("rev")).collect()(0).getDouble(0)
    assert(out.forall(_.getDouble(2) == mx))
  }

  test("q_rank_battery: ranks normalized, cume_dist tops out at 1 per customer") {
    val df = PipelineQ.qRankBattery.run(spark, dir)
    val bad = df.filter(col("pr") < 0 || col("pr") > 1 || col("cd") <= 0 || col("cd") > 1).count()
    assert(bad == 0)
    val tops = df.groupBy("o_custkey").agg(max("cd").as("m")).filter(col("m") =!= 1.0).count()
    assert(tops == 0)
  }

  test("q_dup_spans matches a driver-side shingle recount") {
    val out = PipelineQ.qDupSpans.run(spark, dir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val texts = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toArray)
      .filter(_._2.length >= 8)
    val docShingles = texts.map { case (id, t) =>
      id -> t.sliding(8).filter(_.length == 8).map(_.mkString(" ")).toArray
    }
    val docsPerShingle = docShingles.flatMap { case (id, ss) => ss.distinct.map(_ -> id) }
      .groupBy(_._1).map { case (sh, xs) => sh -> xs.length }
    assert(out.keySet == docShingles.map(_._1).toSet)
    for ((id, ss) <- docShingles.take(40)) {
      val (nGrams, nShared) = out(id)
      assert(nGrams == ss.length.toLong, s"doc $id n_grams")
      assert(nShared == ss.count(docsPerShingle(_) >= 2).toLong, s"doc $id n_shared")
    }
  }

  test("q_recursive_walk: closed-form chain arithmetic, UnionLoop in the plan") {
    val df = PipelineQ.qRecursiveWalk.run(spark, dir)
    val rows = df.collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val k = r.getLong(0)
      assert(r.getLong(1) == k % 5, s"nation $k root")
      assert(r.getLong(2) == k / 5, s"nation $k chain length")
    }
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("UnionLoop"), p)
  }

  test("q_markov_transitions: rows are a proper stochastic matrix") {
    val rows = PipelineQ.qMarkovTransitions.run(spark, dir).collect()
    assert(rows.nonEmpty)
    val byCur = rows.groupBy(_.getString(0))
    for ((cur, rs) <- byCur) {
      val pSum = rs.map(_.getDouble(3)).sum
      assert(math.abs(pSum - 1.0) < 1e-3, s"$cur transition probs sum to $pSum")
    }
    // transition counts conserve: total transitions = total events - users
    val ev = Tables.load(spark, dir, "events")
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getLong(2)).sum == expected)
  }

  test("plan guards: star broadcasts, banded joins never cartesian") {
    val ms = plan(PipelineQ.qMarketShare)
    assert("BroadcastHashJoin".r.findAllIn(ms).length >= 3, ms)
    val sb = plan(PipelineQ.qSimhashBand)
    assert(!sb.contains("CartesianProduct"), sb)
    val sd = plan(PipelineQ.qSemDedup)
    assert(!sd.contains("CartesianProduct"), sd)
    val ds = plan(PipelineQ.qDsirWeights)
    assert("BroadcastHashJoin".r.findAllIn(ds).length >= 2, ds)
  }

  test("q_state_runs: runs are maximal, contiguous, and conserve events") {
    val rows = PipelineQ.qStateRuns.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val byUser = rows.groupBy(_._1)
    for ((u, rs) <- byUser) {
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.length).toSeq, s"user $u run_idx gap")
      // maximality: adjacent runs never share a state
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3 != b._3, s"user $u adjacent runs same state")
        case _ =>
      }
    }
    assert(rows.map(_._4).sum == Tables.load(spark, dir, "events").count())
  }

  test("TopKAggregator: bounded buffer, order-insensitive, equals the window plan") {
    val agg = new graft.operators.TopKAggregator(3)
    // unit-level: any insertion order and any merge split yield the same top-3
    val entries = Seq((5.0, 2L), (5.0, 1L), (3.0, 7L), (9.0, 4L), (1.0, 9L), (9.0, 5L))
    val expected = Seq((9.0, 4L), (9.0, 5L), (5.0, 1L))
    for (perm <- entries.permutations.take(40)) {
      val whole = perm.foldLeft(agg.zero)(agg.reduce)
      assert(agg.finish(whole) == expected, s"perm $perm")
      val (l, r) = perm.splitAt(perm.length / 2)
      val merged = agg.merge(l.foldLeft(agg.zero)(agg.reduce), r.foldLeft(agg.zero)(agg.reduce))
      assert(agg.finish(merged) == expected, s"split-merge $perm")
      assert(merged.entries.length <= 3)
    }
    // query-level: exact row set of the row_number window, no Window in the plan
    val df = queries.PipelineQ.qTopkPerKey.run(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), p)
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val win = Tables.load(spark, dir, "orders")
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 3)
      .select(col("o_custkey"), col("rank").cast("long"), col("o_orderkey"))
      .orderBy(col("o_custkey"), col("rank"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == win)
  }

  test("q_weighted_median matches a driver-side weighted-cumulative scan; no Window") {
    val df = PipelineQ.qWeightedMedian.run(spark, dir)
    assert(!df.queryExecution.executedPlan.toString.contains("Window"))
    val out = df.collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getDouble(3)))).toMap
    val rows = Tables.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")).collect()
      .map(r => (r.getString(0), r.getDouble(1), math.round(r.getDouble(2) * 100)))
    for ((flag, rs) <- rows.groupBy(_._1)) {
      val byV = rs.groupBy(_._2).map { case (v, xs) => v -> xs.map(_._3).sum }.toSeq.sortBy(_._1)
      val tw = byV.map(_._2).sum
      def q(m: Long, f: Long): Double = {
        var c = 0L
        byV.find { case (_, wv) => c += wv; m * c >= f * tw }.get._1
      }
      val (p25, med, p75) = out(flag)
      assert(p25 == q(4, 1), s"$flag wp25"); assert(med == q(2, 1), s"$flag wmedian")
      assert(p75 == q(4, 3), s"$flag wp75")
    }
  }

  test("q_bigram_lm matches a driver-side add-1 MLE recomputation") {
    val out = PipelineQ.qBigramLm.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val toks = Tables.load(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> "[a-z]+".r.findAllIn(r.getString(1).toLowerCase).toArray)
      .filter(_._2.length >= 2)
    val bigs = toks.map { case (id, t) => id -> t.sliding(2).filter(_.length == 2).toArray }
    val cxy = bigs.flatMap(_._2).groupBy(p => (p(0), p(1))).map { case (k, v) => k -> v.length }
    val cx = bigs.flatMap(_._2.map(_(0))).groupBy(identity).map { case (k, v) => k -> v.length }
    val vocab = cx.size
    assert(out.keySet == bigs.map(_._1).toSet)
    for ((id, bs) <- bigs.take(25)) {
      val expected = bs.map(p =>
        math.log((cxy((p(0), p(1))) + 1.0) / (cx(p(0)) + vocab))).sum / bs.length
      assert(out(id) == math.round(expected * 1e6) / 1e6, s"doc $id")
    }
  }

  test("q_null_safe_join: the nulled key still pairs; plan stays a hash join") {
    val df = PipelineQ.qNullSafeJoin.run(spark, dir)
    val rows = df.collect()
    // 4 surviving priorities + the NULL bucket (nulled '1-URGENT') all joined
    assert(rows.length == 5)
    assert(rows.count(_.isNullAt(0)) == 1)
    assert(rows.forall(r => r.getLong(1) > 0 && r.getDouble(2) > 0))
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q_centroid_drift: full label coverage, valid cosines, matches one recompute") {
    val rows = PipelineQ.qCentroidDrift.run(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getLong(1) == 64L, s"label ${r.getInt(0)} dims")
      assert(math.abs(r.getDouble(2)) <= 1.0 + 1e-9)
    }
    // recompute one label driver-side from rounded half-centroids
    val label0 = rows.find(_.getInt(0) == rows.head.getInt(0)).get
    val vecs = Tables.load(spark, dir, "embeddings")
      .filter(col("label") === label0.getInt(0))
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray)
    val halves = vecs.groupBy(_._1 % 2).map { case (h, vs) =>
      h -> (0 until 64).map(d =>
        math.round(vs.map(_._2(d).toDouble).sum / vs.length * 1e5) / 1e5).toArray
    }
    val (a, b) = (halves(0L), halves(1L))
    val cos = a.zip(b).map { case (x, y) => x * y }.sum /
      (math.sqrt(a.map(x => x * x).sum) * math.sqrt(b.map(x => x * x).sum))
    assert(label0.getDouble(2) == math.round(cos * 1e6) / 1e6)
  }

  test("q_event_pattern counts contiguous triples, matches a driver-side scan") {
    val out = PipelineQ.qEventPattern.run(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val seqs = Tables.load(spark, dir, "events")
      .select("user_id", "ts", "event_id", "event_type").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime, r.getLong(2), r.getString(3)))
      .groupBy(_._1)
      .map { case (u, rs) => u -> rs.sortBy(x => (x._2, x._3)).map(_._4).toSeq }
    val expected = seqs.flatMap { case (u, types) =>
      val n = types.sliding(3).count(_ == Seq("click", "view", "purchase"))
      if (n > 0) Some(u -> n.toLong) else None
    }
    // sliding(3) counts overlapping windows; contiguous triples of 3
    // distinct types can't overlap, so the counts coincide
    assert(out == expected)
  }

  test("q_skyline equals the brute-force Pareto frontier") {
    val got = PipelineQ.qSkyline.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDate(2).toLocalDate.toEpochDay)).toSet
    val pts = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderdate").cast("date")).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDate(2).toLocalDate.toEpochDay))
    val expected = pts.filter { case (_, p, d) =>
      !pts.exists { case (_, p2, d2) => p2 >= p && d2 <= d && (p2 > p || d2 < d) }
    }.toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q_kcenter_seed matches a driver-side greedy farthest-point run") {
    val out = PipelineQ.qKcenterSeed.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSeq == Seq(1, 2, 3))
    val vecs = Tables.load(spark, dir, "embeddings")
      .filter(col("vec_id") < 300).select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
      .sortBy(_._1)
    def sqd(a: Array[Double], b: Array[Double]) =
      a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + (x - y) * (x - y) }
    val (id1, e1) = vecs.head
    val d1 = vecs.filter(_._1 != id1).map { case (id, e) => (id, e, sqd(e, e1)) }
    val (id2, e2, sep2) = d1.maxBy { case (id, _, d) => (d, -id) }
    val d2 = d1.filter(_._1 != id2).map { case (id, e, d) => (id, math.min(d, sqd(e, e2))) }
    val (id3, sep3) = d2.maxBy { case (id, d) => (d, -id) }
    assert(out(0)._2 == id1)
    assert(out(1)._2 == id2 && out(1)._3 == math.round(sep2 * 1e4) / 1e4)
    assert(out(2)._2 == id3 && out(2)._3 == math.round(sep3 * 1e4) / 1e4)
    // separations shrink as the cover grows
    assert(out(2)._3 <= out(1)._3)
  }

  test("q_auc matches the brute-force Mann-Whitney pair count") {
    val r = PipelineQ.qAuc.run(spark, dir).collect()(0)
    val docsL = Tables.load(spark, dir, "documents")
      .select("n_chars", "lang").collect()
      .map(x => (x.getLong(0), x.getString(1) == "en"))
    val pos = docsL.filter(_._2).map(_._1); val neg = docsL.filterNot(_._2).map(_._1)
    val u = (for (p <- pos; n <- neg) yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    assert(r.getLong(0) == pos.length.toLong && r.getLong(1) == neg.length.toLong)
    assert(r.getDouble(2) == math.round(u * 1e6 / (pos.length.toLong * neg.length)) / 1e6)
  }

  test("q_vocab_overlap: jaccards in (0,1], symmetric-free pair list") {
    val rows = PipelineQ.qVocabOverlap.run(spark, dir).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      assert(r.getString(0) < r.getString(1))
      val j = r.getDouble(3)
      assert(j > 0.0 && j <= 1.0)
      assert(r.getLong(2) > 0)
    }
  }

  test("q_table_checksum matches a driver-side commutative hash sum") {
    val out = PipelineQ.qTableChecksum.run(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val rows = Tables.load(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_returnflag", "l_linestatus")
      .collect()
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = rows.groupBy(_.getString(4)).map { case (flag, rs) =>
      flag -> ((rs.length.toLong, rs.map(r =>
        h32(Seq(r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3),
          r.getString(4), r.getString(5)).mkString("|"))).sum))
    }
    assert(out == expected)
  }

  test("q_banded_range: equi hash join on buckets, matches the naive non-equi join") {
    val p = plan(PipelineQ.qBandedRange)
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    // semantics equal the direct non-equi broadcast join
    val got = PipelineQ.qBandedRange.run(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    val bands = Seq((0, 0.0, 10.0), (1, 10.0, 20.0), (2, 20.0, 30.0), (3, 30.0, 40.0), (4, 40.0, 55.0))
    val b = spark.createDataFrame(bands).toDF("band_id", "lo", "hi")
    val l = Tables.load(spark, dir, "lineitem")
    val naive = l.join(broadcast(b), l("l_quantity") >= b("lo") && l("l_quantity") < b("hi"))
      .groupBy(col("band_id"))
      .agg(count(lit(1)).as("n"), (round(sum(col("l_extendedprice")) * 100) / 100).as("rev"))
      .orderBy(col("band_id")).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSeq == naive.toSeq)
  }

  test("q_interp_linear: knots keep their own value, endpoints stay null, gaps blend") {
    val rows = PipelineQ.qInterpLinear.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq
    val events = Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("t"),
        col("event_type"), col("value"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getDouble(4)))
    val byUser = events.groupBy(_._1)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    var knots = 0; var nulls = 0; var blends = 0
    for ((uid, eid, got) <- rows.take(2000)) {
      val seq = byUser(uid).sortBy(e => (e._3, e._2))
      val idx = seq.indexWhere(_._2 == eid)
      val (_, _, t, typ, v) = seq(idx)
      val prev = seq.take(idx + 1).reverse.find(_._4 == "purchase")
      val next = seq.drop(idx).find(_._4 == "purchase")
      (prev, next) match {
        case (Some(p), Some(n)) if p._3 == n._3 =>
          assert(got.contains(r6(p._5)), s"knot/coincident at ($uid,$eid)")
          if (typ == "purchase") { assert(got.contains(r6(v))); knots += 1 }
        case (Some(p), Some(n)) =>
          val want = p._5 + (n._5 - p._5) * ((t - p._3) * 1.0 / (n._3 - p._3))
          assert(got.contains(r6(want)), s"blend at ($uid,$eid)")
          blends += 1
        case _ =>
          assert(got.isEmpty, s"no extrapolation at ($uid,$eid)")
          nulls += 1
      }
    }
    assert(knots > 0 && nulls > 0 && blends > 0, s"degenerate coverage: $knots/$nulls/$blends")
  }

  test("q_jaro_fuzzy equals a driver-side brute-force of the collapsed blocking") {
    // EXACTNESS of the name-collapse, not recall: rebuild the entire
    // expected output from the raw part rows — group by (brand, size,
    // name), score every cross-name pair in each block with the same
    // kernel, add per-name intra rows — and require set equality.
    // sf0.01 (not the suite's sf0.001): the smaller fixture's blocks
    // hold no ≥0.82 cross-name pair, which would make the test vacuous
    val jdir = "/root/testdata/sf0.01"
    import org.apache.spark.unsafe.types.UTF8String
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val rows = Tables.load(spark, jdir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_size"), col("p_name"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2), r.getString(3)))
    val groups = rows.groupBy(r => (r._2, r._3, r._4)).map { case (k, rs) =>
      k -> ((rs.map(_._1).min, rs.length.toLong))
    }
    val cross = for {
      Seq(((ba, sa, na), (ra, ma)), ((bb, sb, nb), (rb, mb))) <-
        groups.toSeq.combinations(2).map(_.sortBy(_._2._1))
      if ba == bb && sa == sb
      jw = r6(graft.functions.JaroWinklerImpl.compute(
        UTF8String.fromString(na), UTF8String.fromString(nb)))
      if jw >= 0.82
    } yield (ra, rb, jw, ma * mb)
    val expected = cross.toSet ++
      groups.values.collect { case (rep, n) if n >= 2 => (rep, rep, 1.0, n * (n - 1) / 2) }
    val got = PipelineQ.qJaroFuzzy.run(spark, jdir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.exists(p => p._1 != p._2), "degenerate: no cross-name pair at sf0.001")
  }

  test("q_copurchase basket plan matches a driver-side basket recomputation") {
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).map { case (o, rs) => o -> rs.map(_._2).distinct.toSeq }
    val nOrders = baskets.size.toDouble
    val freq = baskets.values.flatten.groupBy(identity).map { case (p, ps) => p -> ps.size.toLong }
    val nBoth = baskets.values.toSeq
      .flatMap(parts => for (a <- parts; b <- parts if a < b) yield (a, b))
      .groupBy(identity).map { case (k, ps) => k -> ps.size.toLong }
      .filter(_._2 >= 3)
    def r6(x: Double) = math.round(x * 1e6) / 1e6
    val expected = nBoth.map { case ((a, b), n) =>
      (a, b, n, r6(n * nOrders / (freq(a) * freq(b).toDouble)))
    }.toSet
    val got = PipelineQ.qCopurchase.run(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got == expected,
      s"missing=${(expected -- got).take(3)} extra=${(got -- expected).take(3)}")
    assert(expected.nonEmpty, "degenerate: no qualifying pair at sf0.001")
  }
}
