package graft

import graft.queries.SkewQ
import org.apache.spark.sql.functions._

/** The skew gate's balance evidence, on DETERMINISTIC record counts
  * (task timing is noise on a loaded CI host; record routing is not).
  * The q_skew_* oracles prove the salted operators return the right
  * ANSWERS under a 20%-hot key; this spec proves they actually SPREAD
  * the hot key — the property that saves the stage at 100 TB.
  */
class SkewBalanceSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  test("the skew fixture concentrates ~20% of events on the hot user") {
    val ev = SkewQ.skewedEvents(spark, dir)
    val total = ev.count().toDouble
    val hot = ev.filter(col("user_id") === -42L).count().toDouble
    assert(hot / total > 0.15 && hot / total < 0.25,
      s"hot fraction ${hot / total} drifted from the ~20% design point")
  }

  test("unsalted grouping funnels the hot key into one reduce group") {
    import spark.implicits._
    val sizes = SkewQ.skewedEvents(spark, dir)
      .groupBy(col("user_id")).count()
      .select(col("count")).as[Long].collect().sorted
    val median = sizes(sizes.length / 2)
    assert(sizes.last >= 20 * median,
      s"fixture too mild: hot group ${sizes.last} vs median $median — " +
        "the salted path would be indistinguishable from the plain one")
  }

  test("salting splits the hot key across all buckets within 2x of even") {
    import spark.implicits._
    // the same salt expression Skew.saltedAgg uses
    val hotGroups = SkewQ.skewedEvents(spark, dir)
      .filter(col("user_id") === -42L)
      .withColumn("__salt", (rand(seed = 42) * 32).cast("int"))
      .groupBy(col("__salt")).count()
      .select(col("count")).as[Long].collect()
    val hotTotal = hotGroups.sum
    assert(hotGroups.length === 32, s"only ${hotGroups.length}/32 salt buckets hit")
    val even = hotTotal.toDouble / 32
    assert(hotGroups.max <= 2 * even,
      s"worst salted sub-group ${hotGroups.max} exceeds 2x the even share $even")
  }

  test("content salt routes identically regardless of input partitioning") {
    import spark.implicits._
    // rand(seed)-salt is per-partition-deterministic, so repartitioning the
    // input reshuffles the routing; contentSalt hashes the row's own bytes
    // and must assign every event_id the same bucket under any split.
    def routing(parts: Int): Map[Long, Int] =
      SkewQ.skewedEvents(spark, dir)
        .repartition(parts)
        .withColumn("__salt", graft.operators.Skew.contentSalt(32, col("event_id")))
        .select(col("event_id").as[Long], col("__salt").as[Int])
        .collect().toMap
    val a = routing(7)
    val b = routing(13)
    assert(a === b, "content-derived salt changed under repartitioning")
    // and it still spreads the hot user across all 32 buckets within 2x even
    val hotGroups = SkewQ.skewedEvents(spark, dir)
      .filter(col("user_id") === -42L)
      .withColumn("__salt", graft.operators.Skew.contentSalt(32, col("event_id")))
      .groupBy(col("__salt")).count()
      .select(col("count")).as[Long].collect()
    assert(hotGroups.length === 32, s"only ${hotGroups.length}/32 salt buckets hit")
    assert(hotGroups.max <= 2.0 * hotGroups.sum / 32)
  }

  test("hot-only salted join bounds build replication to the hot keys") {
    import spark.implicits._
    val li = SkewQ.skewedLineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
    val build = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    val hot = graft.operators.Skew.hotKeys(li, Seq("p_partkey"), minShare = 0.05)
    val hotRows = hot.collect().map(_.getLong(0))
    assert(hotRows.toSeq === Seq(1L), "the 20% fixture should detect exactly the hot part")
    // result equals the plain inner join row-for-row
    val joined = graft.operators.Skew.saltedJoinSkewOnly(
      li, build, Seq("p_partkey"), saltBuckets = 16, hotKeys = hot)
    assert(joined.count() === li.join(build, Seq("p_partkey")).count())
    // the hot key's probe rows spread over all 16 buckets within 2x even —
    // same salt expression the operator uses (seed 44)
    val hotPerSalt = li.filter(col("p_partkey") === 1L)
      .withColumn("__salt", (rand(seed = 44) * 16).cast("int"))
      .groupBy(col("__salt")).count()
      .select(col("count")).as[Long].collect()
    assert(hotPerSalt.length === 16)
    assert(hotPerSalt.max <= 2.0 * hotPerSalt.sum / 16)
  }

  test("hot-only salted join degenerates to the plain join when nothing is hot") {
    val li = SkewQ.skewedLineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
    val build = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    // minShare above the hot key's ~20% share -> empty hot set -> every row
    // salts 0, build replicates x1, result identical to the plain join
    val hot = graft.operators.Skew.hotKeys(li, Seq("p_partkey"), minShare = 0.5)
    assert(hot.count() === 0)
    val joined = graft.operators.Skew.saltedJoinSkewOnly(
      li, build, Seq("p_partkey"), saltBuckets = 16, hotKeys = hot)
    assert(joined.count() === li.join(build, Seq("p_partkey")).count())
  }

  test("AQE ON: hot-only salted join keeps the answer exact and the hot key spread") {
    val conf = spark.conf
    val keys = Seq(
      "spark.sql.adaptive.enabled", "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes", "spark.sql.shuffle.partitions",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize")
    val prev = keys.map(k => k -> conf.getOption(k)).toMap
    // AQE + coalescing ACTIVE. The byte knobs are DERIVED from the
    // fixture's measured shuffle volume (not pinned) so a schema or
    // encoding change moves them with the data instead of silently
    // flipping which partitions coalesce: a hot salted sub-group is
    // s·T/saltBuckets bytes, and advisory = 2× that — big enough that
    // coalescing is genuinely active on the salted stage (adjacent
    // sub-advisory partitions merge in ~pairs), small enough that the
    // 16 hot sub-groups cannot collapse below the asserted 4 distinct
    // reducers (that would need advisory ≥ 4× a sub-group).
    val saltBuckets = 16
    val shufflePartitions = 32
    val (hotShare, shuffleBytes) = {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      @volatile var maxStage = 0L
      val sl = new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val b = e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
          if (b > maxStage) maxStage = b
        }
      }
      spark.sparkContext.addSparkListener(sl)
      try {
        val li = SkewQ.skewedLineitem(spark, dir)
          .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
        val build = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
        val hot = graft.operators.Skew.hotKeys(li, Seq("p_partkey"), minShare = 0.05)
        graft.operators.Skew.saltedJoinSkewOnly(
          li, build, Seq("p_partkey"), saltBuckets = saltBuckets, hotKeys = hot).count()
        val s = li.filter(col("p_partkey") === 1L).count().toDouble / li.count()
        val deadline = System.currentTimeMillis() + 30000
        while (maxStage == 0L && System.currentTimeMillis() < deadline) Thread.sleep(50)
        (s, maxStage)
      } finally spark.sparkContext.removeSparkListener(sl)
    }
    val hotSub = hotShare * shuffleBytes / saltBuckets
    assert(shuffleBytes > 0, "measured no shuffle — the calibration join stopped shuffling")
    assert(hotSub >= 1024,
      s"fixture drifted: a hot salted sub-group is only $hotSub B — too small " +
        "to stage a meaningful coalescing regime")
    val advisory = (2 * hotSub).toLong
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", advisory.toString)
    // the 1MB default floor would swallow this whole sf0.01 stage into
    // one partition regardless of salt — scale it with the advisory
    conf.set("spark.sql.adaptive.coalescePartitions.minPartitionSize",
      math.max(256L, advisory / 4).toString)
    // the sf0.01 part dim auto-broadcasts, which would skip the probe
    // shuffle this test measures — the production regime is a build side
    // too big to broadcast (saltedJoinSkewOnly's stated use case)
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = SkewQ.skewedLineitem(spark, dir)
        .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
      val build = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
      val hot = graft.operators.Skew.hotKeys(li, Seq("p_partkey"), minShare = 0.05)
      val joined = graft.operators.Skew.saltedJoinSkewOnly(
        li, build, Seq("p_partkey"), saltBuckets = 16, hotKeys = hot)
      // answer identity survives AQE's re-planning
      assert(joined.count() === li.join(build, Seq("p_partkey")).count())
      // the unsalted join puts EVERY hot row in one reduce partition; the
      // salted join's spread must survive AQE's partition coalescing.
      // pid is projected BEFORE the hot-key filter: spark_partition_id is
      // nondeterministic, so Catalyst cannot push the filter below it —
      // filtering first would shrink the join stage and AQE would
      // (correctly) coalesce the small remnant, measuring nothing
      def hotPids(df: org.apache.spark.sql.DataFrame): Long = df
        .withColumn("pid", org.apache.spark.sql.functions.spark_partition_id())
        .filter(col("p_partkey") === 1L)
        .select(col("pid")).distinct().count()
      val plainPids = hotPids(li.join(build, Seq("p_partkey")))
      val saltedPids = hotPids(joined)
      assert(plainPids === 1L, s"fixture drifted: plain join spread hot key over $plainPids")
      assert(saltedPids >= 4L,
        s"AQE coalescing collapsed the salted hot key to $saltedPids partitions")
    } finally prev.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("hot-key detection reuses the counts exchange — one aggregation, not two scans") {
    val li = SkewQ.skewedLineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
    val hot = graft.operators.Skew.hotKeys(li, Seq("p_partkey"), minShare = 0.05)
    // static planning so ReuseExchange is visible in the plan string (AQE
    // performs the same reuse at stage-materialization time)
    val conf = spark.conf
    val prevAqe = conf.getOption("spark.sql.adaptive.enabled")
    conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val p = graft.operators.Skew.hotKeys(li, Seq("p_partkey"), minShare = 0.05)
        .queryExecution.executedPlan.toString
      assert(p.contains("ReusedExchange"),
        s"total-side should reuse the counts exchange, not rescan:\n$p")
    } finally prevAqe.fold(conf.unset("spark.sql.adaptive.enabled"))(
      conf.set("spark.sql.adaptive.enabled", _))
  }

  test("salted join replicates the build row per bucket, probe spread holds") {
    import spark.implicits._
    val li = SkewQ.skewedLineitem(spark, dir)
      .select(col("l_partkey").as("p_partkey"), col("l_extendedprice"))
    val build = Tables.load(spark, dir, "part").select(col("p_partkey"), col("p_brand"))
    val joined = graft.operators.Skew.saltedJoin(li, build, Seq("p_partkey"), saltBuckets = 16)
    // row-for-row equal to the plain inner join…
    assert(joined.count() === li.join(build, Seq("p_partkey")).count())
    // …and the hot part's probe rows divide across the 16 salted sub-keys
    val hotPerSalt = li.filter(col("p_partkey") === 1L)
      .withColumn("__salt", (rand(seed = 43) * 16).cast("int"))
      .groupBy(col("__salt")).count()
      .select(col("count")).as[Long].collect()
    assert(hotPerSalt.length === 16)
    assert(hotPerSalt.max <= 2.0 * hotPerSalt.sum / 16)
  }
}
