package graft

import graft.nshm._
import org.apache.spark.sql.functions.col

/** Bucketed/partitioned catalog layout: the fault_id joins must be
  * co-located (no Exchange on the bucketed inputs).
  */
class CatalogSpec extends SparkSpec {
  import spark.implicits._

  private def seeded(): NshmStore = {
    val store = new InMemoryNshmStore(spark)
    store.append("parent_fault", Seq((1L, "Alpine Fault")).toDF("parent_id", "name"))
    store.append(
      "fault",
      Seq((1L, 3, 1L, 90.0, Option.empty[Int], 1L))
        .toDF("fault_id", "fault_system", "nshm_id", "rake", "tect_type", "parent_id"))
    store.append(
      "fault_plane",
      Seq((1L, -42.0, 172.0, -42.0, 173.0, -43.0, 173.0, -43.0, 172.0, 0.0, 10.0, 1L))
        .toDF("plane_id", "top_left_lat", "top_left_lon", "top_right_lat", "top_right_lon",
          "bottom_right_lat", "bottom_right_lon", "bottom_left_lat", "bottom_left_lon",
          "top_depth", "bottom_depth", "fault_id"))
    store.append(
      "rupture",
      Seq((1L, 3, 1L, 100.0, 6.5, 10.0, 0.01))
        .toDF("rupture_id", "fault_system", "nshm_id", "area", "magnitude", "len", "rate"))
    store.append(
      "rupture_faults",
      Seq((1L, 1L, 1L)).toDF("rupture_fault_id", "rupture_id", "fault_id"))
    store.append(
      "magnitude_frequency_distribution",
      Seq((1L, 1L, 6.5, 0.01)).toDF("entry_id", "fault_id", "magnitude", "rate"))
    store
  }

  test("save + open round-trips all six tables with the scale layout") {
    Catalog.save(seeded(), buckets = 4, prefix = "t1_")
    val store = Catalog.open(spark, "t1_")
    Schemas.all.keys.foreach { n => assert(store.table(n).count() === 1L, n) }
    // facade works unchanged over the catalog store
    val db = new NshmDb(store)
    assert(db.query("Alpine Fault").keySet === Set(1L))
  }

  test("MERGE upsert: matched rows update, unmatched insert, re-run is idempotent") {
    val dir = s"/tmp/mergestore_${System.nanoTime()}"
    val store = new ParquetNshmStore(spark, dir)
    store.create()
    store.append(
      "rupture",
      Seq((1L, 3, 10L, 100.0, 6.5, 10.0, 0.01), (2L, 3, 11L, 200.0, 7.0, 20.0, 0.02))
        .toDF("rupture_id", "fault_system", "nshm_id", "area", "magnitude", "len", "rate"))

    // batch updates nshm_id=10 (new rate) and inserts nshm_id=12
    val batch = Seq((1L, 3, 10L, 100.0, 6.5, 10.0, 0.05), (3L, 3, 12L, 300.0, 7.5, 30.0, 0.03))
      .toDF("rupture_id", "fault_system", "nshm_id", "area", "magnitude", "len", "rate")
    def contents() = store.table("rupture")
      .select("nshm_id", "rate").collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap

    store.merge("rupture", batch, Seq("fault_system", "nshm_id"))
    assert(contents() === Map(10L -> 0.05, 11L -> 0.02, 12L -> 0.03))

    // concurrent-ish double-insert: replaying the identical batch changes nothing
    store.merge("rupture", batch, Seq("fault_system", "nshm_id"))
    assert(contents() === Map(10L -> 0.05, 11L -> 0.02, 12L -> 0.03))
    assert(store.table("rupture").count() === 3L)

    // same semantics on the in-memory store
    val mem = new InMemoryNshmStore(spark)
    mem.append("parent_fault", Seq((1L, "Alpine Fault")).toDF("parent_id", "name"))
    mem.merge("parent_fault",
      Seq((1L, "Alpine Fault"), (2L, "Kakapo")).toDF("parent_id", "name"), Seq("name"))
    mem.merge("parent_fault",
      Seq((1L, "Alpine Fault"), (2L, "Kakapo")).toDF("parent_id", "name"), Seq("name"))
    assert(mem.table("parent_fault").count() === 2L)
  }

  test("bucketed fault_id join is co-located: no Exchange on bucketed inputs") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ path
    try {
      Catalog.save(seeded(), buckets = 4, prefix = "t2_")
      val store = Catalog.open(spark, "t2_")
      val joined = store.table("fault_plane")
        .join(store.table("rupture_faults"), "fault_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), s"unexpected shuffle:\n$plan")
      assert(joined.count() === 1L)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
