package graft

import graft.queries.Dedup
import org.apache.spark.sql.functions._
import scala.util.Random

/** Pins the 60-bit shingle-hash contract (`Dedup.gramHash`): the engine
  * and the DuckDB oracles spell the IDENTICAL md5-prefix hash, so a
  * collision — two distinct grams sharing the prefix — conflates the
  * same gram pair in BOTH engines and the gate stays exact. Real 60-bit
  * collisions cannot be forced (that would be an md5 prefix collision),
  * so the property is established in two halves:
  *
  *  1. spell equivalence at the production width: the engine's
  *     `gramHash(g, 15)` equals an independent JVM replay of the
  *     oracle's `('0x' || substr(md5(g), 1, 15))::BIGINT` for random
  *     strings — identical functions have identical collisions;
  *  2. collision behavior at a SHRUNK width (1 hex char = 16 buckets,
  *     collisions near-certain): the whole span-islands pipeline
  *     ([[Dedup.spanIslands]]) matches an independent Scala replay of
  *     the oracle's algorithm using the same shrunk spell, on random
  *     corpora where cross-gram collisions demonstrably occur — the
  *     conflation is bit-identical on both sides, not an engine quirk.
  */
class DedupCollisionSpec extends SparkSpec {
  import spark.implicits._

  /** JVM replay of the oracle's hash spell. */
  private def oracleHash(gram: String, hexChars: Int): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(gram.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(hexChars), 16)
  }

  /** Independent replay of the oracle's span-islands algorithm: corpus
    * 8-gram occurrences hashed with `hexChars`, every occurrence that is
    * not the corpus-wide first (min (doc_id, pos)) marks [i, i+7],
    * overlapping marks merged per doc. Returns doc -> merged intervals.
    */
  private def referenceIslands(
      corpus: Seq[(Long, Seq[String])], hexChars: Int): Map[Long, Seq[(Long, Long)]] = {
    val occ = for {
      (docId, toks) <- corpus if toks.length >= 8
      i <- 1 to (toks.length - 7)
    } yield (oracleHash(toks.slice(i - 1, i + 7).mkString(" "), hexChars), docId, i.toLong)
    val first = occ.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => (o._2, o._3)).min
    }
    val dups = occ.filter { case (g, d, i) => first(g) != ((d, i)) }
    dups.groupBy(_._2).map { case (doc, ds) =>
      val iv = ds.map(d => (d._3, d._3 + 7)).distinct.sorted
      val merged = iv.foldLeft(List.empty[(Long, Long)]) {
        case (acc, (s, e)) => acc match {
          case (ps, pe) :: rest if s <= pe => (ps, math.max(pe, e)) :: rest
          case _ => (s, e) :: acc
        }
      }
      doc -> merged.reverse
    }
  }

  private def engineIslands(
      corpus: Seq[(Long, Seq[String])], hexChars: Int): Map[Long, Seq[(Long, Long)]] = {
    val toks = corpus.toDF("doc_id", "t")
    Dedup.spanIslands(toks, hexChars)
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("s")).cast("long").as("s"), max(col("e")).cast("long").as("e"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(2), r.getLong(3))))
      .groupBy(_._1).map { case (d, rows) => d -> rows.map(_._2).toSeq.sorted }
  }

  test("gramHash(_, 15) is the oracle's 60-bit spell, bit for bit") {
    val rnd = new Random(13)
    val grams = (1 to 200).map(_ => (1 to 8).map(_ =>
      rnd.alphanumeric.take(1 + rnd.nextInt(8)).mkString).mkString(" ")) :+
      "" :+ "a" :+ ("z " * 7 + "z")
    val got = grams.toDF("g").select(Dedup.gramHash(col("g")).as("h"))
      .as[Long].collect().toSeq
    assert(got === grams.map(oracleHash(_, 15)))
  }

  test("span islands match the oracle replay under forced collisions (1-hex hash)") {
    val rnd = new Random(101)
    var sawCrossGramCollision = false
    for (trial <- 1 to 8) {
      val corpus = (1L to 10L).map { d =>
        val len = 8 + rnd.nextInt(33)
        d -> Seq.fill(len)(Seq("a", "b", "c")(rnd.nextInt(3)))
      }
      // record that the shrunk hash really conflates DISTINCT grams
      val grams = corpus.flatMap { case (_, t) =>
        (1 to t.length - 7).map(i => t.slice(i - 1, i + 7).mkString(" "))
      }.distinct
      if (grams.groupBy(oracleHash(_, 1)).values.exists(_.length > 1))
        sawCrossGramCollision = true
      assert(engineIslands(corpus, 1) === referenceIslands(corpus, 1),
        s"trial $trial diverged")
    }
    assert(sawCrossGramCollision,
      "fixture drifted: no cross-gram collision occurred, the property tested nothing")
  }

  test("a constructed collision conflates the same pair in engine and oracle replay") {
    // search two DISTINCT 8-grams with equal 1-hex-char prefix, put one
    // in each of two docs: the later doc's gram must be marked as a
    // corpus-wide duplicate by BOTH sides even though the strings differ
    val pool = Iterator.from(0).map(k => Seq.fill(8)(s"w$k"))
    val g1 = pool.next()
    val h1 = oracleHash(g1.mkString(" "), 1)
    val g2 = pool.find(g => g != g1 && oracleHash(g.mkString(" "), 1) == h1).get
    val corpus = Seq(1L -> g1, 2L -> g2)
    val expected = Map(2L -> Seq((1L, 8L))) // doc 2 fully marked, doc 1 clean
    assert(referenceIslands(corpus, 1) === expected)
    assert(engineIslands(corpus, 1) === expected)
  }
}
