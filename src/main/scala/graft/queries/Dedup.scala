package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.operators.Checkpoints.pinSer
import graft.text.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication extension pack over `documents`: exact (content hash),
  * MinHash signatures + LSH banding, SimHash, and n-gram Jaccard
  * near-dup pairs — every stage cross-checked against DuckDB via the
  * md5-derived portable hash.
  *
  * Scale shape: shingling/hashing is embarrassingly parallel; MinHash
  * reduces each doc to k longs (tiny shuffle); LSH banding turns
  * all-pairs similarity into an equi-join on short bucket keys. Only the
  * explicit Jaccard query is quadratic, and it is bounded to a candidate
  * subset — at 100 TB that role is played by the LSH candidates.
  */
object Dedup extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadDistributed(s, dir, "documents", "doc_id")

  private val P = MinhashPrime

  /** Exact dedup via full-content hash, per source. */
  val qDedupExact: Q = Q(
    "q_dedup_exact",
    Some("""SELECT source, count(*) AS n_docs,
            count(DISTINCT md5(text)) AS n_unique,
            count(*) - count(DISTINCT md5(text)) AS n_dups
            FROM documents GROUP BY source ORDER BY source"""),
    (s, dir) =>
      docs(s, dir)
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          countDistinct(md5(col("text"))).as("n_unique"),
          (count(lit(1)) - countDistinct(md5(col("text")))).as("n_dups"))
        .orderBy(col("source")))

  /** MinHash signatures: k=4 universal hashes over distinct 3-gram
    * shingle hashes.
    */
  val qMinhashSig: Q = Q(
    "q_minhash_sig", {
      val sigs = MinhashParams.zipWithIndex
        .map { case ((a, b), j) => s"min((h * $a + $b) % $P) AS sig$j" }
        .mkString(", ")
      Some(s"""WITH sh AS (
                 SELECT doc_id, unnest(list_distinct(
                   [substring(text, i, 3) FOR i IN range(1, length(text) - 1)])) AS s
                 FROM documents WHERE length(text) >= 3),
               h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh)
               SELECT doc_id, $sigs FROM h GROUP BY doc_id ORDER BY doc_id""")
    },
    (s, dir) =>
      // native one-pass kernel — the oracle replays the exploded
      // pipeline and must still hash-match (parity is the kernel's
      // contract, see MinhashSigsImpl). loadDistributed's spread
      // repartition stays: the kernel is md5-bound per row, and the
      // testdata parquet is a single row group (scan parallelism 1) —
      // one cheap text shuffle buys full-core kernel compute. On a
      // many-split corpus the scan itself provides the parallelism and
      // the spread collapses to a no-op alignment.
      docs(s, dir)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"),
          graft.functions.MinhashFunctions.minhashSigsNative(col("text")).as("sigs"))
        .select(col("doc_id"),
          col("sigs").getItem(0).as("sig0"), col("sigs").getItem(1).as("sig1"),
          col("sigs").getItem(2).as("sig2"), col("sigs").getItem(3).as("sig3"))
        .orderBy(col("doc_id")))

  /** LSH banding over the MinHash signatures: 2 bands × 2 rows; buckets
    * holding >1 doc are the near-dup candidate sets.
    */
  val qLshBuckets: Q = Q(
    "q_lsh_buckets", {
      val sigs = MinhashParams.zipWithIndex
        .map { case ((a, b), j) => s"min((h * $a + $b) % $P) AS sig$j" }
        .mkString(", ")
      Some(s"""WITH sh AS (
                 SELECT doc_id, unnest(list_distinct(
                   [substring(text, i, 3) FOR i IN range(1, length(text) - 1)])) AS s
                 FROM documents WHERE length(text) >= 3),
               h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
               sig AS (SELECT doc_id, $sigs FROM h GROUP BY doc_id),
               bands AS (
                 SELECT 0 AS band, concat_ws('_', sig0, sig1) AS bucket FROM sig
                 UNION ALL
                 SELECT 1 AS band, concat_ws('_', sig2, sig3) AS bucket FROM sig)
               SELECT band, bucket, count(*) AS n_docs
               FROM bands GROUP BY band, bucket HAVING count(*) > 1
               ORDER BY band, bucket""")
    },
    (s, dir) => {
      val sig = docs(s, dir)
        .filter(length(col("text")) >= 3)
        .select(col("doc_id"),
          graft.functions.MinhashFunctions.minhashSigsNative(col("text")).as("sigs"))
      // single pass over the signatures: explode to (band, bucket) rather
      // than a union that would recompute the signature subtree per band
      val bands = sig
        .select(explode(array(
          struct(lit(0).as("band"),
            concat_ws("_", col("sigs").getItem(0), col("sigs").getItem(1)).as("bucket")),
          struct(lit(1).as("band"),
            concat_ws("_", col("sigs").getItem(2), col("sigs").getItem(3)).as("bucket")))).as("b"))
        .select(col("b.band").as("band"), col("b.bucket").as("bucket"))
      bands
        .groupBy(col("band"), col("bucket"))
        .agg(count(lit(1)).as("n_docs"))
        .filter(col("n_docs") > 1)
        .orderBy(col("band"), col("bucket"))
    })

  /** 16-bit SimHash per document over token hashes. */
  val qSimhash: Q = Q(
    "q_simhash", {
      val bitSums = (0 until 16)
        .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS __bit$b")
        .mkString(", ")
      val combine = (0 until 16)
        .map(b => s"CASE WHEN __bit$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      Some(s"""WITH toks AS (
                 SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
                 FROM documents),
               h AS (SELECT doc_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM toks),
               bits AS (SELECT doc_id, $bitSums FROM h GROUP BY doc_id)
               SELECT doc_id, $combine AS simhash FROM bits ORDER BY doc_id""")
    },
    (s, dir) =>
      // native one-pass kernel (projection, no token explode/shuffle);
      // the oracle replays the exploded pipeline and must hash-match.
      // Spread repartition kept for the same reason as q_minhash_sig.
      docs(s, dir)
        .select(col("doc_id"),
          graft.functions.MinhashFunctions.simhash16Native(col("text")).as("simhash"))
        .filter(col("simhash").isNotNull)
        .orderBy(col("doc_id")))

  /** Dedup CASCADE: exact content collapse FIRST, then SimHash banded
    * near-dup on the (far smaller) representative set, multiplicities
    * carried through so each near-pair reports the underlying duplicate
    * mass it stands for.
    *
    * This ordering is the load-bearing scale property, demonstrated by
    * this round's sf10 run: direct banding over a corpus where every
    * document has K verbatim copies is quadratic in K (all K copies of a
    * doc share every band bucket — at K=100 the candidate self-join
    * spilled past local disk, the sf10 board's only engine DNF), while
    * the cascade's banding runs on content-unique reps (500k → 5k at
    * sf10) and K only ever appears as a per-rep integer weight. A
    * production pipeline always runs the cascade, never direct banding.
    */
  val qDedupCascade: Q = Q(
    "q_dedup_cascade", {
      val bitSums = (0 until 16)
        .map(b => s"sum(CASE WHEN (h >> $b) & 1 = 1 THEN 1 ELSE -1 END) AS __bit$b")
        .mkString(", ")
      val combine = (0 until 16)
        .map(b => s"CASE WHEN __bit$b > 0 THEN ${1L << b} ELSE 0 END")
        .mkString(" + ")
      Some(s"""WITH reps AS MATERIALIZED (
                 SELECT text, min(doc_id) AS rep_id, count(*) AS mult
                 FROM documents GROUP BY text),
               toks AS (SELECT rep_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
                        FROM reps),
               h AS (SELECT rep_id, ('0x' || substr(md5(w), 1, 8))::BIGINT AS h FROM toks),
               bits AS (SELECT rep_id, $bitSums FROM h GROUP BY rep_id),
               sh AS MATERIALIZED (SELECT rep_id, $combine AS simhash FROM bits),
               bands AS MATERIALIZED (
                 SELECT rep_id, simhash, 0 AS band, simhash & 255 AS v FROM sh
                 UNION ALL
                 SELECT rep_id, simhash, 1 AS band, (simhash >> 8) & 255 AS v FROM sh),
               cand AS MATERIALIZED (
                 SELECT DISTINCT a.rep_id AS ra, b.rep_id AS rb,
                        a.simhash AS sa, b.simhash AS sb
                 FROM bands a JOIN bands b
                   ON a.band = b.band AND a.v = b.v AND a.rep_id < b.rep_id),
               near AS MATERIALIZED (
                 SELECT ra, rb FROM cand WHERE bit_count(xor(sa, sb)) <= 3),
               mass AS (
                 SELECT CAST(count(*) AS BIGINT) AS n_near_pairs,
                        CAST(coalesce(sum(m1.mult * m2.mult), 0) AS BIGINT) AS near_pair_mass
                 FROM near
                 JOIN reps m1 ON m1.rep_id = near.ra
                 JOIN reps m2 ON m2.rep_id = near.rb)
               SELECT (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n_docs,
                      (SELECT CAST(count(*) AS BIGINT) FROM reps) AS n_reps,
                      (SELECT CAST(count(*) AS BIGINT) FROM documents)
                        - (SELECT CAST(count(*) AS BIGINT) FROM reps) AS n_exact_dups,
                      n_near_pairs, near_pair_mass
               FROM mass""")
    },
    (s, dir) => {
      // exact collapse: one hash shuffle on content; reps is rep-count
      // sized (content-unique), so the checkpoint that lets four branches
      // reuse it is tiny at any SF
      val reps = docs(s, dir)
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("rep_id"), count(lit(1)).as("mult"))
        .transform(pinSer)
      val sh = reps
        .select(col("rep_id"), col("mult"),
          graft.functions.MinhashFunctions.simhash16Native(col("text")).as("simhash"))
        .filter(col("simhash").isNotNull)
      val bands = sh.select(
          col("rep_id"), col("simhash"),
          explode(array(
            struct(lit(0).as("band"), col("simhash").bitwiseAND(lit(255L)).as("v")),
            struct(lit(1).as("band"),
              shiftright(col("simhash"), 8).bitwiseAND(lit(255L)).as("v")))).as("bv"))
        .select(col("rep_id"), col("simhash"),
          col("bv.band").as("band"), col("bv.v").as("v"))
      val a = bands.select(
        col("band"), col("v"), col("rep_id").as("ra"), col("simhash").as("sa"))
      val b = bands.select(
        col("band").as("band_b"), col("v").as("v_b"),
        col("rep_id").as("rb"), col("simhash").as("sb"))
      val near = a
        .join(b, col("band") === col("band_b") && col("v") === col("v_b") &&
          col("ra") < col("rb"))
        .select(col("ra"), col("rb"), col("sa"), col("sb"))
        .distinct()
        .filter(bit_count(col("sa").bitwiseXOR(col("sb"))) <= 3)
        .select(col("ra"), col("rb"))
      val m = reps.select(col("rep_id"), col("mult"))
      val mass = near
        .join(m.select(col("rep_id").as("ra"), col("mult").as("ma")), Seq("ra"))
        .join(m.select(col("rep_id").as("rb"), col("mult").as("mb")), Seq("rb"))
        .agg(
          count(lit(1)).cast("long").as("n_near_pairs"),
          coalesce(sum(col("ma") * col("mb")), lit(0L)).cast("long").as("near_pair_mass"))
      val totals = docs(s, dir).agg(count(lit(1)).as("n_docs"))
      val nReps = reps.agg(count(lit(1)).as("n_reps"))
      totals.crossJoin(nReps).crossJoin(mass) // three 1-row frames
        .select(
          col("n_docs").cast("long").as("n_docs"),
          col("n_reps").cast("long").as("n_reps"),
          (col("n_docs") - col("n_reps")).cast("long").as("n_exact_dups"),
          col("n_near_pairs"), col("near_pair_mass"))
    })

  /** Exact n-gram Jaccard near-dup pairs over a bounded candidate subset
    * (doc_id < 100): shingle-explode, self-join on shingle, intersection
    * counts vs set sizes.
    */
  val qNgramJaccard: Q = Q(
    "q_ngram_jaccard",
    Some("""WITH sh AS (
              SELECT doc_id, unnest(list_distinct(
                [substring(text, i, 3) FOR i IN range(1, length(text) - 1)])) AS s
              FROM documents WHERE doc_id < 100 AND length(text) >= 3),
            sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS c
              FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id)
            SELECT doc_a, doc_b, round(c * 1.0 / (sa.n + sb.n - c), 4) AS jaccard
            FROM inter
            JOIN sz sa ON sa.doc_id = doc_a
            JOIN sz sb ON sb.doc_id = doc_b
            WHERE c * 1.0 / (sa.n + sb.n - c) >= 0.5
            ORDER BY doc_a, doc_b"""),
    (s, dir) => {
      val sh = docs(s, dir)
        .filter(col("doc_id") < 100 && length(col("text")) >= 3)
        .select(col("doc_id"), explode(shingles(col("text"), 3)).as("s"))
      val sz = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.as("a"); val b = sh.as("b")
      val inter = a
        .join(b, col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("c"))
      inter
        .join(broadcast(sz.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n", "na")), Seq("doc_a"))
        .join(broadcast(sz.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n", "nb")), Seq("doc_b"))
        .withColumn("jaccard_raw", col("c") * lit(1.0) / (col("na") + col("nb") - col("c")))
        .filter(col("jaccard_raw") >= 0.5)
        .select(col("doc_a"), col("doc_b"), round(col("jaccard_raw"), 4).as("jaccard"))
        .orderBy(col("doc_a"), col("doc_b"))
    })

  /** Embedding-cosine near-dup pairs over a bounded candidate set
    * (vec_id < 500): the vector-space complement of the text dedup
    * family, scored with the native dot-product expression.
    */
  val qCosineDedup: Q = Q(
    "q_cosine_dedup", {
      def sq(c: String) =
        s"list_sum([CAST(list_extract($c, i) AS DOUBLE) * CAST(list_extract($c, i) AS DOUBLE) FOR i IN range(1, len($c) + 1)])"
      val dot =
        "list_sum([CAST(list_extract(a.embedding, i) AS DOUBLE) * CAST(list_extract(b.embedding, i) AS DOUBLE) FOR i IN range(1, len(a.embedding) + 1)])"
      Some(s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 500)
               SELECT vec_a, vec_b, cos FROM (
                 SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                        round($dot / (sqrt(${sq("a.embedding")}) * sqrt(${sq("b.embedding")})), 4) AS cos
                 FROM e a JOIN e b ON a.vec_id < b.vec_id)
               WHERE cos >= 0.35
               ORDER BY vec_a, vec_b""")
    },
    (s, dir) => {
      val e = Tables.loadDistributed(s, dir, "embeddings", "vec_id")
        .filter(col("vec_id") < 500)
        .select(col("vec_id"), col("embedding"))
      val b = e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b"))
      e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a"))
        .join(b, col("vec_a") < col("vec_b"))
        .withColumn(
          "cos",
          round(graft.functions.VectorFunctions.vecCosine(col("emb_a"), col("emb_b")), 4))
        .filter(col("cos") >= 0.35)
        .select(col("vec_a"), col("vec_b"), col("cos"))
        .orderBy(col("vec_a"), col("vec_b"))
    })

  /** Near-dup clustering: connected components over the LSH doc↔bucket
    * bipartite graph via min-label propagation WITH pointer jumping —
    * each round (a) pulls the min label through buckets (one hop) and
    * (b) path-compresses (label := label's label), so reachable distance
    * grows exponentially and 4 fixed rounds cover any component diameter
    * up to ~2^4 (empirically, 3 rounds already reach fixpoint at both
    * gate SFs — LSH components are shallow — so 4 carries one safety
    * round). Both engines run the identical 4 rounds (the oracle
    * unrolls them as a CTE chain), so gate equality holds by
    * construction; DedupClusterSpec asserts round 4 is a semantic
    * fixpoint. Each round is two key-partitioned aggregations and a
    * self-join — no pairwise candidate explosion, no driver-side graph.
    */
  val qLshClusters: Q = Q(
    "q_lsh_clusters", {
      val sigs = MinhashParams.zipWithIndex
        .map { case ((a, b), j) => s"min((h * $a + $b) % $P) AS sig$j" }
        .mkString(", ")
      // AS MATERIALIZED everywhere a CTE is referenced more than once:
      // DuckDB inlines CTEs by default, which replicates the whole
      // upstream subtree (and its parquet scans) exponentially across
      // the 4 rounds
      val rounds = (1 to 4).map { i =>
        s"""b$i AS MATERIALIZED (SELECT m.bkey, min(d${i - 1}.lbl) AS blbl
                    FROM m JOIN d${i - 1} USING (doc_id) GROUP BY m.bkey),
            h$i AS MATERIALIZED (SELECT d.doc_id, least(d.lbl, coalesce(min(b$i.blbl), d.lbl)) AS lbl
                    FROM d${i - 1} d
                    LEFT JOIN m USING (doc_id)
                    LEFT JOIN b$i USING (bkey)
                    GROUP BY d.doc_id, d.lbl),
            d$i AS MATERIALIZED (SELECT c.doc_id, p.lbl AS lbl
                    FROM h$i c JOIN h$i p ON c.lbl = p.doc_id)"""
      }.mkString(",\n")
      Some(s"""WITH sh AS (
                 SELECT doc_id, unnest(list_distinct(
                   [substring(text, i, 3) FOR i IN range(1, length(text) - 1)])) AS s
                 FROM documents WHERE length(text) >= 3),
               h AS (SELECT doc_id, ('0x' || substr(md5(s), 1, 8))::BIGINT AS h FROM sh),
               sig AS (SELECT doc_id, $sigs FROM h GROUP BY doc_id),
               m AS MATERIALIZED (
                 SELECT doc_id, concat_ws('_', '0', sig0, sig1) AS bkey FROM sig
                 UNION ALL
                 SELECT doc_id, concat_ws('_', '1', sig2, sig3) AS bkey FROM sig),
               d0 AS MATERIALIZED (SELECT doc_id, doc_id AS lbl FROM documents),
               $rounds,
               sizes AS (SELECT lbl, count(*) AS cluster_size FROM d4 GROUP BY lbl)
               SELECT d.doc_id, d.lbl AS cluster_id, s.cluster_size
               FROM d4 d JOIN sizes s USING (lbl)
               WHERE s.cluster_size > 1
               ORDER BY cluster_id, doc_id""")
    },
    // converge-checked: the 4-round oracle is a fixpoint at the gate
    // SFs (DedupClusterSpec asserts it), so stopping at changed == 0
    // lands on the identical labels — but a 100× corpus with a longer
    // similarity chain keeps iterating instead of silently mislabeling
    (s, dir) => clusterRun(s, dir, maxRounds = 16))

  /** The Spark side of [[qLshClusters]]: builds the doc↔bucket
    * membership and runs [[propagateLabels]]. `exactRounds` pins the
    * round count for the spec's fixpoint assertions (rounds vs
    * rounds+1); the default converges.
    */
  /** (doc_id, bkey) banded-minhash membership — 2 bands × 2 rows over
    * the k=4 signatures. Shared by the clustering rounds and the
    * persisted index: the bucket scheme IS the index format.
    *
    * Signatures come from the native one-pass
    * [[graft.functions.MinhashSigs]] kernel: a map-side PROJECTION,
    * where the composable pipeline (explode 3-grams → md5 → groupBy
    * min×k) materialized corpus × shingle rows and spent a whole
    * shuffle to take four minimums. Bit-identical output (the oracles
    * replaying the exploded pipeline still hash-match).
    */
  def lshMembership(d: DataFrame): DataFrame =
    d.filter(length(col("text")) >= 3)
      .select(col("doc_id"),
        graft.functions.MinhashFunctions.minhashSigsNative(col("text")).as("sigs"))
      .select(col("doc_id"), explode(array(
        concat_ws("_", lit("0"), col("sigs").getItem(0), col("sigs").getItem(1)),
        concat_ws("_", lit("1"), col("sigs").getItem(2), col("sigs").getItem(3)))).as("bkey"))

  /** Persist the LSH near-dup index: the corpus's banded-minhash
    * memberships as a (doc_id, bkey) table. Build once at ingest;
    * every incoming batch then near-dup-checks itself with ONE
    * equi-join on short bucket keys ([[probeLshIndex]]) instead of
    * re-shingling the corpus — the text analogue of the persisted IVF
    * index's build-once/probe-many contract.
    */
  def writeLshIndex(corpus: DataFrame, path: String): Unit =
    lshMembership(corpus).write.mode("overwrite").parquet(path)

  /** Incremental index maintenance — the probe-then-MERGE half of the
    * production dedup cycle: after a batch has been near-dup-checked
    * ([[probeLshIndex]]), append its banded-minhash memberships so
    * tomorrow's batch dedups against today's. Append-only parquet: no
    * rewrite of the existing index files, so the merge cost is the
    * batch's own signature scan regardless of index size.
    */
  def appendToLshIndex(newBatch: DataFrame, path: String): Unit =
    lshMembership(newBatch).write.mode("append").parquet(path)

  /** Near-dup-check `newBatch` (doc_id, text) against a persisted
    * index: bucket equi-join for candidates, then EXACT 3-gram Jaccard
    * verification bounded to the candidate pairs — candidate texts are
    * fetched from `corpusTexts` by selective semi-join (the index
    * prunes, the lake verifies; signatures alone can't score k=4
    * Jaccard exactly). Returns one row per matched new doc:
    * (doc_id, dup_of = best match, jaccard, n_matches), best = highest
    * Jaccard with ties to the lowest corpus id.
    *
    * STOP-BUCKET cap: buckets holding more than `maxBucket` corpus
    * docs are skipped during candidate generation — a degenerate
    * bucket (boilerplate/template cluster) carries no discriminative
    * signal, and verifying its quadratic pair set is exactly the
    * explosion LSH exists to avoid (measured: the cap cuts the sf0.1
    * gate probe from 1.33M candidate pairs to ~3k). A doc in one
    * degenerate bucket is still reachable through its other band;
    * exact duplicates are q_dedup_incremental's hash check anyway.
    * The cap is part of the operator's SEMANTICS (the oracle applies
    * the identical HAVING), not a lossy shortcut bolted on after.
    */
  def probeLshIndex(
      spark: SparkSession, path: String,
      newBatch: DataFrame, corpusTexts: DataFrame,
      minJaccard: Double = 0.5,
      maxBucket: Int = 64): DataFrame = {
    val idx = spark.read.parquet(path).withColumnRenamed("doc_id", "corp_id")
    val ok = idx.groupBy(col("bkey")).agg(count(lit(1)).as("__n"))
      .filter(col("__n") <= maxBucket).select(col("bkey"))
    val idxOk = idx.join(ok, Seq("bkey"), "left_semi")
    val newBk = lshMembership(newBatch).withColumnRenamed("doc_id", "new_id")
    // feeds the pair join + both semi-joins — LAZY pin
    // (Checkpoints.materializeLazy contract): the first action is
    // newSh's eager pin job just below, whose semi-join build side
    // scans cand fully and references it exactly once, so the
    // candidate join is computed, pinned, and consumed in ONE job
    // instead of paying its own barrier (r19 shape: eager pin = one
    // extra sequential job per probe)
    val cand = graft.operators.Checkpoints.materializeLazy(
      newBk.join(idxOk, Seq("bkey"))
        .select(col("new_id"), col("corp_id")).distinct())
    def shOf(df: DataFrame, idName: String) =
      df.filter(length(col("text")) >= 3)
        .select(col("doc_id").as(idName), explode(shingles(col("text"), 3)).as("s3"))
    val newSh = shOf(newBatch, "new_id")
      .join(cand.select(col("new_id")).distinct(), Seq("new_id"), "left_semi")
      .transform(pinSer)
    val corpSh = shOf(corpusTexts, "corp_id")
      .join(cand.select(col("corp_id")).distinct(), Seq("corp_id"), "left_semi")
      .transform(pinSer)
    val nNew = newSh.groupBy(col("new_id")).agg(count(lit(1)).as("na"))
    val nCorp = corpSh.groupBy(col("corp_id")).agg(count(lit(1)).as("nb"))
    val inter = cand
      .join(newSh, Seq("new_id"))
      .join(corpSh, Seq("corp_id", "s3"))
      .groupBy(col("new_id"), col("corp_id")).agg(count(lit(1)).as("c"))
    // threshold compares the ROUNDED value (spelled identically in the
    // oracle) so last-ulp drift can't flip membership
    val jacc = round(col("c") * 1e6 / (col("na") + col("nb") - col("c"))) / 1e6
    inter
      .join(nNew, Seq("new_id"))
      .join(nCorp, Seq("corp_id"))
      .withColumn("jacc", jacc)
      .filter(col("jacc") >= minJaccard)
      .groupBy(col("new_id"))
      .agg(
        max(struct(col("jacc").as("j"), (-col("corp_id")).as("negid"))).as("best"),
        count(lit(1)).as("n_matches"))
      .select(
        col("new_id").as("doc_id"),
        (-col("best.negid")).as("dup_of"),
        col("best.j").as("jaccard"),
        col("n_matches").cast("long").as("n_matches"))
      .orderBy(col("doc_id"))
  }

  def clusterRun(
      s: SparkSession, dir: String,
      maxRounds: Int = 16, exactRounds: Option[Int] = None): DataFrame = {
    val labels = propagateLabels(lshMembership(docs(s, dir)), maxRounds, exactRounds)._1
    val sizes = labels.groupBy(col("lbl")).agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, Seq("lbl"))
      .filter(col("cluster_size") > 1)
      .select(col("doc_id"), col("lbl").as("cluster_id"), col("cluster_size"))
      .orderBy(col("cluster_id"), col("doc_id"))
  }

  /** Connected components over a (doc_id, bkey) bipartite membership via
    * min-label propagation WITH pointer jumping, iterated to
    * CONVERGENCE: each round (a) pulls the min label through buckets
    * (one hop) and (b) path-compresses (label := label's label), so
    * reachable distance roughly doubles per round. The driver stops at
    * the first round that changes no label — one cheap `count` per
    * round on the candidate frame — with `maxRounds` as a safety
    * backstop (16 doublings cover any plausible component diameter; a
    * cap hit means the similarity graph is pathological and should be
    * inspected, so it logs loudly). `exactRounds` disables the
    * convergence check and runs a pinned number of rounds — the spec
    * uses it to prove fixpoints and to demonstrate what a fixed cap
    * mislabels.
    *
    * Returns (labels, roundsRun) where roundsRun includes the final
    * no-change round.
    */
  /** One min-label-propagation round with pointer jumping — the body of
    * [[propagateLabels]]' loop, also audited standalone by
    * [[graft.PlanAudit]] (the gate query's final frame is checkpointed,
    * hiding the per-round aggregations/joins). One m ⋈ labels join
    * feeds BOTH the bucket-min and the doc-min aggregation (the naive
    * form joins m against labels twice per round); every candidate doc
    * has a bucket, so no left join needed.
    */
  private[graft] def propagateRound(
      mByDoc: DataFrame, mByBkey: DataFrame, labels: DataFrame): DataFrame = {
    val ml = mByDoc.join(labels, Seq("doc_id"))
    val b = ml.groupBy(col("bkey")).agg(min(col("lbl")).as("blbl"))
    val docmin = mByBkey.join(b, Seq("bkey"))
      .groupBy(col("doc_id")).agg(min(col("blbl")).as("mb"))
    val hopped = labels
      .join(docmin, Seq("doc_id"), "left")
      .select(col("doc_id"), least(col("lbl"), coalesce(col("mb"), col("lbl"))).as("lbl"))
    // pointer jumping: label := label's label (labels are doc ids, so
    // the parent row always exists) — distance doubles per round
    val parents = hopped.select(col("doc_id").as("p_id"), col("lbl").as("p_lbl"))
    hopped.join(parents, hopped("lbl") === parents("p_id"))
      .select(hopped("doc_id"), col("p_lbl").as("lbl"))
  }

  /** One representative propagation round over the real membership
    * (materialized per key exactly as [[propagateLabels]] holds it, so
    * the audit sees the round's true incremental shuffle/join structure)
    * for [[graft.PlanAudit]]. */
  def lshClusterRoundPlan(s: SparkSession, dir: String): DataFrame = {
    val mByBkey = graft.operators.Checkpoints.materialize(
      lshMembership(Tables.loadDistributed(s, dir, "documents", "doc_id")))
    val mByDoc = graft.operators.Checkpoints.materialize(
      mByBkey.repartition(col("doc_id")))
    val labels = graft.operators.Checkpoints.materialize(
      mByDoc.select(col("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("lbl")))
    propagateRound(mByDoc, mByBkey, labels)
  }

  def propagateLabels(
      membership: DataFrame,
      maxRounds: Int,
      exactRounds: Option[Int] = None): (DataFrame, Int) = {
    // Iterate ONLY over docs sharing a non-singleton bucket: a doc whose
    // buckets are all its own can neither change label nor affect any
    // other doc's, and qLshClusters' final `cluster_size > 1` filter
    // drops it anyway — so the rounds below are equality-preserving on a
    // candidate set that at real corpus scale is a small fraction of
    // the corpus (the oracle runs the same rounds un-restricted; the
    // gate checks the results agree). Materialize it once instead of
    // re-deriving the membership on every of the 12 references (the
    // oracle's AS MATERIALIZED m is the same decision).
    val bucketDocs = Window.partitionBy(col("bkey"))
    // The rounds reference the membership on both keys — doc_id (label
    // pull) and bkey (bucket min) — so keep one checkpointed copy
    // PRE-PARTITIONED per key: localCheckpoint preserves the physical
    // partitioning in the LogicalRDD, so none of the rounds re-shuffles
    // the membership side of its joins/aggregations.
    // ENTRY pins stay EAGER: round 1's job references mByDoc more than
    // once (the label seed subtree AND the propagation join), so lazy
    // pins would compute the membership build repeatedly inside that
    // job — outside materializeLazy's single-first-consumer contract.
    // Only the PER-ROUND pin below is lazily fused (one reference per
    // consumer). localCheckpoint preserves the physical partitioning
    // in the LogicalRDD either way, so none of the rounds re-shuffles
    // the membership side of its joins/aggregations.
    val mByBkey = graft.operators.Checkpoints.materialize(membership
      .withColumn("__n", count(lit(1)).over(bucketDocs))
      .filter(col("__n") > 1)
      .drop("__n"))
    val mByDoc = graft.operators.Checkpoints.materialize(
      mByBkey.repartition(col("doc_id")))
    var labels = mByDoc.select(col("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("lbl"))
    val target = exactRounds.getOrElse(maxRounds)
    var round = 0
    var converged = false
    while (round < target && !converged) {
      round += 1
      val next = propagateRound(mByDoc, mByBkey, labels)
      if (exactRounds.isEmpty) {
        // ONE job per round (was two): the changed-count below is the
        // LAZY checkpoint's materializing action — it joins the whole
        // round frame against the previous labels, so every partition
        // is computed, pinned, and convergence-checked in the same job
        // (Checkpoints.materializeLazy; still truncates the
        // 3×-per-round lineage growth, still goes reliable+eager when
        // a checkpoint dir is configured).
        val mat = graft.operators.Checkpoints.materializeLazy(next)
        val changed = mat
          .join(labels.withColumnRenamed("lbl", "prev"), Seq("doc_id"))
          .filter(col("lbl") =!= col("prev"))
          .count()
        converged = changed == 0L
        labels = mat
      } else {
        // pinned-rounds path (specs): truncate lineage every second
        // round — ~9 subtree copies between truncations stays cheap to
        // plan; the eager-materialize barrier is what costs wall time
        labels =
          if (round % 2 == 0 || round == target)
            graft.operators.Checkpoints.materialize(next)
          else next
      }
    }
    if (!converged && exactRounds.isEmpty)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"propagateLabels hit the $maxRounds-round backstop without converging; " +
          s"component diameter exceeds 2^$maxRounds — labels may be non-canonical")
    (labels, round)
  }

  /** The build-once/probe-many near-dup cycle under the gate: persist
    * the LSH index for the existing corpus (doc_id % 10 ≠ 0), then
    * near-dup-check the incoming batch (doc_id % 10 = 0) against it —
    * the NEAR-dup complement of q_dedup_incremental's exact-hash
    * admission check. The oracle replays the whole cycle (signatures →
    * bands → candidate join → exact candidate-bounded Jaccard → best
    * match per new doc) against the raw table, proving the persisted
    * index loses and invents no candidates.
    */
  val qLshIndexDedup: Q = Q(
    "q_lsh_index_dedup", {
      val sigs = MinhashParams.zipWithIndex
        .map { case ((a, b), j) => s"min((h * $a + $b) % $P) AS sig$j" }
        .mkString(", ")
      def shCte(name: String, src: String) =
        s"""$name AS (
             SELECT doc_id, unnest(list_distinct(
               [substring(text, i, 3) FOR i IN range(1, length(text) - 1)])) AS s3
             FROM $src WHERE length(text) >= 3)"""
      def bandCte(name: String, sigSrc: String) =
        s"""$name AS (
             SELECT doc_id, concat_ws('_', '0', sig0, sig1) AS bkey FROM $sigSrc
             UNION ALL
             SELECT doc_id, concat_ws('_', '1', sig2, sig3) AS bkey FROM $sigSrc)"""
      Some(s"""WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
               newb AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
               ${shCte("shc", "corpus")}, ${shCte("shn", "newb")},
               hc AS (SELECT doc_id, ('0x' || substr(md5(s3), 1, 8))::BIGINT AS h FROM shc),
               hn AS (SELECT doc_id, ('0x' || substr(md5(s3), 1, 8))::BIGINT AS h FROM shn),
               sigc AS (SELECT doc_id, $sigs FROM hc GROUP BY doc_id),
               sign AS (SELECT doc_id, $sigs FROM hn GROUP BY doc_id),
               ${bandCte("mc", "sigc")}, ${bandCte("mn", "sign")},
               ok AS (SELECT bkey FROM mc GROUP BY bkey HAVING count(*) <= 64),
               cand AS MATERIALIZED (
                 SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corp_id
                 FROM mn n JOIN ok USING (bkey) JOIN mc c USING (bkey)),
               szc AS (SELECT doc_id, count(*) AS n FROM shc GROUP BY doc_id),
               szn AS (SELECT doc_id, count(*) AS n FROM shn GROUP BY doc_id),
               inter AS (
                 SELECT cand.new_id, cand.corp_id, count(*) AS c
                 FROM cand
                 JOIN shn a ON a.doc_id = cand.new_id
                 JOIN shc b ON b.doc_id = cand.corp_id AND b.s3 = a.s3
                 GROUP BY cand.new_id, cand.corp_id),
               scored AS (
                 SELECT new_id, corp_id,
                        round(c * 1e6 / (szn.n + szc.n - c)) / 1e6 AS jacc
                 FROM inter
                 JOIN szn ON szn.doc_id = new_id
                 JOIN szc ON szc.doc_id = corp_id
                 WHERE round(c * 1e6 / (szn.n + szc.n - c)) / 1e6 >= 0.5)
               SELECT new_id AS doc_id,
                      -((max({'j': jacc, 'negid': -corp_id})).negid) AS dup_of,
                      (max({'j': jacc, 'negid': -corp_id})).j AS jaccard,
                      CAST(count(*) AS BIGINT) AS n_matches
               FROM scored GROUP BY new_id ORDER BY doc_id""")
    },
    (s, dir) => {
      val d = docs(s, dir)
      val corpus = d.filter(col("doc_id") % 10 =!= 0).select(col("doc_id"), col("text"))
      val newb = d.filter(col("doc_id") % 10 === 0).select(col("doc_id"), col("text"))
      val path = java.nio.file.Files.createTempDirectory("lsh_index").resolve("idx").toString
      writeLshIndex(corpus, path)
      probeLshIndex(s, path, newb, corpus, minJaccard = 0.5)
    })

  /** The incremental (probe-then-MERGE) index cycle under the gate:
    * build the index for the day-0 corpus (doc_id % 10 ∉ {0, 5}),
    * probe batch A (doc_id % 10 = 5) against it, MERGE A's signatures
    * in ([[appendToLshIndex]]), then probe batch B (doc_id % 10 = 0)
    * against the grown index — so B's matches can resolve to docs that
    * arrived in A, which the day-0 index never saw. The oracle replays
    * both probes from the raw table (A vs day-0 corpus, B vs corpus ∪
    * A), proving the appended index is exactly equivalent to
    * rebuilding from scratch — candidates are neither lost nor
    * invented by the merge.
    */
  val qLshIndexIncremental: Q = Q(
    "q_lsh_index_incremental", {
      val sigs = MinhashParams.zipWithIndex
        .map { case ((a, b), j) => s"min((h * $a + $b) % $P) AS sig$j" }
        .mkString(", ")
      def shCte(name: String, src: String) =
        s"""$name AS (
             SELECT doc_id, unnest(list_distinct(
               [substring(text, i, 3) FOR i IN range(1, length(text) - 1)])) AS s3
             FROM $src WHERE length(text) >= 3)"""
      def bandCte(name: String, sigSrc: String) =
        s"""$name AS (
             SELECT doc_id, concat_ws('_', '0', sig0, sig1) AS bkey FROM $sigSrc
             UNION ALL
             SELECT doc_id, concat_ws('_', '1', sig2, sig3) AS bkey FROM $sigSrc)"""
      // one full probe replay (shingles → signatures → bands → capped
      // candidates → exact candidate-bounded Jaccard), prefixed so the
      // A- and B-probes coexist in one WITH chain
      def probe(p: String, newSrc: String, corpSrc: String) =
        s"""${shCte(s"sh${p}c", corpSrc)}, ${shCte(s"sh${p}n", newSrc)},
            h${p}c AS (SELECT doc_id, ('0x' || substr(md5(s3), 1, 8))::BIGINT AS h FROM sh${p}c),
            h${p}n AS (SELECT doc_id, ('0x' || substr(md5(s3), 1, 8))::BIGINT AS h FROM sh${p}n),
            sg${p}c AS (SELECT doc_id, $sigs FROM h${p}c GROUP BY doc_id),
            sg${p}n AS (SELECT doc_id, $sigs FROM h${p}n GROUP BY doc_id),
            ${bandCte(s"m${p}c", s"sg${p}c")}, ${bandCte(s"m${p}n", s"sg${p}n")},
            ok$p AS (SELECT bkey FROM m${p}c GROUP BY bkey HAVING count(*) <= 64),
            cand$p AS MATERIALIZED (
              SELECT DISTINCT n.doc_id AS new_id, c.doc_id AS corp_id
              FROM m${p}n n JOIN ok$p USING (bkey) JOIN m${p}c c USING (bkey)),
            szc$p AS (SELECT doc_id, count(*) AS n FROM sh${p}c GROUP BY doc_id),
            szn$p AS (SELECT doc_id, count(*) AS n FROM sh${p}n GROUP BY doc_id),
            inter$p AS (
              SELECT cand$p.new_id, cand$p.corp_id, count(*) AS c
              FROM cand$p
              JOIN sh${p}n a ON a.doc_id = cand$p.new_id
              JOIN sh${p}c b ON b.doc_id = cand$p.corp_id AND b.s3 = a.s3
              GROUP BY cand$p.new_id, cand$p.corp_id),
            scored$p AS (
              SELECT new_id, corp_id,
                     round(c * 1e6 / (szn$p.n + szc$p.n - c)) / 1e6 AS jacc
              FROM inter$p
              JOIN szn$p ON szn$p.doc_id = new_id
              JOIN szc$p ON szc$p.doc_id = corp_id
              WHERE round(c * 1e6 / (szn$p.n + szc$p.n - c)) / 1e6 >= 0.5),
            res$p AS (
              SELECT new_id AS doc_id,
                     -((max({'j': jacc, 'negid': -corp_id})).negid) AS dup_of,
                     (max({'j': jacc, 'negid': -corp_id})).j AS jaccard,
                     CAST(count(*) AS BIGINT) AS n_matches,
                     '${p.toUpperCase}' AS batch
              FROM scored$p GROUP BY new_id)"""
      Some(s"""WITH corpa AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 NOT IN (0, 5)),
               newa AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 5),
               corpb AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
               newbb AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
               ${probe("a", "newa", "corpa")},
               ${probe("b", "newbb", "corpb")}
               SELECT * FROM resa UNION ALL SELECT * FROM resb
               ORDER BY batch, doc_id""")
    },
    (s, dir) => {
      val d = docs(s, dir)
      val m10 = col("doc_id") % 10
      val corpus = d.filter(m10 =!= 0 && m10 =!= 5).select(col("doc_id"), col("text"))
      val batchA = d.filter(m10 === 5).select(col("doc_id"), col("text"))
      val batchB = d.filter(m10 === 0).select(col("doc_id"), col("text"))
      val path = java.nio.file.Files
        .createTempDirectory("lsh_index_inc").resolve("idx").toString
      writeLshIndex(corpus, path)
      // force the A-probe NOW: its plan reads the index lazily, and the
      // append below must not leak A's own signatures into A's probe
      val resA = probeLshIndex(s, path, batchA, corpus)
        .withColumn("batch", lit("A")).transform(pinSer)
      appendToLshIndex(batchA, path)
      val resB = probeLshIndex(s, path, batchB, corpus.union(batchA))
        .withColumn("batch", lit("B"))
      resA.union(resB).orderBy(col("batch"), col("doc_id"))
    })

  /** Lower-cased word tokens per document — the shared input of the
    * substring-dedup pair (accounting + rewrite). localCheckpointed:
    * feeds the gram explode AND the final join-back.
    */
  private def spanTokens(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"),
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)).as("t"))
      .transform(pinSer)

  /** Duplicated-token intervals merged into islands, per doc: every
    * token-8-gram occurrence that is not the corpus-wide FIRST
    * occurrence (min (doc_id, pos)) marks positions [i, i+7];
    * overlapping marks merge via a gaps-and-islands pass under a
    * PARTITIONED (per-doc) window. Returns (doc_id, s, e, island).
    *
    * Scale shape: one explode to (8-gram, pos), one corpus-wide hash
    * aggregation for first-occurrences, one join back, per-doc
    * windows. Nothing is ever pairwise.
    */
  /** The md5-prefix gram hash, the IDENTICAL spell the DuckDB oracles
    * use (`('0x' || substr(md5(g), 1, 15))::BIGINT`): 15 hex chars =
    * 60 bits. A collision (two distinct grams sharing the prefix)
    * therefore conflates the same gram pair in BOTH engines, which is
    * what keeps the gate exact — pinned by DedupCollisionSpec, which
    * shrinks `hexChars` to force collisions and checks the engine
    * against an independent replay of the oracle's algorithm.
    * Production callers always use the 60-bit default.
    */
  private[graft] def gramHash(gram: Column, hexChars: Int = 15): Column =
    conv(substring(md5(gram), 1, hexChars), 16, 10).cast("long")

  private[graft] def spanIslands(toks: DataFrame, hashHexChars: Int = 15): DataFrame = {
    // the 8-gram is hashed to a 60-bit int AT THE MAP SIDE (both engines
    // spell the identical md5-prefix hash), so the corpus-wide
    // first-occurrence aggregation and the join back shuffle 8-byte keys
    // instead of ~50-char strings — a 4-6× shuffle/spill reduction that
    // is the difference between completing and dying on local disk at
    // sf100 (225M+ gram occurrences). 60 bits over 225M grams ≈ 0.02
    // expected collisions, and a collision conflates the same pair in
    // BOTH engines, so the gate stays exact.
    val gr = toks.filter(size(col("t")) >= 8)
      .select(col("doc_id"), explode(expr(
        """transform(sequence(1, size(t) - 7),
                     i -> named_struct('i', i, 'gram', array_join(slice(t, i, 8), ' ')))"""))
        .as("x"))
      .select(col("doc_id"), col("x.i").as("i"),
        gramHash(col("x.gram"), hashHexChars).as("g"))
    // First-occurrence filtering as ONE g-partitioned window over gr
    // (min struct = the same corpus-wide first the oracle's `f` CTE
    // computes), not groupBy + join-back. The join shape executed the
    // gram explode + md5 — the widest work in the query — TWICE (once
    // under the aggregate, once on the probe side: at sf0.1 the
    // aggregate side is broadcast, at scale AQE turns it into a
    // sort-merge join shuffling BOTH full sides). The window shape
    // explodes once and exchanges gr once; its per-partition sort on g
    // is work the aggregate side's SortAggregate already paid.
    // (Same-window A/B + plan diff in OPTIMIZATION_r20.md; dup set
    // identical by construction — DedupCollisionSpec + oracle pin it.)
    val wG = Window.partitionBy(col("g"))
    val dups = gr
      .withColumn("fst", min(struct(col("doc_id").as("d"), col("i").as("fi"))).over(wG))
      .filter(!(col("doc_id") === col("fst.d") && col("i") === col("fst.fi")))
    val iv = dups.select(col("doc_id"), col("i").as("s"), (col("i") + 7).as("e")).distinct()
    val wPrev = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wRun = Window.partitionBy(col("doc_id")).orderBy(col("s"), col("e"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    iv
      .withColumn("pmax", max(col("e")).over(wPrev))
      .withColumn("island",
        sum(when(col("pmax").isNull || col("s") > col("pmax"), 1L).otherwise(0L)).over(wRun))
  }

  /** The island CTE chain shared by the two span-dedup oracles —
    * identical text so the accounting and rewrite gates replay the
    * same duplicated-interval table.
    */
  private val spanIslandSql =
    """toks AS (SELECT doc_id, regexp_extract_all(lower(text), '[a-z]+') AS t
                FROM documents),
       gr0 AS (SELECT doc_id,
                      unnest([{'i': i, 'gram': array_to_string(t[i:i+7], ' ')}
                              FOR i IN range(1, len(t) - 6)],
                             recursive := true)
               FROM toks WHERE len(t) >= 8),
       gr AS (SELECT doc_id, i,
                     ('0x' || substr(md5(gram), 1, 15))::BIGINT AS g
              FROM gr0),
       f AS (SELECT g, min({'d': doc_id, 'i': i}) AS fst FROM gr GROUP BY g),
       d AS (SELECT gr.doc_id, gr.i FROM gr JOIN f USING (g)
             WHERE NOT (gr.doc_id = f.fst.d AND gr.i = f.fst.i)),
       iv AS (SELECT DISTINCT doc_id, i AS s, i + 7 AS e FROM d),
       m AS (SELECT doc_id, s, e,
                    max(e) OVER (PARTITION BY doc_id ORDER BY s, e
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
             FROM iv),
       isl AS (SELECT doc_id, s, e,
                      sum(CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END)
                        OVER (PARTITION BY doc_id ORDER BY s, e
                              ROWS UNBOUNDED PRECEDING) AS island
               FROM m)"""

  /** Exact substring dedup ACCOUNTING (the Lee et al. 2022 transform,
    * token-8-gram grain): every 8-gram occurrence that is not the
    * corpus-wide FIRST occurrence (min (doc_id, pos)) marks its 8
    * token positions as duplicated; overlapping marks merge into
    * islands (gaps-and-islands per doc — a PARTITIONED window), and
    * each doc reports how many tokens the dedup pass would remove vs
    * retain. This is the coverage half of substring dedup — the
    * number that decides whether a doc survives, gets trimmed, or is
    * dropped — computed without ever materializing rewritten text.
    *
    * Scale shape: one tokenization, one explode to (8-gram, pos), one
    * corpus-wide hash aggregation for first-occurrences, one join
    * back, then per-doc windows. Nothing is ever pairwise.
    */
  val qSpanDedup: Q = Q(
    "q_span_dedup",
    Some(s"""WITH $spanIslandSql,
            cov AS (SELECT doc_id, island, max(e) - min(s) + 1 AS clen, count(*) AS nsp
                    FROM isl GROUP BY 1, 2),
            agg AS (SELECT doc_id, sum(clen) AS n_covered, sum(nsp) AS n_dup_spans
                    FROM cov GROUP BY doc_id)
            SELECT t.doc_id, CAST(len(t.t) AS BIGINT) AS n_tokens,
                   CAST(coalesce(a.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
                   CAST(coalesce(a.n_covered, 0) AS BIGINT) AS n_covered,
                   CAST(len(t.t) - coalesce(a.n_covered, 0) AS BIGINT) AS n_retained
            FROM toks t LEFT JOIN agg a USING (doc_id) ORDER BY t.doc_id"""),
    (s, dir) => {
      val toks = spanTokens(s, dir)
      val isl = spanIslands(toks)
      val agg = isl.groupBy(col("doc_id"), col("island"))
        .agg((max(col("e")) - min(col("s")) + 1).as("clen"), count(lit(1)).as("nsp"))
        .groupBy(col("doc_id"))
        .agg(sum(col("clen")).as("n_covered"), sum(col("nsp")).as("n_dup_spans"))
      toks.join(agg, Seq("doc_id"), "left")
        .select(
          col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
          coalesce(col("n_dup_spans"), lit(0L)).cast("long").as("n_dup_spans"),
          coalesce(col("n_covered"), lit(0L)).cast("long").as("n_covered"),
          (size(col("t")) - coalesce(col("n_covered"), lit(0L))).cast("long").as("n_retained"))
        .orderBy(col("doc_id"))
    })

  /** Exact substring dedup REWRITE (the other half of Lee et al.
    * 2022): subtract each doc's duplicated-token islands from
    * [1, n_tokens] and emit the text rebuilt from the KEPT ranges —
    * the transform a real pipeline ships, not just the accounting.
    * Gated on the md5 of the rewritten string plus the retained-token
    * count; the oracle rebuilds the identical string in DuckDB via
    * list slicing + array_to_string over the same island table.
    *
    * Scale shape: on top of [[spanIslands]] this adds one per-doc
    * island aggregation (collect_list over ≤ n/8 merged islands) and
    * a map-side complement/slice/join — the rewrite itself never
    * shuffles beyond the island table it already has.
    */
  val qSpanRewrite: Q = Q(
    "q_span_rewrite",
    Some(s"""WITH $spanIslandSql,
            mi AS (SELECT doc_id, island, min(s) AS s, max(e) AS e
                   FROM isl GROUP BY doc_id, island),
            li AS (SELECT doc_id, list({'s': s, 'e': e} ORDER BY s) AS isls
                   FROM mi GROUP BY doc_id),
            j AS (SELECT t.doc_id, t.t,
                         coalesce(li.isls, CAST([] AS STRUCT(s INT, e INT)[])) AS isls
                  FROM toks t LEFT JOIN li USING (doc_id)),
            k AS (SELECT doc_id, t, list_filter(
                    [{'s': CASE WHEN i = 1 THEN 1 ELSE isls[i-1].e + 1 END,
                      'e': CASE WHEN i = len(isls) + 1 THEN len(t) ELSE isls[i].s - 1 END}
                     FOR i IN range(1, len(isls) + 2)],
                    r -> r.e >= r.s) AS kept
                  FROM j)
            SELECT doc_id,
                   CAST(coalesce(list_sum(list_transform(kept, r -> r.e - r.s + 1)), 0) AS BIGINT)
                     AS n_retained,
                   md5(coalesce(array_to_string(
                     flatten(list_transform(kept, r -> t[r.s:r.e])), ' '), '')) AS rewrite_md5
            FROM k ORDER BY doc_id"""),
    (s, dir) => {
      val toks = spanTokens(s, dir)
      val mi = spanIslands(toks).groupBy(col("doc_id"), col("island"))
        .agg(min(col("s")).as("s"), max(col("e")).as("e"))
      val li = mi.groupBy(col("doc_id"))
        .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("isls"))
      toks.join(li, Seq("doc_id"), "left")
        .withColumn("isls",
          coalesce(col("isls"), expr("cast(array() as array<struct<s:int,e:int>>)")))
        // kept ranges = complement of the islands over [1, size(t)]:
        // starts = 1 :: (e+1 per island), ends = (s-1 per island) :: size(t)
        .withColumn("kept", expr(
          """filter(
               zip_with(
                 concat(array(1), transform(isls, x -> x.e + 1)),
                 concat(transform(isls, x -> x.s - 1), array(size(t))),
                 (a, b) -> named_struct('s', a, 'e', b)),
               r -> r.e >= r.s)"""))
        .select(
          col("doc_id"),
          expr("cast(aggregate(kept, 0, (acc, r) -> acc + r.e - r.s + 1) as bigint)")
            .as("n_retained"),
          md5(expr(
            "array_join(flatten(transform(kept, r -> slice(t, r.s, r.e - r.s + 1))), ' ')"))
            .as("rewrite_md5"))
        .orderBy(col("doc_id"))
    })

  override def queries: Seq[Q] =
    Seq(qDedupExact, qDedupCascade, qMinhashSig, qLshBuckets, qSimhash, qNgramJaccard,
      qCosineDedup, qLshClusters, qLshIndexDedup, qLshIndexIncremental, qSpanDedup,
      qSpanRewrite)
}
