package graft.queries

import graft.{Q, QueryPack, Tables}
import graft.text.TextFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis extension pack over `documents`: token statistics,
  * quality signals, heuristic language ID, content fingerprinting. All
  * arithmetic is engine-portable (md5, integer ops, explicit doubles) so
  * every query carries an exact DuckDB oracle.
  */
object TextOps extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.loadDistributed(s, dir, "documents", "doc_id")

  private val stopwords = Seq("the", "a", "of", "data", "value")

  /** Quality scoring: char/word counts and stopword ratio per doc. */
  val qTextStats: Q = Q(
    "q_text_stats",
    Some("""SELECT doc_id, length(text) AS n_chars_calc, n_words, n_stop,
            round(n_stop * 1.0 / n_words, 4) AS stop_ratio
            FROM (SELECT doc_id, text,
                  len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words,
                  len(list_filter(string_split(text, ' '),
                      w -> w IN ('the','a','of','data','value'))) AS n_stop
                  FROM documents)
            ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          length(col("text")).cast("long").as("n_chars_calc"),
          size(tokens(col("text"))).cast("long").as("n_words"),
          hitCount(tokens(col("text")), stopwords).cast("long").as("n_stop"))
        .withColumn("stop_ratio", round(col("n_stop") * lit(1.0) / col("n_words"), 4))
        .orderBy(col("doc_id")))

  /** Token counting per source: volume, distinct vocabulary, mean. */
  val qTokenCount: Q = Q(
    "q_token_count",
    Some("""WITH per_doc AS (
              SELECT doc_id, source,
                     len(list_filter(string_split(text, ' '), w -> w <> '')) AS n_words
              FROM documents),
            vocab AS (
              SELECT source, count(DISTINCT w) AS n_vocab FROM (
                SELECT source, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS w
                FROM documents)
              GROUP BY source)
            SELECT p.source AS source, count(*) AS n_docs,
                   CAST(sum(n_words) AS BIGINT) AS total_tokens,
                   round(avg(n_words), 2) AS avg_tokens, max(n_vocab) AS n_vocab
            FROM per_doc p JOIN vocab v ON p.source = v.source
            GROUP BY p.source
            ORDER BY source"""),
    (s, dir) => {
      val d = docs(s, dir)
      val perDoc = d.select(
        col("source"),
        size(tokens(col("text"))).cast("long").as("n_words"))
      val vocab = d
        .select(col("source"), explode(tokens(col("text"))).as("w"))
        .groupBy(col("source"))
        .agg(countDistinct(col("w")).as("n_vocab"))
      perDoc
        .groupBy(col("source"))
        .agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_words")).as("total_tokens"),
          round(avg(col("n_words")), 2).as("avg_tokens"))
        .join(broadcast(vocab), Seq("source"))
        .select(col("source"), col("n_docs"), col("total_tokens"), col("avg_tokens"), col("n_vocab"))
        .orderBy(col("source"))
    })

  private val markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "row", "scan"),
    "es" -> Seq("data", "value", "table"),
    "zh" -> Seq("hash", "join"),
    "de" -> Seq("fast", "slow"),
    "fr" -> Seq("query", "merge"))

  /** Heuristic language ID: marker-token hit counts, argmax with a fixed
    * preference order on ties, scored against the labeled column.
    */
  val qLangId: Q = Q(
    "q_lang_id", {
      val hitExprs = markers.map { case (l, ws) =>
        val set = ws.map(w => s"'$w'").mkString(",")
        s"len(list_filter(string_split(text, ' '), w -> w IN ($set))) AS ${l}_hits"
      }.mkString(", ")
      val caseExpr = markers.map(_._1).init.zipWithIndex.map { case (l, i) =>
        val rest = markers.map(_._1).drop(i + 1)
        val conds = rest.map(r => s"${l}_hits >= ${r}_hits").mkString(" AND ")
        s"WHEN $conds THEN '$l'"
      }.mkString(" ") + s" ELSE '${markers.last._1}'"
      Some(s"""SELECT lang, predicted, count(*) AS n FROM (
               SELECT lang, CASE $caseExpr END AS predicted FROM (
                 SELECT lang, $hitExprs FROM documents))
               GROUP BY lang, predicted
               ORDER BY lang, predicted""")
    },
    (s, dir) => {
      val d = docs(s, dir)
      val withHits = markers.foldLeft(d.select(col("lang"), col("text"))) {
        case (df, (l, ws)) =>
          df.withColumn(s"${l}_hits", hitCount(tokens(col("text")), ws))
      }
      val langs = markers.map(_._1)
      val predicted = langs.init.zipWithIndex
        .foldRight(lit(langs.last)) { case ((l, i), acc) =>
          val conds = langs.drop(i + 1)
            .map(r => col(s"${l}_hits") >= col(s"${r}_hits"))
            .reduce(_ && _)
          when(conds, lit(l)).otherwise(acc)
        }
      withHits
        .withColumn("predicted", predicted)
        .groupBy(col("lang"), col("predicted"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("lang"), col("predicted"))
    })

  /** Content fingerprinting: full-text and 64-char-prefix 60-bit
    * fingerprints (md5-derived, portable).
    */
  val qFingerprint: Q = Q(
    "q_fingerprint",
    Some("""SELECT doc_id,
            ('0x' || substr(md5(lower(text)), 1, 15))::BIGINT AS fp,
            ('0x' || substr(md5(substr(text, 1, 64)), 1, 15))::BIGINT AS prefix_fp
            FROM documents
            ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          fingerprint60(lower(col("text"))).as("fp"),
          fingerprint60(substring(col("text"), 1, 64)).as("prefix_fp"))
        .orderBy(col("doc_id")))

  /** BPE-ish regex tokenization: letter runs, digit runs, and single
    * punctuation as separate tokens (the pre-tokenizer split most BPE
    * vocabularies assume), counted per doc.
    */
  val qBpeTokens: Q = Q(
    "q_bpe_tokens",
    Some("""SELECT doc_id,
            CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
            CAST(len(list_distinct(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))) AS BIGINT) AS n_distinct
            FROM documents ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)))
            .cast("long").as("n_bpe_tokens"),
          size(array_distinct(
            regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))))
            .cast("long").as("n_distinct"))
        .orderBy(col("doc_id")))

  /** Rolling polynomial hash over the character stream
    * (acc·31 + code mod 1e9+7, seeded with the first code — matching
    * DuckDB's list_reduce fold), the classic content-defined
    * fingerprint.
    */
  val qRollingFp: Q = Q(
    "q_rolling_fp",
    Some("""SELECT doc_id,
            list_reduce([CAST(ord(c) AS BIGINT) FOR c IN string_split(text, '')],
                        (acc, x) -> (acc * 31 + x) % 1000000007) AS rolling_fp
            FROM documents ORDER BY doc_id"""),
    (s, dir) => {
      val codes = transform(split(col("text"), ""), c => ascii(c).cast("long"))
      docs(s, dir)
        .select(
          col("doc_id"),
          aggregate(
            slice(codes, lit(2), size(codes) - 1),
            element_at(codes, 1),
            (acc, x) => (acc * lit(31L) + x) % lit(1000000007L)).as("rolling_fp"))
        .orderBy(col("doc_id"))
    })

  /** Regex predicate filtering (rlike ≙ regexp_matches) plus anchored
    * extraction — kept to a regex subset Java and RE2-style engines
    * treat identically.
    */
  val qRegexFilter: Q = Q(
    "q_regex_filter",
    Some("""SELECT doc_id, regexp_extract(text, '([a-z]+) (join|merge)', 2) AS op
            FROM documents
            WHERE regexp_matches(text, '(join|merge) (fast|slow)')
            ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .filter(col("text").rlike("(join|merge) (fast|slow)"))
        .select(
          col("doc_id"),
          regexp_extract(col("text"), "([a-z]+) (join|merge)", 2).as("op"))
        .orderBy(col("doc_id")))

  /** Regex replacement with group backreferences (Spark `$n`, DuckDB
    * `\n` — same semantics, engine-specific spelling): swap the first
    * two words, then fingerprint the rewritten text so the oracle
    * verifies the actual replacement output.
    */
  val qRegexReplaceGroups: Q = Q(
    "q_regex_replace_groups",
    Some("""SELECT doc_id,
            ('0x' || substr(md5(regexp_replace(text, '^([a-z]+) ([a-z]+)', '\2 \1')), 1, 15))::BIGINT AS swapped_fp
            FROM documents ORDER BY doc_id"""),
    (s, dir) =>
      docs(s, dir)
        .select(
          col("doc_id"),
          fingerprint60(regexp_replace(col("text"), "^([a-z]+) ([a-z]+)", "$2 $1"))
            .as("swapped_fp"))
        .orderBy(col("doc_id")))

  override def queries: Seq[Q] =
    Seq(qTextStats, qTokenCount, qLangId, qFingerprint, qBpeTokens, qRollingFp, qRegexFilter,
      qRegexReplaceGroups)
}
