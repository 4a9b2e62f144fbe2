package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column builders for the training-data text pipeline: tokenization,
  * shingling, portable 32-bit content hashing, MinHash signatures and
  * SimHash — all composed from codegen'd built-ins (no UDFs), so they
  * stay inside whole-stage codegen and push down/prune like any other
  * expression.
  *
  * The content hash is the first 8 hex digits of md5 read as a uint32.
  * md5 is bit-identical across engines, which is what makes the DuckDB
  * oracles for dedup/minhash/simhash exact (Spark's murmur `hash()` is
  * engine-private and would not cross-check).
  */
object TextFunctions {

  /** Whitespace tokens, empty strings dropped. */
  def tokens(text: Column): Column =
    filter(split(text, " "), w => w =!= "")

  /** Character n-gram shingles (distinct), empty below n chars. */
  def shingles(text: Column, n: Int = 3): Column =
    when(
      length(text) >= n,
      array_distinct(
        transform(
          sequence(lit(1), length(text) - lit(n - 1)),
          i => text.substr(i, lit(n)))))
      .otherwise(array().cast("array<string>"))

  /** Explode a (possibly expensive) array expression into struct rows
    * `(s, n)` where `n = size(arr)`, evaluating `arr` exactly ONCE per
    * input row. Referencing the same derived array twice in a select
    * (`size(shs)` + `explode(shs)`) lets CollapseProject merge the
    * projections and duplicate the producing expression — for
    * [[shingles]] that doubles the per-row cost of the scan. The outer
    * `transform` over a one-element array binds the array to a lambda
    * variable (a "let"); no optimizer rule inlines a lambda binding,
    * so the expression keeps a single home no matter how the
    * surrounding projections collapse.
    */
  def explodeWithSize(arr: Column): Column =
    explode(
      transform(array(arr), a =>
        transform(a, x => struct(x.as("s"), size(a).as("n"))))
        .getItem(0))

  /** First 8 hex digits of md5 as uint32 in a long (engine-portable). */
  def md5Hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** 60-bit content fingerprint (15 hex digits of md5 — fits a long). */
  def fingerprint60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Universal-hash family over uint32: (a·h + b) mod p with p prime >
    * 2^32. Products stay well inside int64 for a ≤ ~2^20.
    */
  val MinhashPrime = 4294967311L
  val MinhashParams: Seq[(Long, Long)] =
    Seq((1L, 17L), (7L, 101L), (13L, 499L), (31L, 997L))

  /** Aggregate columns: one MinHash signature per hash-family member,
    * to apply over an exploded (key, hash) frame — `agg(minhashSigs(col("h")): _*)`.
    */
  def minhashSigs(h: Column): Seq[Column] =
    MinhashParams.zipWithIndex.map { case ((a, b), j) =>
      min((h * lit(a) + lit(b)) % lit(MinhashPrime)).as(s"sig$j")
    }

  /** SimHash over an exploded (key, token-hash) frame: per-bit signed
    * counts as aggregates, then [[simhashFromBits]] folds them into the
    * signature.
    */
  def simhashBitAggs(h: Column, bits: Int = 16): Seq[Column] =
    (0 until bits).map { b =>
      sum(when(shiftright(h, b) % 2 === 1, 1).otherwise(-1)).as(s"__bit$b")
    }

  def simhashFromBits(bits: Int = 16): Column =
    (0 until bits)
      .map(b => when(col(s"__bit$b") > 0, lit(1L << b)).otherwise(lit(0L)))
      .reduce(_ + _)

  /** Stopword-hit count over a token array. */
  def hitCount(toks: Column, words: Seq[String]): Column =
    size(filter(toks, w => w.isInCollection(words)))
}
