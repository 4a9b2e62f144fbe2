package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Johnson–Lindenstrauss random projection with a deterministic ±1 sign
  * matrix (Achlioptas, JCSS 2003: Rademacher entries satisfy the JL
  * guarantee; no Gaussian needed), scaled by 1/√dimOut so expected
  * squared norm is preserved.
  *
  * The matrix entries are derived from md5 of the literal
  * "salt:j:i" — the SAME bytes any other engine can hash — so the
  * sketch is portable and reproducible: no broadcast of a random
  * matrix, no seed state, nothing to persist. The signs fold to plain
  * ±1.0 literals at plan time, so the executed expression per output
  * dim is a fixed codegen'd ±-chain over the input array — a pure
  * per-row projection with no shuffle and no UDF.
  *
  * At corpus scale the dimOut-wide sketch is the cheap prefilter:
  * brute-force cosine on the sketch (8 doubles, not 64 floats) selects
  * rerank candidates an order of magnitude cheaper; exact similarity
  * then runs only on the survivors.
  */
object RandomProjection {

  /** Sign of matrix entry (j, i): parity of the 32-bit md5 prefix of
    * "salt:j:i", evaluated eagerly (the plan carries the ±1 literal).
    */
  def sign(salt: String, j: Int, i: Int): Double = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$salt:$j:$i".getBytes("UTF-8"))
      .take(4).map("%02x".format(_)).mkString
    if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
  }

  /** Output dim j as a Column over the float-array `vec`. */
  def projectDim(vec: Column, salt: String, j: Int, dimIn: Int, dimOut: Int): Column =
    (0 until dimIn)
      .map(i => lit(sign(salt, j, i)) * element_at(vec, i + 1).cast("double"))
      .reduce(_ + _) / math.sqrt(dimOut.toDouble)

  /** Appends y0..y{dimOut-1} projection columns. */
  def project(df: DataFrame, vec: Column, salt: String, dimIn: Int, dimOut: Int): DataFrame =
    df.select(df.columns.map(col) ++
      (0 until dimOut).map(j => projectDim(vec, salt, j, dimIn, dimOut).as(s"y$j")): _*)
}
