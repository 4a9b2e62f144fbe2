package graft.functions

import graft.text.TextFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature kernel, shared by interpreted eval and
  * generated code.
  *
  * Exact semantic parity with the composable pipeline it replaces
  * (`explode(shingles(text, 3)) → md5Hash32 → groupBy(min((h·a+b) mod p) ×k)`),
  * bit for bit:
  *   - shingles via `UTF8String.substringSQL(i, 3)` — the SAME function
  *     Column.substr lowers to, so character (code-point) windows agree
  *     on any input, astral planes included;
  *   - hash = first 8 hex digits of md5 of the shingle's UTF-8 bytes
  *     (≡ `conv(substring(md5(s), 1, 8), 16, 10)`) = the first 4 digest
  *     bytes as an unsigned 32-bit value;
  *   - `min` is duplicate-insensitive, so skipping the pipeline's
  *     `array_distinct` cannot change any signature.
  * Oracles that replay the exploded pipeline in DuckDB therefore keep
  * hash-matching unchanged.
  *
  * Why it matters at 100 TB: the pipeline form materializes
  * corpus × shingle-count rows and shuffles them into a groupBy just to
  * take k minimums — the signature becomes a SHUFFLE. This kernel folds
  * the k minimums in one pass over the string, making the signature a
  * map-side projection: zero extra rows, zero exchanges, fused into
  * whole-stage codegen.
  */
object MinhashSigsImpl {
  private val as: Array[Long] = TextFunctions.MinhashParams.map(_._1).toArray
  private val bs: Array[Long] = TextFunctions.MinhashParams.map(_._2).toArray
  private val P: Long = TextFunctions.MinhashPrime

  /** Signatures of `text`'s 3-gram shingle set; null when the text has
    * no 3-gram (< 3 characters) — mirroring the pipeline form, where
    * such docs simply produce no signature row.
    */
  def compute(text: UTF8String): GenericArrayData = {
    val nChars = text.numChars()
    if (nChars < 3) return null
    val k = as.length
    val sigs = Array.fill(k)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    var i = 1
    while (i <= nChars - 2) {
      md.reset()
      val d = md.digest(text.substringSQL(i, 3).getBytes)
      val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < sigs(j)) sigs(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }
}

/** `minhash_sigs(text)` → array<long> of the k=4 MinHash signatures
  * (see [[MinhashSigsImpl]] for semantics and the scale rationale).
  */
case class MinhashSigs(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def prettyName: String = "minhash_sigs"

  override def nullSafeEval(input: Any): Any =
    MinhashSigsImpl.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // nullSafeCodeGen's wrapper handles the null child; the kernel's own
    // null (text shorter than one shingle) folds into isNull after the
    // call — assigning ev.isNull inside the body is supported (the
    // wrapper declares it as a mutable local)
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.functions.MinhashSigsImpl.compute($c);
         |${ev.isNull} = (${ev.value} == null);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs =
    copy(child = newChild)
}

/** One-pass 16-bit SimHash kernel — same parity-by-construction design
  * as [[MinhashSigsImpl]], replacing the
  * `explode(tokens) → md5Hash32 → groupBy(±1 bit sums ×16)` pipeline
  * (corpus × token rows through a shuffle) with a per-row projection.
  *
  * Token windows are byte ranges split at ASCII 0x20: in UTF-8 the
  * space byte never occurs inside a multi-byte sequence, so the
  * segments are exactly the UTF-8 bytes `split(text, ' ')` (empty
  * segments dropped, ≙ the pipeline's `w <> ''` filter) feeds to md5.
  * Hash = first 4 md5 digest bytes unsigned; bit b of the signature is
  * set iff the token count with bit b set strictly exceeds the count
  * without (ties → 0, matching `sum(±1) > 0`). Null when the text has
  * no tokens — such docs produce no signature row in the pipeline form.
  */
object Simhash16Impl {
  def compute(text: UTF8String): java.lang.Long = {
    val bytes = text.getBytes
    val counts = new Array[Int](16)
    val md = java.security.MessageDigest.getInstance("MD5")
    var any = false
    var start = 0
    var i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == 0x20) {
        if (i > start) {
          any = true
          md.reset()
          val d = md.digest(java.util.Arrays.copyOfRange(bytes, start, i))
          val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
            ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
          var b = 0
          while (b < 16) {
            if (((h >> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    if (!any) return null
    var sig = 0L
    var b = 0
    while (b < 16) { if (counts(b) > 0) sig |= 1L << b; b += 1 }
    java.lang.Long.valueOf(sig)
  }
}

/** `simhash16(text)` → the 16-bit SimHash signature as a long
  * (see [[Simhash16Impl]]).
  */
case class Simhash16(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${other.simpleString}")
  }
  override def prettyName: String = "simhash16"

  override def nullSafeEval(input: Any): Any = {
    val r = Simhash16Impl.compute(input.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val boxed = ctx.freshName("boxed")
      s"""
         |java.lang.Long $boxed = graft.functions.Simhash16Impl.compute($c);
         |if ($boxed == null) { ${ev.isNull} = true; } else { ${ev.value} = $boxed.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Simhash16 =
    copy(child = newChild)
}

object MinhashFunctions {
  /** Column wrapper over the native [[MinhashSigs]] expression. */
  def minhashSigsNative(text: Column): Column =
    ColumnBridge.column(MinhashSigs(ColumnBridge.expression(text)))

  /** Column wrapper over the native [[Simhash16]] expression. */
  def simhash16Native(text: Column): Column =
    ColumnBridge.column(Simhash16(ColumnBridge.expression(text)))
}
