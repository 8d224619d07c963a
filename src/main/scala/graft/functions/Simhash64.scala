package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Row-local 64-bit SimHash kernel — the single-pass Charikar signature the
  * HOF form in [[graft.operators.Dedup.simhash64]] computes, as one static
  * call: tokenize, md5 per token, ±1 vote per bit, sign-threshold assemble.
  *
  * BIT-IDENTICAL to the HOF form (asserted in DedupSimilaritySpec) and to
  * the DuckDB oracle, operation for operation:
  *  - trim strips ASCII spaces ONLY (SQL `trim` semantics — NOT Java
  *    `String.trim`, which also strips control chars);
  *  - `split(text, ' ')` with limit -1 keeps interior empty tokens exactly
  *    like Spark's regex split (md5 of "" votes too);
  *  - the 64-bit token hash is the first 16 md5 hex chars as two unsigned
  *    32-bit halves, `hi << 32 | lo` — the same assembly the SQL does with
  *    `conv`/`shiftleft`.
  */
object SimhashKernel {
  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def compute(s: UTF8String): Long = {
    val str = s.toString
    // SQL trim: leading/trailing ASCII space only
    var b = 0
    var e = str.length
    while (b < e && str.charAt(b) == ' ') b += 1
    while (e > b && str.charAt(e - 1) == ' ') e -= 1
    val toks = str.substring(b, e).split(" ", -1)
    val votes = new Array[Int](64)
    val dg = md.get()
    var t = 0
    while (t < toks.length) {
      dg.reset()
      val d = dg.digest(toks(t).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hi = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      val lo = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
        ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
      val h = (hi << 32) | lo
      var bit = 0
      while (bit < 64) {
        if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
        bit += 1
      }
      t += 1
    }
    var sig = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) sig |= (1L << bit)
      bit += 1
    }
    sig
  }
}

/** Codegen'd `graft_simhash64(text)`.
  *
  * Why a custom Catalyst expression: the HOF form is a 3-deep nested
  * `aggregate`/`zip_with`/`transform` tree — interpreted per-element lambda
  * dispatch over a 64-slot accumulator PER TOKEN, outside whole-stage
  * codegen. The signature pass runs once per corpus row in q37/q58 and the
  * streaming near-dup path, so the per-token interpreter overhead is the
  * dominant cost; this compiles to a single static call on the codegen'd
  * row loop (same fast/fallback contract as `graft_cosine`).
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash64 requires a string argument, got ${other.sql}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimhashKernel.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimhashKernel.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
