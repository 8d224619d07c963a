package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Codegen'd hyperplane-LSH band values: `graft_lsh_bands(v, planesFlat, r)`
  * computes, for each band of `r` consecutive hyperplanes, the packed
  * sign-bit value `Σ_i (dot(v, plane_{b·r+i}) >= 0 ? 1L << i : 0)` and
  * returns the band array.
  *
  * Why native: the HOF form ([[graft.operators.Similarity.bandValues]])
  * evaluates `nBands × r` interpreted `aggregate(zip_with(...))` dot
  * products per row — per-element lambda dispatch with boxing, outside
  * whole-stage codegen. The banding kernel runs once per corpus row in the
  * near-dup and ANN pipelines (`dim × nPlanes` multiplies), which at corpus
  * scale makes it the hottest vector loop after cosine itself. This
  * expression compiles to one tight primitive loop.
  *
  * Semantics are bit-identical to the HOF form: each dot product is the
  * same index-order sequential sum, and the sign test is the same `>= 0`
  * (asserted bit-for-bit in DedupSimilaritySpec).
  *
  * Arguments: `v` array<double> (the vector), `planesFlat` array<double>
  * (the `nPlanes × dim` matrix flattened row-major — a foldable literal in
  * every caller), `r` int (planes per band). `nPlanes` is derived as
  * `planesFlat.length / v.length`.
  */
case class LshBands(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_bands"

  override def checkInputDataTypes(): TypeCheckResult = {
    def vec(t: DataType): Boolean = t match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (vec(first.dataType) && vec(second.dataType) && third.dataType == IntegerType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_lsh_bands requires (array<double>, array<double>, int), got " +
        s"(${first.dataType.sql}, ${second.dataType.sql}, ${third.dataType.sql})")
  }

  override protected def nullSafeEval(v: Any, planes: Any, r: Any): Any = {
    val x = v.asInstanceOf[ArrayData]
    val p = planes.asInstanceOf[ArrayData]
    val rows = r.asInstanceOf[Int]
    val dim = x.numElements()
    val nBands = if (dim == 0 || rows <= 0) 0 else p.numElements() / dim / rows
    val out = new Array[Long](nBands)
    var b = 0
    while (b < nBands) {
      var band = 0L
      var i = 0
      while (i < rows) {
        val off = (b * rows + i) * dim
        var dot = 0.0
        var j = 0
        while (j < dim) { dot += x.getDouble(j) * p.getDouble(off + j); j += 1 }
        if (dot >= 0) band |= 1L << i
        i += 1
      }
      out(b) = band
      b += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, p, r) => {
      val dim = ctx.freshName("dim"); val nBands = ctx.freshName("nBands")
      val out = ctx.freshName("out"); val b = ctx.freshName("b")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val off = ctx.freshName("off"); val dot = ctx.freshName("dot")
      val band = ctx.freshName("band")
      s"""
         |int $dim = $v.numElements();
         |int $nBands = ($dim == 0 || $r <= 0) ? 0 : $p.numElements() / $dim / $r;
         |long[] $out = new long[$nBands];
         |for (int $b = 0; $b < $nBands; $b++) {
         |  long $band = 0L;
         |  for (int $i = 0; $i < $r; $i++) {
         |    int $off = ($b * $r + $i) * $dim;
         |    double $dot = 0.0;
         |    for (int $j = 0; $j < $dim; $j++) {
         |      $dot += $v.getDouble($j) * $p.getDouble($off + $j);
         |    }
         |    if ($dot >= 0) $band |= 1L << $i;
         |  }
         |  $out[$b] = $band;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}
