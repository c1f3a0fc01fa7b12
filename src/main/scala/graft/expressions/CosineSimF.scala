package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

import graft.functions.Kernels

/** Cosine similarity between two `array<float>` embeddings as a native
  * Catalyst expression with hand-written codegen — the (b)-tier custom
  * operator path from the build contract (compose > custom Expression >
  * custom plan > mapPartitions). Semantically identical to
  * [[Kernels.cosineF]] (which remains the interpreted fallback and the
  * SQL-registered form): dot over the common prefix, zero-norm → 0.0.
  *
  * Versus the StaticInvoke dispatch used for the other kernels, the
  * generated loop reads the float slots of the two `ArrayData` values
  * directly inside the consuming WholeStageCodegen stage — no method
  * dispatch per row, no boxing, null handling via the standard
  * nullSafeCodeGen scaffolding. This sits in the inner loop of the ANN
  * operators (Similarity.bruteForceTopK scores |corpus|×|probes| pairs),
  * which is exactly where codegen depth pays at 100 TB.
  */
case class CosineSimF(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType): Boolean = t match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects (array<float>, array<float>), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }

  override def prettyName: String = "cosine_sim"

  protected override def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosineF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  protected override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val nA = ctx.freshName("nA")
      val nB = ctx.freshName("nB")
      val n = ctx.freshName("n")
      val na2 = ctx.freshName("na2")
      val nb2 = ctx.freshName("nb2")
      val dot = ctx.freshName("dot")
      val v = ctx.freshName("v")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      // float-op order mirrors Kernels.cosineF exactly (ascending-index
      // sums, sqrt, then divide) so results are bit-identical to the
      // interpreted path
      s"""
         |final int $nA = $a.numElements();
         |final int $nB = $b.numElements();
         |double $na2 = 0.0;
         |for (int $i = 0; $i < $nA; $i++) {
         |  final double $v = (double) $a.getFloat($i);
         |  $na2 += $v * $v;
         |}
         |double $nb2 = 0.0;
         |for (int $i = 0; $i < $nB; $i++) {
         |  final double $v = (double) $b.getFloat($i);
         |  $nb2 += $v * $v;
         |}
         |final double $na = Math.sqrt($na2);
         |final double $nb = Math.sqrt($nb2);
         |if ($na == 0.0 || $nb == 0.0) {
         |  ${ev.value} = 0.0;
         |} else {
         |  final int $n = Math.min($nA, $nB);
         |  double $dot = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $dot += (double) $a.getFloat($i) * $b.getFloat($i);
         |  }
         |  ${ev.value} = $dot / ($na * $nb);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimF =
    copy(left = newLeft, right = newRight)
}
