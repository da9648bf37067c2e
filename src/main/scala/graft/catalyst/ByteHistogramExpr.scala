package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Normalized byte-value histogram over a binary payload — the
  * multimodal feature-extraction kernel ([[graft.multimodal.Multimodal
  * .byteHistogramFeatures]]).
  *
  * Replaces the `df.rdd.mapPartitions` formulation: pure byte
  * arithmetic has no codec seam justifying a drop out of Tungsten, so
  * it belongs in whole-stage codegen — one fused loop per payload, no
  * Row boxing, no RDD↔DataFrame round-trip, and the scan's column
  * pruning / filter pushdown survive (an RDD hop erases them).
  *
  * Bin of byte b (unsigned) = b·bins/256; counts normalized by payload
  * length (empty payload → all-zero vector, mirroring the previous
  * max(len,1) contract). Null payload → null.
  */
case class ByteHistogramExpr(child: Expression, bins: Int)
    extends UnaryExpression {

  require(bins > 0 && bins <= 256, s"bins must be in [1, 256], got $bins")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_histogram requires a binary argument, got ${child.dataType.simpleString}")

  override def nullSafeEval(input: Any): Any = {
    val payload = input.asInstanceOf[Array[Byte]]
    val counts = new Array[Long](bins)
    var i = 0
    while (i < payload.length) {
      counts((payload(i) & 0xff) * bins / 256) += 1
      i += 1
    }
    val n = math.max(payload.length, 1).toDouble
    val out = new Array[Double](bins)
    i = 0
    while (i < bins) { out(i) = counts(i) / n; i += 1 }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, payload => {
      val counts = ctx.freshName("counts")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      s"""
         |final long[] $counts = new long[$bins];
         |for (int $i = 0; $i < $payload.length; $i++) {
         |  $counts[(($payload[$i]) & 0xff) * $bins / 256]++;
         |}
         |final double $n = Math.max($payload.length, 1);
         |final double[] $out = new double[$bins];
         |for (int $i = 0; $i < $bins; $i++) { $out[$i] = $counts[$i] / $n; }
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ByteHistogramExpr =
    copy(child = newChild)
}
