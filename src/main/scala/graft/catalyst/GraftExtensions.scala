package graft.catalyst

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extension point: install with
  * `.config("spark.sql.extensions", "graft.catalyst.GraftExtensions")`
  * (or `withExtensions`). Injects:
  *  - SQL function `parse_magnitude(str)` — native codegen'd parser
  *  - SQL function `dot_product(arr, arr)` — fused similarity kernel
  *  - SQL function `byte_histogram(bin, bins)` — multimodal feature kernel
  *  - optimizer rule [[ApproxAboveThreshold]] — exact→approx percentile
  *    rewrite above a size threshold
  *  - optimizer rule [[ApproxDistinctAboveThreshold]] — exact
  *    count(DISTINCT) → HyperLogLog++ above a size threshold
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("parse_magnitude"),
      new ExpressionInfo(classOf[ParseMagnitudeExpr].getName, "parse_magnitude"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "parse_magnitude takes exactly one argument")
        ParseMagnitudeExpr(args.head)
      }))
    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProductExpr].getName, "dot_product"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "dot_product takes exactly two arguments")
        DotProductExpr(args(0), args(1))
      }))
    ext.injectFunction((
      new FunctionIdentifier("byte_histogram"),
      new ExpressionInfo(classOf[ByteHistogramExpr].getName, "byte_histogram"),
      (args: Seq[Expression]) => {
        require(args.length == 2, "byte_histogram takes (binary, bins)")
        val bins = args(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"byte_histogram bins must be an integer literal, got $other")
        }
        ByteHistogramExpr(args.head, bins)
      }))
    // Pre-CBO batch: runs ONCE per query, after operator optimization.
    // injectOptimizerRule would place it in the operator-optimization
    // FIXPOINT (up to 100 iterations/query); combined with the stats
    // walk the rule needs, that taxed the whole suite ~17%.
    ext.injectPreCBORule(_ => ApproxAboveThreshold)
    ext.injectPreCBORule(_ => ApproxDistinctAboveThreshold)
  }
}
