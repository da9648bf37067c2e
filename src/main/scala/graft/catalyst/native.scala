package graft.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-API entry points for the native Catalyst expressions — usable
  * without installing [[GraftExtensions]] (SQL registration) on the
  * session. */
object native {

  /** Native magnitude-suffix parser (see [[ParseMagnitudeExpr]]): same
    * semantics as [[graft.functions.Parsers.parseMagnitude]], one
    * imperative scan per string instead of a regex when/otherwise tree
    * (~3× cheaper on the parse-heavy bench path). */
  def parseMagnitude(c: Column): Column =
    ColumnBridge.column(ParseMagnitudeExpr(ColumnBridge.expression(c)))

  /** Native fused dot product (see [[DotProductExpr]]): numerically
    * identical to the `aggregate(zip_with(...))` fold but one codegen'd
    * loop — the exact-similarity kernel for q24/q30/q34. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Native normalized byte histogram (see [[ByteHistogramExpr]]): the
    * multimodal feature kernel, inside whole-stage codegen. */
  def byteHistogram(c: Column, bins: Int): Column =
    ColumnBridge.column(ByteHistogramExpr(ColumnBridge.expression(c), bins))

  /** Native single-pass learned-BPE token counter (see
    * [[BpeTokenCountExpr]]): same result as the replace-chain
    * application, without 21 intermediate strings per row. */
  def bpeTokenCount(merges: Seq[String], text: Column): Column =
    ColumnBridge.column(BpeTokenCountExpr(ColumnBridge.expression(text), merges))

  /** Native single-pass Space-Saving heavy-hitter top-k (see
    * [[SpaceSavingTopK]]): one ObjectHashAggregate pass, returns
    * `array<struct<value, cnt, err>>`; err == 0 certifies cnt exact. */
  def spaceSavingTopK(c: Column, k: Int, capacity: Int): Column =
    ColumnBridge.column(SpaceSavingTopK(ColumnBridge.expression(c), k, capacity)
      .toAggregateExpression())
}
