package graft.io

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Row-order preservation at scale (SURVEY §1.1 / §7.4.2).
  *
  * The reference's row order is semantically meaningful: the input CSV
  * is market-cap rank order and the `Rank` column is dropped
  * (crypto_etl_pipeline.py:156), so position is the only remaining
  * carrier of ranking. A single-partition read preserves it trivially
  * (parity mode); on a multi-partition cluster read, order must be
  * carried EXPLICITLY, because every shuffle — repartition, AQE
  * coalescing, a join — is free to reorder rows.
  *
  * Contract: [[stamp]] at read time, while the frame still reflects
  * source order (before any shuffle); process on however many
  * partitions the cluster wants; [[restore]] once, at the output edge.
  * The id is `monotonically_increasing_id()` = (partitionIndex << 33) +
  * row-offset-within-partition: stable from the moment it is stamped
  * (it travels with the row through any shuffle), monotone within each
  * scan partition, and monotone ACROSS partitions in scan-partition
  * order — so sorting by it restores the stamped read's order. Gaps
  * between partitions are fine; only relative order matters.
  */
object RowOrder {

  val RowIdCol = "_row_id"

  /** Stamp the current read order into [[RowIdCol]]. Call on the frame
    * as read, before any wide transformation. Narrow and codegen'd —
    * adds no shuffle, no action. */
  def stamp(df: DataFrame): DataFrame =
    df.withColumn(RowIdCol, monotonically_increasing_id())

  def isStamped(df: DataFrame): Boolean = df.columns.contains(RowIdCol)

  /** Restore stamped order and drop the stamp — the output edge of the
    * pipeline. One range-partitioned sort (the only place the order
    * contract costs anything; at 100 TB it parallelizes across the
    * range, there is no single-partition funnel). */
  def restore(df: DataFrame): DataFrame = {
    require(isStamped(df), s"no $RowIdCol column to restore order from")
    df.orderBy(RowIdCol).drop(RowIdCol)
  }
}
