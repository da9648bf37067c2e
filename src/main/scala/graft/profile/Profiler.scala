package graft.profile

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Profiling model (reference A8–A13: ydata-profiling's computed
  * statistics re-expressed as Spark aggregates; SURVEY.md §2.3).
  *
  * Structure over HTML bytes: the reference ships two profiling report
  * HTMLs (cryptos_api_report.html, cryptos_kaggle_report.html,
  * crypto_etl_pipeline.py:261-287); parity means computing the same
  * statistic kinds — per-column numeric stats with quantiles and
  * histograms, string stats with top values, correlation matrix,
  * missing census, duplicate census, alerts — not the same bytes
  * (SURVEY §7.4.7).
  */
case class NumericProfile(
    name: String, dtype: String, nNonNull: Long, nMissing: Long,
    nDistinct: Long, nZeros: Long, nNegative: Long, nInfinite: Long,
    mean: Option[Double], min: Option[Double], max: Option[Double],
    std: Option[Double], skew: Option[Double], kurt: Option[Double],
    q05: Option[Double], q25: Option[Double], median: Option[Double],
    q75: Option[Double], q95: Option[Double],
    histogram: Seq[(Double, Double, Long)]) {
  def missingPct: Double =
    if (nNonNull + nMissing == 0) 0.0 else nMissing.toDouble / (nNonNull + nMissing)
  def iqr: Option[Double] = for (a <- q25; b <- q75) yield b - a
  def range: Option[Double] = for (a <- min; b <- max) yield b - a
  def cv: Option[Double] = for (s <- std; m <- mean if m != 0) yield s / m
}

case class StringProfile(
    name: String, nNonNull: Long, nMissing: Long, nDistinct: Long,
    minLen: Option[Long], maxLen: Option[Long], avgLen: Option[Double],
    topValues: Seq[(String, Long)])

case class TableProfile(
    nRows: Long, nCols: Int, nDuplicateRows: Long,
    numeric: Seq[NumericProfile], strings: Seq[StringProfile],
    correlations: Seq[(String, String, Double)], alerts: Seq[String],
    /** A10 second correlation method: Spearman rank correlation for the
      * same column pairs (ydata's correlation tab shows both). Listwise
      * semantics: rows with a null in any profiled numeric column drop
      * out (= pandas `df[cols].dropna().corr(method="spearman")`). */
    spearman: Seq[(String, String, Double)] = Seq.empty,
    /** A11 per-row missing patterns: null-flag bitstring (one char per
      * column, in [[columnNames]] order, '1' = null) → row count,
      * most frequent first. */
    columnNames: Seq[String] = Seq.empty,
    missingPatterns: Seq[(String, Long)] = Seq.empty,
    /** A12 head/tail sample rows, rendered as strings ("null" for null). */
    headRows: Seq[Seq[String]] = Seq.empty,
    tailRows: Seq[Seq[String]] = Seq.empty)

/** One-pass-per-concern profiler:
  *   pass 1 — one wide aggregate: every numeric stat (including exact
  *            quantiles) + string lengths + pairwise correlations + all
  *            null/zero/negative censuses, for every column at once;
  *   pass 2 — histograms for all numeric columns in ONE aggregate
  *            (bins need pass-1 min/max — a data-dependent barrier,
  *            same shape as the reference's quantile→fill dataflow);
  *   pass 3 — duplicate-row count (groupBy all columns);
  *   pass 4 — per-string-column top-k (k small; TakeOrdered per column).
  *
  * At 100 TB: pass 1 is a single scan with partial aggregation except
  * the exact percentiles (flip `approxQuantiles` on to make the whole
  * pass map-combinable); histograms stay one scan regardless.
  */
object Profiler {

  val DefaultBins = 10
  val DefaultTopK = 10

  /** Valve for the string top-k path: a column whose exact distinct
    * count (pass 1) exceeds this many values takes the heavy-hitter
    * sketch path instead of the exact full groupBy. −1 = never sketch.
    * Same pattern as the percentile valve
    * ([[graft.catalyst.ApproxAboveThreshold]]): small/parity workloads
    * keep exactness, 100 TB keeps liveness, no caller changes. */
  val TopkSketchThresholdKey = "spark.graft.profile.topkSketchThresholdDistinct"
  val DefaultTopkSketchThreshold = 100000L

  /** Observable for the valve spec (the ArtifactStore `trainRuns`
    * pattern): number of sketch-path top-k executions this JVM. */
  val sketchTopKRuns = new java.util.concurrent.atomic.AtomicLong

  /** Sub-valve INSIDE the sketch path: `true` (default) = the native
    * single-pass [[graft.catalyst.SpaceSavingTopK]] aggregate;
    * `false` = the original two-phase mapPartitions candidates + exact
    * recount. Both produce identical output (ProfilerSpec pins it);
    * the native path usually does it in ONE scan. */
  val TopkNativeKey = "spark.graft.profile.topkNativeEnabled"

  /** Observables for the native-path spec: single-pass executions, and
    * how many of those failed self-certification and recounted. */
  val nativeTopKRuns = new java.util.concurrent.atomic.AtomicLong
  val nativeRecountRuns = new java.util.concurrent.atomic.AtomicLong

  /** Exact top-k: full groupBy — one shuffle row per distinct value
    * per partition (map-side partials). The right path while distinct
    * counts are bounded; the scale problem is the shuffle growing with
    * column cardinality, not k. */
  def topKExact(df: DataFrame, c: String, topK: Int): Seq[(String, Long)] =
    df.filter(col(c).isNotNull).groupBy(c).count()
      .orderBy(desc("count"), asc(c)).limit(topK).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

  /** Heavy-hitter top-k for HIGH-cardinality columns — the sketch side
    * of the valve. Dispatches on [[TopkNativeKey]] between the native
    * single-pass aggregate ([[topKNative]], default) and the original
    * two-phase candidates-then-recount path ([[topKTwoPhase]]); both
    * keep the same contract — reported counts are exact, approximation
    * risk lives only in candidate selection, and a column with no
    * repeated values yields k count-1 values whose pure-lexicographic
    * selection no frequency sketch can (or should) reproduce. */
  def topKSketch(df: DataFrame, c: String, topK: Int): Seq[(String, Long)] = {
    sketchTopKRuns.incrementAndGet()
    if (df.sparkSession.conf.getOption(TopkNativeKey).forall(_.toBoolean))
      topKNative(df, c, topK)
    else topKTwoPhase(df, c, topK)
  }

  /** Heavy-hitter top-k, native form (the shape [[topKTwoPhase]]'s
    * scaladoc always named): ONE ObjectHashAggregate pass with the
    * [[graft.catalyst.SpaceSavingTopK]] `TypedImperativeAggregate` —
    * per-partition Space-Saving summaries (≤ capacity entries each)
    * merged by the aggregation itself, no mapPartitions, no candidate
    * union job. The result carries its own exactness certificate
    * (floor == 0 ⟹ every distinct value was tracked with an exact
    * count — see the expression's scaladoc); only when the certificate
    * FAILS does a second, candidate-restricted exact recount run — so
    * the common case is one scan, and the exactness contract of the
    * two-phase path is kept either way. Shuffle cost: capacity rows
    * per partition, independent of column cardinality. */
  def topKNative(df: DataFrame, c: String, topK: Int): Seq[(String, Long)] = {
    nativeTopKRuns.incrementAndGet()
    val spark = df.sparkSession
    import spark.implicits._
    val cap = math.max(topK * 20, 256)
    // ask for all `cap` tracked entries: the tail beyond topK is the
    // recount candidate set if certification fails, and the collect is
    // ≤ cap rows either way
    val row = df.filter(col(c).isNotNull)
      .agg(graft.catalyst.native.spaceSavingTopK(col(c), cap, cap).as("ss"))
      .select(col("ss.floor"), col("ss.top")).collect()(0)
    val entries = row.getSeq[org.apache.spark.sql.Row](1)
      .map(r => (r.getString(0), r.getLong(1)))
    if (row.getLong(0) == 0L) entries.take(topK)
    else {
      nativeRecountRuns.incrementAndGet()
      val cand = entries.map(_._1).toDF(c)
      df.filter(col(c).isNotNull)
        .join(broadcast(cand), Seq(c), "left_semi")
        .groupBy(c).count()
        .orderBy(desc("count"), asc(c)).limit(topK).collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
    }
  }

  /** Heavy-hitter top-k, two-phase form (kept as the
    * `TopkNativeKey = false` fallback and the parity yardstick):
    *  1. Per-partition Space-Saving (Metwally et al. 2005) with
    *     capacity max(20·k, 256): each partition emits ≤ capacity
    *     candidate values, and any value whose in-partition count
    *     exceeds partitionRows/capacity is GUARANTEED present (the
    *     Space-Saving bound) — so a genuinely frequent value survives
    *     into the candidate union.
    *  2. One exact recount restricted to the broadcast candidate set
    *     (semi-join): reported counts are EXACT for every candidate.
    * Shuffle cost: candidates × partitions rows, independent of column
    * cardinality — vs the exact path's distinct-values × partitions.
    * The candidate pass is the documented mapPartitions exception
    * (genuine per-partition imperative state — the state the native
    * [[graft.catalyst.SpaceSavingTopK]] aggregate now owns). */
  def topKTwoPhase(df: DataFrame, c: String, topK: Int): Seq[(String, Long)] = {
    val spark = df.sparkSession
    import spark.implicits._
    val cap = math.max(topK * 20, 256)
    val cand = df.select(col(c)).filter(col(c).isNotNull).as[String]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, Long]
        it.foreach { v =>
          if (m.contains(v) || m.size < cap) m(v) = m.getOrElse(v, 0L) + 1L
          else { // evict the current min; the newcomer inherits its count
            val (mk, mv) = m.minBy(_._2)
            m.remove(mk)
            m.update(v, mv + 1L)
          }
        }
        m.keysIterator
      }.distinct().toDF(c)
    df.filter(col(c).isNotNull)
      .join(broadcast(cand), Seq(c), "left_semi")
      .groupBy(c).count()
      .orderBy(desc("count"), asc(c)).limit(topK).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
  }

  /** Spearman rank-correlation matrix (the profiling suite's second
    * correlation method, SURVEY A10): per-column average ranks via the
    * grouped-CDF ([[graft.operators.RankStats.avgRanks]] — no global
    * row window), joined back by value, then ONE wide Pearson pass over
    * all rank columns. Cost: one value-join per column + one aggregate
    * scan; every join key table is bounded by column cardinality. */
  def spearmanMatrix(df: DataFrame, cols: Seq[String]): Seq[(String, String, Double)] = {
    // Listwise semantics for real: rank AFTER dropping rows with a null
    // in any profiled column (= pandas df[cols].dropna().corr("spearman")).
    // Ranking the full per-column population first would hand tie-averaged
    // ranks to rows that later drop out, skewing the surviving ranks when
    // nulls are staggered across columns.
    val base = df.select(cols.map(col): _*).na.drop(cols)
    // ONE shared prefix plan for every column (one sketch job + one
    // totals scan), not a pair of barrier jobs per column
    val rankTabs = graft.operators.RankStats.rankTables(base, cols)
    val ranked = cols.foldLeft(base) { (acc, c) =>
      val r = rankTabs(c)
        .withColumnsRenamed(Map("v" -> s"$c!v", "r" -> s"$c!rank"))
      acc.join(r, acc(c) === r(s"$c!v")).drop(s"$c!v")
    }
    val pairs = for { (a, i) <- cols.zipWithIndex; b <- cols.drop(i + 1) } yield (a, b)
    if (pairs.isEmpty) return Seq.empty
    val aggs = pairs.map { case (a, b) =>
      corr(col(s"$a!rank"), col(s"$b!rank")).as(s"$a!$b")
    }
    val row = ranked.agg(aggs.head, aggs.tail: _*).head()
    pairs.zipWithIndex.map { case ((a, b), i) =>
      (a, b, if (row.isNullAt(i)) Double.NaN else row.getDouble(i))
    }
  }

  def isNumeric(f: StructField): Boolean = f.dataType match {
    case _: NumericType => true
    case _ => false
  }

  def profile(df: DataFrame, bins: Int = DefaultBins, topK: Int = DefaultTopK,
              approxQuantiles: Boolean = false,
              withSpearman: Boolean = true): TableProfile = {
    val numCols = df.schema.fields.filter(isNumeric).map(_.name).toSeq
    val strCols = df.schema.fields.filter(_.dataType == StringType).map(_.name).toSeq
    val nRows = df.count()

    // ---- pass 1: one wide aggregate ----------------------------------
    def pct(c: String, q: Double): Column =
      if (approxQuantiles) expr(s"approx_percentile(`$c`, $q, 10000)").cast("double")
      else expr(s"percentile(`$c`, $q)")
    val numAggs = numCols.flatMap { c =>
      val d = col(c).cast("double")
      Seq(
        count(col(c)).as(s"$c!n"),
        sum(col(c).isNull.cast("long")).as(s"$c!miss"),
        countDistinct(col(c)).as(s"$c!dist"),
        sum((d === 0.0).cast("long")).as(s"$c!zeros"),
        sum((d < 0.0).cast("long")).as(s"$c!neg"),
        sum((isnan(d) || d === Double.PositiveInfinity || d === Double.NegativeInfinity)
          .cast("long")).as(s"$c!inf"),
        avg(d).as(s"$c!mean"), min(d).as(s"$c!min"), max(d).as(s"$c!max"),
        // Fisher-adjusted G1/G2 (pandas/ydata parity), not population g1/g2
        stddev_samp(d).as(s"$c!std"),
        graft.functions.Moments.skewG1(d).as(s"$c!skew"),
        graft.functions.Moments.kurtG2(d).as(s"$c!kurt"),
        pct(c, 0.05).as(s"$c!q05"), pct(c, 0.25).as(s"$c!q25"),
        pct(c, 0.5).as(s"$c!q50"), pct(c, 0.75).as(s"$c!q75"),
        pct(c, 0.95).as(s"$c!q95"))
    }
    val strAggs = strCols.flatMap { c =>
      Seq(
        count(col(c)).as(s"$c!n"),
        sum(col(c).isNull.cast("long")).as(s"$c!miss"),
        countDistinct(col(c)).as(s"$c!dist"),
        min(length(col(c)).cast("long")).as(s"$c!minlen"),
        max(length(col(c)).cast("long")).as(s"$c!maxlen"),
        avg(length(col(c))).as(s"$c!avglen"))
    }
    val corrPairs = for {
      (a, i) <- numCols.zipWithIndex; b <- numCols.drop(i + 1)
    } yield (a, b)
    val corrAggs = corrPairs.map { case (a, b) =>
      corr(col(a).cast("double"), col(b).cast("double")).as(s"$a!corr!$b")
    }
    val aggs = numAggs ++ strAggs ++ corrAggs
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def g[T](k: String): Option[T] = {
      val i = row.fieldIndex(k)
      if (row.isNullAt(i)) None else Some(row.getAs[T](i))
    }
    def gl(k: String): Long = g[Long](k).getOrElse(0L)

    // ---- pass 2: all histograms in one aggregate ---------------------
    val bounds = numCols.map(c => c -> (g[Double](s"$c!min"), g[Double](s"$c!max"))).toMap
    val histAggs = numCols.flatMap { c =>
      bounds(c) match {
        case (Some(lo), Some(hi)) if hi > lo =>
          val width = (hi - lo) / bins
          val bucket = least(floor((col(c).cast("double") - lo) / width), lit(bins - 1))
          (0 until bins).map(b => sum((bucket === b).cast("long")).as(s"$c!h$b"))
        case _ => Seq.empty
      }
    }
    val histRow =
      if (histAggs.nonEmpty) Some(df.agg(histAggs.head, histAggs.tail: _*).head())
      else None
    def hist(c: String): Seq[(Double, Double, Long)] = bounds(c) match {
      case (Some(lo), Some(hi)) if hi > lo =>
        val width = (hi - lo) / bins
        (0 until bins).map { b =>
          val n = histRow.map { r =>
            val i = r.fieldIndex(s"$c!h$b")
            if (r.isNullAt(i)) 0L else r.getLong(i)
          }.getOrElse(0L)
          (lo + b * width, lo + (b + 1) * width, n)
        }
      case _ => Seq.empty
    }

    // ---- pass 3: duplicate rows --------------------------------------
    val nDup = nRows - df.dropDuplicates().count()

    // ---- pass 3b: A11 per-row missing-pattern matrix -----------------
    // one groupBy over the null-flag bitstring (cardinality ≤ 2^nCols,
    // in practice a handful; partial-aggregates map-side), top patterns
    // by frequency — the reference report's missing-matrix condensed to
    // its distinct rows
    val patternCol = concat(df.columns.map(c => col(c).isNull.cast("int").cast("string")): _*)
    val missingPatterns = df.groupBy(patternCol.as("pattern")).count()
      .orderBy(desc("count"), asc("pattern")).limit(topK).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq

    // ---- pass 3c: A12 head/tail sample -------------------------------
    // limit() reads only leading partitions; tail() only trailing ones —
    // both bounded actions at any scale
    val sampleN = 5
    def fmtRows(rows: Array[org.apache.spark.sql.Row]): Seq[Seq[String]] =
      rows.toSeq.map(r => (0 until r.length).map(i =>
        if (r.isNullAt(i)) "null" else r.get(i).toString))
    val headRows = fmtRows(df.limit(sampleN).collect())
    val tailRows = fmtRows(df.tail(sampleN))

    // ---- pass 4: string top-k (valve-selected path) ------------------
    // Same discipline as the percentile valve (ApproxAboveThreshold):
    // exact below the threshold, sketch above — keyed here on the exact
    // per-column distinct count pass 1 already computed, so the valve
    // decision is free.
    val topkThresh = df.sparkSession.conf
      .getOption(TopkSketchThresholdKey).map(_.toLong)
      .getOrElse(DefaultTopkSketchThreshold)
    val tops = strCols.map { c =>
      c -> (if (topkThresh >= 0 && gl(s"$c!dist") > topkThresh)
              topKSketch(df, c, topK)
            else topKExact(df, c, topK))
    }.toMap

    val numeric = numCols.map { c =>
      NumericProfile(c, df.schema(c).dataType.simpleString,
        gl(s"$c!n"), gl(s"$c!miss"), gl(s"$c!dist"), gl(s"$c!zeros"),
        gl(s"$c!neg"), gl(s"$c!inf"),
        g[Double](s"$c!mean"), g[Double](s"$c!min"), g[Double](s"$c!max"),
        g[Double](s"$c!std"), g[Double](s"$c!skew"), g[Double](s"$c!kurt"),
        g[Double](s"$c!q05"), g[Double](s"$c!q25"), g[Double](s"$c!q50"),
        g[Double](s"$c!q75"), g[Double](s"$c!q95"), hist(c))
    }
    val strings = strCols.map { c =>
      StringProfile(c, gl(s"$c!n"), gl(s"$c!miss"), gl(s"$c!dist"),
        g[Long](s"$c!minlen"), g[Long](s"$c!maxlen"), g[Double](s"$c!avglen"),
        tops(c))
    }
    val correlations = corrPairs.flatMap { case (a, b) =>
      g[Double](s"$a!corr!$b").map(r => (a, b, r))
    }

    // ---- pass 5: Spearman matrix (A10's second method) ---------------
    val spearman =
      if (withSpearman && numCols.size >= 2) spearmanMatrix(df, numCols)
      else Seq.empty
    TableProfile(nRows, df.columns.length, nDup, numeric, strings,
      correlations, alerts(nRows, numeric, strings, correlations),
      spearman, df.columns.toSeq, missingPatterns, headRows, tailRows)
  }

  /** A13: thresholded alert rules over the computed stats — the same
    * alert kinds the reference reports surface. */
  def alerts(nRows: Long, numeric: Seq[NumericProfile],
             strings: Seq[StringProfile],
             correlations: Seq[(String, String, Double)]): Seq[String] = {
    val a = Seq.newBuilder[String]
    correlations.filter { case (_, _, r) => math.abs(r) > 0.9 }
      .foreach { case (x, y, r) => a += f"HIGH_CORRELATION: $x ~ $y (r=$r%.3f)" }
    numeric.foreach { p =>
      if (p.missingPct > 0.05) a += f"MISSING: ${p.name} (${p.missingPct * 100}%.1f%% missing)"
      if (p.nDistinct == 1 && p.nNonNull > 0) a += s"CONSTANT: ${p.name}"
      if (p.nNonNull > 0 && p.nZeros.toDouble / p.nNonNull > 0.1)
        a += f"ZEROS: ${p.name} (${p.nZeros} zeros)"
      if (p.skew.exists(s => math.abs(s) > 20)) a += s"SKEWED: ${p.name}"
    }
    strings.foreach { p =>
      if (p.nDistinct == p.nNonNull && p.nNonNull > 0) a += s"UNIQUE: ${p.name}"
      if (p.nDistinct == 1 && p.nNonNull > 0) a += s"CONSTANT: ${p.name}"
      if (p.topValues.headOption.exists(_._2.toDouble / math.max(p.nNonNull, 1) > 0.9))
        a += s"IMBALANCE: ${p.name}"
    }
    a.result()
  }
}
