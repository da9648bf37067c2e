package graft.tools

import graft.GraftSession
import org.apache.spark.sql.{DataFrame, SparkSession}

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.time.{Instant, LocalDate, ZoneOffset}

/** Deterministic synthetic-data generator for SCALE REHEARSALS.
  *
  * The driver ships sf ∈ {0.001, 0.01, 0.1} (TESTDATA.md, read-only);
  * validating the engine's 100×-scale claims needs bigger inputs, so
  * this main regenerates the same star schema at an arbitrary sf with
  * the distributions measured from the driver's own tables:
  *
  *  - row counts: lineitem 6M·sf (l_orderkey uniform over 1.5M·sf
  *    orders ⇒ Poisson(4) lineitems/order incl. empty orders), events
  *    1M·sf over 15k·sf users, customer 150k·sf, part 200k·sf,
  *    supplier 10k·sf, documents 50k·sf, embeddings 20k·sf (min 500
  *    each), region/nation fixed;
  *  - values: uniform prices/quantities/dates with the driver's exact
  *    bounds and 2-dp rounding; events.value ~ Exp(mean 50); Zipf-free
  *    30-token document vocabulary with ~4.5 % planted near-dups
  *    (prefix-preserving tail mutation, 10 % `dup` marker tokens) and
  *    ~0.2 % exact dups; embeddings iid unit-normalized 64-dim floats
  *    with uniform labels 0–9.
  *
  * Everything is a pure function of (seed=42, table, row id) via a
  * splitmix64 mix — no sequential RNG state — so any row regenerates
  * independently on any executor and reruns are bit-identical. Each
  * table is written as ONE parquet file (driver layout) with 16 MiB row
  * groups so Spark still gets split parallelism at sf1.
  *
  * events.ts is written as raw LONG nanoseconds (Spark cannot write
  * parquet TIMESTAMP(NANOS)); `tools/events_ns.py` rewrites that one
  * column's logical type so the table round-trips like the driver's
  * (Spark: nanosAsLong; DuckDB: TIMESTAMP). Nanos are µs·1000 — DuckDB
  * truncates ns→µs on read, so sub-µs precision would diverge engines.
  *
  * Usage: runMain graft.tools.GenData <sf> <outDir>
  */
object GenData {

  val Seed = 42L

  // ---- splitmix64-style stateless hashing -------------------------------
  private def mix(x: Long): Long = {
    var z = x + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  /** Uniform 64-bit hash of (seed, parts…). */
  def h(parts: Long*): Long = {
    var a = mix(Seed)
    parts.foreach(p => a = mix(a ^ p))
    a
  }
  /** Uniform double in [0, 1). */
  def u(x: Long): Double = (x >>> 11) * (1.0 / (1L << 53))
  /** Uniform long in [0, n). */
  def mod(x: Long, n: Long): Long = java.lang.Math.floorMod(x, n)
  /** Zipf(s≈1) long in [0, n): inverse-CDF of the log-uniform law,
    * P(k) ≈ 1/((k+1)·ln n) — so key 0 alone draws ln2/ln(n) of all rows
    * (~4.9 % at n = 1.5M: a genuinely hot key at any sf). Used by the
    * skew-rehearsal mode for l_orderkey. */
  def zipf(x: Long, n: Long): Long =
    math.min(n - 1, math.exp(u(x) * math.log(n.toDouble)).toLong - 1).max(0)
  private def round2(x: Double): Double = math.rint(x * 100.0) / 100.0

  // ---- table ids (distinct hash streams per table/field) ----------------
  private object T {
    val Cust = 1L; val Supp = 2L; val Part = 3L; val Ord = 4L
    val Li = 5L; val Ev = 6L; val Doc = 7L; val Emb = 8L
  }

  // ---- row types (driver column names/order) ----------------------------
  case class Customer(c_custkey: Long, c_name: String, c_nationkey: Int,
                      c_acctbal: Double, c_mktsegment: String)
  case class Supplier(s_suppkey: Long, s_name: String, s_nationkey: Int,
                      s_acctbal: Double)
  case class PartRow(p_partkey: Long, p_name: String, p_brand: String,
                     p_type: String, p_size: Int, p_retailprice: Double)
  case class Order(o_orderkey: Long, o_custkey: Long, o_orderstatus: String,
                   o_totalprice: Double, o_orderdate: java.sql.Timestamp,
                   o_orderpriority: String)
  case class Lineitem(l_orderkey: Long, l_partkey: Long, l_suppkey: Long,
                      l_linenumber: Int, l_quantity: Double,
                      l_extendedprice: Double, l_discount: Double,
                      l_tax: Double, l_returnflag: String,
                      l_linestatus: String, l_shipdate: java.sql.Timestamp)
  case class Event(event_id: Long, ts: Long, user_id: Long,
                   event_type: String, value: Double, props: String)
  case class Doc(doc_id: Long, text: String, lang: String, source: String,
                 n_chars: Long)
  case class Emb(vec_id: Long, embedding: Array[Float], label: Int)

  // ---- vocabularies measured from the driver tables ---------------------
  private val MktSegments =
    Array("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")
  private val Priorities =
    Array("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val PartAdjs =
    Array("blue", "cold", "hot", "large", "new", "old", "red", "small")
  private val PartNouns =
    Array("anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget")
  private val PartTypes =
    Array("ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD")
  private val EventTypes =
    Array("click", "error", "purchase", "signup", "view")
  private val Regions =
    Array("AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST")
  private val OrderStatus = Array("F", "O", "P")
  private val ReturnFlags = Array("A", "N", "R")
  private val LineStatus = Array("F", "O")
  private val Vocab = Array(
    "spark", "window", "merge", "table", "column", "vector", "stream",
    "value", "data", "small", "join", "filter", "big", "group", "hash",
    "customer", "sort", "order", "slow", "line", "part", "fast", "the",
    "row", "agg", "key", "query", "a", "scan", "batch")

  // ---- date helpers (all-UTC midnights, like the driver) ----------------
  private val OrderDate0 = LocalDate.of(1995, 1, 1).toEpochDay
  private val OrderDate1 = LocalDate.of(2001, 8, 1).toEpochDay
  private val ShipDate0 = LocalDate.of(1995, 1, 2).toEpochDay
  private val ShipDate1 = LocalDate.of(2001, 11, 4).toEpochDay
  private def midnight(epochDay: Long): java.sql.Timestamp =
    java.sql.Timestamp.from(
      LocalDate.ofEpochDay(epochDay).atStartOfDay(ZoneOffset.UTC).toInstant)
  private val EventsNs0 = Instant.parse("2024-01-01T00:00:00Z").getEpochSecond * 1000000000L
  private val EventsSpanUs = 30L * 86400L * 1000000L // 30 days, µs granularity

  // ---- documents --------------------------------------------------------
  private def freshTokens(id: Long): Array[String] = {
    // ~1 % long docs (250–400 tokens) deliberately exceed the 202-token
    // point where the old `range(1, 201)` shingle oracle silently
    // truncated — they keep the q22/q23/q27/q28 parity non-vacuous now
    // that shinglesSql generates per-doc positions. The rest match the
    // driver's measured 10–100 token range.
    val n =
      if (u(h(T.Doc, id, 8L)) < 0.01) (250 + mod(h(T.Doc, id, 9L), 151)).toInt
      else (10 + mod(h(T.Doc, id, 1L), 91)).toInt
    Array.tabulate(n)(j => Vocab(mod(h(T.Doc, id, 2L, j.toLong), 30).toInt))
  }

  def docFor(id: Long): Doc = {
    val r = u(h(T.Doc, id, 0L))
    val toks: Array[String] =
      if (id >= 10 && r < 0.002) {
        // planted exact duplicate of a nearby fresh doc
        freshTokens(id - 1 - mod(h(T.Doc, id, 3L), 10))
      } else if (id >= 10 && r < 0.047) {
        // planted near-duplicate: keep a 60–90 % prefix, mutate the tail
        val src = freshTokens(id - 1 - mod(h(T.Doc, id, 3L), 10))
        val keep = math.max(1,
          (src.length * (0.6 + 0.3 * u(h(T.Doc, id, 4L)))).toInt)
        val tail = Array.tabulate(src.length - keep) { j =>
          val hj = h(T.Doc, id, 5L, j.toLong)
          if (u(hj) < 0.1) "dup" else Vocab(mod(mix(hj), 30).toInt)
        }
        src.take(keep) ++ tail
      } else freshTokens(id)
    val text = toks.mkString(" ")
    val langX = u(h(T.Doc, id, 6L))
    val lang =
      if (langX < 0.41) "en" else if (langX < 0.5575) "de"
      else if (langX < 0.705) "es" else if (langX < 0.8525) "fr" else "zh"
    Doc(id, text, lang, "src" + mod(h(T.Doc, id, 7L), 20), text.length.toLong)
  }

  // ---- embeddings -------------------------------------------------------
  def embFor(id: Long): Emb = {
    val g = new Array[Double](64)
    var j = 0
    while (j < 32) {
      val u1 = math.max(u(h(T.Emb, id, (2 * j).toLong)), 1e-12)
      val u2 = u(h(T.Emb, id, (2 * j + 1).toLong))
      val r = math.sqrt(-2.0 * math.log(u1))
      g(2 * j) = r * math.cos(2.0 * math.Pi * u2)
      g(2 * j + 1) = r * math.sin(2.0 * math.Pi * u2)
      j += 1
    }
    val norm = math.sqrt(g.map(x => x * x).sum)
    Emb(id, g.map(x => (x / norm).toFloat), mod(h(T.Emb, id, 99L), 10).toInt)
  }

  // ---- write helper: one parquet FILE per table (driver layout) ---------
  private def writeOne(df: DataFrame, outDir: String, name: String): Unit = {
    val tmp = s"$outDir/_tmp_$name"
    df.coalesce(1).write.mode("overwrite")
      .option("parquet.block.size", (16 * 1024 * 1024).toString)
      .parquet(tmp)
    val part = scala.util.Using.resource(Files.list(Paths.get(tmp))) { s =>
      s.filter(_.toString.endsWith(".parquet")).findFirst()
        .orElseThrow(() => new IllegalStateException(s"no part file in $tmp"))
    }
    Files.move(part, Paths.get(s"$outDir/$name.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    // clean the temp dir (part metadata markers)
    scala.util.Using.resource(Files.walk(Paths.get(tmp))) { s =>
      s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(p => Files.deleteIfExists(p))
    }
  }

  def generate(spark: SparkSession, sf: Double, outDir: String,
               zipfOrders: Boolean = false): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(outDir))

    def n(base: Long, min: Long = 0L): Long = math.max(min, (base * sf).toLong)
    val nCust = n(150000); val nSupp = n(10000); val nPart = n(200000)
    val nOrd = n(1500000); val nLi = n(6000000); val nEv = n(1000000)
    val nUsers = n(15000); val nDoc = n(50000, 500); val nEmb = n(20000, 500)

    writeOne(Seq.tabulate(5)(i => (i, Regions(i))).toDF("r_regionkey", "r_name"),
      outDir, "region")
    writeOne(Seq.tabulate(25)(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), outDir, "nation")

    writeOne(spark.range(0, nCust, 1, 32).map { id =>
      Customer(id, f"Customer#$id%09d", mod(h(T.Cust, id, 1L), 25).toInt,
        round2(-1000.0 + 11000.0 * u(h(T.Cust, id, 2L))),
        MktSegments(mod(h(T.Cust, id, 3L), 5).toInt))
    }.toDF(), outDir, "customer")

    writeOne(spark.range(0, nSupp, 1, 32).map { id =>
      Supplier(id, f"Supplier#$id%09d", mod(h(T.Supp, id, 1L), 25).toInt,
        round2(-1000.0 + 11000.0 * u(h(T.Supp, id, 2L))))
    }.toDF(), outDir, "supplier")

    writeOne(spark.range(0, nPart, 1, 32).map { id =>
      PartRow(id,
        PartAdjs(mod(h(T.Part, id, 1L), 8).toInt) + " " +
          PartNouns(mod(h(T.Part, id, 2L), 8).toInt),
        "Brand#" + (1 + mod(h(T.Part, id, 3L), 25)),
        PartTypes(mod(h(T.Part, id, 4L), 6).toInt),
        1 + mod(h(T.Part, id, 5L), 50).toInt,
        900.0 + mod(h(T.Part, id, 6L), 1000) / 10.0)
    }.toDF(), outDir, "part")

    val orderDateSpan = OrderDate1 - OrderDate0 + 1
    writeOne(spark.range(0, nOrd, 1, 32).map { id =>
      Order(id, mod(h(T.Ord, id, 1L), nCust),
        OrderStatus(mod(h(T.Ord, id, 2L), 3).toInt),
        round2(1000.0 + 499000.0 * u(h(T.Ord, id, 3L))),
        midnight(OrderDate0 + mod(h(T.Ord, id, 4L), orderDateSpan)),
        Priorities(mod(h(T.Ord, id, 5L), 5).toInt))
    }.toDF(), outDir, "orders")

    val shipDateSpan = ShipDate1 - ShipDate0 + 1
    val liKey: Long => Long =
      if (zipfOrders) id => zipf(h(T.Li, id, 1L), nOrd)
      else id => mod(h(T.Li, id, 1L), nOrd)
    writeOne(spark.range(0, nLi, 1, 32).map { id =>
      Lineitem(liKey(id), mod(h(T.Li, id, 2L), nPart),
        mod(h(T.Li, id, 3L), nSupp), 1 + mod(h(T.Li, id, 4L), 7).toInt,
        (1 + mod(h(T.Li, id, 5L), 50)).toDouble,
        round2(900.0 + 104100.0 * u(h(T.Li, id, 6L))),
        round2(0.10 * u(h(T.Li, id, 7L))),
        round2(0.08 * u(h(T.Li, id, 8L))),
        ReturnFlags(mod(h(T.Li, id, 9L), 3).toInt),
        LineStatus(mod(h(T.Li, id, 10L), 2).toInt),
        midnight(ShipDate0 + mod(h(T.Li, id, 11L), shipDateSpan)))
    }.toDF(), outDir, "lineitem")

    writeOne(spark.range(0, nEv, 1, 32).map { id =>
      Event(id, EventsNs0 + mod(h(T.Ev, id, 1L), EventsSpanUs) * 1000L,
        mod(h(T.Ev, id, 2L), nUsers),
        EventTypes(mod(h(T.Ev, id, 3L), 5).toInt),
        round2(-50.0 * math.log(1.0 - u(h(T.Ev, id, 4L)))),
        s"""{"k": ${mod(h(T.Ev, id, 5L), 100)}}""")
    }.toDF(), outDir, "events")

    writeOne(spark.range(0, nDoc, 1, 32).map(id => docFor(id)).toDF(), outDir, "documents")
    writeOne(spark.range(0, nEmb, 1, 32).map(id => embFor(id)).toDF(), outDir, "embeddings")
  }

  /** Usage: runMain graft.tools.GenData <sf> <outDir> [zipf] */
  def main(args: Array[String]): Unit = {
    val (sfStr, outDir) = (args(0), args(1))
    val zipfOrders = args.length > 2 && args(2) == "zipf"
    val spark = GraftSession.local(
      cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt,
      appName = "graft-gendata")
    generate(spark, sfStr.toDouble, outDir, zipfOrders)
    spark.stop()
  }
}
