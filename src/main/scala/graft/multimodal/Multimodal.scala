package graft.multimodal

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extraction /
  * resize / frame-sampling as partition-wise transforms.
  *
  * The decode is REAL as of round 5: [[Codecs]] sniffs container magic
  * and parses PNG/JPEG/BMP/GIF through `javax.imageio` (animated GIF
  * doubles as the multi-frame/video fixture) and WAV through
  * `javax.sound.sampled` — JDK-builtin codecs, zero added dependencies.
  * The former `StubDecoder` is gone; q71 pins an encode→decode PNG
  * round trip against a DuckDB oracle that re-derives pixel sums from
  * the generator formula.
  *
  * 100 TB posture: payloads never leave executors; decode is
  * mapPartitions (one codec init per partition, not per row);
  * metadata-only queries prune the binary column at the parquet scan,
  * so analytic passes over metadata read none of the payload bytes.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("kind", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_bytes", LongType)))

  /** Attach a binary payload column (UTF-8 bytes of a string column —
    * the testdata stand-in for real media bytes). */
  def withPayload(df: DataFrame, from: String = "text",
                  to: String = "content"): DataFrame =
    df.withColumn(to, encode(col(from), "UTF-8"))

  /** Decode metadata partition-wise through the real codecs. Output
    * adds a `meta` struct; kind is sniffed from magic bytes, unclaimed
    * payloads come back kind='unknown' with true n_bytes (never a
    * partition failure). Partition-preserving: no shuffle. */
  def decodeMeta(df: DataFrame, contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("meta", MediaMetaType))
    val iIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // codec/reader lookup state initializes once per partition here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](iIdx)
        val m = Codecs.decode(payload)
        Row.fromSeq(r.toSeq :+ Row(m.kind, m.width, m.height, m.channels,
          m.sampleRate, m.nFrames, payload.length.toLong))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Feature extraction: normalized byte-value histogram (16 bins) as
    * a fixed-size feature vector — the plumbing shape of any embedding
    * extractor (binary in, float vector out). Pure byte arithmetic has
    * no codec seam, so unlike [[decodeMeta]] this stays a Catalyst
    * expression inside whole-stage codegen
    * ([[graft.catalyst.ByteHistogramExpr]]) — no RDD hop, scan pruning
    * and pushdown intact. */
  def byteHistogramFeatures(df: DataFrame, contentCol: String = "content",
                            bins: Int = 16): DataFrame =
    df.withColumn("features",
      graft.catalyst.native.byteHistogram(col(contentCol), bins))

  /** Resize: payload→payload partition-wise transform. Payloads a codec
    * claims take the REAL path — decode, nearest-neighbor scale, PNG
    * re-encode ([[Codecs.resizeImage]]) — and the metadata struct is
    * rewritten to describe the ACTUAL output: a single-frame RGB PNG,
    * so `kind='image'`, `n_frames=1` even when the input was a
    * multi-frame GIF (use [[resizeFrames]] to keep every frame).
    * Payloads no codec claims (text, audio, corrupt bytes) pass through
    * UNCHANGED — bytes and meta both — so mixed corpora never fail and
    * never inflate: the pre-r7 byte-resample fallback scaled opaque
    * payloads by targetW·targetH / (0·0 → 1), a ~1e6× memory blow-up
    * on any non-image row. Shape contract: binary in → binary out,
    * meta always describes the bytes, partition preserving, payload
    * never leaves the executor. */
  def resize(df: DataFrame, targetW: Int, targetH: Int,
             contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val cIdx = inSchema.fieldIndex(contentCol)
    val mIdx = inSchema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](cIdx)
        Codecs.resizeImage(payload, targetW, targetH) match {
          case Some(png) =>
            val meta = r.getStruct(mIdx)
            val newMeta = Row("image", targetW, targetH, 3,
              meta.getInt(4), 1, png.length.toLong)
            Row.fromSeq(r.toSeq.updated(cIdx, png).updated(mIdx, newMeta))
          case None => r // unclaimed payload: pass through, meta still true
        }
      }
    }
    spark.createDataFrame(rdd, inSchema)
  }

  /** Frame-complete resize: multi-frame payloads (animated GIF — the
    * video stand-in) have EVERY frame scaled and re-encoded as an
    * animated GIF with the same frame count, so `kind='video'` and
    * `n_frames` stay truthful; single-frame images re-encode as PNG
    * with `kind='image'`. Unclaimed payloads pass through unchanged,
    * same as [[resize]]. Same shape contract: partition preserving,
    * payloads stay on executors. */
  def resizeFrames(df: DataFrame, targetW: Int, targetH: Int,
                   contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val cIdx = inSchema.fieldIndex(contentCol)
    val mIdx = inSchema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](cIdx)
        Codecs.resizeFrames(payload, targetW, targetH) match {
          case Some((out, nFrames)) =>
            val meta = r.getStruct(mIdx)
            val kind = if (nFrames > 1) "video" else "image"
            val newMeta = Row(kind, targetW, targetH, 3,
              meta.getInt(4), nFrames, out.length.toLong)
            Row.fromSeq(r.toSeq.updated(cIdx, out).updated(mIdx, newMeta))
          case None => r
        }
      }
    }
    spark.createDataFrame(rdd, inSchema)
  }

  /** Frame sampling: every-k-th frame index list from decoded metadata —
    * pure Column arithmetic (no payload touch; scan prunes `content`). */
  def sampleFrames(df: DataFrame, every: Int = 30): DataFrame =
    df.withColumn("sampled_frames",
      when(col("meta.kind") === "video",
        sequence(lit(0), greatest(col("meta.n_frames") - 1, lit(0)), lit(every)))
        .otherwise(array(lit(0))))

  /** Metadata-only analytic pass: proves the binary column prunes out
    * of the scan when only `meta` fields are referenced. */
  def metaSummary(decoded: DataFrame): DataFrame =
    decoded.groupBy("meta.kind")
      .agg(count(lit(1)).as("n"),
           avg(col("meta.width")).as("avg_width"),
           sum(col("meta.n_bytes")).as("total_bytes"))
      .orderBy("kind")

  // ---- q71: oracle-checked real-codec round trip -----------------------

  /** Deterministic per-doc image dimensions (mirrored in [[q71Sql]]). */
  private def q71Dims(docId: Long): (Int, Int) =
    (8 + (docId % 24).toInt, 8 + ((docId / 3) % 16).toInt)

  /** Synthesize one formula PNG per document id: dims from [[q71Dims]],
    * pixels from [[Codecs.synthPng]]'s seed formula. mapPartitions so
    * the PNG encoder state is per-partition; input is a doc_id-only
    * scan (no text bytes read). */
  def synthImages(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val ids = docs.select("doc_id")
    val outSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("content", BinaryType)))
    val rdd = ids.rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val (w, h) = q71Dims(id)
        Row(id, Codecs.synthPng(id, w, h))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** q71: REAL ImageIO round trip, oracle-checkable. Synthesizes a
    * formula PNG per doc, decodes it back through the engine's codec
    * seam ([[decodeMeta]] for header metadata, [[Codecs.pixelSum]] for
    * the full raster), and emits per-doc decoded facts. The DuckDB
    * oracle recomputes width/height from the dim formula and pixel_sum
    * as Σ (doc_id·131 + i) mod 256 over i < 3wh — a hash-exact match is
    * only possible if the PNG encode→decode actually round-trips.
    * Map-only except the output sort; the doc table contributes one
    * narrow column. */
  def q71ImageDecode(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val decoded = decodeMeta(synthImages(docs))
    val inSchema = decoded.schema
    val cIdx = inSchema.fieldIndex("content")
    val outSchema = StructType(inSchema.fields :+ StructField("pix_sum", LongType))
    val withSum = spark.createDataFrame(
      decoded.rdd.mapPartitions { rows =>
        rows.map { r =>
          val s = Codecs.pixelSum(r.getAs[Array[Byte]](cIdx))
            .map(_._3).getOrElse(-1L)
          Row.fromSeq(r.toSeq :+ s)
        }
      }, outSchema)
    withSum.select(col("doc_id"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"),
        (col("meta.width").cast("long") * col("meta.height")).as("n_pixels"),
        col("pix_sum"))
      .orderBy("doc_id")
  }

  // ---- q110: perceptual image dedup (dHash + Hamming banding) ----------

  /** Planted near-identical images: every doc with id ≡ 3 (mod 7)
    * renders its BASE doc's (id − 3) image — same dims, same seed —
    * with [[Codecs.synthTexturedPng]]'s sparse perturbation (every
    * 97th channel +64), the image-corpus analogue of GenData's planted
    * near-dup documents. Everything derives from doc_id, so the DuckDB
    * oracle re-plants identically. */
  private val DedupStride = 97
  private val DedupDelta = 64
  private def q110Spec(docId: Long): (Long, Boolean) =
    if (docId >= 3 && docId % 7 == 3) (docId - 3, true) else (docId, false)

  /** q110: PERCEPTUAL image dedup — the multimodal leg of the dedup
    * surface (r9 verdict item 6: "image dedup is table stakes for a
    * multimodal corpus"). Per doc: synthesize the formula image
    * (planting per [[q110Spec]]), decode through the REAL ImageIO seam,
    * 56-bit dHash over the decoded raster ([[Codecs.dHash56]]); then
    * the q26/q27 machinery applied to image signatures — candidates
    * collide on any of four 14-bit Hamming bands, candidates only are
    * exact-verified with `bit_count(xor)` ≤ `maxDist`. Output: the
    * near-dup census (ida, idb, hamming).
    *
    * The oracle never decodes anything: it re-derives each dHash
    * arithmetically from the generator formula (dims, quadratic
    * texture, NN sampling grid, luminance sums, comparison bits) — a
    * hash-exact match certifies the whole decoded path, the q71
    * convention extended from pixel sums to a perceptual signature.
    *
    * Scale shape: signatures are 8 bytes/image computed map-side at the
    * codec seam (payloads never shuffle); the pair relation is the
    * banded equi-join — O(n) signature rows, collisions only — and
    * verification is one integer popcount per candidate. Band buckets
    * larger than `maxBand` are SKIPPED (the q22 DefaultMaxDf
    * convention, cap mirrored in the oracle): a real corpus carries
    * massive identical-image families — logo tiles, blank frames —
    * whose pair census is O(f²) per family; past the cap that family
    * is connected-component / canonical-keeper business (q56/q98's
    * shape), not a pair list. The same plan at 100 TB:
    * band-partitioned join over an 8-byte column, hot buckets gated. */
  /** (doc_id, sig) — every doc's image rendered (with planting),
    * decoded through the real codec seam, dHashed. THE map-side
    * signature relation of the image-dedup surface: 8 bytes per image,
    * payloads never leave the partition. */
  private[graft] def imageSigs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val sigSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("sig", LongType)))
    spark.createDataFrame(
      docs.select("doc_id").rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (seed, pert) = q110Spec(id)
          val (w, h) = q71Dims(seed)
          val png = Codecs.synthTexturedPng(seed, w, h,
            if (pert) DedupStride else 0, DedupDelta)
          Row(id, Codecs.dHash56(png).getOrElse(-1L))
        }
      }, sigSchema)
  }

  /** The 4×14-bit Hamming band rows of a signature relation. */
  private[graft] def sigBands(sigs: DataFrame): DataFrame =
    sigs.select(col("doc_id"), explode(expr(
        """transform(sequence(0, 3),
          |  k -> struct(k AS band, shiftright(sig, k * 14) & 16383 AS x))"""
          .stripMargin)).as("z"))
      .select(col("doc_id"), col("z.band").as("band"), col("z.x").as("x"))

  def q110ImageDedup(docs: DataFrame, maxDist: Int = 10,
                     maxBand: Int = 64): DataFrame = {
    // severed (review finding): the RDD-backed signature frame is read
    // by the band explode AND both verify sides — un-checkpointed, each
    // plan reference would re-synthesize and re-decode every image
    val sigs = imageSigs(docs).localCheckpoint()
    val bands = sigBands(sigs)
    // hot-bucket gate: buckets above maxBand are family business, not
    // pair business (see scaladoc); singleton buckets generate nothing
    val keep = bands.groupBy("band", "x").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBand)
      .select("band", "x")
    val gated = bands.join(keep, Seq("band", "x"), "left_semi")
    val cand = gated.as("p").join(gated.as("q"),
        col("p.band") === col("q.band") && col("p.x") === col("q.x") &&
          col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("ida"), col("q.doc_id").as("idb")).distinct()
    cand
      .join(sigs.select(col("doc_id").as("ida"), col("sig").as("sa")), "ida")
      .join(sigs.select(col("doc_id").as("idb"), col("sig").as("sb")), "idb")
      .select(col("ida"), col("idb"),
        expr("cast(bit_count(sa ^ sb) AS int)").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy("ida", "idb")
  }

  /** The arithmetic dHash re-derivation CTEs (spec → dims → grid →
    * lum → cmp → `sig(doc_id, sig)` → `bands`) — shared by q110Sql
    * and q114Sql; never decodes anything. */
  private def sigSqlCtes: String = {
    // channel value at raster channel index i, with the planted bump
    def chan(c: Int): String = {
      val i = s"(3 * (sy * w + sx) + $c)"
      s"((seed * 131 + (seed % 97) * $i + $i * $i" +
        s" + CASE WHEN pert AND $i % $DedupStride = 0" +
        s" THEN $DedupDelta ELSE 0 END) % 256)"
    }
    s"""spec AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id >= 3 AND doc_id % 7 = 3 THEN doc_id - 3
       |         ELSE doc_id END AS seed,
       |    (doc_id >= 3 AND doc_id % 7 = 3) AS pert
       |  FROM documents),
       |dims AS (SELECT doc_id, seed, pert,
       |    CAST(8 + seed % 24 AS BIGINT) AS w,
       |    CAST(8 + (seed // 3) % 16 AS BIGINT) AS h
       |  FROM spec),
       |grid AS (SELECT doc_id, seed, pert, w, h, gx.g AS gx, gy.g AS gy,
       |    (gx.g * w) // 8 AS sx, (gy.g * h) // 8 AS sy
       |  FROM dims, unnest(range(0, 8)) gx(g), unnest(range(0, 8)) gy(g)),
       |lum AS (SELECT doc_id, gx, gy,
       |    ${chan(0)} + ${chan(1)} + ${chan(2)} AS lum
       |  FROM grid),
       |cmp AS (SELECT a.doc_id, a.gy * 7 + a.gx AS b,
       |    CASE WHEN a.lum > bb.lum THEN 1 ELSE 0 END AS bit
       |  FROM lum a JOIN lum bb ON bb.doc_id = a.doc_id AND bb.gy = a.gy
       |    AND bb.gx = a.gx + 1
       |  WHERE a.gx < 7),
       |sig AS MATERIALIZED (SELECT doc_id,
       |    CAST(sum(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS sig
       |  FROM cmp GROUP BY doc_id),
       |bands AS (SELECT doc_id, k.k AS band, (sig >> (14 * k.k)) & 16383 AS x
       |  FROM sig, unnest(range(0, 4)) k(k))""".stripMargin
  }

  def q110Sql(maxDist: Int = 10, maxBand: Int = 64): String =
    s"""WITH $sigSqlCtes,
       |keep AS (SELECT band, x FROM bands GROUP BY band, x
       |         HAVING count(*) > 1 AND count(*) <= $maxBand),
       |gated AS (SELECT b.* FROM bands b JOIN keep k
       |          ON k.band = b.band AND k.x = b.x),
       |cand AS (SELECT DISTINCT p.doc_id AS ida, q.doc_id AS idb
       |  FROM gated p JOIN gated q
       |    ON p.band = q.band AND p.x = q.x AND p.doc_id < q.doc_id)
       |SELECT c.ida, c.idb,
       |  CAST(bit_count(xor(sa.sig, sb.sig)) AS INT) AS hamming
       |FROM cand c
       |JOIN sig sa ON sa.doc_id = c.ida
       |JOIN sig sb ON sb.doc_id = c.idb
       |WHERE bit_count(xor(sa.sig, sb.sig)) <= $maxDist
       |ORDER BY ida, idb""".stripMargin

  /** q114: IMAGE ADMISSION — the q73/q92 ingest-tick shape on
    * perceptual signatures, completing the multimodal dedup leg into
    * the admission loop: an incoming image batch (doc_id % 17 = 0, the
    * [[graft.operators.Provenance.BatchMod]] convention) is judged
    * against the already-ingested corpus's PERSISTED signature state —
    * `dup_image` when a cross-side band collision exact-verifies at
    * Hamming ≤ `maxDist` (hamming 0 covers byte-identical renders, so
    * no separate exact tier is needed at the signature level), `new`
    * otherwise; per-source report.
    *
    * Scale shape: the corpus contributes 8-byte signatures — the state
    * an [[graft.io.ArtifactStore.IngestStateStore]] accumulates per
    * tick exactly like text hashes (MultimodalSpec pins the
    * state-backed form ≡ this live one); the batch derives its
    * signatures map-side at the codec seam; candidates are cross-side
    * band collisions only (corpus-side hot buckets gated at `maxBand`,
    * the q110 cap); verification is one popcount per candidate. The
    * live form computes both sides from the one table so the DuckDB
    * oracle re-derives every signature arithmetically. */
  def q114ImageAdmission(docs: DataFrame, maxDist: Int = 10,
                         maxBand: Int = 64): DataFrame = {
    val m = pmod(col("doc_id"), lit(graft.operators.Provenance.BatchMod))
    val sigs = imageSigs(docs).localCheckpoint() // bands + both verify sides
    val corpusSigs = sigs.join(
      docs.filter(m =!= 0).select("doc_id"), Seq("doc_id"), "left_semi")
    val batchSigs = sigs.join(
      docs.filter(m === 0).select("doc_id"), Seq("doc_id"), "left_semi")
    val flagged = flaggedAgainstState(corpusSigs, batchSigs, maxDist, maxBand)
    docs.filter(m === 0).select(col("doc_id"), col("source"))
      .join(flagged, col("doc_id") === col("fid"), "left")
      .groupBy("source")
      .agg(count(lit(1)).as("n_batch"),
        count(col("fid")).as("n_dup_image"),
        (count(lit(1)) - count(col("fid"))).as("n_new"))
      .orderBy("source")
  }

  /** Batch docs flagged as perceptual dups of the STATE side:
    * (doc_id, fid) with fid = doc_id for flagged rows — cross-side
    * band collisions (state hot buckets gated) popcount-verified.
    * Shared by the live q114 and the state-backed admission
    * (MultimodalSpec). */
  private[graft] def flaggedAgainstState(stateSigs: DataFrame,
                                         batchSigs: DataFrame,
                                         maxDist: Int,
                                         maxBand: Int): DataFrame = {
    val sb = sigBands(stateSigs)
    val keep = sb.groupBy("band", "x").agg(count(lit(1)).as("bn"))
      .filter(col("bn") <= maxBand).select("band", "x")
    val gated = sb.join(keep, Seq("band", "x"), "left_semi")
      .select(col("doc_id").as("sid"), col("band"), col("x"))
    val cand = sigBands(batchSigs).join(gated, Seq("band", "x"))
      .select(col("doc_id"), col("sid")).distinct()
    cand
      .join(batchSigs.select(col("doc_id"), col("sig").as("bsig")), "doc_id")
      .join(stateSigs.select(col("doc_id").as("sid2"), col("sig").as("ssig")),
        col("sid") === col("sid2"))
      .filter(expr(s"bit_count(bsig ^ ssig) <= $maxDist"))
      .select(col("doc_id").as("fid")).distinct()
  }

  def q114Sql(maxDist: Int = 10, maxBand: Int = 64): String = {
    val bm = graft.operators.Provenance.BatchMod
    s"""WITH $sigSqlCtes,
       |cb AS (SELECT b.* FROM bands b
       |       WHERE b.doc_id % $bm <> 0),
       |keep AS (SELECT band, x FROM cb GROUP BY band, x
       |         HAVING count(*) <= $maxBand),
       |cbg AS (SELECT cb.doc_id AS sid, cb.band, cb.x FROM cb
       |        JOIN keep k ON k.band = cb.band AND k.x = cb.x),
       |bb AS (SELECT * FROM bands WHERE doc_id % $bm = 0),
       |cand AS (SELECT DISTINCT bb.doc_id, cbg.sid
       |         FROM bb JOIN cbg ON cbg.band = bb.band AND cbg.x = bb.x),
       |fz AS (SELECT DISTINCT c.doc_id AS fid
       |       FROM cand c
       |       JOIN sig sa ON sa.doc_id = c.doc_id
       |       JOIN sig sb ON sb.doc_id = c.sid
       |       WHERE bit_count(xor(sa.sig, sb.sig)) <= $maxDist)
       |SELECT d.source, count(*) AS n_batch, count(fz.fid) AS n_dup_image,
       |  count(*) - count(fz.fid) AS n_new
       |FROM documents d LEFT JOIN fz ON fz.fid = d.doc_id
       |WHERE d.doc_id % $bm = 0
       |GROUP BY d.source ORDER BY d.source""".stripMargin
  }

  // ---- q116: perceptual audio dedup (envelope sig + Hamming bands) -----

  /** Planted near-identical clips: every doc with id ≡ 2 (mod 5)
    * renders its base doc's (id − 2) clip — same seed, same length —
    * with a sparse +1000 perturbation every 101st sample. */
  private val AudioStride = 101
  private val AudioDelta = 1000
  private def q116Spec(docId: Long): (Long, Boolean) =
    if (docId >= 2 && docId % 5 == 2) (docId - 2, true) else (docId, false)
  private def q116Len(seed: Long): Int = (200 + seed % 150).toInt

  /** (doc_id, sig) — every doc's clip synthesized, decoded through the
    * real `javax.sound` seam, envelope-hashed. */
  private[graft] def audioSigs(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    val sigSchema = StructType(Seq(StructField("doc_id", LongType),
      StructField("sig", LongType)))
    spark.createDataFrame(
      docs.select("doc_id").rdd.mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val (seed, pert) = q116Spec(id)
          val wav = Codecs.synthTexturedWav(seed, 8000, q116Len(seed),
            if (pert) AudioStride else 0, AudioDelta)
          Row(id, Codecs.audioEnvelopeSig56(wav).getOrElse(-1L))
        }
      }, sigSchema)
  }

  /** q116: PERCEPTUAL audio dedup — the audio leg of the multimodal
    * dedup surface, completing image (q110) + audio: per doc a
    * deterministic PCM clip (planting per [[q116Spec]]) decoded through
    * the REAL `javax.sound` codec seam into a 56-bit envelope signature
    * ([[Codecs.audioEnvelopeSig56]]), then exactly the q110 census
    * machinery — four 14-bit Hamming bands gate candidates (hot buckets
    * capped), popcount verifies at ≤ `maxDist`. The DuckDB oracle
    * re-derives every signature arithmetically from the sample formula
    * (windowed |amplitude| sums compared by integer cross-products) —
    * the q71/q110 convention on a second modality, certifying the
    * whole decode→window→compare path. Scale shape identical to q110:
    * 8-byte signatures map-side, banded equi-join, popcount verify. */
  def q116AudioDedup(docs: DataFrame, maxDist: Int = 10,
                     maxBand: Int = 64): DataFrame = {
    // severed: same multi-reference argument as q110 (review finding)
    val sigs = audioSigs(docs).localCheckpoint()
    val bands = sigBands(sigs)
    val keep = bands.groupBy("band", "x").agg(count(lit(1)).as("bn"))
      .filter(col("bn") > 1 && col("bn") <= maxBand)
      .select("band", "x")
    val gated = bands.join(keep, Seq("band", "x"), "left_semi")
    val cand = gated.as("p").join(gated.as("q"),
        col("p.band") === col("q.band") && col("p.x") === col("q.x") &&
          col("p.doc_id") < col("q.doc_id"))
      .select(col("p.doc_id").as("ida"), col("q.doc_id").as("idb")).distinct()
    cand
      .join(sigs.select(col("doc_id").as("ida"), col("sig").as("sa")), "ida")
      .join(sigs.select(col("doc_id").as("idb"), col("sig").as("sb")), "idb")
      .select(col("ida"), col("idb"),
        expr("cast(bit_count(sa ^ sb) AS int)").as("hamming"))
      .filter(col("hamming") <= maxDist)
      .orderBy("ida", "idb")
  }

  def q116Sql(maxDist: Int = 10, maxBand: Int = 64): String =
    s"""WITH spec AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id >= 2 AND doc_id % 5 = 2 THEN doc_id - 2
       |         ELSE doc_id END AS seed,
       |    (doc_id >= 2 AND doc_id % 5 = 2) AS pert
       |  FROM documents),
       |sp AS (SELECT doc_id, seed, pert,
       |    CAST(200 + seed % 150 AS BIGINT) AS n
       |  FROM spec),
       |smp AS (SELECT doc_id, (57 * ii.i) // n AS k,
       |    abs(((seed * 31 + (1 + seed % 1009) * ii.i * ii.i
       |          + CASE WHEN pert AND ii.i % $AudioStride = 0
       |                 THEN $AudioDelta ELSE 0 END) % 65536) - 32768) AS a
       |  FROM sp, unnest(range(0, n)) ii(i)),
       |win AS (SELECT doc_id, k, CAST(sum(a) AS BIGINT) AS s,
       |          count(*) AS c
       |        FROM smp GROUP BY doc_id, k),
       |cmp AS (SELECT a.doc_id, a.k AS b,
       |    CASE WHEN a.s * bb.c > bb.s * a.c THEN 1 ELSE 0 END AS bit
       |  FROM win a JOIN win bb ON bb.doc_id = a.doc_id AND bb.k = a.k + 1
       |  WHERE a.k < 56),
       |sig AS MATERIALIZED (SELECT doc_id,
       |    CAST(sum(bit * (CAST(1 AS BIGINT) << b)) AS BIGINT) AS sig
       |  FROM cmp GROUP BY doc_id),
       |bands AS (SELECT doc_id, kk.k AS band, (sig >> (14 * kk.k)) & 16383 AS x
       |  FROM sig, unnest(range(0, 4)) kk(k)),
       |keep AS (SELECT band, x FROM bands GROUP BY band, x
       |         HAVING count(*) > 1 AND count(*) <= $maxBand),
       |gated AS (SELECT b.* FROM bands b JOIN keep k
       |          ON k.band = b.band AND k.x = b.x),
       |cand AS (SELECT DISTINCT p.doc_id AS ida, q.doc_id AS idb
       |  FROM gated p JOIN gated q
       |    ON p.band = q.band AND p.x = q.x AND p.doc_id < q.doc_id)
       |SELECT c.ida, c.idb,
       |  CAST(bit_count(xor(sa.sig, sb.sig)) AS INT) AS hamming
       |FROM cand c
       |JOIN sig sa ON sa.doc_id = c.ida
       |JOIN sig sb ON sb.doc_id = c.idb
       |WHERE bit_count(xor(sa.sig, sb.sig)) <= $maxDist
       |ORDER BY ida, idb""".stripMargin

  /** Oracle twin of [[q71ImageDecode]]: dims from the same formula,
    * pixel sum re-derived arithmetically (never decoding anything) —
    * agreement certifies the Spark side's real codec round trip. */
  def q71Sql: String =
    """WITH dims AS (
      |  SELECT doc_id,
      |         CAST(8 + doc_id % 24 AS INT) AS width,
      |         CAST(8 + (doc_id // 3) % 16 AS INT) AS height
      |  FROM documents),
      |flat AS (
      |  SELECT doc_id, width, height,
      |         unnest(generate_series(0, CAST(3 * width * height - 1 AS BIGINT))) AS i
      |  FROM dims)
      |SELECT doc_id, width, height, CAST(3 AS INT) AS channels,
      |       CAST(width AS BIGINT) * height AS n_pixels,
      |       CAST(sum((doc_id * 131 + i) % 256) AS BIGINT) AS pix_sum
      |FROM flat
      |GROUP BY doc_id, width, height
      |ORDER BY doc_id""".stripMargin
}
