package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column support: image/audio/video as opaque `binary`
  * payloads + typed metadata, with decode / feature-extraction /
  * frame-sampling as partition-wise transforms.
  *
  * The Spark-side plumbing is real and tested — schema contracts,
  * partition-preserving mapPartitions batches, feature vector shape —
  * while the actual codec call is STUBBED (this container ships no
  * image/audio libraries): [[StubDecoder.decode]] derives deterministic
  * pseudo-metadata from the payload bytes and is the single seam where
  * a real decoder (javacpp/ffmpeg/ImageIO) plugs in.
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
    StructField("sample_rate", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("n_bytes", LongType)))

  /** The decode seam. STUB: metadata is derived deterministically from
    * payload bytes (first-byte tag → kind; FNV-style hash → dims) so
    * every test is reproducible. A production build replaces ONLY this
    * object. */
  object StubDecoder {
    def decode(payload: Array[Byte]): (String, Int, Int, Int, Int) = {
      var h = 2166136261L
      var i = 0
      while (i < math.min(payload.length, 64)) {
        h = (h ^ (payload(i) & 0xffL)) * 16777619L
        i += 1
      }
      val kind = (if (payload.isEmpty) 0 else payload(0) & 0x03) match {
        case 0 => "image"
        case 1 => "audio"
        case 2 => "video"
        case _ => "unknown"
      }
      val width = 16 + math.floorMod(h, 1905).toInt
      val height = 16 + math.floorMod(h >> 11, 1065).toInt
      val sampleRate = if (kind == "audio") 8000 + math.floorMod(h >> 7, 5).toInt * 8000 else 0
      val nFrames = if (kind == "video") 1 + math.floorMod(h >> 17, 3000).toInt else 1
      (kind, width, height, sampleRate, nFrames)
    }
  }

  /** Attach a binary payload column (UTF-8 bytes of a string column —
    * the testdata stand-in for real media bytes). */
  def withPayload(df: DataFrame, from: String = "text",
                  to: String = "content"): DataFrame =
    df.withColumn(to, encode(col(from), "UTF-8"))

  /** Decode metadata partition-wise. Input needs (id long, content
    * binary); output adds a `meta` struct. Partition-preserving: no
    * shuffle, one decoder instance per partition. */
  def decodeMeta(df: DataFrame, idCol: String = "doc_id",
                 contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields :+ StructField("meta", MediaMetaType))
    val iIdx = inSchema.fieldIndex(contentCol)
    val rdd = df.rdd.mapPartitions { rows =>
      // decoder init happens once per partition here
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](iIdx)
        val (kind, w, h, sr, nf) = StubDecoder.decode(payload)
        Row.fromSeq(r.toSeq :+ Row(kind, w, h, sr, nf, payload.length.toLong))
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

  /** Resize: payload→payload partition-wise transform to target
    * dimensions, updating the metadata struct to match. STUB scaler:
    * the output payload is an even byte-resample of the input sized
    * proportionally to the pixel-count ratio (deterministic, so specs
    * pin exact lengths); a real build swaps in an image scaler at this
    * seam. Shape contract (binary in → binary out, meta rewritten,
    * partition-preserving, payload never leaves the executor) is the
    * part that matters — it is identical for the real codec. */
  def resize(df: DataFrame, targetW: Int, targetH: Int,
             contentCol: String = "content"): DataFrame = {
    val spark = df.sparkSession
    val inSchema = df.schema
    val cIdx = inSchema.fieldIndex(contentCol)
    val mIdx = inSchema.fieldIndex("meta")
    val rdd = df.rdd.mapPartitions { rows =>
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](cIdx)
        val meta = r.getStruct(mIdx)
        val (w, h) = (meta.getInt(1), meta.getInt(2))
        val ratio = (targetW.toLong * targetH).toDouble / math.max(w.toLong * h, 1L)
        val outLen = math.max((payload.length * ratio).toInt, 1)
        val out = new Array[Byte](outLen)
        var i = 0
        while (i < outLen) { // even resample over the source bytes
          out(i) = payload(((i.toLong * payload.length) / outLen).toInt)
          i += 1
        }
        val newMeta = Row(meta.getString(0), targetW, targetH,
          meta.getInt(3), meta.getInt(4), outLen.toLong)
        val vals = r.toSeq.updated(cIdx, out).updated(mIdx, newMeta)
        Row.fromSeq(vals)
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
}
