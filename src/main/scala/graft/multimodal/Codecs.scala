package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.{IIOImage, ImageIO}
import javax.sound.sampled.AudioSystem

/** Real media codecs over JDK-builtin libraries — no external deps:
  * `javax.imageio` (PNG/JPEG/BMP/GIF; animated GIF is the video path)
  * and `javax.sound.sampled` (WAV/PCM). This object IS the decode seam
  * that rounds 2–4 shipped as `StubDecoder`: kind is sniffed from magic
  * bytes, dimensions/channels/frame counts come from the actual
  * container headers, and pixel access does a full image decode.
  *
  * Everything here is per-row compute with no Spark dependency, invoked
  * from `mapPartitions` in [[Multimodal]] so codec init (reader lookup)
  * happens once per partition and payload bytes never leave executors.
  */
object Codecs {

  /** ImageIO's default decode path spools through a disk-backed cache
    * file per call — catastrophic for a 32-thread executor. In-memory
    * streams only. (Safe to set repeatedly; executors race benignly.) */
  ImageIO.setUseCache(false)

  final case class Meta(kind: String, width: Int, height: Int,
                        channels: Int, sampleRate: Int, nFrames: Int)

  val Unknown: Meta = Meta("unknown", 0, 0, 0, 0, 1)

  /** Container sniff from magic bytes (public file-format signatures). */
  def sniff(p: Array[Byte]): String = {
    def at(i: Int): Int = if (i < p.length) p(i) & 0xff else -1
    if (at(0) == 0x89 && at(1) == 'P' && at(2) == 'N' && at(3) == 'G') "image"
    else if (at(0) == 0xff && at(1) == 0xd8 && at(2) == 0xff) "image"
    else if (at(0) == 'B' && at(1) == 'M') "image"
    else if (at(0) == 'G' && at(1) == 'I' && at(2) == 'F' && at(3) == '8') "gif"
    else if (at(0) == 'R' && at(1) == 'I' && at(2) == 'F' && at(3) == 'F' &&
             at(8) == 'W' && at(9) == 'A' && at(10) == 'V' && at(11) == 'E') "audio"
    else "unknown"
  }

  /** Header-level decode: dimensions and channel count from the image
    * reader (header parse only — no pixel decode), frame count for
    * animated GIFs, WAV format fields from the RIFF header. Payloads
    * that no installed codec claims come back [[Unknown]] rather than
    * failing the partition. */
  def decode(p: Array[Byte]): Meta = sniff(p) match {
    case "image" | "gif" =>
      val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(p))
      try {
        val readers = ImageIO.getImageReaders(iis)
        if (!readers.hasNext) Unknown
        else {
          val r = readers.next()
          try {
            r.setInput(iis)
            val n = r.getNumImages(true)
            val channels = {
              val it = r.getImageTypes(0)
              if (it.hasNext) it.next().getNumComponents else 0
            }
            // multi-frame GIF = the container's video stand-in
            val kind = if (n > 1) "video" else "image"
            Meta(kind, r.getWidth(0), r.getHeight(0), channels, 0, math.max(n, 1))
          } finally r.dispose()
        }
      } catch { case _: Exception => Unknown } finally iis.close()
    case "audio" =>
      try {
        val aff = AudioSystem.getAudioFileFormat(new ByteArrayInputStream(p))
        val f = aff.getFormat
        Meta("audio", 0, 0, f.getChannels, f.getSampleRate.toInt,
          math.max(aff.getFrameLength, 1))
      } catch { case _: Exception => Unknown }
    case _ => Unknown
  }

  /** Full pixel decode → (width, height, sum over all pixels of
    * R+G+B). Channel-order independent, so it is stable across whatever
    * BufferedImage layout the decoder picks. Lossless formats (PNG)
    * round-trip exactly — the q71 oracle re-derives this sum from the
    * generator formula. */
  def pixelSum(p: Array[Byte]): Option[(Int, Int, Long)] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(p))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      var sum = 0L
      var y = 0
      while (y < img.getHeight) {
        var x = 0
        while (x < img.getWidth) {
          val rgb = img.getRGB(x, y)
          sum += ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
          x += 1
        }
        y += 1
      }
      Some((img.getWidth, img.getHeight, sum))
    }
  }

  def encodePng(img: BufferedImage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Deterministic RGB test image: channel value at pixel p (row-major),
    * channel c ∈ {R=0,G=1,B=2} is `(seed * 131 + 3p + c) mod 256`.
    * The q71 DuckDB oracle recomputes sums over this formula, so a green
    * row certifies a REAL PNG encode→decode round trip. */
  def synthPng(seed: Long, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val base = seed * 131L + 3L * p
        val r = java.lang.Math.floorMod(base, 256L).toInt
        val g = java.lang.Math.floorMod(base + 1L, 256L).toInt
        val b = java.lang.Math.floorMod(base + 2L, 256L).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1; p += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** Deterministic TEXTURED RGB image for the perceptual-dedup census
    * (q110): channel value at raster channel index i is
    * `(seed·131 + (seed mod 97)·i + i² [+ delta when i ≡ 0 (mod stride),
    * stride > 0]) mod 256`. The i² term decorrelates adjacent pixels —
    * under [[synthPng]]'s linear ramp every same-dimension pair of
    * images is spuriously "near" in dHash space (its bits only fire at
    * mod-256 wraps), which would drown the census. The (seed mod 97)·i
    * term breaks the SEED period: without it, any formula
    * f(seed mod 256, i) renders bit-identical images for seeds 256
    * apart, and at 50 k docs those identical families made the pair
    * census quadratic (2.65 M rows at gen-sf1 — the round-10 rehearsal
    * find); with the coprime second modulus, identical textures need
    * seed collisions mod 256·97, which a 50 k corpus doesn't contain.
    * All terms stay small and non-negative — no overflow, no
    * engine-specific mod — so the SQL oracle re-derives values exactly.
    * `stride > 0` plants a sparse perturbation: the near-identical copy
    * whose dHash differs in only a few bits. */
  def synthTexturedPng(seed: Long, w: Int, h: Int, stride: Int = 0,
                       delta: Int = 0): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    def v(i: Long): Int = {
      val bump = if (stride > 0 && i % stride == 0) delta.toLong else 0L
      java.lang.Math.floorMod(seed * 131L + (seed % 97L) * i + i * i + bump,
        256L).toInt
    }
    var p = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val i = 3L * p
        img.setRGB(x, y, (v(i) << 16) | (v(i + 1) << 8) | v(i + 2))
        x += 1; p += 1
      }
      y += 1
    }
    encodePng(img)
  }

  /** 56-bit difference hash (dHash) of a decoded image: an 8×8
    * nearest-neighbor luminance grid (lum = R+G+B — channel-order
    * independent like [[pixelSum]]), bit gy·7+gx set when
    * lum(gx,gy) > lum(gx+1,gy). 7 comparisons × 8 rows keeps the
    * signature in 56 bits — always positive, so band extraction and
    * the SQL oracle's 2^b sum need no signed-shift edge cases. The
    * sampling grid is the [[scaleNN]] convention (sx = gx·w / 8), so
    * the oracle re-derives the hash from the generator formula without
    * decoding anything. None for payloads no codec claims. */
  def dHash56(p: Array[Byte]): Option[Long] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(p))
      catch { case _: Exception => null }
    if (img == null) None
    else {
      val (w, h) = (img.getWidth, img.getHeight)
      val lum = Array.tabulate(8, 8) { (gy, gx) =>
        val sx = ((gx.toLong * w) / 8).toInt
        val sy = ((gy.toLong * h) / 8).toInt
        val rgb = img.getRGB(sx, sy)
        ((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)
      }
      var sig = 0L
      var gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 7) {
          if (lum(gy)(gx) > lum(gy)(gx + 1)) sig |= 1L << (gy * 7 + gx)
          gx += 1
        }
        gy += 1
      }
      Some(sig)
    }
  }

  /** Deterministic 16-bit mono PCM WAV (hand-built RIFF header, parsed
    * back by `javax.sound.sampled`). */
  def synthWav(seed: Long, sampleRate: Int, nSamples: Int): Array[Byte] = {
    val dataSize = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nSamples) {
      buf.putShort((java.lang.Math.floorMod(seed * 31L + i, 65536L) - 32768L).toShort)
      i += 1
    }
    buf.array()
  }

  /** Deterministic TEXTURED 16-bit mono PCM WAV (the audio analogue of
    * [[synthTexturedPng]], for the q116 perceptual-dedup census):
    * sample i = `((seed·31 + (1 + seed mod 1009)·i²) mod 65536) − 32768`.
    * The PER-DOC quadratic coefficient is the decisive design point: a
    * shared i² term (first attempt) made every clip's |amplitude|
    * envelope ride the same wrap structure — 8 k spurious near-pairs
    * at 500 docs — while a seed-scaled coefficient gives each doc its
    * own wrap frequency, so unrelated envelope bits decorrelate; the
    * coefficient modulus 1009 (prime, > any tested corpus / 50) keeps
    * in-range coefficient collisions — which at mod 89 produced a
    * 246 k-pair census at 50 k docs — to a handful; `stride > 0`
    * plants a sparse +`delta`
    * perturbation — the near-identical re-encode. All arithmetic is
    * small non-negative integers, exactly re-derivable in SQL. */
  def synthTexturedWav(seed: Long, sampleRate: Int, nSamples: Int,
                       stride: Int = 0, delta: Int = 0): Array[Byte] = {
    val dataSize = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits/sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0L
    while (i < nSamples) {
      val bump = if (stride > 0 && i % stride == 0) delta.toLong else 0L
      buf.putShort((java.lang.Math.floorMod(
        seed * 31L + (1L + seed % 1009L) * i * i + bump, 65536L) - 32768L).toShort)
      i += 1
    }
    buf.array()
  }

  /** 56-bit ENVELOPE signature of a decoded audio clip — the audio
    * dHash: the REAL `javax.sound` decode yields the PCM samples, the
    * clip splits into 57 contiguous windows (sample i belongs to window
    * `(57·i) / n`, integer division — the one convention both engines
    * share), and bit k compares the mean |amplitude| of window k
    * against window k+1 — via the exact integer cross-product
    * `sum_k·cnt_{k+1} > sum_{k+1}·cnt_k`, so no division ever happens
    * and the SQL oracle re-derives every bit from the generator
    * formula. Robust to constant gain the way dHash is to brightness.
    * None when no codec claims the payload. */
  def audioEnvelopeSig56(p: Array[Byte]): Option[Long] = {
    val samples =
      try {
        val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(p))
        try {
          val bytes = in.readAllBytes()
          val n = bytes.length / 2
          val out = new Array[Int](n)
          var i = 0
          while (i < n) {
            out(i) = ((bytes(2 * i) & 0xff) | (bytes(2 * i + 1) << 8)).toShort.toInt
            i += 1
          }
          out
        } finally in.close()
      } catch { case _: Exception => null }
    if (samples == null || samples.length == 0) None
    else {
      val n = samples.length
      val sum = new Array[Long](57)
      val cnt = new Array[Long](57)
      var i = 0
      while (i < n) {
        val k = ((57L * i) / n).toInt
        sum(k) += math.abs(samples(i))
        cnt(k) += 1
        i += 1
      }
      var sig = 0L
      var b = 0
      while (b < 56) {
        if (sum(b) * cnt(b + 1) > sum(b + 1) * cnt(b)) sig |= 1L << b
        b += 1
      }
      Some(sig)
    }
  }

  /** Deterministic animated GIF (the multi-frame/video fixture):
    * `frames` solid-tone frames via ImageIO's GIF sequence writer. */
  def synthGif(seed: Long, w: Int, h: Int, frames: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(out)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      var f = 0
      while (f < frames) {
        val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
        val tone = java.lang.Math.floorMod(seed * 17L + f * 9L, 256L).toInt
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { img.setRGB(x, y, (tone << 16) | (tone << 8) | tone); x += 1 }
          y += 1
        }
        writer.writeToSequence(new IIOImage(img, null, null),
          writer.getDefaultWriteParam)
        f += 1
      }
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** Nearest-neighbor scale (exact, interpolation-free — deterministic
    * across JVMs). Explicit pixel loop rather than `AffineTransformOp`,
    * which refuses palette-indexed sources (GIF frames decode as
    * TYPE_BYTE_INDEXED). */
  private def scaleNN(img: BufferedImage, targetW: Int, targetH: Int): BufferedImage = {
    val (sw, sh) = (img.getWidth, img.getHeight)
    val dst = new BufferedImage(targetW, targetH, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < targetH) {
      val sy = ((y.toLong * sh) / targetH).toInt
      var x = 0
      while (x < targetW) {
        dst.setRGB(x, y, img.getRGB(((x.toLong * sw) / targetW).toInt, sy))
        x += 1
      }
      y += 1
    }
    dst
  }

  /** Real image resize: decode → [[scaleNN]] → PNG re-encode. For
    * multi-frame inputs (animated GIF) this takes frame 0 only — the
    * output is honestly a single-frame image; use [[resizeFrames]] to
    * keep every frame. Returns None for payloads no codec claims
    * (caller passes the payload through unchanged). */
  def resizeImage(p: Array[Byte], targetW: Int, targetH: Int): Option[Array[Byte]] = {
    val img =
      try ImageIO.read(new ByteArrayInputStream(p))
      catch { case _: Exception => null }
    if (img == null) None
    else Some(encodePng(scaleNN(img, targetW, targetH)))
  }

  /** Frame-complete resize: every frame of a multi-frame container is
    * [[scaleNN]]-scaled and the result re-encoded as an animated GIF of
    * the same frame count (single-frame inputs re-encode as PNG, frame
    * count 1). Assumes full-raster frames, which is what [[synthGif]]
    * and any frame-sampled pipeline output produce; GIF delta-frames
    * with offsets would resize per-raster, not per-composite — a
    * documented limit of the JDK-only codec set. Returns the bytes and
    * the output frame count; None when no codec claims the payload. */
  def resizeFrames(p: Array[Byte], targetW: Int, targetH: Int): Option[(Array[Byte], Int)] = {
    val iis = ImageIO.createImageInputStream(new ByteArrayInputStream(p))
    try {
      val readers = ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val n = r.getNumImages(true)
          if (n <= 1) Some((encodePng(scaleNN(r.read(0), targetW, targetH)), 1))
          else {
            val out = new ByteArrayOutputStream()
            val ios = ImageIO.createImageOutputStream(out)
            val writer = ImageIO.getImageWritersByFormatName("gif").next()
            try {
              writer.setOutput(ios)
              writer.prepareWriteSequence(null)
              var f = 0
              while (f < n) {
                writer.writeToSequence(
                  new IIOImage(scaleNN(r.read(f), targetW, targetH), null, null),
                  writer.getDefaultWriteParam)
                f += 1
              }
              writer.endWriteSequence()
            } finally { writer.dispose(); ios.close() }
            Some((out.toByteArray, n))
          }
        } finally r.dispose()
      }
    } catch { case _: Exception => None } finally iis.close()
  }
}
