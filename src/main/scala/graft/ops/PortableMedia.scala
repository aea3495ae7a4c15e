package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** REAL multimodal decode for dependency-free formats.
  *
  * `Multimodal.FakeCodec` stays the declared seam for library-bound
  * formats (MP4/video need codecs no bare JVM ships); this object
  * removes the stub for the formats a JVM can parse with zero new
  * dependencies: binary PPM (P6) images and PCM WAV audio via hand
  * parsers, and PNG/JPEG/BMP/GIF via the JDK's built-in `javax.imageio`
  * (see decodeImage below). Synthesis writes REAL
  * format bytes with pixels/samples that are deterministic modular
  * arithmetic of the id, and decode is a REAL byte-level parser
  * (whitespace/comment-tolerant P6 header scan, RIFF chunk walk) — so the
  * DuckDB oracle can recompute the decoded statistics in closed form and
  * any encode/decode inconsistency surfaces as a value mismatch, not a
  * fixture tautology.
  *
  * Spark shape: the codec calls are single typed UDF columns (the one
  * opaque step, exactly the seam a vectorized/native codec would fill);
  * everything around them stays codegen'd columnar projection. Blobs are
  * value-sized (KBs); at 100 TB the operator is embarrassingly parallel
  * map work with no shuffle.
  */
object PortableMedia {

  // ------------------------------------------------------------ synthesis

  /** P6 image, w×h: R=(id·31+x+y)%256, G=(id·37+x)%256, B=(id·41+y)%256. */
  def ppmBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val header = s"P6\n# graft synthetic $id\n$w $h\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + w * h * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var p = header.length
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        out(p) = ((id * 31 + x + y) % 256).toByte
        out(p + 1) = ((id * 37 + x) % 256).toByte
        out(p + 2) = ((id * 41 + y) % 256).toByte
        p += 3; x += 1
      }
      y += 1
    }
    out
  }

  /** Mono 16-bit PCM WAV, n samples at `rate` Hz:
    * s(i) = ((id·7 + i·13) % 251) − 125. */
  def wavBytes(id: Long, n: Int, rate: Int): Array[Byte] = {
    val dataLen = n * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(rate).putInt(rate * 2).putShort(2).putShort(16)
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < n) { buf.putShort((((id * 7 + i * 13) % 251) - 125).toShort); i += 1 }
    buf.array()
  }

  private val synthImageUdf = udf { id: Long =>
    ppmBytes(id, (8 + id % 9).toInt, (8 + (id * 3) % 9).toInt)
  }
  private val synthWavUdf = udf { id: Long =>
    wavBytes(id, (64 + id % 129).toInt, 16000)
  }

  /** Real-format image blobs from a numeric id column. */
  def synthesizeImages(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("string").as("media_id"),
      synthImageUdf(col(idCol).cast("long")).as("blob"))

  /** Real-format audio blobs from a numeric id column. */
  def synthesizeWavs(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("string").as("media_id"),
      synthWavUdf(col(idCol).cast("long")).as("blob"))

  // -------------------------------------------------------------- decode

  case class ImageStats(width: Int, height: Int,
                        mean_r: Double, mean_g: Double, mean_b: Double)

  /** Parse binary PPM (P6): magic, whitespace/#-comment-tolerant header
    * ints (width, height, maxval), single whitespace, then w·h RGB
    * triples. Returns null on any malformed input. */
  def decodePpm(bytes: Array[Byte]): ImageStats = {
    if (bytes == null || bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return null
    var pos = 2
    def nextInt(): Int = {
      // skip whitespace and comments
      var inComment = false
      while (pos < bytes.length &&
        (inComment || bytes(pos).toChar.isWhitespace || bytes(pos) == '#')) {
        if (bytes(pos) == '#') inComment = true
        else if (bytes(pos) == '\n') inComment = false
        pos += 1
      }
      var v = -1
      while (pos < bytes.length && bytes(pos) >= '0' && bytes(pos) <= '9') {
        v = (if (v < 0) 0 else v) * 10 + (bytes(pos) - '0')
        pos += 1
      }
      v
    }
    val w = nextInt(); val h = nextInt(); val maxval = nextInt()
    if (w <= 0 || h <= 0 || maxval != 255) return null
    pos += 1 // exactly one whitespace byte after maxval
    // pixel size in Long: a hostile header like "50000 50000" overflows
    // Int (w*h*3 < 0) and would bypass the truncation check
    if (pos.toLong + w.toLong * h.toLong * 3L > bytes.length) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    var i = pos
    val end = pos + w * h * 3
    while (i < end) {
      sr += bytes(i) & 0xff; sg += bytes(i + 1) & 0xff; sb += bytes(i + 2) & 0xff
      i += 3
    }
    val n = (w * h).toDouble
    ImageStats(w, h, sr / n, sg / n, sb / n)
  }

  case class WavStats(sample_rate: Int, channels: Int, n_samples: Int, mean_abs: Double)

  /** Parse PCM WAV: RIFF/WAVE magic, then a chunk walk (tolerates extra
    * chunks and any fmt/data order); 16-bit little-endian MONO samples.
    * Returns null on malformed input, non-PCM-16 encodings, or
    * multi-channel audio (interleaved frames would silently double
    * n_samples and blend channels into mean_abs — reject rather than
    * mis-decode). */
  def decodeWav(bytes: Array[Byte]): WavStats = {
    if (bytes == null || bytes.length < 12) return null
    def ascii(off: Int, n: Int) = new String(bytes, off, n, "US-ASCII")
    if (ascii(0, 4) != "RIFF" || ascii(8, 4) != "WAVE") return null
    val bb = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var pos = 12
    var rate = -1; var channels = -1; var bits = -1
    var dataOff = -1; var dataLen = -1
    while (pos + 8 <= bytes.length) {
      val cid = ascii(pos, 4)
      val clen = bb.getInt(pos + 4)
      if (clen < 0 || pos + 8 + clen > bytes.length) return null
      cid match {
        case "fmt " =>
          if (clen < 16 || bb.getShort(pos + 8) != 1) return null // PCM only
          channels = bb.getShort(pos + 10)
          rate = bb.getInt(pos + 12)
          bits = bb.getShort(pos + 22)
        case "data" => dataOff = pos + 8; dataLen = clen
        case _ => // skip unknown chunk
      }
      pos += 8 + clen + (clen & 1) // chunks are word-aligned
    }
    if (rate < 0 || dataOff < 0 || bits != 16 || channels != 1) return null
    val n = dataLen / 2
    var s = 0L
    var i = 0
    while (i < n) { s += math.abs(bb.getShort(dataOff + i * 2).toLong); i += 1 }
    WavStats(rate, channels, n, if (n == 0) 0.0 else s.toDouble / n)
  }

  // ------------------------------------------- JDK ImageIO (PNG / JPEG)

  // ImageIO defaults to spooling streams through a disk cache dir — wrong
  // for executor threads (temp-file churn + a global cache-dir lock).
  // In-memory cache keeps the codec pure CPU work.
  javax.imageio.ImageIO.setUseCache(false)

  /** Pixel formula shared with ppmBytes, so every encoder feeds the same
    * closed-form oracle: R=(id·31+x+y)%256, G=(id·37+x)%256, B=(id·41+y)%256. */
  private def synthImage(id: Long, w: Int, h: Int): java.awt.image.BufferedImage = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val r = ((id * 31 + x + y) % 256).toInt
        val g = ((id * 37 + x) % 256).toInt
        val b = ((id * 41 + y) % 256).toInt
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }

  /** REAL PNG bytes via the JDK's built-in encoder — zero new deps.
    * Lossless, so decoded channel stats equal the PPM closed form. */
  def pngBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(synthImage(id, w, h), "png", bos)
    bos.toByteArray
  }

  /** REAL JPEG bytes (JDK encoder). Lossy — decoded stats only approximate
    * the closed form, so JPEG is spec-tested with tolerance, not
    * oracle-gated. */
  def jpegBytes(id: Long, w: Int, h: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(synthImage(id, w, h), "jpg", bos)
    bos.toByteArray
  }

  /** REAL decode for every ImageIO-registered container (PNG, JPEG, BMP,
    * GIF, WBMP — the JDK's built-ins). Same stats contract as decodePpm;
    * null on undecodable bytes. Row-buffered getRGB keeps it one pass. */
  def decodeImage(bytes: Array[Byte]): ImageStats = {
    if (bytes == null) return null
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth; val h = img.getHeight
    if (w <= 0 || h <= 0) return null
    var sr = 0L; var sg = 0L; var sb = 0L
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val p = row(x)
        sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
        x += 1
      }
      y += 1
    }
    val n = (w.toLong * h).toDouble
    ImageStats(w, h, sr / n, sg / n, sb / n)
  }

  private val synthPngUdf = udf { id: Long =>
    pngBytes(id, (8 + id % 9).toInt, (8 + (id * 3) % 9).toInt)
  }

  /** Real PNG blobs from a numeric id column — same dims/pixels as
    * synthesizeImages, different container. */
  def synthesizePngs(df: DataFrame, idCol: String): DataFrame =
    df.select(col(idCol).cast("string").as("media_id"),
      synthPngUdf(col(idCol).cast("long")).as("blob"))

  private val decodeImageUdf = udf(decodePpm _)
  private val decodeImageIOUdf = udf(decodeImage _)
  private val decodeWavUdf = udf(decodeWav _)

  /** Decoded per-image statistics through the JDK ImageIO codec
    * (PNG/JPEG/BMP/GIF): (media_id, width, height, mean RGB). */
  def decodeImagesIO(df: DataFrame): DataFrame =
    df.withColumn("img", decodeImageIOUdf(col("blob")))

  /** Decoded per-image statistics: (media_id, width, height, mean RGB). */
  def decodeImages(df: DataFrame): DataFrame =
    df.withColumn("img", decodeImageUdf(col("blob")))

  /** Decoded per-clip audio statistics. */
  def decodeWavs(df: DataFrame): DataFrame =
    df.withColumn("wav", decodeWavUdf(col("blob")))
}
