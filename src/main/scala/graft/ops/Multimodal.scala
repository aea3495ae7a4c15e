package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing (north-rule addition): media as opaque
  * `binary` columns with typed metadata, plus decode / feature-extract /
  * frame-sample operators.
  *
  * ===== STUB BOUNDARY (video only) =====
  * REAL decoders exist for every format a bare JVM can parse:
  * PortableMedia decodes P6 images and PCM WAV with hand parsers and
  * PNG/JPEG/BMP/GIF through the JDK's built-in javax.imageio — all
  * oracle-gated (q43–q45). Only VIDEO remains a deterministic fake (no
  * JVM-built-in codec exists): those blobs carry a 16-byte synthetic
  * header (magic, format, width, height) generated from doc identity, and
  * "decode" parses that header. Everything Spark-side is REAL and
  * load-bearing at scale: the binary schema, the metadata struct,
  * partition sizing for large blobs, and the single-opaque-UDF batch
  * shape — swap `FakeCodec` for an MP4 codec and the pipeline is
  * unchanged.
  */
object Multimodal {

  val blobSchema: StructType = StructType(Seq(
    StructField("media_id", StringType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("blob", BinaryType, nullable = false)))

  val Magic: Int = 0x47424c42 // "GBLB"

  /** Deterministic fake blob: 16-byte header + size-varying payload.
    * Stands in for real media bytes so the plumbing is testable; all
    * fields are modular arithmetic of the numeric id so an external SQL
    * oracle can recompute them. */
  def synthesizeBlobs(df: DataFrame, idCol: String): DataFrame = {
    df.select(
      col(idCol).cast("string").as("media_id"),
      expr(s"element_at(array('image', 'audio', 'video'), CAST(($idCol * 7) % 3 + 1 AS INT))").as("media_type"),
      FakeCodec.encodeExpr(idCol).as("blob"))
  }

  /** Decode the typed metadata struct from the blob header — pure binary
    * slicing with built-ins (no UDF): real decoders replace only the
    * payload interpretation, not this plumbing. */
  def decodeMeta(df: DataFrame): DataFrame = {
    def beInt(start: Int) = // 4 bytes big-endian from 1-based offset
      expr(s"CAST(conv(hex(substring(blob, $start, 4)), 16, 10) AS BIGINT)")
    df.withColumn("meta", struct(
        beInt(1).as("magic"),
        beInt(5).as("format_id"),
        beInt(9).as("width"),
        beInt(13).as("height"),
        (length(col("blob")) - 16).as("payload_bytes")))
      .withColumn("valid", col("meta.magic") === Magic)
  }

  /** Feature extraction: a typed UDF over the blob column — the seam a
    * real decoder (vectorized Pandas UDF / JNI codec) plugs into. Unlike a
    * df.rdd round-trip, a column UDF keeps the rest of the projection in
    * Tungsten format and preserves column pruning and whole-stage codegen
    * around the single opaque call. The fake "feature" is a deterministic
    * 8-dim summary of the payload bytes. */
  private val featuresUdf = udf((blob: Array[Byte]) => FakeCodec.features(blob))

  def extractFeatures(df: DataFrame): DataFrame =
    df.withColumn("features", featuresUdf(col("blob"))) // seam: PortableMedia has the real codecs

  /** Frame sampling for "video" blobs: emit every `stride`-th frame offset
    * as (media_id, frame_idx, frame_off) — pure arithmetic explode, the
    * real pattern for clip extraction. */
  def sampleFrames(df: DataFrame, frameBytes: Int = 256, stride: Int = 10): DataFrame =
    df.where(col("media_type") === "video")
      .select(col("media_id"),
        posexplode(expr(
          s"sequence(0, greatest(CAST((length(blob) - 16) / $frameBytes AS INT) - 1, 0), $stride)")))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_off")
}

/** The deterministic stand-in codec — the ONLY fake part. */
object FakeCodec {
  /** Header(16B): magic | format | width | height, then payload bytes.
    * All fields are `id`-modular arithmetic (SQL-oracle recomputable). */
  def encodeExpr(idCol: String): org.apache.spark.sql.Column =
    expr(
      s"""unhex(concat(
         |  '${"%08X".format(Multimodal.Magic)}',
         |  lpad(hex(($idCol * 7) % 4), 8, '0'),
         |  lpad(hex(64 + ($idCol * 31) % 1985), 8, '0'),
         |  lpad(hex(64 + ($idCol * 37) % 1985), 8, '0'),
         |  repeat(lpad(hex($idCol % 256), 2, '0'),
         |         CAST(128 + ($idCol * 13) % 1024 AS INT))))""".stripMargin)

  /** Deterministic 8-dim byte-histogram summary so downstream plumbing
    * (ANN over features, quality filters) is exercised end to end. Real
    * pixel/sample decoders live in PortableMedia (P6/WAV hand parsers,
    * PNG/JPEG via javax.imageio) — this fake remains only for the `video`
    * media type, which no bare JVM can decode. */
  def features(blob: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 16 // skip header
    while (i < blob.length) { out((blob(i) & 0xff) % 8) += 1f; i += 1 }
    val n = math.max(blob.length - 16, 1).toFloat
    var j = 0
    while (j < 8) { out(j) /= n; j += 1 }
    out
  }
}
