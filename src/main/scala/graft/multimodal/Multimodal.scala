package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, functions => F}
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Assets are opaque `binary` columns plus a typed metadata struct. IMAGE
  * decode is REAL (round 11): [[decodeImage]] binds the JDK-shipped
  * `javax.imageio` codec inside a per-partition loop — the JVM analogue
  * of the reference's pandas_udf/mapInPandas pattern
  * (ann/index_inferers/hnswlib_index_inferer.py:17-46) — and
  * [[syntheticPngs]] manufactures deterministic real PNGs so decode
  * correctness is oracle-checkable (dimensions are a pure function of the
  * asset id). Audio/video codecs are NOT in the JDK; their decode keeps
  * the same mapPartitions shape with the codec call swapped in
  * ([[decodePartitioned]], retained as the documented template and test
  * fixture alongside [[decodeStub]]).
  */
object Multimodal {
  /** Canonical asset schema: id + bytes + declared format. */
  val assetSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("format", StringType, nullable = true),
  ))

  /** Metadata produced by decode: dimensions/duration + integrity hash. */
  val metaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("checksum", StringType, nullable = false),
    StructField("width", LongType, nullable = false),
    StructField("height", LongType, nullable = false),
  ))

  /** Wrap any table into fake binary assets (deterministic: bytes = UTF-8
    * of a text column). */
  def fakeAssets(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(F.col(idCol).cast("long").as("asset_id"),
      F.encode(F.col(textCol), "UTF-8").as("content"),
      F.lit("fake/img").as("format"))

  /** Deterministic REAL PNG per row, encoded executor-side with the JDK's
    * `javax.imageio` (no external dependency): dimensions are a pure
    * function of the id — width = 1 + (id mod maxDim),
    * height = 1 + (id·7 mod maxDim) — so a decode stage downstream has a
    * SQL-expressible ground truth, and pixels are a deterministic hash
    * fill. The per-partition loop (encoder init once, rows streamed) is
    * the exact integration shape a real ingest's decoder uses. */
  def syntheticPngs(df: DataFrame, idCol: String, maxDim: Int = 48): DataFrame = {
    require(maxDim >= 1, s"syntheticPngs: maxDim=$maxDim")
    val spark = df.sparkSession
    val m = maxDim
    val rdd = df.select(F.col(idCol).cast("long")).rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false) // no temp-file cache on executors
      rows.map { r =>
        val id = r.getLong(0)
        val w = 1 + java.lang.Math.floorMod(id, m.toLong).toInt
        val h = 1 + java.lang.Math.floorMod(id * 7L, m.toLong).toInt
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            img.setRGB(x, y, ((id * 2654435761L + x * 31L + y * 131L) & 0xffffffL).toInt)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        Row(id, bos.toByteArray, "image/png")
      }
    }
    spark.createDataFrame(rdd, assetSchema)
  }

  /** Decoded-image metadata schema: width/height are null when the bytes
    * are not a decodable image (`decode_ok` false) — corrupt assets are
    * REPORTED, not dropped and not fatal to the batch. */
  val imageMetaSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("byte_len", LongType, nullable = false),
    StructField("width", LongType, nullable = true),
    StructField("height", LongType, nullable = true),
    StructField("decode_ok", BooleanType, nullable = false),
  ))

  /** REAL image decode via `javax.imageio.ImageIO.read` (PNG/JPEG/GIF/BMP
    * ship in every JDK): per-partition codec binding, rows streamed
    * through — one decoded image in memory at a time, no driver
    * involvement, scales with partition count. Undecodable payloads yield
    * (decode_ok = false, null dims) instead of failing the task: at
    * 100 TB some assets WILL be corrupt and a poison row must not kill
    * the stage. */
  def decodeImage(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "content").rdd.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Exception => null }
        val len = if (bytes == null) 0L else bytes.length.toLong
        if (img == null) Row(id, len, null, null, false)
        else Row(id, len, img.getWidth.toLong, img.getHeight.toLong, true)
      }
    }
    spark.createDataFrame(rdd, imageMetaSchema)
  }

  /** STUB decode — TEST FIXTURE ONLY since round 11 (real decode:
    * [[decodeImage]]). Deterministic metadata from bytes:
    * width = 64 + len mod 512, height = 64 + (len*7) mod 512 — kept as
    * the expression-only twin for [[decodePartitioned]] parity specs. */
  def decodeStub(assets: DataFrame): DataFrame =
    assets.select(
      F.col("asset_id"),
      F.length(F.col("content")).cast("long").as("byte_len"),
      F.md5(F.col("content")).as("checksum"),
      (F.lit(64L) + F.pmod(F.length(F.col("content")).cast("long"), F.lit(512L))).as("width"),
      (F.lit(64L) + F.pmod(F.length(F.col("content")).cast("long") * 7, F.lit(512L))).as("height"),
    )

  /** mapPartitions-shaped decode TEMPLATE (test fixture since round 11):
    * identical output to `decodeStub` but routed through a per-partition
    * "codec" — the documented integration shape for codecs NOT in the JDK
    * (audio/video). For images the real binding exists: [[decodeImage]]. */
  def decodePartitioned(assets: DataFrame): DataFrame = {
    val spark = assets.sparkSession
    val rdd = assets.select("asset_id", "content").rdd.mapPartitions { rows =>
      // real impl: val codec = Codec.open() here, close on exhaustion
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val len = bytes.length.toLong
        val md = java.security.MessageDigest.getInstance("MD5")
        val checksum = md.digest(bytes).map("%02x".format(_)).mkString
        Row(id, len, checksum, 64L + len % 512L, 64L + (len * 7) % 512L)
      }
    }
    spark.createDataFrame(rdd, metaSchema)
  }

  /** Resize planning: fit (width, height) into a bounding box preserving
    * aspect ratio — the Spark-side arithmetic of a resize stage (the pixel
    * work itself belongs in the decodePartitioned codec body). Integer
    * scaling: out_w = min(maxW, w·maxH div h bounded), pure expressions. */
  def resizeDims(meta: DataFrame, maxW: Long, maxH: Long): DataFrame = {
    val w = F.col("width"); val h = F.col("height")
    // pick the binding side by cross-multiplication (exact long compare),
    // scale the other side with floor division — long products stay well
    // under 2^53, so the double quotient floors exactly
    val fitByWidth = (h * F.lit(maxW)) <= (w * F.lit(maxH)) // maxW/w <= maxH/h
    meta.select(F.col("asset_id"), w.as("width"), h.as("height"),
      F.when(fitByWidth, F.lit(maxW))
        .otherwise(F.floor((w * F.lit(maxH)) / h)).cast("long").as("out_w"),
      F.when(fitByWidth, F.floor((h * F.lit(maxW)) / w))
        .otherwise(F.lit(maxH)).cast("long").as("out_h"))
  }

  /** Feature extraction: 16-bin byte histogram per asset, L1-normalized —
    * a real (non-stub) content feature with the same per-partition
    * mapPartitions shape a learned-embedding extractor would use. */
  def byteHistogram(assets: DataFrame, bins: Int = 16): DataFrame = {
    val spark = assets.sparkSession
    val schema = StructType(Seq(
      StructField("asset_id", LongType, nullable = false),
      StructField("features", ArrayType(DoubleType, containsNull = false), nullable = false)))
    val b = bins
    val rdd = assets.select("asset_id", "content").rdd.mapPartitions { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]](1)
        val hist = new Array[Double](b)
        bytes.foreach { x => hist(((x & 0xff) * b) / 256) += 1.0 }
        val n = math.max(bytes.length, 1).toDouble
        Row(r.getLong(0), hist.map(_ / n).toSeq)
      }
    }
    spark.createDataFrame(rdd, schema)
  }

  /** "Frame sampling": slice every `stride`-th fixed-size block out of a
    * binary payload (the shape of video frame extraction — block offsets
    * computed as expressions, bytes sliced distributedly). */
  def sampleBlocks(assets: DataFrame, blockSize: Int, stride: Int): DataFrame =
    assets.select(F.col("asset_id"),
      F.posexplode(
        F.transform(
          F.sequence(F.lit(0),
            F.greatest(((F.length(F.col("content")) - blockSize) /
              (blockSize * stride)).cast("int"), F.lit(0))),
          i => F.substring(F.col("content"),
            (i * blockSize * stride + 1).cast("int"), F.lit(blockSize)))))
      .withColumnRenamed("pos", "block_idx")
      .withColumnRenamed("col", "block")
      .withColumn("block_len", F.length(F.col("block")).cast("long"))
}
