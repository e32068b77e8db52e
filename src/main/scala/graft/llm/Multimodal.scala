package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column conventions + processing plumbing (driver
  * north-star). Media payloads are opaque `binary` columns with a typed
  * metadata struct alongside — the schema a 100 TB image/audio/video lake
  * actually uses (payload stays columnar-compressed in parquet; metadata
  * is pruned/pushed independently of the blobs).
  *
  * The decode step is STUBBED (no image/audio libs in this container):
  * [[fakeDecodeFeatures]] derives a deterministic float feature vector
  * from the payload bytes, so the Spark-side plumbing — schema, batch
  * iteration, partition shape, feature arrays — is real and tested while
  * the codec call is an explicit seam to swap for a real decoder.
  */
object Multimodal {

  /** Canonical media schema: (media_id, payload binary, meta struct). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Build a media table from any (id, string-content) source — the
    * payload is the utf-8 encoding; width/height are deterministic fakes
    * derived from the payload hash (stand-ins for decoded dimensions). */
  def asMediaTable(df: DataFrame, id: Column, content: Column): DataFrame = {
    val payload = encode(content, "UTF-8")
    val h = md5(payload)
    df.select(
      id.cast("long").as("media_id"),
      payload.as("payload"),
      struct(
        lit("application/octet-stream").as("mime"),
        (pmod(conv(substring(h, 1, 8), 16, 10).cast("long"), lit(1920L)) + 1).cast("int").as("width"),
        (pmod(conv(substring(h, 9, 8), 16, 10).cast("long"), lit(1080L)) + 1).cast("int").as("height"),
        octet_length(payload).cast("long").as("n_bytes")).as("meta"))
  }

  /** STUB decode: deterministic pseudo-features from payload bytes.
    * Replace this seam with a real codec (e.g., JNI/ONNX) in production —
    * everything around it (partitioned batch iteration, fixed-dim float
    * output, null-payload passthrough) is the real contract. */
  def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return null
    val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
    val out = new Array[Float](dim)
    var i = 0
    while (i < dim) {
      val b = md(i % md.length) & 0xFF
      val mix = (b * 31 + i * 17) % 256
      // double arithmetic, single final rounding to float — reproducible
      // in the SQL oracle (no float/float double-rounding hazard)
      out(i) = ((mix / 255.0) - 0.5).toFloat
      i += 1
    }
    out
  }

  /** Feature-extraction pass: mapPartitions in batches (the Scala twin of
    * Arrow-batched `mapInPandas`) — one decoder instance per partition,
    * batched iteration so a real codec could amortize setup. Output:
    * (media_id, features array<float>). */
  def extractFeatures(spark: SparkSession, media: DataFrame, dim: Int,
                      batchSize: Int = 256): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      // per-partition "decoder" setup happens here, once
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val id = r.getLong(0)
          val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
          Row(id, fakeDecodeFeatures(payload, dim))
        }
      }
    }(enc)
  }

  /** STUB resize: crop the payload to the target dimension budget
    * (outW*outH bytes) — the deterministic stand-in for a real scaler.
    * Same mapPartitions batch shape as [[extractFeatures]] (one codec
    * instance per partition, batched rows), emitting the full media
    * schema with the meta struct updated to the new dimensions. */
  def resize(media: DataFrame, outW: Int, outH: Int, batchSize: Int = 256): DataFrame = {
    val enc = org.apache.spark.sql.Encoders.row(mediaSchema)
    val budget = outW * outH
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val id = r.getLong(0)
            val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            val resized =
              if (payload == null) null
              else if (payload.length <= budget) payload
              else java.util.Arrays.copyOfRange(payload, 0, budget)
            // null payload → null n_bytes: the mediaSchema convention
            // (asMediaTable's octet_length(NULL) is NULL, not 0)
            val n: Any = if (resized == null) null else resized.length.toLong
            Row(id, resized, Row(r.getString(2), outW, outH, n))
          }
        }
      }(enc)
  }

  /** "Frame sampling" for sequence media: split payload into fixed-size
    * frames, keep every `stride`-th — pure Column ops, fully pushed into
    * codegen. Emits (media_id, frame_idx, frame binary). */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame = {
    val nFrames = ceil(octet_length(col("payload")).cast("double") / frameBytes).cast("int")
    media
      .filter(col("payload").isNotNull && octet_length(col("payload")) > 0)
      .select(col("media_id"), col("payload"),
        explode(filter(sequence(lit(0), nFrames - 1), i => i % stride === 0)).as("frame_idx"))
      .select(col("media_id"), col("frame_idx"),
        substr(col("payload"), col("frame_idx") * frameBytes + 1, lit(frameBytes)).as("frame"))
  }

  /** Metadata-only scan: prunes the payload column entirely at the parquet
    * reader — the reason metadata lives beside, not inside, the blob. */
  def metaScan(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("meta.mime").as("mime"),
      col("meta.width").as("width"), col("meta.height").as("height"),
      col("meta.n_bytes").as("n_bytes"))
}
