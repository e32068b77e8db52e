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
  * The metadata is REAL: [[asMediaTable]] derives format/width/height/
  * bit-depth by parsing container header bytes with the native
  * [[graft.functions.MediaDims]] expression (PNG IHDR / JPEG SOFn scan /
  * GIF logical screen) — no codec library, pure byte logic inside the
  * scan, exactly what a curation resolution-gate filters on. Only PIXEL
  * decode remains a stub ([[fakeDecodeFeatures]], an explicit seam for a
  * real codec), because feature extraction genuinely needs one.
  */
object Multimodal {

  /** Canonical media schema: (media_id, payload binary, meta struct). */
  val mediaSchema: StructType = StructType(Seq(
    // nullable: an orphan row whose id was lost upstream must DEGRADE
    // (NULL id propagates, both engines agree) — with nullable=false a
    // single such row kills the whole mapPartitions job with
    // ROW_VALUE_IS_NULL (r15 adversarial NULL-doc_id row, measured)
    StructField("media_id", LongType, nullable = true),
    StructField("payload", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("bit_depth", IntegerType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Ingest step: (id, payload) → media table with the meta struct
    * PARSED from the payload's container header bytes
    * ([[graft.functions.MediaDims]] — a codegen'd projection, so the
    * metadata materializes at scan speed with zero shuffles; downstream
    * filters read the struct and never touch the blob again). */
  def asMediaTable(df: DataFrame, id: Column, payload: Column): DataFrame = {
    val dims = graft.functions.MediaDims(payload)
    df.select(
      id.cast("long").as("media_id"),
      payload.as("payload"),
      struct(
        when(dims.getField("format") === "unknown",
          lit("application/octet-stream"))
          .otherwise(concat(lit("image/"), dims.getField("format"))).as("mime"),
        dims.getField("width").as("width"),
        dims.getField("height").as("height"),
        dims.getField("bit_depth").as("bit_depth"),
        octet_length(payload).cast("long").as("n_bytes")).as("meta"))
  }

  /** Deterministic test-corpus payload: REAL container header bytes
    * (format and dimensions chosen by id residues) followed by the
    * utf-8 content — so header parsing runs against genuine PNG/JPEG/GIF
    * byte layouts (variable JPEG segment lengths included, forcing a
    * real segment scan) without shipping binary fixtures. id % 4 == 3
    * gets NO header: the unknown-format path. The residue formula is
    * mirrored in the SQL oracles (entry/LlmQueries). */
  def syntheticPayload(id: Column, content: Column): Column = {
    val m = id
    val w = (m % 1920 + 1).cast("int")
    val h = ((m * 7) % 1080 + 1).cast("int")
    val w32 = lpad(hex(w), 8, "0"); val h32 = lpad(hex(h), 8, "0")
    val w16 = lpad(hex(w), 4, "0"); val h16 = lpad(hex(h), 4, "0")
    // PNG: sig, IHDR len 13, "IHDR", w/h u32 BE, depth 8|16, colour-type
    // 6 + compression/filter/interlace 0, fake CRC
    val png = concat(lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
      w32, h32, when(m % 2 === 0, lit("08")).otherwise(lit("10")),
      lit("06000000" + "DEADBEEF"))
    // JPEG: SOI, APP0 of VARIABLE length L, COM of variable length LC,
    // then SOF0 (len 11, precision 8, h/w u16 BE, 1 component)
    val L = (m % 8 + 16).cast("int"); val LC = (m % 5 + 4).cast("int")
    val zeros = lit("0" * 64)
    val app0 = concat(lit("FFE0"), lpad(hex(L), 4, "0"),
      zeros.substr(lit(1), (L - 2) * 2))
    val com = concat(lit("FFFE"), lpad(hex(LC), 4, "0"),
      zeros.substr(lit(1), (LC - 2) * 2))
    val sof = concat(lit("FFC0" + "000B" + "08"), h16, w16, lit("01" + "011100"))
    val jpeg = concat(lit("FFD8"), app0, com, sof)
    // GIF89a: w/h u16 LITTLE-endian, packed byte carrying colour
    // resolution in bits 4-6, background + aspect
    val wLe = concat(substring(w16, 3, 2), substring(w16, 1, 2))
    val hLe = concat(substring(h16, 3, 2), substring(h16, 1, 2))
    val gif = concat(lit("474946383961"), wLe, hLe,
      lpad(hex((m % 8) * 16), 2, "0"), lit("0000"))
    val hdr = when(m % 4 === 0, png).when(m % 4 === 1, jpeg)
      .when(m % 4 === 2, gif).otherwise(lit(""))
    concat(unhex(hdr), encode(content, "UTF-8"))
  }

  /** STUB pixel decode: deterministic pseudo-features from the payload's
    * LOWERCASE HEX rendering (both engines hex-render bytes identically
    * and DuckDB's md5 only accepts VARCHAR — the q_media_frames
    * discipline). Replace this seam with a real codec (e.g., JNI/ONNX)
    * in production — everything around it (partitioned batch iteration,
    * fixed-dim float output, null-payload passthrough) is the real
    * contract; header METADATA no longer goes through here (it parses
    * natively via [[graft.functions.MediaDims]]). */
  def fakeDecodeFeatures(payload: Array[Byte], dim: Int): Array[Float] = {
    if (payload == null) return null
    val hexChars = "0123456789abcdef"
    val hx = new Array[Byte](payload.length * 2)
    var p = 0
    while (p < payload.length) {
      hx(2 * p) = hexChars((payload(p) >> 4) & 0xF).toByte
      hx(2 * p + 1) = hexChars(payload(p) & 0xF).toByte
      p += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5").digest(hx)
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
      StructField("media_id", LongType, nullable = true),
      StructField("features", ArrayType(FloatType), nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.select(col("media_id"), col("payload")).mapPartitions { it =>
      // per-partition "decoder" setup happens here, once
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          // boxed: a NULL id row degrades instead of killing the job
          val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
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
    media.select(col("media_id"), col("payload"), col("meta.mime").as("mime"),
        col("meta.bit_depth").as("bit_depth"))
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          batch.iterator.map { r =>
            val id: Any = if (r.isNullAt(0)) null else r.getLong(0)
            val payload = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
            val resized =
              if (payload == null) null
              else if (payload.length <= budget) payload
              else java.util.Arrays.copyOfRange(payload, 0, budget)
            // null payload → null n_bytes: the mediaSchema convention
            // (asMediaTable's octet_length(NULL) is NULL, not 0);
            // bit depth passes through — scaling changes dims, not depth
            val n: Any = if (resized == null) null else resized.length.toLong
            Row(id, resized, Row(r.getString(2), outW, outH, r.get(3), n))
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
      col("meta.bit_depth").as("bit_depth"), col("meta.n_bytes").as("n_bytes"))

  /** Content-defined chunking dedup over binary payloads — the
    * storage-dedup primitive (LBFS/Rabin lineage; FastCDC is the
    * production variant): a chunk boundary falls after byte i wherever
    * the hash of the `window`-byte window ending at i is ≡ 0 mod
    * `divisor`, so boundaries are ALIGNMENT-ROBUST — inserting one byte
    * near the front of a payload shifts every fixed-size block but
    * leaves all content-defined chunks after the edit identical, which
    * is exactly why shared-chunk mass detects duplicated media content
    * that offset-based blocking misses. Average chunk ≈ `divisor`
    * bytes; a payload shorter than `window` is one chunk.
    *
    * Byte semantics ride the LOWERCASE HEX rendering of the payload on
    * both engines (DuckDB cannot md5/substring a BLOB — the
    * q_media_frames discipline), so window and chunk hashes are
    * hex-string md5s, bit-identical across engines for ANY bytes.
    *
    * Emits per media: (media_id, n_bytes, n_chunks, n_shared,
    * shared_bytes) where a chunk is SHARED when its (hash, length)
    * occurs in ≥ 2 distinct media — per-media shared mass is the
    * storage-dedup yield estimate, and Σ shared_bytes/Σ n_bytes the
    * corpus figure.
    *
    * Plan shape: boundary detection and chunk slicing are per-payload
    * projections (posexplode over byte positions feeding one
    * collect_list back on the SAME media key — one media-keyed
    * exchange); chunk sharing is one (hash, len) aggregate plus a
    * broadcast-size join back. SEAM note: the per-position explode
    * materializes n rows per payload, fine for the KB-scale payloads
    * here; MB-scale media wants the boundary scan fused into one
    * native Expression pass (the MediaDims pattern) — the plumbing
    * (hex semantics, chunk table, share join) stays identical. */
  /** Boundary-hash fold constants: the qualityRules bounded-polynomial
    * discipline (TextAnalysis GramP) — per-step mod keeps the
    * accumulator < 2⁴², so acc·K + byte < 2⁶³, no Java wraparound; K
    * is small enough that every byte still perturbs all divisor
    * residues. */
  private val ChunkK = 1000003L
  private val ChunkP = 4398042316799L // prime < 2^42

  def cdcChunkStats(media: DataFrame, window: Int = 8,
                    divisor: Int = 32): DataFrame = {
    // spread first: documents.parquet is a single split at bench scale
    // and the per-byte fold below is the expensive projection (the
    // qualityRules spreadToCores lesson; no-op at lake scale)
    val ph = graft.core.Xform.spreadToCores(media
      .filter(col("payload").isNotNull && octet_length(col("payload")) > 0)
      .select(col("media_id"), lower(hex(col("payload"))).as("ph"),
        octet_length(col("payload")).cast("long").as("n_bytes")))
    // Window hash = 8-step integer polynomial fold reading the hex
    // DIRECTLY per position. Two rejected forms: md5-per-window paid a
    // 32-char digest + parse per position (~1.6M windows at sf0.1:
    // 6.1 s); a pre-decoded bytes-array column gets INLINED into the
    // position lambda by CollapseProject (the transform is
    // single-referenced, so the rule collapses it into the consuming
    // projection), re-decoding the whole payload once per position —
    // O(bytes²) per payload, minutes at sf0.1. Reading `ph` (a plain
    // scan attribute, nothing to inline) keeps the fold linear.
    // DuckDB's list_reduce has no explicit zero but seeds with the
    // first element — identical to Spark's aggregate from 0 here,
    // since (0·K + b₀) % P = b₀.
    def winHash(i: Column): Column = aggregate(
      sequence(lit(0L), lit(window - 1L)),
      lit(0L),
      (a, j) => (a * ChunkK +
        conv(col("ph").substr(((i - window + 1L + j) * 2L - 1L).cast("int"),
          lit(2)), 16, 10).cast("long")) % ChunkP)
    // Boundary positions: i in [window, n_bytes-1], window = bytes
    // (i-window, i]. Everything stays INSIDE one projection as
    // higher-order lambdas over the position array — an explode would
    // carry the payload once per position (O(bytes²) row volume). The
    // candidate array is guarded empty when n_bytes-1 < window:
    // Spark's sequence(a, b) auto-steps DOWNWARD for b < a and would
    // mint phantom positions past the payload end.
    val cuts = concat(
      array(lit(0L)),
      filter(
        when(col("n_bytes") - 1L >= window,
          sequence(lit(window.toLong), col("n_bytes") - 1L))
          .otherwise(array().cast("array<long>")),
        i => winHash(i) % divisor === 0L),
      array(col("n_bytes")))
    // persisted: the chunk table feeds both the share aggregate and the
    // join back (untracked, the hex chunk chain would run twice)
    val chunks = graft.core.Caches.track(ph
      .select(col("media_id"), col("ph"), cuts.as("cuts"))
      .select(col("media_id"),
        // chunks hash inside the transform so the hex string never
        // rides the explode — only (hash, len) pairs leave the row
        explode(expr(
          "transform(sequence(0, size(cuts) - 2), " +
            "k -> named_struct(" +
            "'ch', md5(substring(ph, CAST(2*cuts[k] + 1 AS INT), " +
            "CAST(2*(cuts[k+1] - cuts[k]) AS INT))), " +
            "'l', cuts[k+1] - cuts[k]))")).as("c"))
      .filter(col("c.l") > 0L)
      .select(col("media_id"), col("c.ch").as("ch"), col("c.l").as("clen")))
    val share = chunks.groupBy(col("ch"), col("clen"))
      .agg(countDistinct(col("media_id")).as("n_media"))
    chunks.join(share, Seq("ch", "clen"))
      .groupBy(col("media_id"))
      .agg(sum(col("clen")).as("n_bytes"),
        count(lit(1)).as("n_chunks"),
        sum(when(col("n_media") >= 2L, 1L).otherwise(0L)).as("n_shared"),
        sum(when(col("n_media") >= 2L, col("clen")).otherwise(0L)).as("shared_bytes"))
  }

  /** 64-bit perceptual difference hash (dHash, the aHash/pHash family's
    * robust member): sample the media to an 8×9 grayscale grid, emit
    * bit (r,c) = grid(r,c) > grid(r,c+1) — 8 row-gradient bits × 8
    * rows. Gradient SIGNS survive brightness/contrast shifts and
    * re-encodes that change every byte of the container, which is why
    * perceptual near-dup finds re-encoded images exact/CDC dedup
    * cannot.
    *
    * STUB decode seam (the [[fakeDecodeFeatures]] contract): the
    * "grayscale grid" here samples the PAYLOAD BYTES at 72 evenly
    * spaced offsets — cell i reads byte floor(i·(n−1)/71) off the
    * lowercase-hex rendering (the engine-pair byte accessor) — a
    * deterministic stand-in for decode→resize(9×8)→luma. Swap the grid
    * for a real codec at the [[extractFeatures]] seam; the dHash layer
    * (gradient bits, 4×16-bit bands, the banded hamming join) is the
    * real, scale-tested operator.
    *
    * Emits (media_id, b0..b3, phash): four 16-bit band values — rows
    * 2j,2j+1 of the bit matrix, bit (r%2)·8+c — plus the 16-hex-char
    * rendering. Bands keep every value < 2¹⁶, so no sign games at bit
    * 63 on either engine. Zero-byte payloads drop (nothing to hash).
    *
    * Shape: a pure projection over the payload scan — 72 shared
    * hex-read subexpressions per row, zero shuffles, codegen'd. */
  def dHash(media: DataFrame): DataFrame = {
    // one native pass over the raw bytes ([[graft.functions
    // .DHashBands]]) — the hex-string + 72×substr Column form walked
    // the string per cell (UTF8String.substring is front-scanning),
    // measured 1.2 s → 0.35 s at sf0.1
    val bands = graft.functions.DHashBands(col("payload"))
    media
      .filter(col("payload").isNotNull && octet_length(col("payload")) > 0)
      .select(col("media_id"), bands.as("bs"))
      .select(col("media_id"),
        element_at(col("bs"), 1).as("b0"), element_at(col("bs"), 2).as("b1"),
        element_at(col("bs"), 3).as("b2"), element_at(col("bs"), 4).as("b3"))
      .withColumn("phash", lower(concat(
        lpad(hex(col("b0")), 4, "0"), lpad(hex(col("b1")), 4, "0"),
        lpad(hex(col("b2")), 4, "0"), lpad(hex(col("b3")), 4, "0"))))
  }

  /** Audio-style energy segmentation over payloads — frame energy,
    * silence count (energy-gated VAD) and the speech ratio, via the
    * one-pass [[graft.functions.MediaEnergyStats]] scan. Returns
    * (media_id, n_frames, n_silent, energy_q, silence_ratio);
    * zero-byte payloads emit (0, 0, 0, NULL). */
  def energyScan(media: DataFrame, frameBytes: Int = 16,
                 threshold: Long = 20000L): DataFrame =
    media.filter(col("payload").isNotNull)
      .select(col("media_id"),
        graft.functions.MediaEnergyStats(col("payload"), frameBytes,
          threshold).as("es"))
      .select(col("media_id"), col("es.n_frames").as("n_frames"),
        col("es.n_silent").as("n_silent"),
        col("es.energy_q").as("energy_q"),
        when(col("es.n_frames") === 0L, lit(null).cast("double"))
          .otherwise(col("es.n_silent").cast("double") /
            col("es.n_frames").cast("double")).as("silence_ratio"))

  /** Perceptual near-dup pairs: media whose dHashes differ in ≤
    * `maxDist` of the 64 gradient bits. Banded candidate generation
    * (the [[graft.llm.Dedup.simhashPairs]] discipline): a pair within
    * hamming ≤ 3 must agree EXACTLY on ≥ 1 of the 4 16-bit bands
    * (pigeonhole), so candidates come from 4 equality self-joins on
    * (band_idx, band_value) — never an all-pairs scan — and the
    * verify step is 4 xor/bit_counts on the already-carried bands.
    * Emits (id1, id2, hamming), id1 < id2, deduped across bands. */
  def dHashPairs(media: DataFrame, maxDist: Int = 3): DataFrame = {
    // tracked persist: both sides of the band self-join read the
    // signature table — uncached, the payload-synth + 72-cell hex
    // projection runs once per side (measured 2.1 s → 1.2 s at sf0.1)
    val sig = graft.core.Caches.track(dHash(media))
    val bandArr = array((0 until 4).map(i =>
      struct(lit(i).as("band_idx"),
        Seq(col("b0"), col("b1"), col("b2"), col("b3"))(i)
          .as("band_bits"))): _*)
    val probes = sig.select(col("media_id"), col("b0"), col("b1"),
        col("b2"), col("b3"), explode(bandArr).as("p"))
      .select(col("media_id"), col("b0"), col("b1"), col("b2"), col("b3"),
        col("p.band_idx").as("band_idx"), col("p.band_bits").as("band_bits"))
    val ham = (0 until 4).map(i => bit_count(
        Seq(col("a.b0"), col("a.b1"), col("a.b2"), col("a.b3"))(i)
          .bitwiseXOR(Seq(col("b.b0"), col("b.b1"), col("b.b2"),
            col("b.b3"))(i))).cast("long"))
      .reduce(_ + _)
    probes.as("a").join(probes.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_bits") === col("b.band_bits") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("id1"), col("b.media_id").as("id2"),
        ham.as("hamming")).distinct()
      .filter(col("hamming") <= maxDist)
  }
}
