package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for a training-data pipeline: image/audio/video
  * payloads ride as opaque `binary` columns with a typed metadata struct;
  * decode / feature-extraction runs per-partition in batches.
  *
  * The actual codec step is STUBBED — image/audio libraries are not in this
  * container — behind `DecodeStub`, a deterministic fake keyed on the payload
  * bytes. Everything Spark-side (schema, batch iteration shape, partition
  * sizing, pure-function contract, output schema) is real and tested; a
  * production deploy swaps `DecodeStub.decodeImage` for a JNI/FFI codec with
  * the same signature.
  *
  * Scale notes: `mapPartitions` keeps the decode batchable and JVM-local
  * (the Scala analog of Python's `mapInPandas` batch shape); payloads stay
  * off the driver; `binaryFile`-style sources should bound partition bytes
  * via `spark.sql.files.maxPartitionBytes` so a partition of blobs fits in
  * executor memory. Feature vectors come back as fixed-width arrays →
  * columnar, codegen-friendly downstream.
  */
object Media {

  /** Typed metadata carried beside every payload. */
  val metadataSchema: StructType = StructType(Seq(
    StructField("media_type", StringType, nullable = false),   // image|audio|video
    StructField("format", StringType, nullable = true),        // png|jpeg|wav|…
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Canonical media-table schema: (media_id, content, meta). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false),
    StructField("meta", metadataSchema, nullable = false)))

  /** STUB decode: a real build replaces these bodies with actual codecs.
    * Deterministic on input bytes so tests and retries are stable. */
  object DecodeStub {
    /** "Decode" a payload into `dim` grayscale-ish floats in [0, 1). */
    def decodeImage(bytes: Array[Byte], dim: Int): Array[Float] = {
      // Deterministic fake: rolling FNV-1a over the payload seeds each cell.
      var h = 0xcbf29ce484222325L
      val out = new Array[Float](dim)
      var i = 0
      while (i < dim) {
        val b: Long = if (bytes.isEmpty) 0L else bytes(i % bytes.length).toLong & 0xffL
        h = (h ^ (b + i)) * 0x100000001b3L
        out(i) = ((h >>> 11).toDouble / (1L << 53).toDouble).toFloat
        i += 1
      }
      out
    }

    /** "Sample" `n` frame offsets from a video duration (uniform stride). */
    def sampleFrames(durationMs: Long, n: Int): Array[Long] =
      if (durationMs <= 0 || n <= 0) Array.empty
      else Array.tabulate(n)(i => durationMs * (2L * i + 1) / (2L * n))

    /** "Resize" a srcW×srcH image payload to outW×outH by nearest-neighbor
      * sampling of the deterministic fake pixel grid pixel(p) = bytes[p mod
      * len] — the same signature a real resampler (which would decode and
      * interpolate actual pixels) drops into. */
    def resizeImage(bytes: Array[Byte], srcW: Int, srcH: Int,
        outW: Int, outH: Int): Array[Byte] = {
      val out = new Array[Byte](outW * outH)
      if (bytes.isEmpty) return out // blank thumbnail for an empty payload
      var r = 0
      while (r < outH) {
        val sr = r * srcH / outH
        var c = 0
        while (c < outW) {
          val sc = c * srcW / outW
          out(r * outW + c) = bytes((sr * srcW + sc) % bytes.length)
          c += 1
        }
        r += 1
      }
      out
    }
  }

  /** Per-partition batched feature extraction: binary content → fixed-width
    * float features + byte stats. Output schema:
    * (media_id, n_bytes, content_hash, features ARRAY<FLOAT>). */
  def extractFeatures(media: DataFrame, dim: Int = 16): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("n_bytes", IntegerType, nullable = false),
      StructField("content_hash", LongType, nullable = false),
      StructField("features", ArrayType(FloatType, containsNull = false), nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media.select("media_id", "content").mapPartitions { rows =>
      // Batch shape: one decoder instance per partition (where a real codec
      // would allocate its native context once), then a pure row loop.
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        var h = 0xcbf29ce484222325L
        bytes.foreach(b => h = (h ^ (b & 0xffL)) * 0x100000001b3L)
        Row(id, bytes.length, h, DecodeStub.decodeImage(bytes, dim).toSeq)
      }
    }(enc)
  }

  /** Frame sampling for video rows: explodes k deterministic frame offsets
    * per payload — plumbing for a frame-level training table.
    *
    * The offsets are pure integer arithmetic (`durationMs*(2i+1)/(2n)`,
    * same formula as `DecodeStub.sampleFrames`), so they're built from
    * codegen'd Catalyst expressions (`transform(sequence(...))` + `div`) —
    * no UDF, no serialization boundary in the hot path. Rows with null or
    * non-positive duration produce no frames (matching the stub). */
  def sampleVideoFrames(media: DataFrame, framesPerVideo: Int = 4): DataFrame = {
    require(framesPerVideo >= 1, s"framesPerVideo must be >= 1, got $framesPerVideo")
    media
      .filter(col("meta.media_type") === "video" &&
        col("meta.duration_ms").isNotNull && col("meta.duration_ms") > 0)
      .withColumn("frame_ms", explode(expr(
        s"transform(sequence(0L, ${framesPerVideo - 1}L), " +
          s"i -> meta.duration_ms * (2L * i + 1L) div ${2L * framesPerVideo}L)")))
      .select("media_id", "frame_ms")
  }

  /** Per-partition batched image resize: image rows → fixed-size thumbnail
    * payloads (nearest-neighbor over the stubbed pixel grid; a real build
    * swaps `DecodeStub.resizeImage` for a codec-backed resampler with the
    * same signature). Output: (media_id, out_w, out_h, pixels BINARY,
    * px_sum) — px_sum is the unsigned byte sum, the driver-hashable digest
    * of the thumbnail. Same mapPartitions batch shape as extractFeatures. */
  def resizeImages(media: DataFrame, outW: Int = 8, outH: Int = 8): DataFrame = {
    require(outW >= 1 && outH >= 1, "output dims must be >= 1")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("out_w", IntegerType, nullable = false),
      StructField("out_h", IntegerType, nullable = false),
      StructField("pixels", BinaryType, nullable = false),
      StructField("px_sum", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media
      .filter(col("meta.media_type") === "image" &&
        col("meta.width").isNotNull && col("meta.height").isNotNull)
      .select(col("media_id"), col("content"), col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        rows.map { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val px = DecodeStub.resizeImage(bytes, r.getInt(2), r.getInt(3), outW, outH)
          var sum = 0L
          px.foreach(b => sum += (b & 0xff))
          Row(r.getLong(0), outW, outH, px, sum)
        }
      }(enc)
  }

  /** Streaming media ingest: tail a directory of media parquet files as an
    * unbounded stream (the batch twin is any (media_id, content, meta)
    * parquet feed). Every transform in this object is STATELESS — a
    * projection, filter, or mapPartitions batch with no aggregation — so
    * `extractFeatures` / `sampleVideoFrames` / `resizeImages` apply to the
    * returned stream UNCHANGED, micro-batch by micro-batch, with no state
    * store and no watermark needed (MediaStreamSpec asserts output parity
    * with the batch path on the same blobs). `maxFilesPerTrigger` bounds a
    * micro-batch the same way `spark.sql.files.maxPartitionBytes` bounds a
    * batch partition: so one trigger's blobs fit executor memory. */
  def readMediaStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .schema(mediaSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Per-partition batched perceptual hashing: image rows → a 64-bit
    * average-hash (aHash) over the 8×8 nearest-neighbor thumbnail — bit
    * idx = 1 iff pixel(idx) is strictly above the thumbnail mean
    * (`px·64 > Σpx`, exact integers — no float mean to disagree on).
    * The standard image near-dup fingerprint: re-encodes, minor edits and
    * small crops keep most bits, so hamming distance ranks similarity.
    * Same mapPartitions batch shape (and the same DecodeStub swap point)
    * as extractFeatures/resizeImages; stateless, so it applies to
    * `readMediaStream` unchanged. Output: (media_id, ahash BIGINT). */
  def imageHashes(media: DataFrame, outW: Int = 8, outH: Int = 8): DataFrame = {
    require(outW * outH == 64, "aHash packs exactly 64 bits — need an 8×8 grid")
    val outSchema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("ahash", LongType, nullable = false)))
    val enc = RowEncoder.encoderFor(outSchema)
    media
      .filter(col("meta.media_type") === "image" &&
        col("meta.width").isNotNull && col("meta.height").isNotNull)
      .select(col("media_id"), col("content"), col("meta.width"), col("meta.height"))
      .mapPartitions { rows =>
        rows.map { r =>
          val px = DecodeStub.resizeImage(
            r.getAs[Array[Byte]](1), r.getInt(2), r.getInt(3), outW, outH)
          var sum = 0L
          px.foreach(b => sum += (b & 0xff))
          var h = 0L
          var i = 0
          while (i < 64) {
            if ((px(i) & 0xff).toLong * 64L > sum) h |= (1L << i)
            i += 1
          }
          Row(r.getLong(0), h)
        }
      }(enc)
  }

  /** Streaming image-dedup ADMISSION over a DURABLE aHash index — the
    * media twin of [[graft.streaming.DocStream.nearDupAdmission]]'s
    * no-state-store posture: each arriving micro-batch fingerprints its
    * images ([[imageHashes]], the exact batch transform), admits exactly
    * one representative per previously-unseen aHash (smallest media_id in
    * the batch wins — deterministic), lands the admitted (media_id, ahash)
    * rows through the idempotent epoch sink, and appends them to the index
    * so the NEXT batch dedups against the grown population — across
    * process generations, because the index is a parquet artifact the
    * checkpoint's commit log coordinates with, not a state store.
    *
    * Replay discipline (foreachBatch is at-least-once; the index append is
    * NOT transactional with the checkpoint): (a) index rows carrying this
    * batch's OWN media_ids are ignored when computing verdicts, so an
    * epoch replayed after a crash-between-append-and-commit re-admits the
    * same rows instead of rejecting them against their half-committed
    * hashes, and the epoch sink overwrites its own partition; (b) the
    * append skips hashes already present (materialized BEFORE the write so
    * nothing reads the index path mid-append) — a replay appends nothing
    * and the index converges.
    *
    * Exact-fingerprint semantics by design: the ingest gate kills
    * re-encodes and byte-identical re-crawls (same thumbnail ⇒ same 64
    * bits); NEAR-dup pairs (hamming ≤ τ) remain a refresh-time audit over
    * the admitted index via [[phashNearDupPairsMih]] — a pigeonhole
    * equi-join, deliberately NOT an admission rule, because a per-batch
    * hamming probe without precomputed MIH tables would be batch×index
    * all-pairs. */
  def hashDedupAdmission(media: DataFrame, indexPath: String,
      admittedPath: String, checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    media.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[Row], epoch: Long) =>
        hashAdmitBatch(batch.toDF(), epoch, indexPath, admittedPath)
      }
      .start()

  /** One [[hashDedupAdmission]] micro-batch: verdicts + epoch write +
    * converging index append. Factored so the spec can replay an epoch
    * directly (the nearDupAdmission test pattern). */
  private[graft] def hashAdmitBatch(batch: DataFrame, epoch: Long,
      indexPath: String, admittedPath: String): Unit = {
    val hashes = imageHashes(batch) // (media_id, ahash)
    val index = batch.sparkSession.read.parquet(indexPath)
    // (a) replay hygiene: verdicts ignore the batch's own half-committed rows
    val foreign = index.join(hashes.select("media_id"), Seq("media_id"), "left_anti")
    // intra-batch winner per hash, then the durable-index verdict
    val reps = hashes.groupBy("ahash").agg(min("media_id").as("media_id"))
    val admitted = reps
      .join(foreign.select("ahash"), Seq("ahash"), "left_anti")
      .select("media_id", "ahash")
    graft.streaming.EventStream.writeEpoch(admitted, epoch, admittedPath)
    // (b) converging append, materialized before it writes its own source
    val novel = admitted.join(index.select("ahash"), Seq("ahash"), "left_anti")
      .localCheckpoint()
    if (!novel.isEmpty) novel.write.mode("append").parquet(indexPath)
  }

  /** Seeds an EMPTY (media_id, ahash) index at `path` — the artifact
    * [[hashDedupAdmission]] probes and grows. */
  def initHashIndex(spark: SparkSession, path: String): Unit =
    spark.createDataFrame(spark.sparkContext.emptyRDD[Row],
      StructType(Seq(StructField("media_id", LongType, nullable = false),
        StructField("ahash", LongType, nullable = false))))
      .write.mode("overwrite").parquet(path)

  /** `syntheticMedia` plus PLANTED image near-duplicates: every 15th base
    * id (an image row) gets a twin at id 1000+i whose payload carries +50
    * (mod 251) on its first 8 bytes — a localized edit that keeps most
    * thumbnail bits, so the pair lands within aHash hamming ≤ 8 (one twin
    * intentionally drifts past the threshold and must be MISSED). Base
    * rows are bit-identical to `syntheticMedia(n)`. */
  def syntheticMediaWithDups(spark: SparkSession, n: Int): DataFrame = {
    val dups = (0 until n by 15).map { i =>
      val payload = Array.tabulate[Byte](64 + (i % 32)) { j =>
        val base = (i * 31 + j * 7) % 251
        (if (j < 8) (base + 50) % 251 else base).toByte
      }
      Row(1000L + i, payload, Row("image", "png", 32, 32, null))
    }
    syntheticMedia(spark, n).unionByName(
      spark.createDataFrame(spark.sparkContext.parallelize(dups, 2), mediaSchema))
  }

  /** Banded-LSH near-dup pairs over aHash fingerprints: candidates are an
    * EQUI-join on (band idx, band value), verified row-locally by
    * `bit_count(xor) ≤ tau` — never all-pairs (x04's SimHash discipline).
    *
    * Scale boundary (documented, and the reason [[phashNearDupPairsMih]]
    * exists): with `nBands` bands of 64/nBands bits, the band-key space is
    * 2^(64/nBands) — 8-bit bands give 256 buckets per band, so once the
    * image population outgrows ~thousands, every bucket holds n/256 rows
    * and candidate generation degrades toward n²/256 even for unrelated
    * images. Narrow bands are a RECALL knob at small n (8×8 recovers
    * hamming-8 pairs that 4×16 misses); at corpus scale switch to the MIH
    * variant, whose recall is a pigeonhole GUARANTEE, not a band-width
    * bet. */
  def phashNearDupPairs(hashes: DataFrame, nBands: Int = 8, tau: Int = 8): DataFrame = {
    require(nBands > 0 && 64 % nBands == 0, s"64 bits must split evenly, got $nBands bands")
    val w = 64 / nBands
    val mask = if (w == 64) -1L else (1L << w) - 1L
    val bands = hashes.select(col("media_id"), col("ahash"),
        explode(expr(s"sequence(0, ${nBands - 1})")).as("k"))
      .withColumn("bv", expr(s"shiftright(ahash, $w * k) & $mask"))
    bands.as("a")
      .join(bands.as("b"),
        col("a.k") === col("b.k") && col("a.bv") === col("b.bv") &&
          col("a.media_id") < col("b.media_id"))
      .select(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"),
        col("a.ahash").as("ha"), col("b.ahash").as("hb"))
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= tau)
      .select("media_a", "media_b", "hamming")
  }

  /** EXACT hamming-≤ tau pairs by multi-index hashing (Norouzi et al.,
    * "Fast Search in Hamming Space with Multi-Index Hashing", CVPR 2012):
    * 4 substrings of 16 bits; by pigeonhole, any pair within hamming tau
    * agrees within radius ⌊tau/4⌋ on SOME substring — so enumerating each
    * image's per-band keys out to that radius (1 + 16 + 120 = 137 keys at
    * radius 2) and equi-joining against the other side's EXACT band keys
    * finds every qualifying pair, with zero misses, by construction.
    *
    * Scale shape: the corpus side stores 4 exact keys per image; the probe
    * side explodes 4×137 keys per image — a CONSTANT fan-out, so shuffle
    * volume is linear in n and bucket occupancy is n·4/65536 per band key
    * (vs n/256 for the 8-bit heuristic). The verify still runs only on
    * banded candidates. This is the form that survives an internet-scale
    * image corpus; [[phashNearDupPairs]] is the cheaper small-n heuristic. */
  def phashNearDupPairsMih(hashes: DataFrame, tau: Int = 8): DataFrame = {
    // radius-2 enumeration guarantees exactness for tau ≤ 4*2+3 = 11
    require(tau >= 0 && tau <= 11, s"radius-2 MIH is exact only for tau <= 11, got $tau")
    val masks: Array[Int] = (Seq(0) ++ (0 until 16).map(1 << _) ++
      (for (i <- 0 until 16; j <- i + 1 until 16) yield (1 << i) | (1 << j))).toArray
    val exact = hashes.select(col("media_id").as("media_b"), col("ahash").as("hb"),
        explode(expr("sequence(0, 3)")).as("k"))
      .withColumn("bv", expr("shiftright(hb, 16 * k) & 65535"))
    val probe = hashes.select(col("media_id").as("media_a"), col("ahash").as("ha"),
        explode(expr("sequence(0, 3)")).as("k"))
      .withColumn("bv0", expr("shiftright(ha, 16 * k) & 65535"))
      .select(col("media_a"), col("ha"), col("k"),
        explode(transform(typedLit(masks), m => col("bv0").bitwiseXOR(m.cast("long"))))
          .as("bv"))
    probe.join(exact, Seq("k", "bv"))
      .filter(col("media_a") < col("media_b"))
      .select("media_a", "media_b", "ha", "hb")
      .distinct()
      .withColumn("hamming", bit_count(col("ha").bitwiseXOR(col("hb"))))
      .filter(col("hamming") <= tau)
      .select("media_a", "media_b", "hamming")
  }

  /** Metadata-only stats — shows pruning: reads `meta`, never `content`. */
  def mediaStats(media: DataFrame): DataFrame =
    media.groupBy(col("meta.media_type").as("media_type"))
      .agg(count(lit(1)).as("n"),
        avg(col("meta.width")).as("avg_width"),
        avg(col("meta.duration_ms")).as("avg_duration_ms"))

  /** Deterministic synthetic media table (test/demo source). */
  def syntheticMedia(spark: SparkSession, n: Int): DataFrame = {
    val rows = (0 until n).map { i =>
      val mediaType = Seq("image", "audio", "video")(i % 3)
      val payload = Array.tabulate[Byte](64 + (i % 32))(j => ((i * 31 + j * 7) % 251).toByte)
      Row(i.toLong, payload,
        Row(mediaType, if (mediaType == "image") "png" else "raw",
          if (mediaType == "image") 32 else null,
          if (mediaType == "image") 32 else null,
          if (mediaType == "video") 1000L * (i % 10 + 1) else null))
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4), mediaSchema)
  }
}
