package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing for a training-data pipeline: media
  * payloads as opaque `binary` columns with typed metadata, and
  * decode / feature-extract / frame-sample as per-partition batch
  * transforms (the Scala analog of `mapInPandas` batch UDFs).
  *
  * The Spark-side plumbing — schema, partitioning, batch iteration
  * shape, output contract — is real and tested. The actual codec step
  * is a clearly-marked deterministic STUB ([[decodeStub]]): no
  * image/audio libraries exist in this container, so it derives a
  * fixed-size feature vector from the payload bytes. A production
  * deployment swaps ONLY that function (same signature), e.g. for a
  * JNI JPEG decoder; nothing else changes.
  */
object Multimodal {

  case class Media(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)
  case class MediaFeatures(media_id: Long, kind: String, dim: Int,
      features: Array[Float])

  val featureDim = 16

  /** STUB decode: deterministic bytes→features (a rolling byte hash
    * folded into [[featureDim]] buckets, scaled to [0,1)). Replace
    * with a real codec in production — signature is the contract.
    */
  def decodeStub(payload: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](featureDim)
    var i = 0
    while (i < payload.length) {
      val b = payload(i) & 0xff
      acc(i % featureDim) = (acc(i % featureDim) * 31 + b) & 0xffffff
      i += 1
    }
    acc.map(v => (v.toDouble / 0x1000000).toFloat)
  }

  /** Batch feature extraction: one pass per partition, reusing any
    * per-partition codec state (the reason this is mapPartitions, not
    * a row UDF — exactly the batch shape `mapInPandas` gives Python).
    * Repartitions by kind so a codec's native context loads once per
    * (partition, kind) run at scale.
    */
  def extractFeatures(media: Dataset[Media])(implicit s: SparkSession)
      : Dataset[MediaFeatures] = {
    import s.implicits._
    media.repartition(col("kind"))
      .mapPartitions { it =>
        // per-partition codec init would go here (once, not per row)
        it.map { m =>
          val f = decodeStub(m.payload)
          MediaFeatures(m.media_id, m.kind, f.length, f)
        }
      }
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame
    * offset becomes a row (frame payload = the byte slice — stub),
    * i.e. the explode-shaped generator of a real frame sampler.
    */
  def sampleFrames(media: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    media
      .withColumn("n_frames",
        floor(length(col("payload")) / frameBytes).cast("int"))
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(col("n_frames") - 1, lit(0)),
          lit(stride))))
      .withColumn("frame_payload",
        expr(s"substring(payload, frame_idx * $frameBytes + 1, $frameBytes)"))
      .drop("payload")

  /** "Resize": renormalize a feature vector to a new dimension by
    * nearest-index sampling (stub for an image resize kernel; the
    * array plumbing — codegen'd transform over indices — is the real
    * part).
    */
  def resizeFeatures(features: DataFrame, newDim: Int): DataFrame =
    features.withColumn("features_resized",
      expr(s"""transform(sequence(0, ${newDim - 1}),
              | i -> features[CAST(i * dim / $newDim AS INT)])""".stripMargin))

  // ----------------------------------------------------------------
  // REAL modality: geo imagery. Payloads of kind "tiff" are GeoTIFF
  // bytes (graft.sources.GeoTiff — the engine's own raster codec), so
  // for the reference's actual domain the decode → kernel → encode
  // path below is fully real, no stub: only JPEG/audio/video remain
  // behind decodeStub.

  /** Decode a GeoTIFF payload to summary features: [width, height,
    * min, max, mean] — a real feature extractor for the "tiff" kind
    * with the same contract as [[decodeStub]].
    */
  def decodeTiffFeatures(payload: Array[Byte]): Array[Float] = {
    val (chip, _) = graft.sources.GeoTiff.decode(payload)
    val valid = chip.px.filter(_ != chip.nodata)
    val n = math.max(valid.length, 1)
    Array(chip.width.toFloat, chip.height.toFloat,
      (if (valid.isEmpty) 0.0 else valid.min).toFloat,
      (if (valid.isEmpty) 0.0 else valid.max).toFloat,
      (valid.sum / n).toFloat)
  }

  case class TiffRow(media_id: Long, payload: Array[Byte])

  /** Distributed image resize over binary GeoTIFF payloads: decode →
    * nearest-neighbor resample to (w, h) over the same bounds →
    * re-encode, preserving each payload's own CRS tag (a resize must
    * not rewrite a UTM tiff's metadata to another EPSG).
    * Per-partition batch shape like [[extractFeatures]]; every step
    * is real (GeoTiff codec + Raster kernel).
    */
  def resizeTiffs(tiffs: Dataset[TiffRow], w: Int, h: Int)
      (implicit s: SparkSession): Dataset[TiffRow] = {
    import s.implicits._
    tiffs.mapPartitions { it =>
      it.map { row =>
        val (chip, epsg) = graft.sources.GeoTiff.decode(row.payload)
        val resized = graft.functions.Raster.resampleNearest(
          chip, w, h, chip.minx, chip.miny, chip.maxx, chip.maxy)
        TiffRow(row.media_id, graft.sources.GeoTiff.encode(resized, epsg))
      }
    }
  }

  // ----------------------------------------------------------------
  // REAL modality: audio. PCM s16le needs no external codec — the
  // "decode" IS the byte math — so the waveform path (decode →
  // resample → features) is fully real like the tiff path above;
  // only compressed formats (mp3/opus/...) would sit behind a stub.

  /** Encode signed 16-bit samples as little-endian PCM bytes. */
  def encodePcm(samples: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](samples.length * 2)
    var i = 0
    while (i < samples.length) {
      val s = samples(i)
      require(s >= -32768 && s <= 32767, s"sample $s out of s16 range")
      out(2 * i) = (s & 0xff).toByte
      out(2 * i + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    out
  }

  /** Decode little-endian PCM s16 bytes back to samples (trailing odd
    * byte is a corrupt payload — fail loudly, a silent drop would
    * shift every later frame).
    */
  def decodePcm(bytes: Array[Byte]): Array[Int] = {
    require(bytes.length % 2 == 0,
      s"PCM s16le payload has odd length ${bytes.length}")
    val out = new Array[Int](bytes.length / 2)
    var i = 0
    while (i < out.length) {
      out(i) = ((bytes(2 * i + 1).toInt << 8) | (bytes(2 * i) & 0xff))
      i += 1
    }
    out
  }

  /** Linear-interpolation resample to `outLen` samples (the audio
    * twin of the tiff nearest-neighbor resize; endpoint-anchored so
    * outLen == n is the identity).
    */
  def resamplePcm(samples: Array[Int], outLen: Int): Array[Int] = {
    require(samples.nonEmpty && outLen > 0, "empty resample")
    if (outLen == 1) return Array(samples(0))
    val out = new Array[Int](outLen)
    val scale = (samples.length - 1).toDouble / (outLen - 1)
    var j = 0
    while (j < outLen) {
      val x = j * scale
      val i0 = math.min(x.toInt, samples.length - 1)
      val i1 = math.min(i0 + 1, samples.length - 1)
      val frac = x - i0
      out(j) = math.round(samples(i0) * (1.0 - frac) + samples(i1) * frac).toInt
      j += 1
    }
    out
  }

  /** EXACT rational linear-interpolation resample: position j maps
    * to the rational j·(n−1)/(outLen−1) and the lerp uses one
    * truncating integer division —
    * s0 + (s1 − s0)·frac / den, where Scala's Long `/` and DuckDB's
    * `//` both truncate toward zero — so the result is engine-exact
    * on negative samples too (where a floating lerp + round would be
    * at the mercy of tie-breaking). Endpoint-anchored: j = 0 and
    * j = outLen−1 return the first/last sample exactly, and
    * outLen == n is the identity (frac is always 0).
    */
  def resamplePcmExact(samples: Array[Int], outLen: Int): Array[Int] = {
    require(samples.nonEmpty && outLen > 1,
      s"resamplePcmExact needs >=1 samples and outLen >= 2, got " +
        s"${samples.length}/$outLen")
    val n = samples.length
    val den = (outLen - 1).toLong
    Array.tabulate(outLen) { j =>
      val num = j.toLong * (n - 1)
      val i0 = (num / den).toInt
      val frac = num % den
      val s0 = samples(i0)
      val s1 = samples(math.min(i0 + 1, n - 1))
      (s0 + (s1 - s0).toLong * frac / den).toInt
    }
  }

  // ----------------------------------------------------------------
  // REAL modality: video. Raw 8-bit grayscale frames (fixed
  // frame_len bytes each) need no codec either — frame slicing and
  // pixel math ARE the decode — so the video path (deframe → per-
  // frame luma → inter-frame motion energy → scene cuts) is fully
  // real like tiff and PCM; only compressed containers (h264/vp9)
  // would sit behind a stub.

  /** Flatten fixed-size 8-bit frames into one payload. */
  def encodeFrames(frames: Array[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty, "no frames")
    val flen = frames(0).length
    val out = new Array[Byte](frames.length * flen)
    var f = 0
    while (f < frames.length) {
      val fr = frames(f)
      require(fr.length == flen, s"ragged frame $f: ${fr.length} vs $flen")
      var p = 0
      while (p < flen) {
        val v = fr(p)
        require(v >= 0 && v <= 255, s"pixel $v out of u8 range")
        out(f * flen + p) = v.toByte
        p += 1
      }
      f += 1
    }
    out
  }

  /** Re-frame a raw video payload (trailing partial frame = corrupt
    * payload — fail loudly, a silent drop would desync every later
    * frame index).
    */
  def decodeFrames(bytes: Array[Byte], frameLen: Int): Array[Array[Int]] = {
    require(frameLen > 0 && bytes.length % frameLen == 0,
      s"payload ${bytes.length} B is not whole $frameLen-byte frames")
    Array.tabulate(bytes.length / frameLen) { f =>
      Array.tabulate(frameLen)(p => bytes(f * frameLen + p) & 0xff)
    }
  }

  case class VideoFeatures(media_id: Long, n_frames: Long, sum_luma: Long,
      motion_total: Long, n_cuts: Long)

  /** Per-item video summary: total luma (exact Σ pixels), motion
    * energy (Σ over frame pairs of Σ|Δpixel|), and scene cuts
    * (frames whose motion vs the previous frame is nonzero).
    */
  def videoFeatures(mediaId: Long, frames: Array[Array[Int]]): VideoFeatures = {
    var luma = 0L
    var motion = 0L
    var cuts = 0L
    var f = 0
    while (f < frames.length) {
      val fr = frames(f)
      var p = 0
      var fm = 0L
      while (p < fr.length) {
        luma += fr(p)
        if (f > 0) fm += math.abs(fr(p) - frames(f - 1)(p))
        p += 1
      }
      if (f > 0 && fm > 0) cuts += 1
      motion += fm
      f += 1
    }
    VideoFeatures(mediaId, frames.length.toLong, luma, motion, cuts)
  }

  case class PcmFeatures(media_id: Long, n_samples: Long, sum_sq: Long,
      zero_crossings: Long, peak: Long)

  /** Waveform features: energy (Σs² — exact), zero-crossing count
    * (strict sign flips), peak |amplitude|. The audio analog of
    * [[decodeTiffFeatures]]'s summary contract.
    */
  def pcmFeatures(mediaId: Long, samples: Array[Int]): PcmFeatures = {
    var sumSq = 0L
    var zc = 0L
    var peak = 0L
    var i = 0
    while (i < samples.length) {
      val s = samples(i).toLong
      sumSq += s * s
      if (i > 0 && samples(i - 1).toLong * s < 0) zc += 1
      val a = math.abs(s)
      if (a > peak) peak = a
      i += 1
    }
    PcmFeatures(mediaId, samples.length.toLong, sumSq, zc, peak)
  }
}
