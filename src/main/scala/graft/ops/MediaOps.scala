package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/** Multimodal-column plumbing (SURVEY §2 L3 note): media travels as an
  * opaque BINARY payload plus a typed metadata struct; decode / feature
  * extraction runs per PARTITION through the typed Dataset API so a real
  * decoder (libjpeg/ffmpeg/soundfile) initializes once per task and streams
  * rows through — the per-partition-batch shape a native library needs.
  * That plumbing (encoders, schema, batch iteration, partition reuse) is
  * real and tested; only the codec call itself is stubbed.
  *
  * ==== STUB BOUNDARY ====
  * The container ships no media codecs, so `decodeHeader`/`sampleFrames`
  * below are DETERMINISTIC FAKES operating on the raw bytes (documented
  * byte arithmetic, reproducible in the DuckDB oracle). A production build
  * replaces ONLY these two functions with real codec calls; everything
  * around them — the case classes, the mapPartitions shape, the declared
  * query — stays as-is.
  */
object MediaOps {

  final case class MediaMeta(lang: String, source: String, n_chars: Long)
  final case class MediaRecord(doc_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(
      doc_id: Long,
      width: Int, height: Int, channels: Int,
      mean_byte: Double, n_frames: Int,
      lang: String)

  /** STUB decode: "parse" an image header from the first payload bytes.
    * Fake, but fixed and documented: width = 64 + b₀ mod 192, height =
    * 64 + b₁ mod 192, channels = 1 + b₂ mod 4; mean_byte = exact mean of
    * all payload bytes (the luminance stand-in). */
  private[ops] def decodeHeader(payload: Array[Byte]): (Int, Int, Int, Double) = {
    require(payload.length >= 3, "payload too short for header")
    def b(i: Int): Int = payload(i) & 0xFF
    val mean = payload.foldLeft(0L)((a, x) => a + (x & 0xFF)).toDouble / payload.length
    (64 + b(0) % 192, 64 + b(1) % 192, 1 + b(2) % 4, mean)
  }

  /** STUB frame sampling: the payload divides into fixed 256-byte "frames";
    * a real sampler would decode every k-th video frame the same way. */
  private[ops] def sampleFrames(payload: Array[Byte]): Int =
    (payload.length + 255) / 256

  /** The decode operator: one decoder "session" per partition, rows
    * streamed through it. Input columns: (doc_id, payload, meta). */
  def decodeFeatures(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    val ds: Dataset[MediaRecord] = media.as[MediaRecord]
    ds.mapPartitions { rows =>
      // real codecs initialize HERE, once per task, and close on exhaustion
      rows.map { r =>
        val (w, h, c, mean) = decodeHeader(r.payload)
        // round6, NOT rint: payload lengths divisible by powers of two
        // put means on exact .xxxxxx5 ties where rint's half-even
        // diverges from the oracle's half-away round (6 docs at sf0.1)
        MediaFeatures(r.doc_id, w, h, c, round6(mean),
          sampleFrames(r.payload), r.meta.lang)
      }
    }.toDF()
  }

  /** round(x, 6) with DuckDB's half-AWAY-from-zero tie-break, applied to
    * the exact binary value. `math.rint` (half-to-even) disagrees on
    * exact halves — and frame means divide by 256, so .xxxxxx5 values are
    * COMMON here, not a corner case (l24 row 9: 93.3203125 → rint said
    * …312, the oracle …313). */
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  final case class MediaHash(doc_id: Long, bands: Array[Int])

  /** STUB perceptual hash (dHash — Krawetz's difference hash): a real
    * implementation decodes, grayscales and box-resizes to an 8×9 grid,
    * then sets bit (r,c) iff grid[r][c] > grid[r][c+1]. The fake keeps
    * every step except the codec: the "resize" is the l23 stride sample
    * (s = max(1, len/72); pix(j) = payload[min(j·s, len−1)]) and the 64
    * comparison bits are the real dHash rule. Emitted as EIGHT 8-bit
    * bands (band k = grid row k's comparisons) — the Hamming-join
    * blocking key, and sidesteps the 2⁶³ sign bit entirely. */
  private[ops] def dHashBands(payload: Array[Byte]): Array[Int] = {
    val len = payload.length
    require(len >= 1, "empty payload")
    val s = math.max(1, len / 72)
    def pix(j: Int): Int = payload(math.min(j * s, len - 1)) & 0xFF
    Array.tabulate(8) { k =>
      (0 until 8).foldLeft(0) { (acc, i) =>
        if (pix(k * 9 + i) > pix(k * 9 + i + 1)) acc | (1 << i) else acc
      }
    }
  }

  /** The perceptual-hash operator: same per-partition decode session as
    * [[decodeFeatures]] (a real build hashes the decoded luminance grid
    * here), one (doc_id, 8×8-bit bands) row per payload. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.map(r => MediaHash(r.doc_id, dHashBands(r.payload)))
    }.toDF()
  }

  final case class ResizedFeatures(
      doc_id: Long, width: Int, height: Int,
      mean_byte: Option[Double], n_sampled: Int, lang: String)

  /** STUB resize: a real resampler decodes and box-filters to (tw, th);
    * the fake keeps the arithmetic shape — stride-sample the payload at
    * s = max(1, len / (tw·th)) and average the sampled bytes — so the
    * downstream contract (fixed output dims, resampled statistic, sample
    * count) and the per-partition session plumbing are exercised with
    * oracle-reproducible byte math. */
  def resizeFeatures(media: DataFrame, tw: Int, th: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.map { r =>
        val len = r.payload.length
        val s = math.max(1, len / (tw * th))
        val n = (len + s - 1) / s
        var sum = 0L
        var i = 0
        while (i < n) { sum += r.payload(i * s) & 0xFF; i += 1 }
        // empty payload: n = 0 → no sampled statistic (the oracle's NULL
        // mean over an empty list), never a NaN through round6
        val mean = if (n == 0) None else Some(round6(sum.toDouble / n))
        ResizedFeatures(r.doc_id, tw, th, mean, n, r.meta.lang)
      }
    }.toDF()
  }

  final case class FrameSample(
      doc_id: Long, frame_id: Int, frame_mean: Double, lang: String)

  /** Frame sampling as a ONE-TO-MANY decode: every k-th 256-byte "frame"
    * of the payload becomes its own output row with its exact byte mean —
    * the explode-shaped plumbing a video pipeline needs (one input row →
    * many frame rows, streamed through the per-partition session, never
    * materializing all frames in memory at once). */
  def sampleFrameRows(media: DataFrame, everyK: Int): DataFrame = {
    require(everyK >= 1)
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { rows =>
      rows.flatMap { r =>
        val nf = sampleFrames(r.payload)
        (0 until nf by everyK).iterator.map { fi =>
          val start = fi * 256
          val end = math.min(start + 256, r.payload.length)
          var sum = 0L
          var i = start
          while (i < end) { sum += r.payload(i) & 0xFF; i += 1 }
          FrameSample(r.doc_id, fi, round6(sum.toDouble / (end - start)), r.meta.lang)
        }
      }
    }.toDF()
  }
}
