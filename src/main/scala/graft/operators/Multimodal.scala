package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** F12 — multimodal column plumbing (SURVEY §2.F12): media as opaque
  * `binary` columns with typed metadata, processed per-partition in
  * batches. All three modalities decode REAL bytes with pure-JVM
  * codecs ([[MediaCodecs]]): PPM images, WAV PCM-16 audio, Y4M video.
  * `FakeCodec` remains only to demonstrate the dispatch seam a
  * compressed-format JNI codec (JPEG, H.264) would drop into 1:1.
  */
object Multimodal {

  /** One media row: payload plus typed metadata (the parquet schema a
    * 100 TB media lake would carry; payloads stay opaque bytes so the
    * scan never decodes what a query doesn't touch). */
  case class MediaRow(media_id: Long, kind: String, payload: Array[Byte],
                      width: Int, height: Int, n_frames: Int)

  case class MediaFeature(media_id: Long, kind: String, n_bytes: Int,
                          checksum: Long, brightness: Double)

  case class FrameSample(media_id: Long, frame_idx: Int, frame_checksum: Long)

  /** STUB codec — deterministic fake standing in for a real decoder.
    * Interface mirrors what an image lib provides; only the bodies are
    * fake. */
  object FakeCodec {
    /** "decode" = stable per-byte transform; a real codec returns pixels. */
    def decode(payload: Array[Byte]): Array[Int] =
      payload.map(b => (b & 0xff)).toArray
    def brightness(pixels: Array[Int]): Double =
      if (pixels.isEmpty) 0.0 else pixels.map(_.toDouble).sum / pixels.length
    def checksum(pixels: Array[Int]): Long =
      pixels.foldLeft(0L)((a, p) => (a * 31 + p) % 1000000007L)
  }

  /** Decode + feature-extract, one partition at a time (the Scala
    * analog of `mapInPandas`: batch-at-a-time, no per-row JVM↔native
    * crossings with a real codec). Narrow — no shuffle. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeature] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val px = FakeCodec.decode(r.payload)
        MediaFeature(r.media_id, r.kind, r.payload.length,
          FakeCodec.checksum(px), FakeCodec.brightness(px))
      }
    }
  }

  /** Linspace frame-index selection shared by both frame samplers —
    * k evenly-spaced indices over [0, n), endpoints included, one
    * index when either count degenerates. */
  private def linspaceIdxs(n: Int, k: Int): Seq[Int] =
    (if (n <= 1 || k <= 1) Seq(0)
     else (0 until k).map(i => (i * (n - 1)) / (k - 1))).distinct

  /** Evenly-spaced frame sampling for video rows — the same linspace
    * selection as the tick resampler (Features.resampleWindow), at the
    * frame level. Explodes only the sampled indices (k per row), never
    * all frames. */
  def sampleFrames(media: Dataset[MediaRow], k: Int): Dataset[FrameSample] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val px = FakeCodec.decode(r.payload)
      linspaceIdxs(r.n_frames, k).map { fi =>
        val slice = if (px.isEmpty) px else Array(px(fi % px.length))
        FrameSample(r.media_id, fi, FakeCodec.checksum(slice))
      }
    }
  }

  // ---- Real-codec path (MediaCodecs): PPM images / WAV audio ----

  case class ImageFeature(media_id: Long, width: Int, height: Int,
                          brightness: Double, thumb_brightness: Double)
  case class AudioFeature(media_id: Long, sample_rate: Int, n_samples: Int,
                          rms: Double, zero_crossings: Int)

  /** Decode REAL PPM payloads (kind == "image"), resize to a thumbnail,
    * and extract luma features — the full decode→transform→featurize
    * chain on genuine bytes, batch-at-a-time per partition, no
    * shuffle. A malformed payload throws (surfacing corrupt media
    * beats silently fake features). */
  def imageFeatures(media: Dataset[MediaRow],
                    thumbW: Int = 8, thumbH: Int = 8): Dataset[ImageFeature] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "image").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, rgb) = MediaCodecs.Ppm.decode(r.payload)
        val thumb = MediaCodecs.Ppm.resize(w, h, rgb, thumbW, thumbH)
        ImageFeature(r.media_id, w, h,
          MediaCodecs.Ppm.brightness(rgb), MediaCodecs.Ppm.brightness(thumb))
      }
    }
  }

  /** Decode REAL WAV PCM-16 payloads (kind == "audio") and extract the
    * classic audio-quality features (RMS level, zero-crossing count). */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeature] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "audio").mapPartitions { rows =>
      rows.map { r =>
        val (rate, samples) = MediaCodecs.Wav.decode(r.payload)
        AudioFeature(r.media_id, rate, samples.length,
          MediaCodecs.Wav.rms(samples), MediaCodecs.Wav.zeroCrossings(samples))
      }
    }
  }

  case class VideoFeature(media_id: Long, width: Int, height: Int,
                          n_frames: Int, mean_luma: Double, motion: Double)

  case class VideoFrame(media_id: Long, frame_idx: Int, mean_luma: Double)

  /** Decode REAL Y4M payloads (kind == "video") and extract the
    * clip-level features a sampling pipeline filters on: frame count,
    * mean luma across frames, and the mean inter-frame absolute luma
    * difference (motion proxy — static clips score ~0). Narrow, batch
    * per partition, no shuffle; a malformed payload throws. */
  def videoFeatures(media: Dataset[MediaRow]): Dataset[VideoFeature] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").mapPartitions { rows =>
      rows.map { r =>
        val (w, h, frames) = MediaCodecs.Y4m.decode(r.payload)
        val luma = frames.map(MediaCodecs.Y4m.meanLuma).sum / frames.length
        val motion =
          if (frames.length < 2) 0.0
          else frames.sliding(2).map { case Array(a, b) =>
            MediaCodecs.Y4m.motion(a, b)
          }.sum / (frames.length - 1)
        VideoFeature(r.media_id, w, h, frames.length, luma, motion)
      }
    }
  }

  /** Evenly-spaced REAL frame sampling over decoded Y4M video — the
    * linspace index selection of [[sampleFrames]], but each sampled
    * index maps to a genuine decoded luma plane, not a stub checksum.
    * Emits k rows per clip (not n_frames): the 100 TB shape where a
    * frame-sampling stage must never explode a long clip. */
  def sampleVideoFrames(media: Dataset[MediaRow], k: Int): Dataset[VideoFrame] = {
    import media.sparkSession.implicits._
    media.filter(_.kind == "video").flatMap { r =>
      val (_, _, frames) = MediaCodecs.Y4m.decode(r.payload)
      linspaceIdxs(frames.length, k).map(fi =>
        VideoFrame(r.media_id, fi, MediaCodecs.Y4m.meanLuma(frames(fi))))
    }
  }

  /** Deterministic synthetic media with REAL payloads: images are
    * valid binary PPMs (gradient pixels), audio rows are valid WAV
    * PCM-16 square waves, and video rows are valid Y4M clips (a
    * horizontally scrolling luma gradient, so the motion proxy is
    * provably nonzero) — every modality exercises genuine decode, not
    * a transform of arbitrary bytes. */
  /** The per-CONTENT-KEY row builder both generators share: the
    * payload derives from `key` by fixed integer formulas while the
    * row keeps its own `id` — so [[syntheticDupMedia]] can plant
    * byte-exact replicas (same key, different id) without duplicating
    * the formulas [[syntheticRealMedia]]'s fixtures pin. */
  private def mediaRowFor(key: Long, id: Long): MediaRow =
    (key % 3) match {
      case 1 =>
        val w = 4 + (key % 3).toInt; val h = 3 + (key % 2).toInt
        val rgb = Array.tabulate(w * h * 3)(i => (key.toInt * 11 + i * 5) % 256)
        MediaRow(id, "image", MediaCodecs.Ppm.encode(w, h, rgb), w, h, 1)
      case 2 =>
        val samples = Array.tabulate[Short](64 + (key % 32).toInt)(i =>
          if ((i / 4) % 2 == 0) 1000.toShort else (-1000).toShort)
        MediaRow(id, "audio", MediaCodecs.Wav.encode(8000, samples), 0, 0, 0)
      case _ =>
        val w = 8; val h = 6
        val nf = 4 + (key % 5).toInt
        val frames = (0 until nf).map(f =>
          Array.tabulate[Byte](w * h)(i =>
            (((i % w) * 32 + f * 16 + key * 7) % 256).toByte))
        MediaRow(id, "video", MediaCodecs.Y4m.encode(w, h, 25, frames), w, h, nf)
    }

  def syntheticRealMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map(id => mediaRowFor(id, id))
  }

  /** A media lake with PLANTED duplicates: ids 0..nDistinct−1 carry
    * distinct content, ids nDistinct..2·nDistinct−1 replicate the
    * content of `id − nDistinct` — so ground truth is BY
    * CONSTRUCTION (keep ⟺ id < nDistinct, every group size 2) and
    * the F78 verdict frame has a formula-generated DuckDB oracle
    * even though codec math itself is not SQL-expressible.
    * `nDistinct % 3 == 0` keeps the replica's kind formula aligned
    * with `id % 3`, and `nDistinct <= 96` keeps the distinct range
    * below the AUDIO content period — the square-wave samples vary
    * only with `key % 32`, so audio keys lcm(3, 32) = 96 apart carry
    * identical content and the "every group has size 2" ground truth
    * would silently break (caught by the oracle at 150: n_copies 4). */
  def syntheticDupMedia(spark: SparkSession, nDistinct: Int): Dataset[MediaRow] = {
    require(nDistinct % 3 == 0,
      s"nDistinct must be divisible by 3: $nDistinct")
    require(nDistinct <= 96,
      s"nDistinct must be <= 96 (audio content period): $nDistinct")
    import spark.implicits._
    spark.range(2L * nDistinct).map(id => mediaRowFor(id % nDistinct, id))
  }

  /** F78 — MEDIA EXACT-CONTENT DEDUP: F1's hash-groupBy dedup lifted
    * to binary media, keyed on the DECODED canonical content (pixels
    * / samples / frames), not the raw bytes — two encodings of the
    * same image (header whitespace, field order) collide here and
    * would not under a byte hash (spec'd with two distinct PPM
    * byte-encodings of one pixel grid). Per row: decode with the real
    * codec, fold content into the shared mod-1e9+7 rolling hash
    * (dims/rate folded first so a 2×3 and 3×2 of the same pixel
    * stream differ); then the standard exact-dedup shape — one
    * (kind, fp) aggregate, keeper = min id, verdict join. Narrow
    * decode pass, one shuffle on the fingerprint key; group frame is
    * content-cardinality-sized (never broadcast — at 100 TB it
    * shuffles like F1). */
  /** The decoded-content fingerprint shared by F78 (batch dedup) and
    * G49 (streaming admission) — decode with the real codec, fold the
    * canonical content (dims/rate first) into the mod-1e9+7 rolling
    * hash. ONE spelling so the batch keep set and the live admit set
    * cannot drift. */
  def contentFp(r: MediaRow): Long = {
    val P = 1000000007L
    def fold(h: Long, v: Long): Long = (h * 31 + v) % P
    r.kind match {
      case "image" =>
        val (w, h, rgb) = MediaCodecs.Ppm.decode(r.payload)
        rgb.foldLeft(fold(fold(0L, w), h))((a, v) => fold(a, v))
      case "audio" =>
        val (rate, samples) = MediaCodecs.Wav.decode(r.payload)
        samples.foldLeft(fold(0L, rate))((a, v) => fold(a, v & 0xffffL))
      case _ =>
        val (w, h, frames) = MediaCodecs.Y4m.decode(r.payload)
        frames.foldLeft(fold(fold(0L, w), h))((a, fr) =>
          fr.foldLeft(fold(a, 255L))((x, b) => fold(x, b & 0xffL)))
    }
  }

  def mediaDedup(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    val fp = media.map(r => (r.media_id, r.kind, contentFp(r)))
      .toDF("media_id", "kind", "fp")
    val groups = fp.groupBy("kind", "fp")
      .agg(count(lit(1)).as("n_copies"), min("media_id").as("_keeper"))
    fp.join(groups, Seq("kind", "fp"))
      .select(col("media_id"), col("kind"), col("n_copies"),
        (col("media_id") === col("_keeper")).as("keep"))
      .orderBy("media_id")
  }

  /** F12 — the full long-format feature frame over [[syntheticRealMedia]]:
    * all three modalities decoded from REAL bytes (PPM/WAV/Y4M) into
    * (media_id, feature, value) rows. Codec math is not SQL-expressible,
    * so this frame carries the driver's rows-only check; its hashable
    * dual is [[mediaSummary]]. */
  def featuresLong(spark: SparkSession, n: Int): DataFrame = {
    val media = syntheticRealMedia(spark, n)
    def longFmt(df: DataFrame, feats: Seq[String]) =
      feats.map(f => df.select(col("media_id"),
        lit(f).as("feature"), col(f).cast("double").as("value")))
    val parts =
      longFmt(imageFeatures(media).toDF,
        Seq("brightness", "thumb_brightness")) ++
      longFmt(audioFeatures(media).toDF,
        Seq("rms", "zero_crossings")) ++
      longFmt(videoFeatures(media).toDF,
        Seq("mean_luma", "motion", "n_frames"))
    parts.reduce(_ unionAll _).orderBy("media_id", "feature")
  }

  /** F12 (driver-hashable form) — the feature frame with each value
    * e6-quantized into int64 (the same per-row HALF_UP quantization
    * [[mediaSummary]] sums): deterministic on every machine, so the
    * FULL frame carries a hard driver hash against the independently
    * re-derived fixture in SparkEntry (VERDICT r11 #5 — this was the
    * registry's one remaining rows-only key). */
  def featuresQuantized(spark: SparkSession, n: Int): DataFrame =
    featuresLong(spark, n)
      .withColumn("value_q",
        round(col("value") * 1000000.0, 0).cast("long"))
      .select("media_id", "feature", "value_q")
      .orderBy("media_id", "feature")

  /** F12b — HASHABLE media-feature summary: per feature, the row count
    * and the exact int64 sum of the e6-quantized values — the driver-
    * checkable dual of [[featuresLong]] (VERDICT r9 #1). Every number
    * is deterministic: payloads derive from media_id by fixed integer
    * formulas, codec feature math is integer sums + correctly-rounded
    * IEEE ops (÷, √), and quantization rounds HALF_UP per row in int
    * space BEFORE the order-independent integer sum — so the frame is
    * bit-identical on every machine and both engines can agree on a
    * spec-written fixture ([[mediaSummaryFixture]], asserted per-run
    * by MediaSummarySpec with hand-derived anchors). */
  def mediaSummary(spark: SparkSession, n: Int): DataFrame =
    featuresLong(spark, n)
      .withColumn("value_q", round(col("value") * 1000000.0, 0).cast("long"))
      .groupBy("feature")
      .agg(count(lit(1)).as("n_rows"), sum("value_q").as("sum_q"))
      .orderBy("feature")

  /** The spec-written fixture [[mediaSummary]] must reproduce at
    * n = 300 — (feature, n_rows, sum_q with values e6-quantized).
    * Provenance: audio rows are hand-derivable (±1000 square wave ⇒
    * rms exactly 1000 ⇒ sum_q = 100·10⁹; crossings every 4th sample ⇒
    * Σ⌊(len−1)/4⌋); the rest follow from the generator's integer pixel
    * formulas through the codec math — MediaSummarySpec re-derives the
    * audio block from first principles and pins the full table. The
    * oracle SQL in SparkEntry interpolates THIS value, so operator,
    * spec, and oracle share one spelling. */
  val mediaSummaryFixture: Seq[(String, Long, Long)] = Seq(
    ("brightness", 100L, 12743774667L),
    ("mean_luma", 100L, 12750000000L),
    ("motion", 100L, 3000000000L),
    ("n_frames", 100L, 600000000L),
    ("rms", 100L, 100000000000L),
    ("thumb_brightness", 100L, 12746642000L),
    ("zero_crossings", 100L, 1916000000L))

  /** Deterministic synthetic media table (no binary test fixtures in
    * the container); payload bytes derive from media_id. */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n).map { id =>
      val kind = if (id % 3 == 0) "video" else if (id % 3 == 1) "image" else "audio"
      val payload = Array.tabulate[Byte](16 + (id % 16).toInt)(i =>
        ((id * 31 + i * 7) % 251).toByte)
      MediaRow(id, kind, payload, 4, 4, 8 + (id % 8).toInt)
    }
  }
}
