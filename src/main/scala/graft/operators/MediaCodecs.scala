package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the multimodal path (SURVEY §2.F12):
  * binary PPM (P6) images, RIFF/WAV PCM-16 mono audio, and YUV4MPEG2
  * (Y4M) uncompressed video are fully decodable with no native
  * libraries, so decode → transform → feature-extract runs end-to-end
  * on real bytes for all three modalities. Compressed formats (JPEG,
  * H.264, …) would drop in behind the same per-kind dispatch seam via
  * JNI ([[Multimodal.FakeCodec]] demonstrates that seam).
  */
object MediaCodecs {

  /** Binary PPM (P6): `P6\n<w> <h>\n<maxval>\n` + w·h·3 raw RGB bytes. */
  object Ppm {
    def encode(w: Int, h: Int, rgb: Array[Int]): Array[Byte] = {
      require(rgb.length == w * h * 3, s"rgb length ${rgb.length} != ${w * h * 3}")
      val header = s"P6\n$w $h\n255\n".getBytes("US-ASCII")
      header ++ rgb.map(v => (v & 0xff).toByte)
    }

    /** @return (width, height, rgb values 0..255). Throws on malformed
      *         input — a corrupt payload must surface, not yield fake
      *         pixels. */
    def decode(payload: Array[Byte]): (Int, Int, Array[Int]) = {
      def fail(why: String) =
        throw new IllegalArgumentException(s"malformed PPM: $why")
      if (payload.length < 2 || payload(0) != 'P' || payload(1) != '6')
        fail("missing P6 magic")
      // Header = 4 whitespace-separated tokens (magic, w, h, maxval),
      // then ONE whitespace byte, then raw pixel data.
      var i = 2
      val tokens = new scala.collection.mutable.ArrayBuffer[Long](3)
      while (tokens.length < 3 && i < payload.length) {
        while (i < payload.length && payload(i).toChar.isWhitespace) i += 1
        var v = -1L
        while (i < payload.length && payload(i) >= '0' && payload(i) <= '9') {
          v = (if (v < 0) 0L else v) * 10 + (payload(i) - '0')
          // Reject oversized tokens while still in Long range — a
          // 20-digit header would wrap even the Long accumulator.
          if (v > Int.MaxValue) fail(s"header token too large")
          i += 1
        }
        if (v < 0) fail("truncated header")
        tokens += v
      }
      if (tokens.length < 3) fail("truncated header")
      i += 1 // the single whitespace after maxval
      // All range checks run on the Long tokens BEFORE narrowing to
      // Int — a .toInt first would TRUNCATE (4294967297L.toInt == 1)
      // and let an adversarial header pass every check yet decode
      // wrong dimensions from a tiny payload.
      if (tokens(2) != 255L) fail(s"unsupported maxval ${tokens(2)}")
      if (tokens(0) <= 0 || tokens(1) <= 0)
        fail(s"bad dimensions ${tokens(0)}x${tokens(1)}")
      if (tokens(0) * tokens(1) * 3 > Int.MaxValue)
        fail(s"dimensions overflow: ${tokens(0)}x${tokens(1)}")
      val (w, h) = (tokens(0).toInt, tokens(1).toInt)
      val n = w * h * 3
      if (payload.length - i < n)
        fail(s"pixel data truncated: ${payload.length - i} < $n")
      val rgb = new Array[Int](n)
      var j = 0
      while (j < n) { rgb(j) = payload(i + j) & 0xff; j += 1 }
      (w, h, rgb)
    }

    /** Nearest-neighbor resize — the cheap pre-embedding normalization
      * every image pipeline runs before the model sees pixels. */
    def resize(w: Int, h: Int, rgb: Array[Int], ow: Int, oh: Int): Array[Int] = {
      val out = new Array[Int](ow * oh * 3)
      var y = 0
      while (y < oh) {
        val sy = y * h / oh
        var x = 0
        while (x < ow) {
          val sx = x * w / ow
          val si = (sy * w + sx) * 3
          val di = (y * ow + x) * 3
          out(di) = rgb(si); out(di + 1) = rgb(si + 1); out(di + 2) = rgb(si + 2)
          x += 1
        }
        y += 1
      }
      out
    }

    /** Mean Rec.601 luma over all pixels. */
    def brightness(rgb: Array[Int]): Double = {
      var acc = 0.0
      var i = 0
      while (i < rgb.length) {
        acc += 0.299 * rgb(i) + 0.587 * rgb(i + 1) + 0.114 * rgb(i + 2)
        i += 3
      }
      if (rgb.isEmpty) 0.0 else acc / (rgb.length / 3)
    }
  }

  /** RIFF/WAV, PCM 16-bit little-endian mono — the canonical 44-byte
    * header + samples layout. */
  object Wav {
    def encode(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val dataLen = samples.length * 2
      val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2) // block align
        .putShort(16) // bits per sample
        .put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(bb.putShort)
      bb.array()
    }

    /** @return (sampleRate, samples). Throws on malformed input. */
    def decode(payload: Array[Byte]): (Int, Array[Short]) = {
      def fail(why: String) =
        throw new IllegalArgumentException(s"malformed WAV: $why")
      if (payload.length < 44) fail("shorter than header")
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      val magic = new Array[Byte](4)
      bb.get(magic); if (new String(magic, "US-ASCII") != "RIFF") fail("no RIFF")
      bb.getInt
      bb.get(magic); if (new String(magic, "US-ASCII") != "WAVE") fail("no WAVE")
      bb.get(magic); if (new String(magic, "US-ASCII") != "fmt ") fail("no fmt")
      val fmtLen = bb.getInt
      val audioFormat = bb.getShort
      val channels = bb.getShort
      val sampleRate = bb.getInt
      bb.getInt; bb.getShort
      val bits = bb.getShort
      if (audioFormat != 1 || channels != 1 || bits != 16)
        fail(s"unsupported format=$audioFormat ch=$channels bits=$bits")
      bb.position(20 + fmtLen)
      bb.get(magic); if (new String(magic, "US-ASCII") != "data") fail("no data chunk")
      val dataLen = bb.getInt
      if (bb.remaining() < dataLen) fail("sample data truncated")
      val samples = new Array[Short](dataLen / 2)
      var i = 0
      while (i < samples.length) { samples(i) = bb.getShort; i += 1 }
      (sampleRate, samples)
    }

    def rms(samples: Array[Short]): Double =
      if (samples.isEmpty) 0.0
      else math.sqrt(samples.foldLeft(0.0)((a, s) => a + s.toDouble * s) / samples.length)

    def zeroCrossings(samples: Array[Short]): Int = {
      var n = 0
      var i = 1
      while (i < samples.length) {
        if ((samples(i - 1) < 0) != (samples(i) < 0)) n += 1
        i += 1
      }
      n
    }
  }

  /** YUV4MPEG2 (Y4M) — the uncompressed video interchange format:
    * one ASCII stream header (`YUV4MPEG2 W<w> H<h> F<n>:<d> ...`),
    * then per frame an ASCII `FRAME` marker followed by raw planes.
    * Supported colorspaces: C420 family (Y w·h + Cb,Cr at w/2·h/2 —
    * the default when the C tag is absent) and Cmono (Y plane only).
    * Decode returns the luma planes — what feature extraction and
    * frame sampling consume; chroma is parsed past, not retained.
    */
  object Y4m {
    private val Magic = "YUV4MPEG2"

    /** Encode luma frames as C420jpeg with neutral (128) chroma. */
    def encode(w: Int, h: Int, fps: Int, frames: Seq[Array[Byte]]): Array[Byte] = {
      require(w > 0 && h > 0 && w % 2 == 0 && h % 2 == 0,
        s"C420 needs positive even dims, got ${w}x$h")
      frames.foreach(f => require(f.length == w * h,
        s"luma plane length ${f.length} != ${w * h}"))
      val header = s"$Magic W$w H$h F$fps:1 Ip A1:1 C420jpeg\n".getBytes("US-ASCII")
      val chroma = Array.fill[Byte]((w / 2) * (h / 2) * 2)(128.toByte)
      val frameMark = "FRAME\n".getBytes("US-ASCII")
      val out = ByteBuffer.allocate(header.length +
        frames.map(f => frameMark.length + f.length + chroma.length).sum)
      out.put(header)
      frames.foreach { f => out.put(frameMark).put(f).put(chroma) }
      out.array()
    }

    /** @return (width, height, luma planes, one w·h array per frame).
      *         Throws on malformed input — a corrupt payload must
      *         surface, not yield fake frames. */
    def decode(payload: Array[Byte]): (Int, Int, Array[Array[Byte]]) = {
      def fail(why: String) =
        throw new IllegalArgumentException(s"malformed Y4M: $why")
      // ---- stream header: one ASCII line ----
      var eol = 0
      while (eol < payload.length && payload(eol) != '\n') eol += 1
      if (eol >= payload.length) fail("no header line")
      val header = new String(payload, 0, eol, "US-ASCII")
      val tags = header.split(' ')
      if (tags.isEmpty || tags(0) != Magic) fail("missing YUV4MPEG2 magic")
      var w = -1L; var h = -1L; var cs = "420jpeg"
      tags.drop(1).filter(_.nonEmpty).foreach { t =>
        (t.charAt(0), t.drop(1)) match {
          case ('W', v) => w = parsePositive(v, fail)
          case ('H', v) => h = parsePositive(v, fail)
          case ('C', v) => cs = v
          case _        => () // F/I/A/X tags don't affect plane layout
        }
      }
      if (w <= 0 || h <= 0) fail(s"missing or bad dimensions ${w}x$h")
      // All range checks run on Long BEFORE narrowing (same discipline
      // as Ppm.decode) — and each DIMENSION is bounded before the
      // product: parsePositive admits 10-digit values, so w·h itself
      // could wrap past 2^63 and slip a tiny/negative frame size past
      // the product check below.
      if (w > Int.MaxValue || h > Int.MaxValue)
        fail(s"dimensions overflow: ${w}x$h")
      val mono = cs == "mono"
      if (!mono && !cs.startsWith("420")) fail(s"unsupported colorspace C$cs")
      if (!mono && (w % 2 != 0 || h % 2 != 0))
        fail(s"C420 needs even dims, got ${w}x$h")
      val frameSizeL = if (mono) w * h else w * h + 2L * ((w / 2) * (h / 2))
      if (frameSizeL > Int.MaxValue) fail(s"dimensions overflow: ${w}x$h")
      val ySize = (w * h).toInt
      val frameSize = frameSizeL.toInt
      // ---- frames: FRAME[ params]\n + planes, until end of payload ----
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
      var i = eol + 1
      while (i < payload.length) {
        var fEol = i
        while (fEol < payload.length && payload(fEol) != '\n') fEol += 1
        if (fEol >= payload.length) fail("truncated FRAME marker")
        val mark = new String(payload, i, fEol - i, "US-ASCII")
        if (mark != "FRAME" && !mark.startsWith("FRAME ")) fail("missing FRAME marker")
        if (payload.length - (fEol + 1) < frameSize)
          fail(s"frame ${frames.length} truncated: " +
            s"${payload.length - fEol - 1} < $frameSize bytes")
        frames += java.util.Arrays.copyOfRange(payload, fEol + 1, fEol + 1 + ySize)
        i = fEol + 1 + frameSize
      }
      if (frames.isEmpty) fail("zero frames")
      (w.toInt, h.toInt, frames.toArray)
    }

    private def parsePositive(s: String, fail: String => Nothing): Long = {
      if (s.isEmpty || !s.forall(c => c >= '0' && c <= '9'))
        fail(s"bad header int '$s'")
      if (s.length > 10) fail("header token too large")
      s.toLong
    }

    /** Mean luma of one frame (0..255). */
    def meanLuma(frame: Array[Byte]): Double =
      if (frame.isEmpty) 0.0
      else {
        var acc = 0L; var i = 0
        while (i < frame.length) { acc += frame(i) & 0xff; i += 1 }
        acc.toDouble / frame.length
      }

    /** Mean absolute luma difference between two frames — the cheap
      * motion proxy a sampling pipeline uses to drop static clips. */
    def motion(a: Array[Byte], b: Array[Byte]): Double = {
      require(a.length == b.length, s"frame size mismatch ${a.length}/${b.length}")
      if (a.isEmpty) 0.0
      else {
        var acc = 0L; var i = 0
        while (i < a.length) { acc += math.abs((a(i) & 0xff) - (b(i) & 0xff)); i += 1 }
        acc.toDouble / a.length
      }
    }
  }
}
