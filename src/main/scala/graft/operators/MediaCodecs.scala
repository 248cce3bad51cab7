package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** REAL pure-JVM codecs for the multimodal path (SURVEY §2.F12):
  * binary PPM (P6) images and RIFF/WAV PCM-16 mono audio are fully
  * decodable with no native libraries, so decode → transform →
  * feature-extract runs end-to-end on real bytes. Video remains the
  * declared stub ([[Multimodal.FakeCodec]]) — there is no pure-JVM
  * video codec — but the dispatch seam is identical, so a JNI codec
  * drops in per-kind.
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
}
