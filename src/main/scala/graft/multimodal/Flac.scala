package graft.multimodal

/** Pure-Scala FLAC subset codec (mono, 16-bit) — the lossless compressed
  * audio path of the ingest battery. Real corpora ship compressed audio;
  * MP3/MP4 decode needs codecs the JDK lacks, but FLAC (the public xiph
  * spec) is pure-integer and LOSSLESS: decoded samples equal the staged
  * PCM bit-for-bit, so the same closed-form sample-statistics oracles
  * that gate the WAV path (m04/m09) replay verbatim — no tolerance
  * contract, unlike lossy JPEG's m11.
  *
  * Subset = the fixed-predictor profile (what `flac -l 0` emits):
  *  - encoder ([[encode]]): STREAMINFO + fixed-blocksize frames; per
  *    frame the best FIXED predictor order 0..4 by exact coded size,
  *    CONSTANT for flat blocks, VERBATIM when Rice does not pay;
  *    single-partition Rice residuals with exact-minimal parameter;
  *    CRC-8 frame headers + CRC-16 frame trailers per spec.
  *  - decoder ([[decodeSamples]]): CONSTANT / VERBATIM / FIXED 0-4
  *    subframes, both Rice methods (4- and 5-bit parameters) at any
  *    partition order including the raw-escape, wasted bits, both
  *    blocking strategies, all block-size codes and the sample-rate
  *    table. LPC subframes and multi-channel are rejected (None), as is
  *    any CRC mismatch or truncation — undecodable rows DROP, the
  *    ingest contract.
  *
  * Everything is big-endian bit-serial (MSB-first), the opposite of
  * WAV's little-endian byte order — the [[BitReader]]/[[BitWriter]]
  * pair is deliberately the only place bit order and sign extension
  * live.
  */
object Flac {

  /** True when the buffer starts with the fLaC stream marker. */
  def isFlac(bytes: Array[Byte]): Boolean =
    bytes != null && bytes.length >= 4 &&
      bytes(0) == 'f' && bytes(1) == 'L' && bytes(2) == 'a' && bytes(3) == 'C'

  // ---- CRCs (FLAC spec: CRC-8 poly 0x07 init 0; CRC-16 poly 0x8005
  // init 0, both MSB-first) ----------------------------------------------

  private[multimodal] def crc8(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= bytes(i) & 0xff
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x80) != 0) ((crc << 1) ^ 0x07) & 0xff else (crc << 1) & 0xff
        b += 1
      }
      i += 1
    }
    crc
  }

  private[multimodal] def crc16(bytes: Array[Byte], from: Int, until: Int): Int = {
    var crc = 0
    var i = from
    while (i < until) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x8005) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  // ---- bit-serial IO (MSB-first, the FLAC bit order) --------------------

  private[multimodal] final class BitWriter {
    private val out = new java.io.ByteArrayOutputStream()
    private var acc = 0L   // pending bits, MSB-aligned within the low `nAcc`
    private var nAcc = 0

    def writeBits(value: Long, n: Int): Unit = {
      require(n >= 0 && n <= 57, s"writeBits n=$n")
      if (n == 0) return
      acc = (acc << n) | (value & ((1L << n) - 1))
      nAcc += n
      while (nAcc >= 8) {
        out.write(((acc >>> (nAcc - 8)) & 0xff).toInt)
        nAcc -= 8
      }
    }

    /** FLAC unary: `value` zero bits then a one bit. */
    def writeUnary(value: Int): Unit = {
      var v = value
      while (v >= 32) { writeBits(0L, 32); v -= 32 }
      writeBits(1L, v + 1)
    }

    def alignToByte(): Unit = if (nAcc > 0) writeBits(0L, 8 - nAcc)

    def toBytes: Array[Byte] = { alignToByte(); out.toByteArray }
  }

  private[multimodal] final class BitReader(bytes: Array[Byte]) {
    private var pos = 0   // next byte
    private var bit = 0   // bits consumed of bytes(pos), 0..7
    var failed = false

    def bytePos: Int = pos
    def atByteBoundary: Boolean = bit == 0

    def skipToByte(): Unit = if (bit != 0) { bit = 0; pos += 1 }

    def readBits(n: Int): Long = {
      require(n >= 0 && n <= 57, s"readBits n=$n")
      var got = 0
      var v = 0L
      while (got < n) {
        if (pos >= bytes.length) { failed = true; return 0L }
        val avail = 8 - bit
        val take = math.min(avail, n - got)
        val chunk = ((bytes(pos) & 0xff) >>> (avail - take)) & ((1 << take) - 1)
        v = (v << take) | chunk
        got += take
        bit += take
        if (bit == 8) { bit = 0; pos += 1 }
      }
      v
    }

    /** Signed n-bit read (two's complement sign extension). */
    def readSigned(n: Int): Int = {
      if (n == 0) return 0
      val u = readBits(n)
      if (failed) 0
      else if ((u & (1L << (n - 1))) != 0) (u - (1L << n)).toInt
      else u.toInt
    }

    /** FLAC unary: count zero bits, consume the terminating one bit. */
    def readUnary(): Int = {
      var q = 0
      while (true) {
        if (pos >= bytes.length) { failed = true; return 0 }
        if (readBits(1) == 1L) return q
        q += 1
        if (q > (bytes.length.toLong * 8)) { failed = true; return 0 }
      }
      0 // unreachable
    }
  }

  // ---- fixed predictors --------------------------------------------------

  /** residual[i] of FIXED order `ord` at position i (i >= ord) — the
    * classic polynomial differences, exact in Long. */
  private def fixedResidual(s: Array[Int], ord: Int, i: Int): Long =
    (ord: @annotation.switch) match {
      case 0 => s(i)
      case 1 => s(i).toLong - s(i - 1)
      case 2 => s(i).toLong - 2L * s(i - 1) + s(i - 2)
      case 3 => s(i).toLong - 3L * s(i - 1) + 3L * s(i - 2) - s(i - 3)
      case 4 => s(i).toLong - 4L * s(i - 1) + 6L * s(i - 2) - 4L * s(i - 3) + s(i - 4)
    }

  /** In-place reconstruction: s currently holds warmup + residuals. */
  private def fixedRestore(s: Array[Long], ord: Int): Unit = {
    var i = ord
    while (i < s.length) {
      (ord: @annotation.switch) match {
        case 0 =>
        case 1 => s(i) += s(i - 1)
        case 2 => s(i) += 2L * s(i - 1) - s(i - 2)
        case 3 => s(i) += 3L * s(i - 1) - 3L * s(i - 2) + s(i - 3)
        case 4 => s(i) += 4L * s(i - 1) - 6L * s(i - 2) + 4L * s(i - 3) - s(i - 4)
      }
      i += 1
    }
  }

  private def zigzag(v: Long): Long = (v << 1) ^ (v >> 63)

  /** Exact Rice size in bits of one residual under parameter k. */
  private def riceBits(u: Long, k: Int): Long = (u >>> k) + 1 + k

  // ---- encoder -----------------------------------------------------------

  /** UTF-8-style coded number (the frame-number coding of the spec). */
  private def writeUtf8Number(bw: BitWriter, v: Long): Unit = {
    if (v < 0x80) bw.writeBits(v, 8)
    else if (v < 0x800) {
      bw.writeBits(0xC0L | (v >>> 6), 8); bw.writeBits(0x80L | (v & 0x3f), 8)
    } else if (v < 0x10000) {
      bw.writeBits(0xE0L | (v >>> 12), 8)
      bw.writeBits(0x80L | ((v >>> 6) & 0x3f), 8)
      bw.writeBits(0x80L | (v & 0x3f), 8)
    } else {
      // frame indices beyond 2^16 frames of 2^12 samples = 2^28 samples
      // per clip are outside any staged corpus; keep the ladder short
      bw.writeBits(0xF0L | (v >>> 18), 8)
      bw.writeBits(0x80L | ((v >>> 12) & 0x3f), 8)
      bw.writeBits(0x80L | ((v >>> 6) & 0x3f), 8)
      bw.writeBits(0x80L | (v & 0x3f), 8)
    }
  }

  private def readUtf8Number(br: BitReader): Long = {
    val b0 = br.readBits(8)
    if (br.failed) return -1
    if ((b0 & 0x80) == 0) return b0
    var n = 0
    var v = 0L
    if ((b0 & 0xE0) == 0xC0) { n = 1; v = b0 & 0x1f }
    else if ((b0 & 0xF0) == 0xE0) { n = 2; v = b0 & 0x0f }
    else if ((b0 & 0xF8) == 0xF0) { n = 3; v = b0 & 0x07 }
    else if ((b0 & 0xFC) == 0xF8) { n = 4; v = b0 & 0x03 }
    else if ((b0 & 0xFE) == 0xFC) { n = 5; v = b0 & 0x01 }
    else if (b0 == 0xFE) { n = 6; v = 0 }
    else { br.failed = true; return -1 }
    var i = 0
    while (i < n) {
      val b = br.readBits(8)
      if (br.failed || (b & 0xC0) != 0x80) { br.failed = true; return -1 }
      v = (v << 6) | (b & 0x3f)
      i += 1
    }
    v
  }

  /** Encode mono 16-bit PCM as a FLAC stream (fixed-predictor profile).
    * Deterministic: subframe type, predictor order and Rice parameter
    * are all exact-minimal-size argmins with lowest-wins tie-breaks. */
  def encode(samples: Array[Int], sampleRate: Int,
      blockSize: Int = 4096): Array[Byte] = {
    require(samples.nonEmpty, "empty clip")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize=$blockSize")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"sampleRate=$sampleRate")
    samples.foreach(s => require(s >= -32768 && s <= 32767, s"not 16-bit: $s"))

    val out = new java.io.ByteArrayOutputStream()
    out.write('f'); out.write('L'); out.write('a'); out.write('C')
    // STREAMINFO (last metadata block): header byte 0x80, 24-bit len 34
    val si = new BitWriter
    si.writeBits(0x80, 8); si.writeBits(34, 24)
    si.writeBits(blockSize.toLong, 16)      // min block size
    si.writeBits(blockSize.toLong, 16)      // max block size
    si.writeBits(0L, 24); si.writeBits(0L, 24) // frame sizes unknown
    si.writeBits(sampleRate.toLong, 20)
    si.writeBits(0L, 3)                     // channels - 1 = 0 (mono)
    si.writeBits(15L, 5)                    // bits/sample - 1 = 15
    si.writeBits(samples.length.toLong, 36) // total samples
    var md5 = 0
    while (md5 < 16) { si.writeBits(0L, 8); md5 += 1 } // MD5 unknown
    out.write(si.toBytes)

    var off = 0
    var frameIdx = 0L
    while (off < samples.length) {
      val n = math.min(blockSize, samples.length - off)
      val block = java.util.Arrays.copyOfRange(samples, off, off + n)
      out.write(encodeFrame(block, frameIdx))
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }

  private def encodeFrame(block: Array[Int], frameIdx: Long): Array[Byte] = {
    val n = block.length
    val bw = new BitWriter
    bw.writeBits(0x3FFEL, 14) // sync
    bw.writeBits(0L, 1)       // reserved
    bw.writeBits(0L, 1)       // blocking strategy: fixed
    bw.writeBits(7L, 4)       // block size: 16-bit (n-1) at header end
    bw.writeBits(0L, 4)       // sample rate: from STREAMINFO
    bw.writeBits(0L, 4)       // channel assignment: mono
    bw.writeBits(4L, 3)       // sample size: 16-bit
    bw.writeBits(0L, 1)       // reserved
    writeUtf8Number(bw, frameIdx)
    bw.writeBits((n - 1).toLong, 16)
    val headerSoFar = { bw.alignToByte(); bw.toBytes } // header is byte-aligned here
    bw.writeBits(crc8(headerSoFar, 0, headerSoFar.length).toLong, 8)

    // ---- subframe: CONSTANT if flat, else best FIXED order by exact
    // coded size (incl. the exact-minimal Rice parameter), else VERBATIM
    if (block.forall(_ == block(0))) {
      bw.writeBits(0L, 1); bw.writeBits(0L, 6); bw.writeBits(0L, 1)
      bw.writeBits(block(0).toLong & 0xffff, 16)
    } else {
      val maxOrd = math.min(4, n - 1)
      var bestOrd = -1
      var bestK = 0
      var bestBits = Long.MaxValue
      var ord = 0
      while (ord <= maxOrd) {
        // exact-minimal k for this order (residual count n-ord)
        var k = 0
        var bestOrdBits = Long.MaxValue
        var bestOrdK = 0
        while (k <= 30) {
          var bits = 0L
          var i = ord
          while (i < n && bits < Long.MaxValue / 2) {
            bits += riceBits(zigzag(fixedResidual(block, ord, i)), k)
            i += 1
          }
          if (bits < bestOrdBits) { bestOrdBits = bits; bestOrdK = k }
          k += 1
        }
        val total = ord.toLong * 16 + bestOrdBits
        if (total < bestBits) { bestBits = total; bestOrd = ord; bestK = bestOrdK }
        ord += 1
      }
      if (bestK > 14 || bestBits >= n.toLong * 16) {
        // Rice does not pay (white-noise block): VERBATIM
        bw.writeBits(0L, 1); bw.writeBits(1L, 6); bw.writeBits(0L, 1)
        var i = 0
        while (i < n) { bw.writeBits(block(i).toLong & 0xffff, 16); i += 1 }
      } else {
        bw.writeBits(0L, 1)
        bw.writeBits(8L | bestOrd.toLong, 6) // 0b001xxx = FIXED order xxx
        bw.writeBits(0L, 1)                  // no wasted bits
        var i = 0
        while (i < bestOrd) { bw.writeBits(block(i).toLong & 0xffff, 16); i += 1 }
        bw.writeBits(0L, 2)                  // residual method: RICE (4-bit)
        bw.writeBits(0L, 4)                  // partition order 0
        bw.writeBits(bestK.toLong, 4)
        i = bestOrd
        while (i < n) {
          val u = zigzag(fixedResidual(block, bestOrd, i))
          bw.writeUnary((u >>> bestK).toInt)
          bw.writeBits(u, bestK)
          i += 1
        }
      }
    }
    bw.alignToByte()
    val body = bw.toBytes
    val full = java.util.Arrays.copyOf(body, body.length + 2)
    val c = crc16(body, 0, body.length)
    full(body.length) = ((c >>> 8) & 0xff).toByte
    full(body.length + 1) = (c & 0xff).toByte
    full
  }

  // ---- decoder -----------------------------------------------------------

  /** Decode a FLAC stream to (sampleRate, samples). Mono 16-bit
    * fixed-predictor subset; None on LPC, multi-channel, other sample
    * widths, CRC mismatch, truncation, or any malformed structure. */
  def decodeSamples(bytes: Array[Byte]): Option[(Int, Array[Int])] = {
    if (!isFlac(bytes)) return None
    val br = new BitReader(bytes)
    br.readBits(32) // marker, validated above
    // ---- metadata blocks ----
    var last = false
    var siRate = -1
    var siBps = -1
    var siChannels = -1
    var totalSamples = -1L
    var sawStreamInfo = false
    while (!last) {
      last = br.readBits(1) == 1L
      val typ = br.readBits(7).toInt
      val len = br.readBits(24).toInt
      if (br.failed) return None
      if (typ == 0) {
        if (len != 34) return None
        sawStreamInfo = true
        br.readBits(16); br.readBits(16) // min/max block size
        br.readBits(24); br.readBits(24) // min/max frame size
        siRate = br.readBits(20).toInt
        siChannels = br.readBits(3).toInt + 1
        siBps = br.readBits(5).toInt + 1
        totalSamples = br.readBits(36)
        var i = 0
        while (i < 16) { br.readBits(8); i += 1 } // MD5
      } else {
        var i = 0
        while (i < len) { br.readBits(8); i += 1 }
      }
      if (br.failed) return None
    }
    if (!sawStreamInfo || siChannels != 1 || siBps != 16 || siRate <= 0)
      return None

    def decodeFrame(): Option[Array[Int]] = {
      val frameStart = br.bytePos
      if (br.readBits(14) != 0x3FFEL || br.failed) return None
      if (br.readBits(1) != 0L) return None // reserved
      val variableBlocking = br.readBits(1) == 1L
      val bsCode = br.readBits(4).toInt
      val srCode = br.readBits(4).toInt
      val chanCode = br.readBits(4).toInt
      val ssCode = br.readBits(3).toInt
      if (br.readBits(1) != 0L || br.failed) return None // reserved
      if (chanCode != 0) return None // mono only
      val bps = ssCode match {
        case 0 => siBps
        case 4 => 16
        case _ => -1
      }
      if (bps != 16) return None
      if (readUtf8Number(br) < 0) return None
      val blockSize = bsCode match {
        case 0 => return None // reserved
        case 1 => 192
        case c if c >= 2 && c <= 5 => 576 << (c - 2)
        case 6 => br.readBits(8).toInt + 1
        case 7 => br.readBits(16).toInt + 1
        case c => 256 << (c - 8)
      }
      srCode match {
        case 0 => ()
        case 12 => br.readBits(8)
        case 13 | 14 => br.readBits(16)
        case 15 => return None
        case _ => () // table rate, no extra field
      }
      if (br.failed || !br.atByteBoundary) return None
      val expectedCrc8 = crc8(bytes, frameStart, br.bytePos)
      if (br.readBits(8).toInt != expectedCrc8 || br.failed) return None

      // ---- one subframe (mono) ----
      if (br.readBits(1) != 0L) return None
      val sfType = br.readBits(6).toInt
      val wastedFlag = br.readBits(1) == 1L
      val wasted = if (wastedFlag) br.readUnary() + 1 else 0
      if (br.failed || wasted >= 16) return None
      val eff = 16 - wasted
      val s = new Array[Long](blockSize)
      if (sfType == 0) { // CONSTANT
        val v = br.readSigned(eff).toLong
        java.util.Arrays.fill(s, v)
      } else if (sfType == 1) { // VERBATIM
        var i = 0
        while (i < blockSize) { s(i) = br.readSigned(eff).toLong; i += 1 }
      } else if ((sfType & 0x38) == 0x08 && (sfType & 0x07) <= 4) { // FIXED
        val ord = sfType & 0x07
        if (ord > blockSize) return None
        var i = 0
        while (i < ord) { s(i) = br.readSigned(eff).toLong; i += 1 }
        // residuals
        val method = br.readBits(2).toInt
        if (method > 1) return None
        val paramBits = if (method == 0) 4 else 5
        val escape = (1 << paramBits) - 1
        val partOrd = br.readBits(4).toInt
        val nParts = 1 << partOrd
        if (blockSize % nParts != 0) return None
        var p = 0
        var idx = ord
        while (p < nParts) {
          val count = blockSize / nParts - (if (p == 0) ord else 0)
          if (count < 0) return None
          val k = br.readBits(paramBits).toInt
          if (k == escape) {
            val raw = br.readBits(5).toInt
            var j = 0
            while (j < count) { s(idx) = br.readSigned(raw).toLong; idx += 1; j += 1 }
          } else {
            var j = 0
            while (j < count) {
              val q = br.readUnary().toLong
              val low = br.readBits(k)
              val u = (q << k) | low
              s(idx) = (u >>> 1) ^ -(u & 1L)
              idx += 1; j += 1
            }
          }
          if (br.failed) return None
          p += 1
        }
        fixedRestore(s, ord)
      } else return None // LPC or reserved: outside the subset

      br.skipToByte()
      val expectedCrc16 = crc16(bytes, frameStart, br.bytePos)
      if (br.readBits(16).toInt != expectedCrc16 || br.failed) return None
      val out = new Array[Int](blockSize)
      var i = 0
      while (i < blockSize) {
        val v = s(i) << wasted
        if (v < -32768 || v > 32767) return None
        out(i) = v.toInt
        i += 1
      }
      val _ = variableBlocking // both strategies accepted
      Some(out)
    }

    val buf = new scala.collection.mutable.ArrayBuffer[Int]()
    while ((totalSamples <= 0 || buf.length < totalSamples) &&
      br.bytePos < bytes.length) {
      decodeFrame() match {
        case Some(fr) => buf ++= fr
        case None => return None
      }
    }
    if (totalSamples > 0 && buf.length != totalSamples) return None
    if (br.bytePos != bytes.length) return None // trailing junk
    Some((siRate, buf.toArray))
  }
}
