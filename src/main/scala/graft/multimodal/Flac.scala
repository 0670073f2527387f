package graft.multimodal

/** Pure-Scala FLAC subset codec (mono, 16-bit) — the lossless compressed
  * audio path of the ingest battery. Real corpora ship compressed audio;
  * MP3/MP4 decode needs codecs the JDK lacks, but FLAC (the public xiph
  * spec) is pure-integer and LOSSLESS: decoded samples equal the staged
  * PCM bit-for-bit, so the same closed-form sample-statistics oracles
  * that gate the WAV path (m04/m09) replay verbatim — no tolerance
  * contract, unlike lossy JPEG's m11.
  *
  * Subset = mono 16-bit, the full subframe family:
  *  - encoder ([[encode]]): STREAMINFO + fixed-blocksize frames; per
  *    frame the best FIXED predictor order 0..4 by exact coded size
  *    (what `flac -l 0` emits), CONSTANT for flat blocks, VERBATIM when
  *    Rice does not pay; Rice residuals at any requested partition
  *    order with exact-minimal per-partition parameters and the raw
  *    escape; CRC-8 frame headers + CRC-16 frame trailers per spec.
  *    [[encodeLpc]] emits LPC subframes with caller-supplied integer
  *    coefficients (integer-exact, so round trips stay bit-perfect).
  *  - decoder ([[decodeSamples]]): CONSTANT / VERBATIM / FIXED 0-4 /
  *    LPC 1-32 subframes, both Rice methods (4- and 5-bit parameters)
  *    at any partition order including the raw-escape, wasted bits,
  *    both blocking strategies, all block-size codes and the
  *    sample-rate table — i.e. any spec-valid mono-16-bit stream,
  *    including default `flac` output. Multi-channel and other sample
  *    widths are rejected (None), as is any CRC mismatch or
  *    truncation — undecodable rows DROP, the ingest contract.
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
    * are all exact-minimal-size argmins with lowest-wins tie-breaks.
    *
    * `partitionOrder` > 0 splits each frame's residual into 2^p Rice
    * partitions with independent exact-minimal parameters (clamped per
    * frame when the block size does not divide); `rice2` selects the
    * 5-bit-parameter residual method. Both default off — the spec's
    * simplest profile — and exist chiefly so the decoder's partition /
    * Rice2 / raw-escape paths are exercised by REAL encoded streams,
    * not synthetic bit fiddling. */
  def encode(samples: Array[Int], sampleRate: Int,
      blockSize: Int = 4096, partitionOrder: Int = 0,
      rice2: Boolean = false): Array[Byte] =
    encodeWith(samples, sampleRate, blockSize, partitionOrder, rice2, None)

  /** LPC-subframe encoder with CALLER-SUPPLIED integer coefficients and
    * shift (applied to every frame) — the integer-exact way to exercise
    * the decoder's LPC reconstruction with real streams: residuals are
    * computed with the same `(Σ coef·s) >> shift` prediction the decoder
    * inverts, so decode(encodeLpc(pcm)) == pcm bit-for-bit for ANY
    * coefficient choice. Test/interop support, hence package-private
    * (a production LPC analyzer — Levinson-Durbin — is out of scope;
    * the DECODER accepts any spec-valid LPC stream regardless). */
  private[graft] def encodeLpc(samples: Array[Int], sampleRate: Int,
      coefs: Array[Int], shift: Int, blockSize: Int = 4096,
      partitionOrder: Int = 0, rice2: Boolean = false): Array[Byte] = {
    require(coefs.nonEmpty && coefs.length <= 32, s"lpc order ${coefs.length}")
    require(shift >= 0 && shift <= 15, s"lpc shift $shift")
    val prec = math.max(2, coefs.map(c =>
      64 - java.lang.Long.numberOfLeadingZeros(if (c >= 0) c.toLong else ~c.toLong) + 1
    ).max.toInt)
    require(prec <= 15, s"lpc coefficients need $prec bits > 15")
    encodeWith(samples, sampleRate, blockSize, partitionOrder, rice2,
      Some((coefs, shift, prec)))
  }

  private def encodeWith(samples: Array[Int], sampleRate: Int,
      blockSize: Int, partitionOrder: Int, rice2: Boolean,
      lpc: Option[(Array[Int], Int, Int)]): Array[Byte] = {
    require(samples.nonEmpty, "empty clip")
    require(blockSize >= 16 && blockSize <= 65535, s"blockSize=$blockSize")
    require(partitionOrder >= 0 && partitionOrder <= 15, s"partitionOrder=$partitionOrder")
    require(sampleRate > 0 && sampleRate < (1 << 20), s"sampleRate=$sampleRate")
    samples.foreach(s => require(s >= -32768 && s <= 32767, s"not 16-bit: $s"))
    lpc.foreach { case (c, _, _) =>
      require(samples.length >= c.length, "clip shorter than the LPC order") }
    // the 4-byte UTF-8-number ladder in writeUtf8Number encodes frame
    // INDICES up to 2^21 - 1, so a clip may have AT MOST 2^21 frames;
    // fail loudly instead of emitting an undecodable stream
    require((samples.length.toLong + blockSize - 1) / blockSize <= (1L << 21),
      s"clip needs > 2^21 frames at blockSize=$blockSize; raise blockSize")

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
      out.write(encodeFrame(block, frameIdx, partitionOrder, rice2, lpc))
      off += n
      frameIdx += 1
    }
    out.toByteArray
  }

  /** Minimal two's-complement width of a value (0 → 0 bits — the spec's
    * all-zero raw partition). */
  private def signedWidth(v: Long): Int =
    if (v == 0) 0
    else 65 - java.lang.Long.numberOfLeadingZeros(if (v > 0) v else ~v)

  /** Exact-minimal residual-section plan: effective partition order
    * (clamped so the block divides and the first partition is
    * non-negative), and per partition either Left(best Rice k) or
    * Right(raw width) when the all-ones escape codes smaller. Returns
    * (effPartOrder, plans, total section bits incl. method/order/param
    * fields). Deterministic: lowest k wins ties, Rice wins a tie with
    * the escape. */
  private def planResidual(res: Array[Long], ord: Int, n: Int,
      reqPartOrd: Int, paramBits: Int): (Int, Array[Either[Int, Int]], Long) = {
    var p = reqPartOrd
    while (p > 0 && (n % (1 << p) != 0 || n / (1 << p) <= ord)) p -= 1
    val nParts = 1 << p
    val escape = (1 << paramBits) - 1
    val plans = new Array[Either[Int, Int]](nParts)
    var totalBits = 2L + 4L + nParts.toLong * paramBits
    var pi = 0
    var idx = 0
    while (pi < nParts) {
      val count = n / nParts - (if (pi == 0) ord else 0)
      var bestK = 0
      var bestKBits = Long.MaxValue
      var k = 0
      while (k < escape) {
        var bits = 0L
        var j = 0
        while (j < count && bits < (1L << 40)) {
          bits += riceBits(zigzag(res(idx + j)), k)
          j += 1
        }
        if (bits < bestKBits) { bestKBits = bits; bestK = k }
        k += 1
      }
      var w = 0
      var j = 0
      while (j < count) {
        val sw = signedWidth(res(idx + j)); if (sw > w) w = sw; j += 1
      }
      val escBits = 5L + count.toLong * w
      if (w <= 31 && escBits < bestKBits) {
        plans(pi) = Right(w); totalBits += escBits
      } else {
        plans(pi) = Left(bestK); totalBits += bestKBits
      }
      idx += count
      pi += 1
    }
    (p, plans, totalBits)
  }

  private def writeResidual(bw: BitWriter, res: Array[Long], ord: Int,
      n: Int, partOrd: Int, plans: Array[Either[Int, Int]],
      paramBits: Int): Unit = {
    bw.writeBits(if (paramBits == 4) 0L else 1L, 2)
    bw.writeBits(partOrd.toLong, 4)
    val nParts = 1 << partOrd
    val escape = (1 << paramBits) - 1
    var pi = 0
    var idx = 0
    while (pi < nParts) {
      val count = n / nParts - (if (pi == 0) ord else 0)
      plans(pi) match {
        case Right(w) =>
          bw.writeBits(escape.toLong, paramBits)
          bw.writeBits(w.toLong, 5)
          var j = 0
          while (j < count) { bw.writeBits(res(idx + j), w); j += 1 }
        case Left(k) =>
          bw.writeBits(k.toLong, paramBits)
          var j = 0
          while (j < count) {
            val u = zigzag(res(idx + j))
            bw.writeUnary((u >>> k).toInt)
            bw.writeBits(u, k)
            j += 1
          }
      }
      idx += count
      pi += 1
    }
  }

  private def encodeFrame(block: Array[Int], frameIdx: Long,
      reqPartOrd: Int, rice2: Boolean,
      lpc: Option[(Array[Int], Int, Int)]): Array[Byte] = {
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

    // ---- subframe: LPC when forced by the caller, CONSTANT if flat,
    // else best FIXED order by exact coded size, else VERBATIM.
    // Wasted-bits detection first (spec: when every sample shares w
    // trailing zero bits — upscaled/quantized audio — the subframe
    // codes s >> w at 16-w bits and flags w in its header): applies to
    // the CONSTANT/VERBATIM/FIXED paths; the LPC path keeps wasted=0
    // (caller-supplied coefficients are defined against raw samples).
    val paramBits = if (rice2) 5 else 4
    val wasted = if (lpc.isDefined) 0 else {
      var w = 16
      var any = false
      var i = 0
      while (i < n && w > 0) {
        val v = block(i)
        if (v != 0) {
          any = true
          w = math.min(w, java.lang.Integer.numberOfTrailingZeros(v))
        }
        i += 1
      }
      if (!any) 0 else math.min(w, 15)
    }
    val eff = 16 - wasted
    val blk = if (wasted == 0) block else block.map(_ >> wasted)
    def writeWastedFlag(): Unit =
      if (wasted == 0) bw.writeBits(0L, 1)
      else { bw.writeBits(1L, 1); bw.writeUnary(wasted - 1) }
    def writeVerbatim(): Unit = {
      bw.writeBits(0L, 1); bw.writeBits(1L, 6); writeWastedFlag()
      var i = 0
      while (i < n) {
        bw.writeBits(blk(i).toLong & ((1L << eff) - 1), eff); i += 1
      }
    }
    lpc match {
      case Some((coefs, shift, prec)) if n > coefs.length =>
        val ord = coefs.length
        val res = new Array[Long](n - ord)
        var i = ord
        while (i < n) {
          var acc = 0L
          var j = 0
          while (j < ord) { acc += coefs(j).toLong * block(i - 1 - j); j += 1 }
          res(i - ord) = block(i).toLong - (acc >> shift)
          i += 1
        }
        val (pOrd, plans, _) = planResidual(res, ord, n, reqPartOrd, paramBits)
        bw.writeBits(0L, 1)
        bw.writeBits(0x20L | (ord - 1).toLong, 6) // 0b1xxxxx = LPC order-1
        bw.writeBits(0L, 1)                       // no wasted bits (raw-coef path)
        i = 0
        while (i < ord) { bw.writeBits(block(i).toLong & 0xffff, 16); i += 1 }
        bw.writeBits((prec - 1).toLong, 4)
        bw.writeBits(shift.toLong, 5)
        i = 0
        while (i < ord) { bw.writeBits(coefs(i).toLong, prec); i += 1 }
        writeResidual(bw, res, ord, n, pOrd, plans, paramBits)
      case Some(_) =>
        // last frame shorter than the LPC order: no prediction possible
        writeVerbatim()
      case None if blk.forall(_ == blk(0)) =>
        bw.writeBits(0L, 1); bw.writeBits(0L, 6); writeWastedFlag()
        bw.writeBits(blk(0).toLong & ((1L << eff) - 1), eff)
      case None =>
        val maxOrd = math.min(4, n - 1)
        var bestOrd = -1
        var bestPlan: (Int, Array[Either[Int, Int]], Long) = null
        var bestRes: Array[Long] = null
        var bestBits = Long.MaxValue
        var ord = 0
        while (ord <= maxOrd) {
          val res = new Array[Long](n - ord)
          var i = ord
          while (i < n) { res(i - ord) = fixedResidual(blk, ord, i); i += 1 }
          val plan = planResidual(res, ord, n, reqPartOrd, paramBits)
          val total = ord.toLong * eff + plan._3
          if (total < bestBits) {
            bestBits = total; bestOrd = ord; bestPlan = plan; bestRes = res
          }
          ord += 1
        }
        if (bestBits >= n.toLong * eff) writeVerbatim() // Rice does not pay
        else {
          bw.writeBits(0L, 1)
          bw.writeBits(8L | bestOrd.toLong, 6) // 0b001xxx = FIXED order xxx
          writeWastedFlag()
          var i = 0
          while (i < bestOrd) {
            bw.writeBits(blk(i).toLong & ((1L << eff) - 1), eff); i += 1
          }
          writeResidual(bw, bestRes, bestOrd, n, bestPlan._1, bestPlan._2,
            paramBits)
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

  /** Coded-residual section shared by the FIXED and LPC subframes: 2-bit
    * method (Rice/Rice2), 4-bit partition order, per-partition parameter
    * with the all-ones raw-bits escape. Fills s(ord until blockSize) with
    * residual values; false on any malformation. */
  private def readResidual(br: BitReader, s: Array[Long], ord: Int,
      blockSize: Int): Boolean = {
    val method = br.readBits(2).toInt
    if (br.failed || method > 1) return false
    val paramBits = if (method == 0) 4 else 5
    val escape = (1 << paramBits) - 1
    val partOrd = br.readBits(4).toInt
    val nParts = 1 << partOrd
    if (br.failed || blockSize % nParts != 0) return false
    var p = 0
    var idx = ord
    while (p < nParts) {
      val count = blockSize / nParts - (if (p == 0) ord else 0)
      // RFC 9639: blockSize >> partOrd must be STRICTLY greater than the
      // predictor order, so a zero-sample first partition is spec-invalid
      if (count <= 0) return false
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
      if (br.failed) return false
      p += 1
    }
    true
  }

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
        if (!readResidual(br, s, ord, blockSize)) return None
        fixedRestore(s, ord)
      } else if ((sfType & 0x20) != 0) { // LPC, order = (type & 0x1F) + 1
        val ord = (sfType & 0x1f) + 1
        if (ord > blockSize) return None
        var i = 0
        while (i < ord) { s(i) = br.readSigned(eff).toLong; i += 1 }
        val precM1 = br.readBits(4).toInt
        if (precM1 == 15 || br.failed) return None // 0b1111 invalid per spec
        val prec = precM1 + 1
        val shift = br.readSigned(5)
        // negative shift is reserved-in-practice (libFLAC never emits it
        // and defines no right-shift-by-negative); reject, don't guess
        if (shift < 0) return None
        val coefs = new Array[Long](ord)
        i = 0
        while (i < ord) { coefs(i) = br.readSigned(prec).toLong; i += 1 }
        if (br.failed || !readResidual(br, s, ord, blockSize)) return None
        // restore: s[i] = residual + ((Σ coef[j]·s[i-1-j]) >> shift) —
        // the SUM is arithmetic-shifted, all in Long (exact: |coef| <
        // 2^15, |s| ≤ 2^17-ish through any 16-bit-input prediction)
        i = ord
        while (i < blockSize) {
          var acc = 0L
          var j = 0
          while (j < ord) { acc += coefs(j) * s(i - 1 - j); j += 1 }
          s(i) += (acc >> shift)
          i += 1
        }
      } else return None // reserved subframe types

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
