package graft

import graft.multimodal.{Flac, Multimodal}
import org.scalatest.funsuite.AnyFunSuite

/** The FLAC codec's LOSSLESS contract: decode(encode(pcm)) == pcm
  * bit-for-bit on every subframe family the encoder can emit, and every
  * malformation (CRC, truncation, trailing junk, unsupported shapes)
  * returns None instead of wrong samples. Pure-JVM — no Spark session. */
class FlacSpec extends AnyFunSuite {

  private def roundTrip(s: Array[Int], rate: Int = 16000,
      blockSize: Int = 4096): Array[Int] = {
    val flac = Flac.encode(s, rate, blockSize)
    assert(Flac.isFlac(flac), "encoder must emit a signed stream")
    val (r, back) = Flac.decodeSamples(flac).getOrElse(
      fail(s"decode failed on ${s.length}-sample clip"))
    assert(r == rate, s"rate $r != $rate")
    back
  }

  test("round-trip is bit-exact across subframe families") {
    // CONSTANT: flat block
    val const = Array.fill(100)(-1234)
    assert(roundTrip(const).sameElements(const))
    // FIXED order 1/2 friendly: linear ramp and smooth quadratic-ish
    val ramp = Array.tabulate(500)(i => i * 13 - 3000)
    assert(roundTrip(ramp).sameElements(ramp))
    val smooth = Array.tabulate(800)(i =>
      (8000 * math.sin(i / 25.0)).toInt)
    assert(roundTrip(smooth).sameElements(smooth))
    // white-noise-ish (the VERBATIM escape hatch): deterministic LCG
    var seed = 12345L
    val noise = Array.fill(300) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      ((seed >>> 33) % 65536 - 32768).toInt
    }
    assert(roundTrip(noise).sameElements(noise))
    // the synthetic corpus signal (what the m13 gate stages)
    val synth = Array.tabulate(70)(i => (((7L * 37 + i * 13) % 4001) - 2000).toInt)
    assert(roundTrip(synth).sameElements(synth))
    // 16-bit extremes survive sign handling
    val extremes = Array(-32768, 32767, -32768, 32767, 0, -1, 1, -32768)
    assert(roundTrip(extremes).sameElements(extremes))
    // single sample, and a clip shorter than any block
    assert(roundTrip(Array(-7)).sameElements(Array(-7)))
    assert(roundTrip(Array(3, -3, 3)).sameElements(Array(3, -3, 3)))
  }

  test("multi-frame streams: frame sequencing and short last frame") {
    val s = Array.tabulate(1000)(i => (i * 31 % 4001) - 2000)
    // 1000 samples at blockSize 64 = 15 full frames + one 40-sample tail
    assert(roundTrip(s, rate = 8000, blockSize = 64).sameElements(s))
    // blockSize 16 (the spec minimum): 62 full frames + tail
    assert(roundTrip(s, blockSize = 16).sameElements(s))
  }

  test("compression actually pays on smooth signals") {
    val smooth = Array.tabulate(4000)(i => (8000 * math.sin(i / 40.0)).toInt)
    val flac = Flac.encode(smooth, 16000)
    assert(flac.length < smooth.length * 2 / 2 + 200,
      s"smooth 4000-sample clip should beat 8000 raw bytes, got ${flac.length}")
    assert(flac.length < 6000,
      s"order-2 prediction should compress the sine well, got ${flac.length}")
  }

  test("partitioned Rice, Rice2, raw escape, and LPC subframes round-trip bit-exact") {
    val s = Array.tabulate(512)(i => (3000 * math.sin(i / 17.0)).toInt + (i % 7) - 3)
    // partition orders 1..4 at both Rice methods: real partitioned streams
    for (p <- 1 to 4; r2 <- Seq(false, true)) {
      val flac = Flac.encode(s, 16000, blockSize = 128, partitionOrder = p,
        rice2 = r2)
      val (_, back) = Flac.decodeSamples(flac).getOrElse(
        fail(s"decode failed at partitionOrder=$p rice2=$r2"))
      assert(back.sameElements(s), s"partitionOrder=$p rice2=$r2 diverged")
    }
    // the raw escape: a constant-magnitude alternating signal makes
    // every order-0 residual exactly 13 bits wide — fixed-width raw
    // (13 bits) beats the best Rice (k=12 → 14 bits/sample) AND beats
    // verbatim (16), so the encoder must pick the escape and the
    // decoder must invert it; the size check proves the escape branch
    // actually ran (verbatim would be ≥ 2 bytes/sample)
    val wild = Array.tabulate(200)(i => if (i % 2 == 0) 2048 else -2048)
    val wildFlac = Flac.encode(wild, 8000, blockSize = 64)
    assert(Flac.decodeSamples(wildFlac).get._2.sameElements(wild))
    // verbatim would cost 42 (stream header) + 4 frames × (~12 overhead
    // + 128 payload) ≈ 490 bytes; 13-bit escape coding lands ~420
    assert(wildFlac.length < 450,
      s"escape coding should beat verbatim (~490), got ${wildFlac.length} bytes")
    // LPC: arbitrary integer coefficients, several orders and shifts —
    // the reconstruction (Σ coef·s) >> shift must invert exactly
    val lpcCases = Seq(
      (Array(2, -1), 0),            // the fixed-order-2 polynomial as LPC
      (Array(3, -3, 1), 0),         // fixed-order-3
      (Array(13, -7, 2), 3),        // fractional predictor, shift 3
      (Array(-5, 9, -4, 1, 2), 5),  // order 5, shift 5
      (Array(1), 1))                // order 1, half-weight
    for ((coefs, shift) <- lpcCases; r2 <- Seq(false, true)) {
      val flac = Flac.encodeLpc(s, 16000, coefs, shift, blockSize = 128,
        partitionOrder = 2, rice2 = r2)
      val (_, back) = Flac.decodeSamples(flac).getOrElse(
        fail(s"LPC decode failed coefs=${coefs.toSeq} shift=$shift rice2=$r2"))
      assert(back.sameElements(s),
        s"LPC coefs=${coefs.toSeq} shift=$shift rice2=$r2 diverged")
    }
    // last frame shorter than the LPC order falls back to VERBATIM
    val short = Array.tabulate(130)(i => i * 11 - 700) // 128 + 2-sample tail
    val lf = Flac.encodeLpc(short, 16000, Array(-5, 9, -4, 1, 2), 5,
      blockSize = 128)
    assert(Flac.decodeSamples(lf).get._2.sameElements(short))
    // wasted bits: every sample a multiple of 2^6 — the subframe codes
    // s >> 6 at 10 bits and the decoder restores the shift; the size
    // assertion proves the wasted-bits branch actually ran (a 16-bit
    // coding of this noise-ish signal could not reach ~10.5 bits/sample)
    var seed = 99L
    val scaled = Array.fill(400) {
      seed = seed * 6364136223846793005L + 1442695040888963407L
      (((seed >>> 40) % 512).toInt - 256) * 64
    }
    val sf = Flac.encode(scaled, 16000, blockSize = 128)
    assert(Flac.decodeSamples(sf).get._2.sameElements(scaled),
      "wasted-bits round trip diverged")
    assert(sf.length < 400 * 11 / 8 + 120,
      s"wasted-bits coding should land ~10.5 bits/sample, got ${sf.length} bytes")
    // ...and a flat block of multiples rides CONSTANT + wasted bits
    val flatScaled = Array.fill(64)(-4096)
    assert(Flac.decodeSamples(Flac.encode(flatScaled, 8000))
      .get._2.sameElements(flatScaled))
  }

  test("malformations return None, never wrong samples") {
    val s = Array.tabulate(200)(i => (i * 17 % 3001) - 1500)
    val flac = Flac.encode(s, 16000, blockSize = 64)
    // every single-byte corruption either fails decode or (headers we
    // skip, e.g. MD5) still decodes to the SAME samples — never silently
    // wrong ones. CRCs cover the frames; STREAMINFO rate/count feed the
    // contract checks.
    var silentWrong = 0
    (0 until flac.length by 7).foreach { i =>
      val bad = flac.clone()
      bad(i) = (bad(i) ^ 0x40).toByte
      Flac.decodeSamples(bad) match {
        case Some((_, back)) if !back.sameElements(s) => silentWrong += 1
        case _ => ()
      }
    }
    assert(silentWrong == 0, s"$silentWrong corruptions decoded to wrong samples")
    // truncation and trailing junk
    assert(Flac.decodeSamples(flac.dropRight(3)).isEmpty)
    assert(Flac.decodeSamples(flac ++ Array[Byte](1, 2, 3)).isEmpty)
    assert(Flac.decodeSamples("not flac at all".getBytes).isEmpty)
    assert(Flac.decodeSamples(Array[Byte]('f', 'L', 'a', 'C')).isEmpty)
  }

  test("partition order clamps below blockSize>>p == predictor order (RFC 9639)") {
    // LPC order 4 at blockSize 128, partitionOrder 5: 128>>5 == 4 == the
    // order, which the spec forbids (it would put ZERO samples in the
    // first partition). The encoder must clamp to a coarser partition
    // order, and the decoder now rejects count == 0 — so this round-trip
    // is the regression trap for both sides of the fix.
    val s = Array.tabulate(256)(i => (2000 * math.sin(i / 9.0)).toInt + (i % 5))
    val flac = Flac.encodeLpc(s, 16000, Array(-5, 9, -4, 1), 5,
      blockSize = 128, partitionOrder = 5)
    assert(Flac.decodeSamples(flac).exists(_._2.sameElements(s)),
      "LPC order-4 at 128>>5 must clamp the partition order, not emit a zero-sample partition")
    // FIXED path: whatever order the search picks at these partition
    // orders must also round-trip under the spec-valid clamp
    for (p <- Seq(4, 5)) {
      val f2 = Flac.encode(s, 16000, blockSize = 128, partitionOrder = p)
      assert(Flac.decodeSamples(f2).exists(_._2.sameElements(s)),
        s"FIXED round-trip diverged at partitionOrder=$p")
    }
  }

  test("frame indices beyond the 4-byte UTF-8 ladder fail loudly") {
    // writeUtf8Number's ladder encodes frame INDICES up to 2^21 - 1, so
    // at most 2^21 frames are encodable; a clip that needs more must
    // throw up front, not emit an undecodable stream that desyncs
    val huge = new Array[Int](16 * ((1 << 21) + 1)) // 2^21 + 1 frames at 16
    val e = intercept[IllegalArgumentException] {
      Flac.encode(huge, 16000, blockSize = 16)
    }
    assert(e.getMessage.contains("2^21"))
    // exactly 2^21 frames (max index 2^21 - 1 = the ladder's top) encodes
    val ok = new Array[Int](16 * (1 << 21))
    assert(Flac.decodeSamples(Flac.encode(ok, 16000, blockSize = 16))
      .exists(_._2.length == ok.length))
  }

  test("wav -> flac -> samples equals wav -> samples (the m13 staging path)") {
    (0L until 40L).foreach { id =>
      val wav = Multimodal.wavFromId(id)
      val pcm = Multimodal.decodeWavSamples(wav).get
      val rate = (8000 + (id % 4) * 4000).toInt
      val (r, back) = Flac.decodeSamples(Flac.encode(pcm, rate)).get
      assert(r == rate && back.sameElements(pcm), s"clip $id diverged")
    }
  }
}
