package graft.functions

/** 64-bit hashing used by the sketch library (HLL register selection,
  * CountMin row hashes, MinHash permutations).
  *
  * MurmurHash64A (Austin Appleby, public domain) for byte strings and a
  * splitmix64-style finalizer for fixed-width keys. Scala's built-in
  * MurmurHash3 is 32-bit — too narrow for cardinality sketches at 100 TB
  * key counts, hence a local 64-bit implementation.
  */
object Hashing {

  private final val M64 = 0xc6a4a7935bd1e995L
  private final val R64 = 47

  /** MurmurHash64A over a byte array. */
  def hashBytes(data: Array[Byte], seed: Long): Long = {
    val len = data.length
    var h = seed ^ (len * M64)
    var i = 0
    val tail = len - (len % 8)
    while (i < tail) {
      var k =
        (data(i) & 0xffL) |
        ((data(i + 1) & 0xffL) << 8) |
        ((data(i + 2) & 0xffL) << 16) |
        ((data(i + 3) & 0xffL) << 24) |
        ((data(i + 4) & 0xffL) << 32) |
        ((data(i + 5) & 0xffL) << 40) |
        ((data(i + 6) & 0xffL) << 48) |
        ((data(i + 7) & 0xffL) << 56)
      k *= M64; k ^= k >>> R64; k *= M64
      h ^= k; h *= M64
      i += 8
    }
    var rem = len - tail
    while (rem > 0) {
      rem -= 1
      h ^= (data(tail + rem) & 0xffL) << (8 * rem)
      if (rem == 0) h *= M64
    }
    h ^= h >>> R64; h *= M64; h ^= h >>> R64
    h
  }

  /** splitmix64 finalizer — full-avalanche mix of a fixed-width key. */
  def mix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  def hashLong(v: Long, seed: Long): Long = mix64(v ^ mix64(seed))

  def hashString(s: String, seed: Long): Long =
    hashBytes(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)

  /** Hash an arbitrary key. Longs/Ints avoid byte-array allocation. */
  def hashAny(k: Any, seed: Long): Long = k match {
    case l: Long   => hashLong(l, seed)
    case i: Int    => hashLong(i.toLong, seed)
    case s: String => hashString(s, seed)
    case other     => hashString(String.valueOf(other), seed)
  }
}
