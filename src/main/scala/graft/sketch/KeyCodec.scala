package graft.sketch

/** Engine-neutral element codec for sketch byte exports.
  *
  * Every versioned export in this package ([[HyperLogLog.toBytes]],
  * [[Theta.toBytes]], [[GridHistogram.toBytes]], [[TopFreq.toBytes]],
  * [[TopDistinct.toBytes]], [[Reservoir.toBytes]], [[BoundedSort.toBytes]])
  * is a documented big-endian byte string another engine can parse with no
  * JVM in sight. The fixed-width sketches need no element codec; the
  * keyed/sampled ones carry their elements, so the element encoding must
  * itself be engine-neutral — this trait pins it to exactly two shapes:
  * 64-bit big-endian integers (`typeId 0`) and raw UTF-8 (`typeId 1`).
  * At 100 TB heavy-hitter keys are habitually pre-hashed to 64-bit
  * anyway; strings cover the rest.
  *
  * `lt` is the canonical ascending order used to make exports
  * byte-stable (equal sketch state ⇒ equal bytes): numeric for i64,
  * lexicographic for strings — both replayable as a SQL ORDER BY.
  */
sealed trait KeyCodec[K] extends Serializable {
  def typeId: Byte
  def write(k: K): Array[Byte]
  def read(b: Array[Byte]): K
  /** canonical ascending order for byte-stable entry layout */
  def lt(a: K, b: K): Boolean
}

object KeyCodec {

  implicit object LongKey extends KeyCodec[Long] {
    val typeId: Byte = 0
    def write(k: Long): Array[Byte] =
      java.nio.ByteBuffer.allocate(8).putLong(k).array()
    def read(b: Array[Byte]): Long = {
      require(b.length == 8, s"i64 key must be 8 bytes, got ${b.length}")
      java.nio.ByteBuffer.wrap(b).getLong
    }
    def lt(a: Long, b: Long): Boolean = a < b
  }

  implicit object StringKey extends KeyCodec[String] {
    val typeId: Byte = 1
    def write(k: String): Array[Byte] =
      k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    def read(b: Array[Byte]): String =
      new String(b, java.nio.charset.StandardCharsets.UTF_8)
    /** UNSIGNED UTF-8 byte order (== Unicode codepoint order, and the
      * binary collation a SQL ORDER BY applies) — NOT Java
      * String.compareTo, whose UTF-16 code-unit order disagrees for
      * supplementary-plane keys (U+FFFF sorts AFTER U+1F600 in UTF-16
      * but BEFORE it in UTF-8), which would make string-keyed exports
      * non-rebuildable relationally. */
    def lt(a: String, b: String): Boolean = {
      val ab = write(a); val bb = write(b)
      val n = math.min(ab.length, bb.length)
      var i = 0
      while (i < n && ab(i) == bb(i)) i += 1
      if (i < n) (ab(i) & 0xff) < (bb(i) & 0xff) else ab.length < bb.length
    }
  }
}
