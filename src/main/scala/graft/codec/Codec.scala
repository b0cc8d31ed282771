package graft.codec

/** Byte-level primitives for posting-list compression.
  *
  * Same ideas as the reference codec — 128-entry blocks, delta + bitpacking
  * for doc ids, (tf-1) bitpacking for term frequencies, VInt tails
  * (`/root/reference/src/postings/compression/mod.rs:3-77`) — but an
  * independent JVM-friendly layout (LSB-first bit packing into a byte array;
  * no SIMD; scaling comes from partitions, SURVEY.md §4.2).
  */
object Codec {

  /** Docs per compression block (reference: COMPRESSION_BLOCK_SIZE = 128). */
  val BlockSize = 128

  // ---------------------------------------------------------------- VInt

  /** LEB128 unsigned varint append. */
  def writeVInt(out: ByteVector, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out += ((v & 0x7f) | 0x80).toByte
      v >>>= 7
    }
    out += (v & 0x7f).toByte
  }

  /** Cursor-based VInt reader. */
  final class ByteCursor(val bytes: Array[Byte], var pos: Int) {
    def readVLong(): Long = {
      var shift = 0
      var result = 0L
      var b = bytes(pos)
      pos += 1
      while ((b & 0x80) != 0) {
        result |= (b & 0x7fL) << shift
        shift += 7
        b = bytes(pos)
        pos += 1
      }
      result | ((b & 0x7fL) << shift)
    }
    def readVInt(): Int = readVLong().toInt
    /** Skip n varints without decoding values. */
    def skipVInts(n: Int): Unit = {
      var remaining = n
      while (remaining > 0) {
        while ((bytes(pos) & 0x80) != 0) pos += 1
        pos += 1
        remaining -= 1
      }
    }
    def hasRemaining: Boolean = pos < bytes.length
  }

  // ---------------------------------------------------------------- bitpack

  /** Bits needed to represent v (0 -> 0 bits). */
  @inline def bitsRequired(v: Int): Int = 32 - Integer.numberOfLeadingZeros(v)

  def maxBitsRequired(vals: Array[Int], off: Int, len: Int): Int = {
    var max = 0
    var i = 0
    while (i < len) { val v = vals(off + i); if (v > max) max = v; i += 1 }
    bitsRequired(max)
  }

  /** Pack `len` non-negative ints at `numBits` bits each, LSB-first, into
    * `out`. Total bytes appended = ceil(len*numBits/8).
    */
  def packBits(vals: Array[Int], off: Int, len: Int, numBits: Int, out: ByteVector): Unit = {
    if (numBits == 0) return
    var acc = 0L
    var accBits = 0
    var i = 0
    while (i < len) {
      acc |= (vals(off + i).toLong & 0xffffffffL) << accBits
      accBits += numBits
      while (accBits >= 8) {
        out += (acc & 0xff).toByte
        acc >>>= 8
        accBits -= 8
      }
      i += 1
    }
    if (accBits > 0) out += (acc & 0xff).toByte
  }

  /** Unpack `len` ints of `numBits` bits each from bytes(start..). Returns
    * bytes consumed.
    */
  def unpackBits(bytes: Array[Byte], start: Int, len: Int, numBits: Int, out: Array[Int], outOff: Int): Int = {
    if (numBits == 0) {
      java.util.Arrays.fill(out, outOff, outOff + len, 0)
      return 0
    }
    var acc = 0L
    var accBits = 0
    var p = start
    val mask = if (numBits == 32) 0xffffffffL else (1L << numBits) - 1
    var i = 0
    while (i < len) {
      while (accBits < numBits) {
        acc |= (bytes(p).toLong & 0xffL) << accBits
        p += 1
        accBits += 8
      }
      out(outOff + i) = (acc & mask).toInt
      acc >>>= numBits
      accBits -= numBits
      i += 1
    }
    p - start
  }

  @inline def packedByteLen(len: Int, numBits: Int): Int = (len * numBits + 7) >>> 3
}

/** Minimal growable byte buffer (avoids boxing of ArrayBuffer[Byte]). */
final class ByteVector(initial: Int = 64) {
  private var arr = new Array[Byte](math.max(initial, 8))
  private var len = 0
  def +=(b: Byte): Unit = {
    if (len == arr.length) arr = java.util.Arrays.copyOf(arr, arr.length * 2)
    arr(len) = b
    len += 1
  }
  def append(bytes: Array[Byte]): Unit = {
    if (len + bytes.length > arr.length) {
      var cap = arr.length * 2
      while (cap < len + bytes.length) cap *= 2
      arr = java.util.Arrays.copyOf(arr, cap)
    }
    System.arraycopy(bytes, 0, arr, len, bytes.length)
    len += bytes.length
  }
  def size: Int = len
  def toArray: Array[Byte] = java.util.Arrays.copyOf(arr, len)
  def clear(): Unit = len = 0
}
