package graft.index

/** 256-entry quantized fieldnorm (document length) code, replicating the
  * reference table exactly. The reference pins the table as a const and
  * verifies it against this closed-form decoder in its own unit test
  * (`/root/reference/src/fieldnorm/code.rs:13` const table; decoder formula at
  * the `test_fieldnorm_byte` test of the same file) — we generate the table
  * from that verified formula instead of hardcoding 256 literals.
  *
  * Values 0..40 are exact; above 40 the code is a 3-bit-mantissa floating
  * point offset by 24, giving geometric buckets up to 2,013,265,944.
  */
object FieldNorms {

  private val IdentityPart = 24

  private def decodeExpPart(b: Int): Long = {
    val bits = (b & 0x07).toLong
    val shift = b >> 3
    if (shift == 0) bits else (bits | 8L) << (shift - 1)
  }

  /** FIELD_NORMS_TABLE — id (0..255) -> representative fieldnorm value. */
  val Table: Array[Int] = Array.tabulate(256) { i =>
    val v = if (i < IdentityPart) i.toLong else IdentityPart + decodeExpPart(i - IdentityPart)
    v.toInt
  }

  /** id -> fieldnorm (`id_to_fieldnorm`, code.rs:2-4). */
  @inline def idToFieldNorm(id: Int): Int = Table(id & 0xff)

  /** fieldnorm -> id: index of the largest table value <= fieldnorm
    * (`fieldnorm_to_id`, code.rs:7-11 — binary_search unwrap_or(idx-1)).
    */
  def fieldNormToId(fieldnorm: Long): Byte = {
    var lo = 0
    var hi = 255
    // invariant: Table(lo) <= fieldnorm (Table(0)=0), answer in [lo, hi]
    while (lo < hi) {
      val mid = (lo + hi + 1) >>> 1
      if (Table(mid).toLong <= fieldnorm) lo = mid else hi = mid - 1
    }
    lo.toByte
  }
}
