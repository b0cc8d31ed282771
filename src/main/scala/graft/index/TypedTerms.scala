package graft.index

/** Order-preserving typed term encodings.
  *
  * The reference maps i64/f64/date/bool values into the u64 term space with
  * monotone bijections so that byte-wise term order equals value order and
  * range queries become dictionary range scans
  * (`/root/reference/src/schema/field_type.rs:53-74`,
  * `src/termdict/mod.rs:11-17`). Here the sortable u64 prints as a fixed
  * 16-hex-digit lowercase string: lexicographic string order == numeric
  * order, so the existing string `term` column, Parquet min/max pruning, and
  * dictionary range predicates all work untouched — the typed term space is
  * just a well-ordered corner of the string term space.
  */
object TypedTerms {

  /** i64 → sortable u64: flip the sign bit (monotone over the full range). */
  @inline def longToSortable(v: Long): Long = v ^ Long.MinValue
  @inline def sortableToLong(u: Long): Long = u ^ Long.MinValue

  /** f64 → sortable u64 (the classic monotone IEEE-754 map: positive floats
    * get the top bit set, negatives bit-flip entirely so order reverses into
    * ascending). Total order; -0.0 sorts below +0.0, NaN above +Inf.
    */
  @inline def doubleToSortable(v: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(v)
    if (b < 0) ~b else b | Long.MinValue
  }
  @inline def sortableToDouble(u: Long): Double = {
    val b = if (u < 0) u & Long.MaxValue else ~u
    java.lang.Double.longBitsToDouble(b)
  }

  /** Sortable u64 as a fixed-width hex term (16 chars, lowercase). */
  def hex(u: Long): String = {
    val s = java.lang.Long.toHexString(u)
    if (s.length == 16) s else "0" * (16 - s.length) + s
  }
  def unhex(s: String): Long = java.lang.Long.parseUnsignedLong(s, 16)

  def encodeLong(v: Long): String = hex(longToSortable(v))
  def decodeLong(t: String): Long = sortableToLong(unhex(t))

  def encodeDouble(v: Double): String = hex(doubleToSortable(v))
  def decodeDouble(t: String): Double = sortableToDouble(unhex(t))

  /** Timestamps index at microsecond precision (the reference truncates
    * DateTime to its configured precision before term encoding;
    * `src/schema/date_time_options.rs`).
    */
  def timestampMicros(ts: java.sql.Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + (ts.getNanos / 1000).toLong
  def encodeTimestamp(ts: java.sql.Timestamp): String = encodeLong(timestampMicros(ts))

  /** Booleans index as u64 0/1 (`src/schema/field_type.rs:63`). */
  def encodeBool(v: Boolean): String = encodeLong(if (v) 1L else 0L)

  /** IP addresses index as the IPv6 16-byte big-endian integer — IPv4 maps
    * into ::ffff:a.b.c.d first — so byte order equals address order
    * (`src/schema/ip_options.rs:1-159`, `common::u128_to_monotonic`). Printed
    * as 32 fixed hex digits: the same well-ordered string-corner trick as the
    * u64 types, so IP range queries are dictionary range scans too.
    */
  def encodeIp(addr: String): String = {
    val ia = java.net.InetAddress.getByName(addr)
    val v6 = ia.getAddress match {
      case b4 if b4.length == 4 =>
        Array[Byte](0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -1, -1, b4(0), b4(1), b4(2), b4(3))
      case b16 => b16
    }
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < 16) {
      val x = v6(i) & 0xff
      sb.append(Character.forDigit(x >> 4, 16)).append(Character.forDigit(x & 0xf, 16))
      i += 1
    }
    sb.toString
  }
  /** Bytes fields index the raw byte array as one term
    * (`src/schema/bytes_options.rs`, `src/schema/field_type.rs:241` — an
    * indexed Bytes field's value IS its term). Fixed two-hex-chars-per-byte
    * printing keeps lexicographic term order == unsigned byte-array order
    * for any value lengths, so exact match AND dictionary range scans work
    * in the same string term space as every other typed field.
    */
  def encodeBytes(b: Array[Byte]): String = {
    val sb = new java.lang.StringBuilder(b.length * 2)
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xff
      sb.append(Character.forDigit(x >> 4, 16)).append(Character.forDigit(x & 0xf, 16))
      i += 1
    }
    sb.toString
  }
  def decodeBytes(t: String): Array[Byte] = {
    val b = new Array[Byte](t.length / 2)
    var i = 0
    while (i < b.length) { b(i) = Integer.parseInt(t.substring(2 * i, 2 * i + 2), 16).toByte; i += 1 }
    b
  }

  def decodeIp(t: String): String = {
    val b = new Array[Byte](16)
    var i = 0
    while (i < 16) { b(i) = Integer.parseInt(t.substring(2 * i, 2 * i + 2), 16).toByte; i += 1 }
    val isV4 = (0 until 10).forall(b(_) == 0) && b(10) == -1 && b(11) == -1
    if (isV4) s"${b(12) & 0xff}.${b(13) & 0xff}.${b(14) & 0xff}.${b(15) & 0xff}"
    else java.net.InetAddress.getByAddress(b).getHostAddress
  }
}
