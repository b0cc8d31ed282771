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
}
