package graft.index

/** Dynamic JSON field indexing: every leaf of a JSON document becomes a
  * path-prefixed term in the json field's own term space — the reference's
  * `JsonPostingsWriter` (`/root/reference/src/postings/json_postings_writer.rs:1-154`)
  * and its path/value term layout (`src/json_utils.rs`): path bytes, an
  * end-of-path separator, a one-byte type tag, then the value bytes.
  *
  * Layout here: `<path>\0<tag><value>` with tags
  * `s` = analyzed string token, `l` = i64 (order-preserving hex),
  * `d` = f64 (order-preserving hex), `b` = bool. Dotted paths (`a.b.c`)
  * address nested objects; arrays index every element at the same path.
  * Because `l`/`d` values use `TypedTerms` encodings, numeric range queries
  * on a path are plain `TypedRange` term-range scans whose bounds share the
  * `<path>\0<tag>` prefix (strings outside the path compare outside the
  * bounds at the prefix, so the scan is exact).
  */
object JsonTerms {
  val Sep = "\u0000" // end-of-path byte: sorts below every path/token char

  def str(path: String, token: String): String = path + Sep + "s" + token
  def long(path: String, v: Long): String = path + Sep + "l" + TypedTerms.encodeLong(v)
  def dbl(path: String, v: Double): String = path + Sep + "d" + TypedTerms.encodeDouble(v)
  def bool(path: String, v: Boolean): String = path + Sep + "b" + v

  /** Walk a parsed JSON value, emitting (term, isString) per leaf token.
    * String leaves run through the analyzer (one emission per token, in
    * order — callers track positions); numbers emit `l` when integral else
    * `d`; bools emit `b`; nulls emit nothing.
    */
  def leafTerms(field: org.json4s.JValue,
      analyzerTerms: String => scala.collection.Seq[String]): Seq[String] = {
    import org.json4s._
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(prefix: String, v: JValue): Unit = v match {
      case JObject(fields) =>
        fields.foreach { case (k, sub) =>
          walk(if (prefix.isEmpty) k else s"$prefix.$k", sub)
        }
      case JArray(vs) => vs.foreach(walk(prefix, _))
      case JString(s0) => analyzerTerms(s0).foreach(t => out += str(prefix, t))
      case JInt(i) => out += long(prefix, i.toLong)
      case JLong(l) => out += long(prefix, l)
      case JDouble(d) => out += dbl(prefix, d)
      case JDecimal(d) => out += dbl(prefix, d.toDouble)
      case JBool(b) => out += bool(prefix, b)
      case JNull | JNothing => ()
      case JSet(vs) => vs.foreach(walk(prefix, _))
    }
    walk("", field)
    out.toSeq
  }
}
