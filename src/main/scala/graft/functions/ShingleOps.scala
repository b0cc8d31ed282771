package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.PipelineOps

/** Native Catalyst expressions for the dedup pipeline's per-row hot loop:
  * text → SQL-parity tokens → 3-gram shingles → hashes/minhash signature,
  * in ONE primitive-array pass per row instead of a chain of interpreted
  * higher-order functions (`transform`/`array_min` lambdas box every
  * element and re-walk the arrays per hash).
  *
  * Value parity is load-bearing: every function reproduces the exact SQL
  * fragments in [[graft.ops.PipelineOps]] bit-for-bit (tokens =
  * `TokensExprSpark`, shingles = `array_distinct(ShinglesExprSpark)`,
  * md5-hash = `TokHashSpark`, xx-hash = Spark's `xxhash64` with seed 42),
  * because the DuckDB oracle re-derives minhash/LSH candidates from the
  * same md5 arithmetic — ShingleOpsSpec pins native == SQL on the corpus.
  * Codegen emits a static call (no CodegenFallback), so the expressions sit
  * inside whole-stage codegen spans; at 100 TB this is the map-side
  * signature pass whose cost dominates dedup, which is exactly why it gets
  * the native kernel treatment (reference analog: tantivy runs tokenization
  * in native code too — `src/tokenizer/tokenizer.rs`).
  */
object ShingleKernel {
  private val SplitRe = java.util.regex.Pattern.compile("[^a-z0-9]+")
  private val Md5 = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }

  /** SQL-parity tokens: `filter(split(lower(text), '[^a-z0-9]+'), x -> x <>
    * '' AND length(x) < 40)`. Lowercasing via UTF8String to match Spark's
    * `lower` exactly; split keeps trailing empties (limit -1) like Spark's
    * two-arg `split`, and the filter drops them.
    */
  def tokens(s: UTF8String): Array[String] = {
    val parts = SplitRe.split(s.toLowerCase.toString, -1)
    val out = new Array[String](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      val p = parts(i)
      if (p.length > 0 && p.length < 40) { out(n) = p; n += 1 }
      i += 1
    }
    if (n == parts.length) out else java.util.Arrays.copyOf(out, n)
  }

  /** First-occurrence-ordered distinct 3-gram shingles —
    * `array_distinct(transform(sequence(1, greatest(n-2, 1)), i ->
    * concat_ws(' ', slice(toks, i, 3))))`: n−2 shingles for n ≥ 3, one
    * (possibly short or empty) shingle otherwise.
    */
  def distinctShingles(toks: Array[String]): Array[String] = {
    val n = toks.length
    val m = math.max(n - 2, 1)
    val seen = new java.util.LinkedHashSet[String](math.max(m * 2, 8))
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      val end = math.min(i + 3, n)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    seen.toArray(new Array[String](seen.size))
  }

  /** `TokHashSpark`: first 8 hex chars of md5 as an unsigned 32-bit value in
    * a long (= first 4 digest bytes, big-endian).
    */
  def md5First8(s: String): Long = {
    val d = Md5.get().digest(UTF8String.fromString(s).getBytes)
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** `TokensExprSpark` as ArrayData — the SQL-parity token array itself, for
    * consumers that need the tokens column (tf counting, shingling in SQL,
    * token counts) without the interpreted `filter` lambda.
    */
  def tokensData(s: UTF8String): ArrayData = {
    val t = tokens(s)
    val out = new Array[Any](t.length)
    var i = 0
    while (i < t.length) { out(i) = UTF8String.fromString(t(i)); i += 1 }
    new GenericArrayData(out)
  }

  def distinctShinglesData(s: UTF8String): ArrayData = {
    val sh = distinctShingles(tokens(s))
    val out = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** MinHash signature: per permutation i, min over distinct shingles of
    * `(md5First8(sh) * A(i) + B(i)) % P` — the minima over the distinct set
    * equal the minima over the multiset, so skipping duplicate shingles is
    * exact. Constants shared with [[PipelineOps]] (single source, the
    * oracle SQL is generated from the same arrays).
    */
  def minhashSigs(s: UTF8String): ArrayData = {
    val a = PipelineOps.MinHashA
    val b = PipelineOps.MinHashB
    val p = PipelineOps.MinHashP
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val sh = distinctShingles(tokens(s))
    var i = 0
    while (i < sh.length) {
      val h = md5First8(sh(i))
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % p
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** xxhash64 (seed 42, Spark's `xxhash64` on a string column) of each
    * distinct shingle.
    */
  def shingleXxHashes(s: UTF8String): ArrayData = {
    val sh = distinctShingles(tokens(s))
    val out = new Array[Long](sh.length)
    var i = 0
    while (i < sh.length) {
      val u = UTF8String.fromString(sh(i))
      out(i) = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }
}

abstract class ShingleExpr extends UnaryExpression {
  protected def staticCall: String
  override def nullable: Boolean = child.nullable
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleKernel.$staticCall($c)")
}

case class SqlTokens(child: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.tokensData(input.asInstanceOf[UTF8String])
  protected def staticCall: String = "tokensData"
  override protected def withNewChildInternal(newChild: Expression): SqlTokens =
    copy(child = newChild)
  override def prettyName: String = "sql_tokens"
}

case class DistinctShingles(child: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.distinctShinglesData(input.asInstanceOf[UTF8String])
  protected def staticCall: String = "distinctShinglesData"
  override protected def withNewChildInternal(newChild: Expression): DistinctShingles =
    copy(child = newChild)
  override def prettyName: String = "distinct_shingles"
}

case class MinHashSigs(child: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.minhashSigs(input.asInstanceOf[UTF8String])
  protected def staticCall: String = "minhashSigs"
  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
  override def prettyName: String = "minhash_sigs"
}

case class ShingleXxHashes(child: Expression) extends ShingleExpr {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def nullSafeEval(input: Any): Any =
    ShingleKernel.shingleXxHashes(input.asInstanceOf[UTF8String])
  protected def staticCall: String = "shingleXxHashes"
  override protected def withNewChildInternal(newChild: Expression): ShingleXxHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_xxhashes"
}

object ShingleOps {
  import org.apache.spark.sql.graftshim.ColumnShim

  def sql_tokens(c: Column): Column = ColumnShim.column(SqlTokens(ColumnShim.expression(c)))
  def distinct_shingles(c: Column): Column = ColumnShim.column(DistinctShingles(ColumnShim.expression(c)))
  def minhash_sigs(c: Column): Column = ColumnShim.column(MinHashSigs(ColumnShim.expression(c)))
  def shingle_xxhashes(c: Column): Column = ColumnShim.column(ShingleXxHashes(ColumnShim.expression(c)))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("sql_tokens", es => SqlTokens(es.head), "built-in")
    reg.createOrReplaceTempFunction("distinct_shingles", es => DistinctShingles(es.head), "built-in")
    reg.createOrReplaceTempFunction("minhash_sigs", es => MinHashSigs(es.head), "built-in")
    reg.createOrReplaceTempFunction("shingle_xxhashes", es => ShingleXxHashes(es.head), "built-in")
  }
}
