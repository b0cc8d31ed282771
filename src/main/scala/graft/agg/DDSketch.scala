package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.ColumnShim
import org.apache.spark.sql.types._

/** DDSketch — the quantile sketch the reference's percentiles aggregation
  * uses (`/root/reference/src/aggregation/metric/percentiles.rs:148,217-227`
  * via the `sketches_ddsketch` crate, defaults alpha=0.01, 2048 bins,
  * min_value=1e-9). Implemented from the public DDSketch algorithm
  * (Masson, Rim, Lee — VLDB 2019): log-gamma bucketing with relative-error
  * guarantee |x_est - x| <= alpha * x, mirrored negative store, zero
  * bucket, and lowest-bin collapse to bound memory.
  */
final class DDSketch(
    val alpha: Double = 0.01,
    val maxBins: Int = 2048,
    val minValue: Double = 1e-9) extends Serializable {

  private val gamma = (1.0 + alpha) / (1.0 - alpha)
  private val invLogGamma = 1.0 / math.log(gamma)

  // sparse stores: bucket key -> count (positive / mirrored negative)
  private[agg] var pos = new java.util.HashMap[Integer, java.lang.Long]()
  private[agg] var neg = new java.util.HashMap[Integer, java.lang.Long]()
  private[agg] var zeroCount = 0L
  private[agg] var count = 0L

  /** (positive bins, negative bins) — memory-bound observability. */
  def binCounts: (Int, Int) = (pos.size, neg.size)

  @inline private def keyOf(v: Double): Int = math.ceil(math.log(v) * invLogGamma).toInt
  @inline private def valueOf(key: Int): Double = 2.0 * math.pow(gamma, key) / (gamma + 1.0)

  private def incr(store: java.util.HashMap[Integer, java.lang.Long], key: Int, by: Long): Unit = {
    val prev = store.get(key)
    store.put(key, if (prev == null) by else prev + by)
    // the bin cap is enforced across pos+neg COMBINED, matching the
    // reference's sketches_ddsketch default of maxBins total — collapse the
    // store that just grew (or the other one if this one is a single bin)
    if (pos.size + neg.size > maxBins) {
      val target = if (store.size >= 2) store else if (pos.size >= 2) pos else neg
      if (target.size >= 2) collapseLowest(target)
    }
  }

  /** Merge the lowest bucket into the second-lowest (accuracy degrades only
    * at the store's small-magnitude tail, as in the reference's collapsing
    * store).
    */
  private def collapseLowest(store: java.util.HashMap[Integer, java.lang.Long]): Unit = {
    var lo1 = Int.MaxValue
    var lo2 = Int.MaxValue
    val it = store.keySet().iterator()
    while (it.hasNext) {
      val k = it.next().intValue()
      if (k < lo1) { lo2 = lo1; lo1 = k }
      else if (k < lo2) lo2 = k
    }
    val c = store.remove(lo1)
    val prev = store.get(lo2)
    store.put(lo2, if (prev == null) c else prev + c)
  }

  def add(v: Double): Unit = add(v, 1L)

  def add(v: Double, times: Long): Unit = {
    if (v > minValue) incr(pos, keyOf(v), times)
    else if (v < -minValue) incr(neg, keyOf(-v), times)
    else zeroCount += times
    count += times
  }

  def merge(other: DDSketch): Unit = {
    require(other.alpha == alpha, "cannot merge sketches with different alpha")
    other.pos.forEach((k, c) => incr(pos, k, c))
    other.neg.forEach((k, c) => incr(neg, k, c))
    zeroCount += other.zeroCount
    count += other.count
  }

  /** Value at quantile q in [0,1]; NaN on an empty sketch. */
  def quantile(q: Double): Double = {
    if (count == 0) return Double.NaN
    val rank = q * (count - 1).toDouble
    var cum = 0.0
    // ascending value order: most-negative first (mirrored keys descending)
    val negKeys = new java.util.ArrayList[Integer](neg.keySet())
    negKeys.sort(java.util.Collections.reverseOrder())
    var i = 0
    while (i < negKeys.size()) {
      val k = negKeys.get(i)
      cum += neg.get(k).longValue().toDouble
      if (cum > rank) return -valueOf(k.intValue())
      i += 1
    }
    cum += zeroCount.toDouble
    if (cum > rank) return 0.0
    val posKeys = new java.util.ArrayList[Integer](pos.keySet())
    java.util.Collections.sort(posKeys)
    i = 0
    while (i < posKeys.size()) {
      val k = posKeys.get(i)
      cum += pos.get(k).longValue().toDouble
      if (cum > rank) return valueOf(k.intValue())
      i += 1
    }
    // numeric edge: fall back to the largest bucket
    if (posKeys.isEmpty) 0.0 else valueOf(posKeys.get(posKeys.size() - 1).intValue())
  }

  def serializeBytes(): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeDouble(alpha)
    out.writeInt(maxBins)
    out.writeDouble(minValue)
    out.writeLong(count)
    out.writeLong(zeroCount)
    def store(m: java.util.HashMap[Integer, java.lang.Long]): Unit = {
      out.writeInt(m.size)
      m.forEach { (k, c) => out.writeInt(k); out.writeLong(c) }
    }
    store(pos)
    store(neg)
    out.flush()
    bos.toByteArray
  }
}

object DDSketch {
  def deserializeBytes(bytes: Array[Byte]): DDSketch = {
    val in = new java.io.DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val s = new DDSketch(in.readDouble(), in.readInt(), in.readDouble())
    s.count = in.readLong()
    s.zeroCount = in.readLong()
    def store(m: java.util.HashMap[Integer, java.lang.Long]): Unit = {
      val n = in.readInt()
      var i = 0
      while (i < n) { m.put(in.readInt(), in.readLong()); i += 1 }
    }
    store(s.pos)
    store(s.neg)
    s
  }

  /** percentiles in 0..100, as the ES/reference request shape. */
  def percentilesAgg(c: Column, percents: Seq[Double], alpha: Double = 0.01): Column =
    ColumnShim.column(
      DDSketchPercentiles(ColumnShim.expression(c.cast("double")), percents, alpha)
        .toAggregateExpression())
}

/** `ddsketch_percentiles(col, percents)` as a Catalyst typed aggregate: the
  * sketch is the aggregation buffer, so Spark's partial aggregation is the
  * reference's segment-collect -> intermediate-merge -> final pipeline
  * (`intermediate_agg_result.rs`), and the shuffle carries one ~KB sketch
  * per group instead of the values.
  */
final case class DDSketchPercentiles(
    child: Expression,
    percents: Seq[Double],
    alpha: Double = 0.01,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[DDSketch] with UnaryLike[Expression] {

  override def createAggregationBuffer(): DDSketch = new DDSketch(alpha)

  override def update(buffer: DDSketch, input: InternalRow): DDSketch = {
    val v = child.eval(input)
    if (v != null) buffer.add(v.asInstanceOf[Double])
    buffer
  }

  override def merge(buffer: DDSketch, other: DDSketch): DDSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: DDSketch): Any =
    new GenericArrayData(percents.map(p => buffer.quantile(p / 100.0)).toArray)

  override def serialize(buffer: DDSketch): Array[Byte] = buffer.serializeBytes()
  override def deserialize(bytes: Array[Byte]): DDSketch = DDSketch.deserializeBytes(bytes)

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "ddsketch_percentiles"

  override def withNewMutableAggBufferOffset(offset: Int): DDSketchPercentiles =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): DDSketchPercentiles =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): DDSketchPercentiles =
    copy(child = newChild)
}
