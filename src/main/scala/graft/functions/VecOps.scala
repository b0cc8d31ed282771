package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expressions for the embedding pipeline's per-row hot
  * loop: cosine similarity and LSH bucket ids over `array<double>` vectors.
  *
  * The declarative forms ([[graft.ops.PipelineOps.cosineExpr]] and the
  * per-bit `aggregate(zip_with(...))` chain in `annBuckets`) are built from
  * higher-order functions whose lambdas evaluate interpreted — every element
  * binds a lambda variable and allocates through `ArrayData`, which at
  * nBits=8 × dim=64 per row dominated `q_ann_lsh`/`q_cosine_topk` wall time.
  * These kernels run the SAME sequential fold over primitive reads (one
  * `getDouble` per element, no allocation), so results are bit-identical to
  * the HOF forms (pinned by SimilaritySpec) while sitting inside whole-stage
  * codegen as a static call — the ShingleKernel treatment applied to
  * vectors. At 100 TB the signature/bucket pass is the map-side cost of ANN,
  * same as the reference's native scoring loops.
  */
object VecKernel {

  /** Sequential-fold cosine, identical association order to
    * `aggregate(zip_with(a,b,(x,y)=>x*y), 0.0, (acc,x)=>acc+x)`:
    * ((0 + a0·b0) + a1·b1) + … — and to DuckDB's `list_dot_product`.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Deterministic random-hyperplane set — single source shared with
    * `PipelineOps.annBuckets`' historical HOF form: seed 1234, row-major
    * `Array.fill(nBits, dim)(rnd.nextGaussian())`. Flattened row-major for
    * the kernel loop; memoized per (nBits, dim).
    */
  private val planeCache =
    scala.collection.concurrent.TrieMap.empty[(Int, Int), Array[Double]]

  def planesFlat(nBits: Int, dim: Int): Array[Double] =
    planeCache.getOrElseUpdate((nBits, dim), {
      val rnd = new scala.util.Random(1234)
      Array.fill(nBits * dim)(rnd.nextGaussian())
    })

  /** LSH bucket id: bit b set iff the sequential-fold dot of the vector with
    * plane b is >= 0 (sign-bit random-hyperplane hash).
    */
  def lshBucket(v: ArrayData, nBits: Int, dim: Int): Long = {
    val p = planesFlat(nBits, dim)
    val n = math.min(v.numElements(), dim)
    var bucket = 0L
    var b = 0
    while (b < nBits) {
      val off = b * dim
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getDouble(i) * p(off + i)
        i += 1
      }
      if (dot >= 0) bucket |= (1L << b)
      b += 1
    }
    bucket
  }
}

/** cosine(a, b) over two array<double> columns. */
case class VecCosine(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = left.nullable || right.nullable
  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.VecKernel.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): VecCosine =
    copy(left = l, right = r)
  override def prettyName: String = "vec_cosine"
}

/** Sign-bit LSH bucket of an array<double> vector (nBits planes, seed 1234). */
case class LshBucket(child: Expression, nBits: Int, dim: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override protected def nullSafeEval(v: Any): Any =
    VecKernel.lshBucket(v.asInstanceOf[ArrayData], nBits, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.VecKernel.lshBucket($c, $nBits, $dim)")
  override protected def withNewChildInternal(newChild: Expression): LshBucket =
    copy(child = newChild)
  override def prettyName: String = "lsh_bucket"
}

object VecOps {
  import org.apache.spark.sql.graftshim.ColumnShim

  def vec_cosine(a: Column, b: Column): Column =
    ColumnShim.column(VecCosine(ColumnShim.expression(a), ColumnShim.expression(b)))
  def lsh_bucket(v: Column, nBits: Int, dim: Int): Column =
    ColumnShim.column(LshBucket(ColumnShim.expression(v), nBits, dim))
}
