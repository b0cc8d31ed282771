package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Tantivy fieldnorm quantization of a document length — `Table(id(dl))`
  * (`/root/reference/src/fieldnorm/code.rs:13`) as a codegen'd static call.
  * Replaces the interpreted 256-element `aggregate` fold in SQL-parity BM25
  * (identical values; the table IS the quantization).
  */
case class FieldNormQuantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    FieldNormQuantize.quantize(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.FieldNormQuantize.quantize($c)")

  override protected def withNewChildInternal(newChild: Expression): FieldNormQuantize =
    copy(child = newChild)

  override def prettyName: String = "fieldnorm_quantize"
}

object FieldNormQuantize {
  def quantize(dl: Long): Long =
    graft.index.FieldNorms.idToFieldNorm(graft.index.FieldNorms.fieldNormToId(dl) & 0xff).toLong

  def fieldnorm_quantize(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(FieldNormQuantize(ColumnShim.expression(c)))
  }
}
