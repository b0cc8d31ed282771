package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter stem of one (already lowercased) token as a native Catalyst
  * expression — the stemmer token filter surface
  * (`/root/reference/src/tokenizer/stemmer.rs`) for DataFrame/SQL pipelines:
  * `transform(tantivy_tokenize(text), t -> porter_stem(t))`. Static-call
  * codegen, stays inside whole-stage codegen spans.
  */
case class PorterStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    PorterStem.stemUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PorterStem.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): PorterStem =
    copy(child = newChild)

  override def prettyName: String = "porter_stem"
}

object PorterStem {
  /** Static entry point shared by interpreted eval and generated code. */
  def stemUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.analysis.PorterStemmer.stem(s.toString))

  def porter_stem(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(PorterStem(ColumnShim.expression(c)))
  }
}
