package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Porter2 (Snowball English) stem of one lowercased token — the
  * reference's `en_stem` filter (`src/tokenizer/stemmer.rs`,
  * `Language::English`) as a codegen'd Catalyst expression:
  * `transform(tantivy_tokenize(text), t -> en_stem(t))`.
  */
case class EnStem(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    EnStem.stemUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.EnStem.stemUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): EnStem =
    copy(child = newChild)

  override def prettyName: String = "en_stem"
}

object EnStem {
  def stemUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(graft.analysis.Porter2Stemmer.stem(s.toString))

  def en_stem(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(EnStem(ColumnShim.expression(c)))
  }
}
