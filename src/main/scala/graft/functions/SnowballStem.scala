package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.analysis.snowball.SnowballStemmer

/** Snowball stem of one lowercased token in any supported language — the
  * reference's `Stemmer` token filter with its `Language` enum
  * (`src/tokenizer/stemmer.rs:12-30`) as a codegen'd Catalyst expression:
  * `transform(tantivy_tokenize(text), t -> snowball_stem(t, 'german'))`.
  * The language is fixed at plan time, so the per-row path is a single
  * virtual call on the resolved stemmer function.
  */
case class SnowballStem(child: Expression, language: String) extends UnaryExpression {

  // resolve eagerly: an unsupported language fails at plan time, not per row
  @transient private lazy val stem: String => String = SnowballStemmer(language)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    UTF8String.fromString(stem(input.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = ctx.addReferenceObj("snowballStem", stem, "scala.Function1")
    defineCodeGen(ctx, ev,
      c => s"UTF8String.fromString((String) $fn.apply($c.toString()))")
  }

  override protected def withNewChildInternal(newChild: Expression): SnowballStem =
    copy(child = newChild)

  override def prettyName: String = "snowball_stem"
}

object SnowballStem {
  def snowball_stem(c: Column, language: String): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(SnowballStem(ColumnShim.expression(c), language))
  }
}
