package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the exact tantivy default analyzer chain
  * (simple tokenizer + remove_long(40) + lowercase — graft.analysis.Analyzer)
  * producing `array<string>`.
  *
  * Unlike the `split/filter/lower` composition used by the SQL-parity ops,
  * this is the engine's own Unicode-exact chain (per-codepoint lowercase, no
  * sigma special-casing, UTF-8 byte length limit), exposed to DataFrames and
  * SQL. Codegen calls a static method directly (no CodegenFallback), so it
  * stays inside whole-stage codegen spans.
  */
case class TantivyTokenize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    TantivyTokenize.tokenizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TantivyTokenize.tokenizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): TantivyTokenize =
    copy(child = newChild)

  override def prettyName: String = "tantivy_tokenize"
}

object TantivyTokenize {
  /** Static entry point shared by interpreted eval and generated code. */
  def tokenizeUtf8(s: UTF8String): ArrayData = {
    val terms = graft.analysis.Analyzer.terms(s.toString)
    val out = new Array[Any](terms.length)
    var i = 0
    while (i < terms.length) { out(i) = UTF8String.fromString(terms(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** Column API: `tantivy_tokenize($"text")` (Spark 4 classic conversion). */
  def tantivy_tokenize(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(TantivyTokenize(ColumnShim.expression(c)))
  }

  /** Register as a SQL function on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "tantivy_tokenize", exprs => TantivyTokenize(exprs.head), "built-in")
}
