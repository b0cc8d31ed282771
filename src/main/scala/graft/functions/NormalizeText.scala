package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Web-text normalization as one codegen'd pass — the cleanup step every
  * crawl pipeline runs before tokenizing/deduplicating (the C4/CCNet
  * "clean" stage):
  *
  *   1. Unicode NFC normalization (combining sequences compose, so
  *      `cafe` + U+0301 and precomposed `café` fingerprint identically —
  *      otherwise exact dedup misses byte-different equal-looking docs);
  *   2. C0 control characters and DEL (U+0000–U+001F, U+007F) map to a
  *      space — covers \t \n \r and the NUL bytes bad decoders leave;
  *   3. runs of ASCII spaces collapse to one, leading/trailing spaces
  *      drop.
  *
  * Scope is deliberately exact: only U+0020 runs collapse (a surviving
  * NBSP is content, not layout), and no lossy mojibake guessing — the op
  * must be deterministic and oracle-checkable (DuckDB `nfc_normalize` +
  * regexp chain computes the same function independently).
  */
case class NormalizeText(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override protected def nullSafeEval(input: Any): Any =
    NormalizeText.normalizeUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NormalizeText.normalizeUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)

  override def prettyName: String = "normalize_text"
}

object NormalizeText {

  def normalize(s: String): String = {
    val nfc = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
    val n = nfc.length
    val sb = new java.lang.StringBuilder(n)
    var i = 0
    var pendingSpace = false // space seen since last emitted char
    while (i < n) {
      val c0 = nfc.charAt(i)
      val c = if (c0 < 0x20 || c0 == 0x7f) ' ' else c0
      if (c == ' ') pendingSpace = true
      else {
        if (pendingSpace && sb.length > 0) sb.append(' ')
        pendingSpace = false
        sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  def normalizeUtf8(s: UTF8String): UTF8String =
    UTF8String.fromString(normalize(s.toString))

  def normalize_text(c: Column): Column = {
    import org.apache.spark.sql.graftshim.ColumnShim
    ColumnShim.column(NormalizeText(ColumnShim.expression(c)))
  }
}
