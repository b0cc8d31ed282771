package graft.search

/** Score explanation tree — the reference's `Explanation`
  * (`/root/reference/src/query/explanation.rs:12-70`): a value, a
  * description, child details, and free-form context lines. Rendered as
  * pretty JSON like the reference's `to_pretty_json`.
  */
final case class Explanation(
    description: String,
    value: Float,
    details: Seq[Explanation] = Nil,
    context: Seq[String] = Nil) {

  def addDetail(child: Explanation): Explanation = copy(details = details :+ child)

  /** Shorthand for a leaf detail (`Explanation::add_const`). */
  def addConst(name: String, v: Float): Explanation =
    addDetail(Explanation(name, v))

  def addContext(line: String): Explanation = copy(context = context :+ line)

  def toJson: String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val parts = Seq(
      Some(s""""value": $value"""),
      Some(s""""description": "${esc(description)}""""),
      if (details.nonEmpty) Some(s""""details": [${details.map(_.toJson).mkString(", ")}]""")
      else None,
      if (context.nonEmpty)
        Some(s""""context": [${context.map(c => "\"" + esc(c) + "\"").mkString(", ")}]""")
      else None).flatten
    parts.mkString("{", ", ", "}")
  }

  /** Indented human-readable rendering. */
  def render: String = {
    val sb = new StringBuilder
    def go(e: Explanation, indent: Int): Unit = {
      sb.append("  " * indent).append(f"${e.value}%.7g  ").append(e.description)
      e.context.foreach(c => sb.append(s" [$c]"))
      sb.append('\n')
      e.details.foreach(go(_, indent + 1))
    }
    go(this, 0)
    sb.toString
  }
}
