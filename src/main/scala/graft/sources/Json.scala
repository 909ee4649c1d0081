package graft.sources

/** Minimal JSON renderer for connector outputs (inverse of
  * `graft.config.Parsers.flatJson`). */
object Json {
  def render(v: Any): String = v match {
    case null => "null"
    case s: String =>
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case '\t' => "\\t"
        case '\r' => "\\r"
        case c if c < ' ' => f"\\u${c.toInt}%04x"
        case c => c.toString
      } + "\""
    case m: Map[_, _] =>
      m.map { case (k, x) => render(k.toString) + ": " + render(x) }
        .mkString("{", ", ", "}")
    case xs: Seq[_] => xs.map(render).mkString("[", ", ", "]")
    case b: Boolean => b.toString
    case n: Int => n.toString
    case n: Long => n.toString
    case d: Double =>
      if (d == d.floor && !d.isInfinite) d.toLong.toString else d.toString
    case f: Float => render(f.toDouble)
    case other => render(other.toString)
  }
}
