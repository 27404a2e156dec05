package graft.functions

/** Chrono/strftime → Java DateTimeFormatter pattern translation for the
  * reference's `to_char` (`/root/reference/python/datafusion/functions/
  * __init__.py:2375` — DataFusion formats with Rust Chrono's strftime
  * dialect, Spark with Java patterns; SURVEY.md §7.3 item 3).
  *
  * Literal text between specifiers is single-quoted so characters that are
  * Java pattern letters (e.g. `/`, `:` are safe, but letters are not) pass
  * through verbatim.
  */
object ChronoFormat {
  private val map: Map[Char, String] = Map(
    'Y' -> "yyyy", 'y' -> "yy", 'm' -> "MM", 'd' -> "dd", 'e' -> "d",
    'H' -> "HH", 'k' -> "H", 'I' -> "hh", 'l' -> "h", 'M' -> "mm",
    'S' -> "ss", 'f' -> "SSSSSSSSS", 'p' -> "a", 'j' -> "DDD",
    'a' -> "EEE", 'A' -> "EEEE", 'b' -> "MMM", 'B' -> "MMMM",
    'G' -> "YYYY", 'V' -> "ww", 'u' -> "e",
    'z' -> "xx", 'Z' -> "zz")
  // %C (century) and %s (epoch seconds) have no Java pattern equivalent and
  // deliberately fall through to the unsupported-specifier error below —
  // a wrong-valued mapping would silently corrupt output.

  def toJava(chrono: String): String = {
    val out = new StringBuilder
    val lit = new StringBuilder
    def flushLit(): Unit = if (lit.nonEmpty) {
      val text = lit.toString
      if (text.exists(_.isLetter)) out.append("'").append(text.replace("'", "''")).append("'")
      else out.append(text)
      lit.clear()
    }
    var i = 0
    while (i < chrono.length) {
      val c = chrono.charAt(i)
      if (c == '%' && i + 1 < chrono.length) {
        val spec = chrono.charAt(i + 1)
        if (spec == '%') { lit.append('%'); i += 2 }
        else map.get(spec) match {
          case Some(java) => flushLit(); out.append(java); i += 2
          case None => throw new IllegalArgumentException(
            s"unsupported Chrono specifier %$spec in '$chrono'")
        }
      } else { lit.append(c); i += 1 }
    }
    flushLit()
    out.toString
  }
}
