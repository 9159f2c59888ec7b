package graft.util

/** The one JSON string escaper (RFC 8259): quote, backslash, named control
  * escapes, \\u for the rest of C0. Every hand-rolled JSON emitter in the
  * library routes through this — five drifting copies is how escaping bugs
  * are born.
  */
object Json {
  def escape(s: String): String = {
    val b = new StringBuilder(s.length + 2)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  /** Locale-independent fixed-decimal rendering — Scala's f-interpolator uses
    * the DEFAULT locale, which turns 1.25 into "1,25" on e.g. de_DE JVMs and
    * corrupts emitted JSON.
    */
  def num(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))
}
