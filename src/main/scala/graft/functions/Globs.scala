package graft.functions

/** Glob→regex compiler for the micromatch subset the reference uses
  * (reference src/index.ts:612 PathMatcher, tests/index.test.ts:28-120).
  *
  * The compiled pattern is deliberately restricted to the regex dialect
  * intersection of Java (`java.util.regex`, what Spark's codegen'd `rlike`
  * executes) and RE2 (what the DuckDB oracle's `regexp_matches` executes):
  * character classes, `(?:...|...)` alternation, `.*`, and a `(?i)` flag.
  * That makes a glob query a **driver-side compile + executor-side codegen
  * rlike** — zero UDFs, zero shuffles, and bit-identical semantics in the
  * oracle. At 100 TB the match is a single scan with the regex inlined
  * into whole-stage codegen.
  *
  * Supported (micromatch semantics, reference tests §3):
  *   - `**`  crosses `/` (leading `**` + slash = zero-or-more dirs)
  *   - `*`   within a segment: `[^/]*`
  *   - `?`   single non-`/` char
  *   - `{a,b}` alternation (nestable)
  *   - `[abc]` / `[!abc]` char classes
  *   - `nocase` option → `(?i)`
  */
object Globs {

  /** Compile one glob to an anchored regex (no ^$ — callers anchor). */
  def compile(glob: String, nocase: Boolean = false): String = {
    val body = translate(glob)
    if (nocase) "(?i)" + body else body
  }

  /** Compile a pattern list (OR semantics, like micromatch(paths, [..])). */
  def compileAny(globs: Seq[String], nocase: Boolean = false): String = {
    val body = globs.map(g => "(?:" + translate(g) + ")").mkString("|")
    if (nocase) "(?i)" + body else body
  }

  /** Compile a capture pattern (reference PathMatcher.capture,
    * src/index.ts:731): `:name` placeholders → `([^/.]+)` groups, `*` →
    * `([^/]+)` groups, everything else literal. Returns the anchored regex
    * and the ordered group names (`:name`s get their name, `*`s get
    * positional `_N`).
    */
  def compileCapture(pattern: String): (String, Seq[String]) = {
    val sb = new StringBuilder
    val names = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    var starN = 0
    val n = pattern.length
    while (i < n) {
      val c = pattern.charAt(i)
      if (c == ':') {
        val j0 = i + 1
        var j = j0
        while (j < n && pattern.charAt(j) != '/' && pattern.charAt(j) != '.') j += 1
        names += pattern.substring(j0, j)
        sb.append("([^/.]+)")
        i = j
      } else if (c == '*') {
        starN += 1
        names += s"_$starN"
        sb.append("([^/]+)")
        i += 1
      } else {
        if ("\\.^$+()|[]{}?".indexOf(c) >= 0) sb.append('\\')
        sb.append(c)
        i += 1
      }
    }
    (sb.toString, names.toSeq)
  }

  private def translate(g: String): String = {
    val sb = new StringBuilder
    var i = 0
    val n = g.length
    while (i < n) {
      g.charAt(i) match {
        case '*' =>
          var j = i
          while (j < n && g.charAt(j) == '*') j += 1
          val prevIsSlashOrStart = i == 0 || g.charAt(i - 1) == '/'
          val nextIsSlash = j < n && g.charAt(j) == '/'
          if (j - i >= 2) {
            if (prevIsSlashOrStart && nextIsSlash) {
              // "a/**/b" or "**/b": zero or more whole dirs (incl. none)
              sb.append("(?:[^/]*/)*"); i = j + 1
            } else {
              // trailing "/**", bare "**", or mid-token: match anything
              sb.append(".*"); i = j
            }
          } else {
            sb.append("[^/]*"); i = j
          }
        case '?' => sb.append("[^/]"); i += 1
        case '{' =>
          val close = matchingBrace(g, i)
          if (close < 0) { sb.append("\\{"); i += 1 }
          else {
            val alts = splitTopLevel(g.substring(i + 1, close))
            sb.append(alts.map(translate).mkString("(?:", "|", ")"))
            i = close + 1
          }
        case '[' =>
          val close = g.indexOf(']', i + 2) // min class width 1
          if (close < 0) { sb.append("\\["); i += 1 }
          else {
            val inner0 = g.substring(i + 1, close)
            val inner = if (inner0.startsWith("!")) "^" + inner0.drop(1) else inner0
            sb.append('[').append(inner).append(']')
            i = close + 1
          }
        case '\\' if i + 1 < n =>
          val c = g.charAt(i + 1)
          if ("\\.^$+()|[]{}*?".indexOf(c) >= 0) sb.append('\\')
          sb.append(c); i += 2
        case c =>
          if ("\\.^$+()|".indexOf(c) >= 0) sb.append('\\')
          sb.append(c); i += 1
      }
    }
    sb.toString
  }

  private def matchingBrace(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '{' => depth += 1
        case '}' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  private def splitTopLevel(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case ',' if depth == 0 => out += cur.toString; cur.clear()
      case c =>
        if (c == '{') depth += 1
        if (c == '}') depth -= 1
        cur.append(c)
    }
    out += cur.toString
    out.toSeq
  }
}
