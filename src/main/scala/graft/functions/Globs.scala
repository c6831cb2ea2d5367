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
  *   - `{2021..2023}` / `{01..12}` / `{0..30..5}` / `{a..e}` sequence
  *     ranges (bash brace expansion: zero-padded iff an endpoint is
  *     written padded, optional step, either direction) — expanded to
  *     the explicit alternation at compile time, capped at
  *     [[MaxBraceRange]] so a runaway range fails loud
  *   - `[abc]` / `[!abc]` char classes
  *   - extglobs `@(a|b)` / `+(x)` / `?(x)` / `*(x)` — exactly-one /
  *     one-or-more / zero-or-one / zero-or-more of the inner
  *     alternatives (micromatch's documented extglob set; each compiles
  *     to a plain RE2∩Java group + quantifier). A star-RUN binds before
  *     the extglob reading, so `**(a)` is `**` + literal parens, not
  *     `*` + `*(a)`.
  *   - extglob negation `!(a|b)` — via [[compileWithNegation]] ONLY
  *     (the list-negation path): RE2 has no lookahead, so a single
  *     regex cannot express it; [[translate]] fails loud rather than
  *     emit a silently-literal `!`.
  *   - POSIX bracket classes `[[:alpha:]]`, `[![:digit:]x]`, … — every
  *     name micromatch's posix mode documents (alnum alpha ascii blank
  *     cntrl digit graph lower print punct space upper word xdigit),
  *     each expanded to an EXPLICIT ASCII range (hex escapes — valid
  *     and identical in Java and RE2, unlike `\p{…}` whose Unicode
  *     semantics differ between engines). Unknown names fail loud.
  *   - `nocase` option → `(?i)`
  */
object Globs {

  /** Compile one glob to an anchored regex (no ^$ — callers anchor). */
  def compile(glob: String, nocase: Boolean = false): String = {
    val body = translate(glob)
    if (nocase) "(?i)" + body else body
  }

  /** Compile a glob that may contain extglob NEGATION `!(a|b)` into the
    * hoisted pair (positive regex, negative regexes) a caller combines
    * as `path RLIKE pos AND NOT path RLIKE neg_k ∀k` — the same
    * column-level negation path `!`-prefixed pattern lists use
    * (api.PathMatcher.isMatch), which is what keeps the compiled
    * dialect inside RE2∩Java (no lookahead).
    *
    * Semantics: positive = the glob with every `!(…)` loosened to `*`;
    * negative_k = the glob with occurrence k hardened to `@(…)` and the
    * others loosened. A path matches iff it matches the loosened
    * pattern and NO single `!(…)` position is instantiated by an
    * excluded alternative — equal to bash/micromatch whenever the
    * negated segment's alignment is unambiguous (it always is unless
    * `**` appears on BOTH sides of the `!(…)` segment). `!(…)` must
    * span a whole path segment (fail-loud otherwise): partial-segment
    * negation (`f!(oo)bar`) has no RE2-expressible equivalent.
    */
  def compileWithNegation(glob: String, nocase: Boolean = false): (String, Seq[String]) = {
    val spans = extNegSpans(glob)
    if (spans.isEmpty) (compile(glob, nocase), Nil)
    else {
      spans.foreach { case (s, e) =>
        val okL = s == 0 || glob.charAt(s - 1) == '/'
        val okR = e == glob.length - 1 || glob.charAt(e + 1) == '/'
        require(okL && okR,
          s"extglob negation !(…) is supported only as a whole path segment: $glob")
      }
      def rebuild(replaceAt: Int => String): String = {
        val sb = new StringBuilder
        var last = 0
        spans.zipWithIndex.foreach { case ((s, e), k) =>
          sb.append(glob.substring(last, s)).append(replaceAt(k))
          last = e + 1
        }
        sb.append(glob.substring(last))
        sb.toString
      }
      val positive = rebuild(_ => "*")
      val negatives = spans.indices.map { k =>
        rebuild(j =>
          if (j == k) "@(" + glob.substring(spans(k)._1 + 2, spans(k)._2) + ")"
          else "*")
      }
      (compile(positive, nocase), negatives.map(compile(_, nocase)).toList)
    }
  }

  /** top-level `!(…)` occurrence spans (start of `!`, index of `)`),
    * skipping escapes and char classes.
    */
  private def extNegSpans(g: String): Seq[(Int, Int)] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    var i = 0
    while (i < g.length) {
      g.charAt(i) match {
        case '\\' => i += 2
        case '[' =>
          val close = g.indexOf(']', i + 2)
          i = if (close < 0) i + 1 else close + 1
        case '!' if i + 1 < g.length && g.charAt(i + 1) == '(' &&
            matchingParen(g, i + 1) > 0 =>
          val close = matchingParen(g, i + 1)
          out += ((i, close))
          i = close + 1
        case _ => i += 1
      }
    }
    out.toSeq
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
    // extglob `X(alts)` for X ∈ @ + ? * → RE2∩Java group + quantifier;
    // returns the index after ')' or -1 if not an extglob at i
    def extglob(i0: Int): Int = {
      if (i0 + 1 >= n || g.charAt(i0 + 1) != '(') return -1
      val close = matchingParen(g, i0 + 1)
      if (close < 0) return -1
      val alts = splitTopLevelAlt(g.substring(i0 + 2, close)).map(translate)
      sb.append(alts.mkString("(?:", "|", ")"))
      g.charAt(i0) match {
        case '+' => sb.append('+')
        case '?' => sb.append('?')
        case '*' => sb.append('*')
        case _ => // '@': exactly one
      }
      close + 1
    }
    while (i < n) {
      g.charAt(i) match {
        case '!' if i + 1 < n && g.charAt(i + 1) == '(' && matchingParen(g, i + 1) > 0 =>
          throw new IllegalArgumentException(
            s"extglob negation !(…) cannot compile to one RE2∩Java regex — use Globs.compileWithNegation / PathMatcher.isMatch: $g")
        case '@' | '+' if i + 1 < n && g.charAt(i + 1) == '(' && matchingParen(g, i + 1) > 0 =>
          i = extglob(i)
        case '*' =>
          var j = i
          while (j < n && g.charAt(j) == '*') j += 1
          val prevIsSlashOrStart = i == 0 || g.charAt(i - 1) == '/'
          val nextIsSlash = j < n && g.charAt(j) == '/'
          if (j - i == 1 && j < n && g.charAt(j) == '(' && matchingParen(g, j) > 0) {
            i = extglob(i) // single `*(` = zero-or-more extglob
          } else if (j - i >= 2) {
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
        case '?' if i + 1 < n && g.charAt(i + 1) == '(' && matchingParen(g, i + 1) > 0 =>
          i = extglob(i)
        case '?' => sb.append("[^/]"); i += 1
        case '{' =>
          val close = matchingBrace(g, i)
          if (close < 0) { sb.append("\\{"); i += 1 }
          else {
            val alts = braceAlternatives(g.substring(i + 1, close))
            sb.append(alts.map(translate).mkString("(?:", "|", ")"))
            i = close + 1
          }
        case '[' =>
          parseBracketClass(g, i) match {
            case Some((body, next)) =>
              sb.append('[').append(body).append(']'); i = next
            case None => sb.append("\\["); i += 1
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

  /** POSIX class names → explicit ASCII ranges, hex-escaped so the
    * expansion is byte-identical under Java regex and RE2 (micromatch
    * posix mode's documented name set; `\p{…}` is avoided because its
    * Unicode reading differs between the two engines).
    */
  private val PosixClasses: Map[String, String] = Map(
    "alnum" -> "a-zA-Z0-9",
    "alpha" -> "a-zA-Z",
    "ascii" -> "\\x00-\\x7f",
    "blank" -> "\\x09\\x20",
    "cntrl" -> "\\x00-\\x1f\\x7f",
    "digit" -> "0-9",
    "graph" -> "\\x21-\\x7e",
    "lower" -> "a-z",
    "print" -> "\\x20-\\x7e",
    "punct" -> "\\x21-\\x2f\\x3a-\\x40\\x5b-\\x60\\x7b-\\x7e",
    "space" -> "\\x09-\\x0d\\x20",
    "upper" -> "A-Z",
    "word" -> "a-zA-Z0-9_",
    "xdigit" -> "0-9A-Fa-f")

  /** Parse a glob bracket class starting at `open` (`g(open) == '['`),
    * expanding embedded POSIX `[:name:]` tokens and honoring leading
    * `!` negation. Returns (compiled class body, index after the
    * closing `]`), or None when the class never closes (the caller
    * emits a literal `[`, the pre-POSIX behavior). A `]` in the first
    * content position is literal (min class width 1 — unchanged).
    * Unknown `[:name:]` fails loud rather than matching literally.
    */
  private def parseBracketClass(g: String, open: Int): Option[(String, Int)] = {
    val sb = new StringBuilder
    var i = open + 1
    if (i < g.length && g.charAt(i) == '!') { sb.append('^'); i += 1 }
    val start = i
    while (i < g.length) {
      if (g.startsWith("[:", i)) {
        val end = g.indexOf(":]", i + 2)
        val name = if (end > i + 2) g.substring(i + 2, end) else ""
        if (name.nonEmpty && name.forall(c => c >= 'a' && c <= 'z')) {
          sb.append(PosixClasses.getOrElse(name,
            throw new IllegalArgumentException(
              s"unknown POSIX class [:$name:] in glob: $g")))
          i = end + 2
        } else { sb.append("\\["); i += 1 } // literal '[' content
      } else if (g.charAt(i) == ']' && i > start) {
        return Some((sb.toString, i + 1))
      } else {
        // escape the chars Java treats specially INSIDE a class
        // ('[' opens a nested class union; ']' in first position would
        // close an empty class; '&&' is Java class intersection while
        // RE2 reads '&' as a literal) — literal in RE2 either way, so
        // escaping keeps the two engines agreeing on [a&&b] etc.
        // '\' stays unescaped: both engines give backslash-escapes
        // inside classes the same literal meaning ([a\-z] etc.).
        val c = g.charAt(i)
        if (c == '[' || c == ']' || c == '&') sb.append('\\')
        sb.append(c); i += 1
      }
    }
    None
  }

  private def matchingParen(s: String, open: Int): Int = {
    var depth = 0
    var i = open
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1; if (depth == 0) return i
        case _ =>
      }
      i += 1
    }
    -1
  }

  /** split extglob alternatives on top-level `|` (parens nest). */
  private def splitTopLevelAlt(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0
    s.foreach {
      case '|' if depth == 0 => out += cur.toString; cur.clear()
      case c =>
        if (c == '(') depth += 1
        if (c == ')') depth -= 1
        cur.append(c)
    }
    out += cur.toString
    out.toSeq
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

  /** max alternatives a `{A..B}` range may expand to — partition paths
    * (years, months, days, hours) are tiny; a huge range is a mistake
    * that should fail loud, not compile to a megabyte regex.
    */
  val MaxBraceRange = 4096

  private val NumRange = """(-?\d+)\.\.(-?\d+)(?:\.\.(\d+))?""".r
  private val ChrRange = """([a-zA-Z])\.\.([a-zA-Z])""".r

  /** Brace alternatives with bash/micromatch SEQUENCE expansion: when
    * the whole brace body is `A..B` (numeric, optionally negative,
    * optional `..step`) or a single-char `a..z` range, expand it to the
    * explicit value list at COMPILE time — `{2021..2023}` ≡
    * `{2021,2022,2023}`, `{01..12}` zero-pads to the endpoint width
    * (the Hive partition-path forms `month=01`). Otherwise the body is
    * a plain comma list. Expansion happens on the driver, once per
    * compile; the executor still sees one codegen'd rlike.
    */
  private[functions] def braceAlternatives(inner: String): Seq[String] = inner match {
    case NumRange(a, b, st) =>
      val step = Option(st).map(_.toLong).getOrElse(1L)
      require(step > 0, s"brace range step must be positive: {$inner}")
      val (lo, hi) = (a.toLong, b.toLong)
      val count = math.abs(hi - lo) / step + 1
      require(count <= MaxBraceRange,
        s"brace range {$inner} expands to $count alternatives (max $MaxBraceRange)")
      // zero-pad iff an endpoint is written padded (bash semantics)
      def padded(s: String) = { val d = s.stripPrefix("-"); d.length > 1 && d.startsWith("0") }
      val width = if (padded(a) || padded(b))
        math.max(a.stripPrefix("-").length, b.stripPrefix("-").length) else 0
      val dir = if (hi >= lo) step else -step
      Iterator.iterate(lo)(_ + dir).takeWhile(v => if (dir > 0) v <= hi else v >= hi)
        .map { v =>
          val digits = math.abs(v).toString
          val pad = "0" * math.max(0, width - digits.length)
          (if (v < 0) "-" else "") + pad + digits
        }.toSeq
    case ChrRange(a, b) =>
      val (x, y) = (a.head, b.head)
      val dir = if (y >= x) 1 else -1
      Iterator.iterate(x.toInt)(_ + dir).takeWhile(c => if (dir > 0) c <= y.toInt else c >= y.toInt)
        .map(_.toChar.toString).toSeq
    case _ => splitTopLevel(inner)
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
