package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Globs

/** Glob semantics pinned to the reference's tests
  * (reference tests/index.test.ts:28-120) — executed through
  * java.util.regex, the same engine Spark's rlike codegen uses.
  */
class GlobsSpec extends AnyFunSuite {
  private def m(path: String, glob: String, nocase: Boolean = false): Boolean =
    path.matches("^(?:" + Globs.compile(glob, nocase) + ")$")
  private def mAny(path: String, globs: Seq[String]): Boolean =
    path.matches("^(?:" + Globs.compileAny(globs) + ")$")

  test("** crosses slashes, * does not") {
    assert(m("foo/bar.txt", "**/*.txt"))
    assert(!m("foo/bar.json", "**/*.txt"))
    assert(m("bar.txt", "**/*.txt")) // leading **/ matches zero dirs
    assert(m("a/b/c/bar.txt", "**/*.txt"))
    assert(!m("foo/bar.txt", "*.txt"))
    assert(m("bar.txt", "*.txt"))
  }

  test("pattern lists have OR semantics") {
    assert(mAny("foo/bar.txt", Seq("**/*.txt", "**/*.json")))
    assert(mAny("foo/bar.json", Seq("**/*.txt", "**/*.json")))
    assert(!mAny("foo/bar.png", Seq("**/*.txt", "**/*.json")))
  }

  test("? matches exactly one non-slash char") {
    assert(m("a/b1.txt", "a/b?.txt"))
    assert(!m("a/b12.txt", "a/b?.txt"))
    assert(!m("a/b/.txt", "a/b?.txt"))
  }

  test("{a,b} alternation") {
    assert(m("x.json", "x.{json,csv}"))
    assert(m("x.csv", "x.{json,csv}"))
    assert(!m("x.txt", "x.{json,csv}"))
    assert(m("data/y/f.csv", "data/**/f.{json,csv}"))
  }

  test("{A..B} sequence ranges — bash brace expansion semantics") {
    // plain numeric range
    assert(m("year=2022/x", "year={2021..2023}/x"))
    assert(!m("year=2024/x", "year={2021..2023}/x"))
    // zero-padded iff an endpoint is written padded
    assert(m("month=01", "month={01..12}"))
    assert(m("month=12", "month={01..12}"))
    assert(!m("month=1", "month={01..12}"))  // padded form only
    assert(m("d=7", "d={1..12}"))            // unpadded form stays bare
    assert(!m("d=07", "d={1..12}"))
    assert(!m("month=13", "month={01..12}"))
    // step + descending + negative
    assert(m("h=10", "h={0..20..5}"))
    assert(!m("h=7", "h={0..20..5}"))
    assert(m("v=3", "v={5..1}"))
    assert(m("t=-2", "t={-3..3}"))
    // alpha range
    assert(m("c", "{a..e}"))
    assert(!m("f", "{a..e}"))
    // a range inside a larger path + extension alternation composes
    assert(m("data/year=2024/month=03/f.csv", "data/year={2023..2024}/month={01..06}/f.{json,csv}"))
    assert(!m("data/year=2024/month=07/f.csv", "data/year={2023..2024}/month={01..06}/f.{json,csv}"))
    // NOT a range: with a comma present the body is a plain list, so
    // "a..b" stays a literal alternative (bash: seq expansion applies
    // only when the WHOLE body is the A..B form)
    assert(m("a..b", "{a..b,x}"))
    assert(m("x", "{a..b,x}"))
    assert(!m("a", "{a..b,x}"))
    // runaway range fails loud instead of compiling a megabyte regex
    intercept[IllegalArgumentException](Globs.compile("{1..1000000}"))
  }

  test("mid-path ** matches zero or more whole dirs") {
    assert(m("a/b", "a/**/b"))
    assert(m("a/x/b", "a/**/b"))
    assert(m("a/x/y/b", "a/**/b"))
    assert(!m("a/xb", "a/**/b"))
  }

  test("char classes and negated classes") {
    assert(m("a1.log", "a[0-9].log"))
    assert(!m("ax.log", "a[0-9].log"))
    assert(m("ax.log", "a[!0-9].log"))
  }

  test("nocase option") {
    assert(m("FOO/Bar.TXT", "**/*.txt", nocase = true))
    assert(!m("FOO/Bar.TXT", "**/*.txt"))
  }

  test("extglobs @( + ( ?( *( — micromatch documented semantics") {
    // @(…) exactly one of the alternatives
    assert(m("a/b.txt", "a/@(b|c).txt"))
    assert(m("a/c.txt", "a/@(b|c).txt"))
    assert(!m("a/d.txt", "a/@(b|c).txt"))
    assert(!m("a/bb.txt", "a/@(b|c).txt"))
    // +(…) one or more
    assert(m("ab.txt", "+(ab).txt"))
    assert(m("abab.txt", "+(ab).txt"))
    assert(!m(".txt", "+(ab).txt"))
    assert(m("xyyz", "x+(y)z"))
    assert(!m("xz", "x+(y)z"))
    // ?(…) zero or one
    assert(m("xz", "x?(y)z"))
    assert(m("xyz", "x?(y)z"))
    assert(!m("xyyz", "x?(y)z"))
    // *(…) zero or more
    assert(m("xz", "x*(y)z"))
    assert(m("xyyyz", "x*(y)z"))
    assert(m("farbfrbfb", "f*(ar|r)b*(f*(ar|r)b)"))
    // alternatives may themselves hold glob tokens
    assert(m("a/b12/c", "a/@(b??|z*)/c"))
    assert(m("a/zoo/c", "a/@(b??|z*)/c"))
    assert(!m("a/b1/c", "a/@(b??|z*)/c"))
    // a star-RUN binds before the extglob reading: **(a) = ** + literal (a)
    assert(m("x/y/(a)", "**(a)"))
  }

  test("extglob negation !(…) via compileWithNegation (hoisted, RE2-safe)") {
    def mNeg(path: String, glob: String): Boolean = {
      val (pos, negs) = Globs.compileWithNegation(glob)
      path.matches("^(?:" + pos + ")$") &&
        !negs.exists(n => path.matches("^(?:" + n + ")$"))
    }
    assert(mNeg("a/x/c", "a/!(b)/c"))
    assert(!mNeg("a/b/c", "a/!(b)/c"))
    assert(mNeg("a/bb/c", "a/!(b)/c")) // bb is not b
    assert(!mNeg("a/b/c", "a/!(b|bb)/c"))
    assert(!mNeg("a/bb/c", "a/!(b|bb)/c"))
    // whole-segment at string edges
    assert(mNeg("x", "!(a)"))
    assert(!mNeg("a", "!(a)"))
    assert(mNeg("d/e", "!(a)/e"))
    assert(!mNeg("a/e", "!(a)/e"))
    // inner glob tokens: exclude by pattern, not just literal
    assert(!mNeg("a/b9/c", "a/!(b?)/c"))
    assert(mNeg("a/b99/c", "a/!(b?)/c"))
    // two independent negated segments conjoin
    assert(mNeg("x/y", "!(a)/!(b)"))
    assert(!mNeg("a/y", "!(a)/!(b)"))
    assert(!mNeg("x/b", "!(a)/!(b)"))
    // the one-regex path must fail LOUD, not match a literal '!'
    intercept[IllegalArgumentException](Globs.compile("a/!(b)/c"))
    // partial-segment negation has no RE2 equivalent — fail loud
    intercept[IllegalArgumentException](Globs.compileWithNegation("f!(oo)bar"))
    // [!…] classes are untouched by extglob scanning
    assert(m("ax.log", "a[!0-9].log"))
  }

  test("POSIX bracket classes — micromatch posix-mode name set") {
    assert(m("a1.log", "a[[:digit:]].log"))
    assert(!m("ax.log", "a[[:digit:]].log"))
    assert(m("ax.log", "a[[:alpha:]].log"))
    assert(!m("a1.log", "a[[:alpha:]].log"))
    assert(m("aB.log", "a[[:upper:]].log"))
    assert(!m("ab.log", "a[[:upper:]].log"))
    assert(m("a_.log", "a[[:word:]].log"))
    assert(m("aF.log", "a[[:xdigit:]].log"))
    assert(!m("aG.log", "a[[:xdigit:]].log"))
    assert(m("a;.log", "a[[:punct:]].log"))
    assert(!m("a1.log", "a[[:punct:]].log"))
    assert(m("a .log", "a[[:space:]].log"))
    assert(m("a\t.log", "a[[:blank:]].log"))
    assert(!m("a1.log", "a[[:blank:]].log"))
    // negation and mixing with plain class members
    assert(m("ax.log", "a[![:digit:]].log"))
    assert(!m("a1.log", "a[![:digit:]].log"))
    assert(m("a1.log", "a[[:alpha:]1].log"))
    assert(m("az.log", "a[[:alpha:]1].log"))
    assert(!m("a2.log", "a[[:alpha:]1].log"))
    // two classes in one bracket
    assert(m("a1.log", "a[[:alpha:][:digit:]].log"))
    assert(m("ax.log", "a[[:alpha:][:digit:]].log"))
    assert(!m("a;.log", "a[[:alpha:][:digit:]].log"))
    // the compiled form stays inside RE2∩Java: hex escapes, no \p{…}
    assert(!Globs.compile("a[[:alpha:]]").contains("\\p"))
    // unknown names fail loud, never silently-literal
    intercept[IllegalArgumentException](Globs.compile("a[[:bogus:]].log"))
    // a '[' that is NOT a posix token stays literal content
    assert(m("a[.log", "a[[].log"))
    // unclosed class still degrades to a literal '[' as before
    assert(m("a[b", "a[b"))
  }

  test("literal dots are escaped") {
    assert(!m("fooXtxt", "foo.txt"))
    assert(m("foo.txt", "foo.txt"))
  }

  test("capture: :name and * become groups (reference capture semantics)") {
    val (re, names) = Globs.compileCapture("users/:id/posts/:postId")
    assert(names == Seq("id", "postId"))
    val mm = ("^" + re + "$").r.findFirstMatchIn("users/123/posts/456").get
    assert(mm.group(1) == "123" && mm.group(2) == "456")

    val (re2, names2) = Globs.compileCapture("data/year=:y/event_type=:t/part-*")
    assert(names2 == Seq("y", "t", "_1"))
    val m2 = ("^" + re2 + "$").r.findFirstMatchIn("data/year=2024/event_type=click/part-7.json").get
    assert(m2.group(1) == "2024" && m2.group(2) == "click" && m2.group(3) == "7.json")
  }

  test("compiled regex is also valid RE2 (DuckDB oracle dialect): no backrefs/lookaround") {
    val res = Seq("**/*.txt", "a/**/b", "x.{json,csv}", "a[!0-9].log", "data/**/event_type=click/*.{json,csv}")
      .map(Globs.compile(_))
    res.foreach { r =>
      assert(!r.contains("(?=") && !r.contains("(?!") && !r.contains("(?<") && !r.contains("\\1"), r)
    }
  }
}
