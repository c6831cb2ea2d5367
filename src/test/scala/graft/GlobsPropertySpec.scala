package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Globs

/** Property-based fuzzing of the glob compiler: structural invariants
  * that must hold for ANY path, not just the hand-picked spec cases.
  */
class GlobsPropertySpec extends AnyFunSuite {

  /** run a ScalaCheck property under ScalaTest without the -plus bridge
    * (only scalatest+scalacheck are on the test classpath).
    */
  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val segGen: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
  private val pathGen: Gen[List[String]] =
    Gen.chooseNum(1, 4).flatMap(n => Gen.listOfN(n, segGen))

  private def matches(path: String, glob: String): Boolean =
    path.matches("^(?:" + Globs.compile(glob) + ")$")

  test("a literal path always matches itself (escaping is sound)") {
    check(Prop.forAll(pathGen) { segs =>
      val p = segs.mkString("/")
      matches(p, p)
    })
  }

  test("replacing any one segment with * still matches") {
    check(Prop.forAll(pathGen, Gen.chooseNum(0, 3)) { (segs, i0) =>
      val i = i0 % segs.length
      val pat = segs.updated(i, "*").mkString("/")
      matches(segs.mkString("/"), pat)
    })
  }

  test("inserting a ** before any segment still matches (zero-dir globstar)") {
    // trailing "p/**" intentionally does NOT match "p" (micromatch
    // requires a child after the slash), so insertion is before a
    // segment, never at the very end
    check(Prop.forAll(pathGen, Gen.chooseNum(0, 4)) { (segs, i0) =>
      val i = i0 % segs.length
      val pat = (segs.take(i) ++ List("**") ++ segs.drop(i)).mkString("/")
      matches(segs.mkString("/"), pat)
    })
  }

  test("trailing /** requires a child (micromatch semantics)") {
    check(Prop.forAll(pathGen, segGen) { (segs, child) =>
      val pat = segs.mkString("/") + "/**"
      !matches(segs.mkString("/"), pat) &&
        matches(segs.mkString("/") + "/" + child, pat)
    })
  }

  test("{seg,other} alternation matches the original segment") {
    check(Prop.forAll(pathGen, segGen) { (segs, alt) =>
      val pat = segs.updated(0, s"{${segs.head},$alt}").mkString("/")
      matches(segs.mkString("/"), pat)
    })
  }

  test("fixed-depth patterns reject paths of different depth") {
    check(Prop.forAll(pathGen, segGen) { (segs, extra) =>
      val pat = segs.map(_ => "*").mkString("/")
      !matches((segs :+ extra).mkString("/"), pat)
    })
  }

  test("? matches exactly single-char positions") {
    check(Prop.forAll(pathGen) { segs =>
      val last = segs.last
      val pat = segs.init :+ ("?" * last.length)
      matches(segs.mkString("/"), pat.mkString("/")) &&
        !matches(segs.mkString("/") + "x", pat.mkString("/"))
    })
  }

  test("extglob invariants: @(seg|alt) matches; k-fold repeat obeys + * ?") {
    // wrapping any one segment as @(seg|other) must keep matching, and
    // the quantified forms must track their repetition contracts for a
    // RANDOM inner token and count — the structural claims behind the
    // hand-picked extglob spec cases
    check(Prop.forAll(pathGen, segGen, Gen.chooseNum(0, 3)) { (segs, alt, i0) =>
      val i = i0 % segs.length
      val pat = segs.updated(i, s"@(${segs(i)}|$alt)").mkString("/")
      matches(segs.mkString("/"), pat)
    })
    check(Prop.forAll(segGen, Gen.chooseNum(0, 4)) { (tok, k) =>
      val rep = tok * k
      (matches(rep, s"*($tok)")
        && (matches(rep, s"+($tok)") == (k >= 1))
        && (matches(rep, s"?($tok)") == (k <= 1)))
    })
  }

  test("extglob negation: !(seg) rejects exactly the excluded alternatives") {
    check(Prop.forAll(pathGen, segGen, Gen.chooseNum(0, 3)) { (segs, other, i0) =>
      val i = i0 % segs.length
      val glob = segs.updated(i, s"!(${segs(i)})").mkString("/")
      val (pos, negs) = Globs.compileWithNegation(glob)
      def mNeg(path: String): Boolean =
        path.matches("^(?:" + pos + ")$") &&
          !negs.exists(n => path.matches("^(?:" + n + ")$"))
      // the original path instantiates the negated segment with the
      // excluded literal → reject; swapping in a DIFFERENT segment → match
      !mNeg(segs.mkString("/")) &&
        (other == segs(i) || mNeg(segs.updated(i, other).mkString("/")))
    })
  }

  test("capture groups reassemble the path (lossless for :name segments)") {
    check(Prop.forAll(pathGen) { segs =>
      val pattern = segs.indices.map(i => s":k$i").mkString("/")
      val (re, names) = Globs.compileCapture(pattern)
      val m = ("^" + re + "$").r.findFirstMatchIn(segs.mkString("/"))
      m.exists(mm => names.indices.map(i => mm.group(i + 1)) == segs) ||
        segs.exists(_.contains(".")) // :name stops at dots by design
    })
  }
}
