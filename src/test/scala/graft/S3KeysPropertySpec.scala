package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite
import graft.api.S3Keys

/** Property-based fuzzing of the S3 key codec: decode(encode(k)) == k
  * must hold for ANY key, including unicode, punctuation, and empty
  * segments — the invariant the reference gets from
  * encodeURIComponent/decodeURIComponent.
  */
class S3KeysPropertySpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, res.status.toString)
  }

  // segments over a deliberately nasty alphabet: ascii printables
  // (incl. % + & = ? #), some unicode, and possibly empty
  private val charGen: Gen[Char] = Gen.frequency(
    6 -> Gen.choose(' ', '~'),
    2 -> Gen.alphaNumChar,
    1 -> Gen.oneOf('ü', 'ß', 'é', '中', '文', '→', '€'))
  private val segGen: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))
  private val keyGen: Gen[String] =
    Gen.chooseNum(1, 5).flatMap(n => Gen.listOfN(n, segGen).map(_.mkString("/")))

  test("decode(encode(key)) == key for arbitrary keys") {
    check(Prop.forAll(keyGen) { k =>
      S3Keys.decodeS3Key(S3Keys.encodeS3Key(k)) == k
    })
  }

  test("encoded keys contain no characters that need URL escaping") {
    val safe = ("ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789" +
      "-_.!~*'()/%").toSet
    check(Prop.forAll(keyGen) { k =>
      S3Keys.encodeS3Key(k).forall(safe.contains)
    })
  }

  test("slash count is preserved (segments never merge or split)") {
    check(Prop.forAll(keyGen) { k =>
      S3Keys.encodeS3Key(k).count(_ == '/') == k.count(_ == '/')
    })
  }
}
