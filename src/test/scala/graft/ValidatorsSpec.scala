package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.validate.Validators
import graft.model.Reasons

/** Per-validator semantics vs TopologyProducer.java:304-340 (hand-computed
  * goldens + ScalaCheck properties around the guard quirks).
  */
class ValidatorsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  // --- ABN (TP:304-317) ---
  test("ABN: known-valid 51824753556 (weighted sum 534 = 6*89)") {
    assert(Validators.isValidABN("51824753556"))
  }
  test("ABN: last-digit perturbation invalid") {
    assert(!Validators.isValidABN("51824753557"))
  }
  test("ABN: numeric wrong length -> false via guard (no exception)") {
    assert(Validators.abnOutcome("123456") == Right(false))
  }
  test("ABN: non-numeric falls through guard and throws (quirk: && not ||)") {
    assert(Validators.abnOutcome("ABN1234567") == Left(Reasons.AbnFail))
  }
  test("ABN: empty string throws (parseInt of empty)") {
    assert(Validators.abnOutcome("") == Left(Reasons.AbnFail))
  }
  test("ABN: numeric strings of length != 11 are always false") {
    val gen = Gen.chooseNum(1, 15).suchThat(_ != 11)
      .flatMap(n => Gen.listOfN(n, Gen.numChar).map(_.mkString))
    check(Prop.forAll(gen)(s => Validators.abnOutcome(s) == Right(false)))
  }
  test("ABN: 11-digit strings decide by checksum, never throw") {
    val gen = Gen.listOfN(11, Gen.numChar).map(_.mkString)
    check(Prop.forAll(gen)(s => Validators.abnOutcome(s).isRight))
  }

  // --- Luhn (TP:325-340) ---
  test("Luhn: 4242424242424242 valid") {
    assert(Validators.isValidCreditCard("4242424242424242"))
  }
  test("Luhn: perturbed invalid") {
    assert(!Validators.isValidCreditCard("4242424242424243"))
  }
  test("Luhn: EMPTY STRING is valid (quirk Q7, sum stays 0)") {
    assert(Validators.luhnOutcome("") == Right(true))
  }
  test("Luhn: non-digit throws -> abort") {
    assert(Validators.luhnOutcome("4242ABCD") == Left(Reasons.LuhnFail))
  }
  test("Luhn: exactly one check digit completes any digit string") {
    val gen = Gen.nonEmptyListOf(Gen.numChar).map(_.mkString)
    check(Prop.forAll(gen) { body =>
      (0 to 9).count(d => Validators.isValidCreditCard(body + d)) == 1
    })
  }

  // --- regex any-match (TP:233-251) ---
  test("regex: ANY-match semantics (Q8) — second pattern suffices") {
    assert(Validators.regexAnyOutcome("Bob Smith",
      Seq("^[A-Z][a-z]+$", "^[A-Za-z ]{2,50}$")) == Right(true))
  }
  test("regex: FULL match, not substring (Java matches() vs rlike)") {
    assert(Validators.regexAnyOutcome("xx123xx", Seq("[0-9]+")) == Right(false))
    assert(Validators.regexAnyOutcome("123", Seq("[0-9]+")) == Right(true))
  }
  test("regex: empty validation list -> false (isAnyValid never set)") {
    assert(Validators.regexAnyOutcome("anything", Nil) == Right(false))
  }
  test("regex: null value -> abort (NPE in reference)") {
    assert(Validators.regexAnyOutcome(null, Seq(".*")) == Left(Reasons.RegexFail))
  }
  test("regex: invalid pattern -> abort (PatternSyntaxException)") {
    assert(Validators.regexAnyOutcome("x", Seq("[unclosed")) == Left(Reasons.RegexFail))
  }
}
