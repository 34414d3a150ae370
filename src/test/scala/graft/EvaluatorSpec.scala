package graft

import java.sql.Timestamp
import org.scalatest.funsuite.AnyFunSuite
import graft.fixtures.TranscriptGen
import graft.model._
import graft.validate.{Evaluator, TokenCodec}

/** Golden accept/reject decisions per quirk Q1-Q9 (SURVEY.md §2.5), built by
  * hand against the reference control flow in TopologyProducer.java:159-294.
  */
class EvaluatorSpec extends AnyFunSuite {
  private val cat = TranscriptGen.catalog
  private val ts = new Timestamp(TranscriptGen.BaseEpoch * 1000L)
  private val tok = TranscriptGen.userToken(1)
  private val uc = "PER_USER1"
  private val uuid = TranscriptGen.userUuid(1)

  private def turn(msg: Envelope, text: String = "raw"): ParsedTurn =
    ParsedTurn("CONV_X", 0, "user", text, null, ts, msg)
  private def env(items: AnswerItem*): Envelope =
    Envelope("DATA_MSG", "Answer", tok, items)
  private def a(att: String, v: String, tgt: String = "PER_TARGET3") =
    AnswerItem(uc, tgt, att, v)
  private def eval(t: ParsedTurn, bl: Boolean = true) = Evaluator.evalTurn(t, cat, bl)

  test("valid email answer accepted") {
    val d = eval(turn(env(a("PRI_EMAIL", "user1@example.com"))))
    assert(d.decision == "valid" && d.reason == null && d.uuid == null)
  }

  test("regex fail rejected with uuid for blacklist") {
    val d = eval(turn(env(a("PRI_EMAIL", "nope"))))
    assert(d.decision == "rejected" && d.reason == Reasons.RegexFail && d.uuid == uuid)
  }

  test("Q1: non-Answer message passes through unvalidated") {
    val d = eval(turn(Envelope("CHAT_MSG", "Chat", null, null)))
    assert(d.decision == "valid")
  }

  test("missing msg_type/data_type -> MALFORMED (getString throws, TP:169-170)") {
    assert(eval(turn(Envelope(null, "Answer", tok, Nil))).reason == Reasons.Malformed)
    assert(eval(turn(Envelope("CHAT_MSG", null, tok, Nil))).reason == Reasons.Malformed)
  }

  test("Q3: unparseable json -> rejected MALFORMED with null uuid (no crash)") {
    val d = eval(turn(null, text = "garbage {{{"))
    assert(d.decision == "rejected" && d.reason == Reasons.Malformed && d.uuid == null)
  }

  test("undecodable token -> MALFORMED, null uuid") {
    val d = eval(turn(Envelope("DATA_MSG", "Answer", "not-a-jwt", Seq(a("PRI_EMAIL", "x@y.co")))))
    assert(d.decision == "rejected" && d.reason == Reasons.Malformed && d.uuid == null)
  }

  test("missing items -> MALFORMED but uuid IS available (NPE after token parse)") {
    val d = eval(turn(Envelope("DATA_MSG", "Answer", tok, null)))
    assert(d.decision == "rejected" && d.reason == Reasons.Malformed && d.uuid == uuid)
  }

  test("empty items array -> valid (loop never runs)") {
    assert(eval(turn(env())).decision == "valid")
  }

  test("source != userCode -> SOURCE_NOT_USER") {
    val d = eval(turn(env(AnswerItem("PER_USER2", "PER_TARGET3", "PRI_EMAIL", "x@y.co"))))
    assert(d.decision == "rejected" && d.reason == Reasons.SourceNotUser)
  }

  test("Q2: missing source entity ABORTS the loop (NPE at TP:198)") {
    val ghostTok = TokenCodec.encode("UUID-G", "g@x.co", "PER_GHOST")
    val items = Seq(
      AnswerItem("PER_GHOST", "PER_TARGET3", "PRI_EMAIL", "x@y.co"),
      AnswerItem("PER_GHOST", "BKT_APPLICATIONS", "LNK_PERSON", "[]"))
    val d = eval(turn(Envelope("DATA_MSG", "Answer", ghostTok, items)))
    assert(d.decision == "rejected" && d.reason == Reasons.SourceMissing)
    assert(d.webdata.isEmpty) // later answers never evaluated
  }

  test("missing target -> TARGET_MISSING, continues (no abort)") {
    val d = eval(turn(env(
      a("PRI_EMAIL", "x@y.co", tgt = "PER_NOSUCH"),
      a("PRI_EMAIL", "user1@example.com"))))
    assert(d.decision == "valid") // Q4 last answer wins
  }

  test("DEF missing -> abort DEF_MISSING") {
    val d = eval(turn(env(a("PRI_EMAIL", "x@y.co", tgt = "PER_NODEF"))))
    assert(d.decision == "rejected" && d.reason == Reasons.DefMissing)
  }

  test("attribute not in DEF whitelist -> ATT_NOT_ALLOWED") {
    val d = eval(turn(env(a("PRI_FORBIDDEN", "x"))))
    assert(d.reason == Reasons.AttNotAllowed)
  }

  test("attribute allowed but undefined -> ATT_UNKNOWN") {
    val d = eval(turn(env(a("GHOST", "x"))))
    assert(d.reason == Reasons.AttUnknown)
  }

  test("Q4: last-answer-wins — later pass overwrites earlier fail") {
    val d = eval(turn(env(a("PRI_EMAIL", "bad"), a("PRI_EMAIL", "user1@example.com"))))
    assert(d.decision == "valid")
  }

  test("Q4 inverse: later fail overwrites earlier pass") {
    val d = eval(turn(env(a("PRI_EMAIL", "user1@example.com"), a("PRI_EMAIL", "bad"))))
    assert(d.decision == "rejected" && d.reason == Reasons.RegexFail)
  }

  test("Q5: blacklist off promotes invalid to valid") {
    val d = eval(turn(env(a("PRI_EMAIL", "bad"))), bl = false)
    assert(d.decision == "valid" && d.promoted && d.reason == Reasons.RegexFail)
  }

  test("Q9: webdata side output fires and never affects validity") {
    val d = eval(turn(env(a("LNK_PERSON", "[]", tgt = "BKT_APPLICATIONS"))))
    assert(d.decision == "valid" && d.webdata.size == 1)
    assert(d.webdata.head.contains("\"code\":\"BKT_APPLICATIONS\""))
    assert(d.webdata.head.contains("\"total\":1"))
  }

  test("Q9: webdata fires even when a LATER answer rejects the message") {
    val d = eval(turn(env(
      a("LNK_PERSON", "[]", tgt = "BKT_APPLICATIONS"),
      a("PRI_EMAIL", "bad"))))
    assert(d.decision == "rejected" && d.webdata.size == 1)
  }

  test("abort mid-loop suppresses later webdata") {
    val d = eval(turn(env(
      a("PRI_EMAIL", "user1@example.com"),
      a("PRI_ABN", "ABN1234567"),
      a("LNK_PERSON", "[]", tgt = "BKT_APPLICATIONS"))))
    assert(d.decision == "rejected" && d.reason == Reasons.AbnFail && d.webdata.isEmpty)
  }

  test("checksum answers: ABN + Luhn golden set") {
    assert(eval(turn(env(a("PRI_ABN", "51824753556")))).decision == "valid")
    assert(eval(turn(env(a("PRI_ABN", "51824753557")))).reason == Reasons.AbnFail)
    assert(eval(turn(env(a("PRI_CREDITCARD", "4242424242424242")))).decision == "valid")
    assert(eval(turn(env(a("PRI_CREDITCARD", "")))).decision == "valid") // Q7
    assert(eval(turn(env(a("PRI_CREDITCARD", "4242ABCD")))).reason == Reasons.LuhnFail)
  }

  test("null checksum value ABORTS (reference NPEs inside the validator)") {
    // abort ⇒ a later answer must NOT overwrite the failure (Q2-style)
    val d = eval(turn(env(
      a("PRI_ABN", null),
      a("PRI_EMAIL", "user1@example.com"))))
    assert(d.decision == "rejected" && d.reason == Reasons.AbnFail)
    val d2 = eval(turn(env(
      a("PRI_CREDITCARD", null),
      a("PRI_EMAIL", "user1@example.com"))))
    assert(d2.decision == "rejected" && d2.reason == Reasons.LuhnFail)
  }

  test("empty validation list attribute always rejects") {
    assert(eval(turn(env(a("PRI_EMPTYLIST", "anything")))).reason == Reasons.RegexFail)
  }
}
