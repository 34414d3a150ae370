package graft.validate

import graft.model._

/** The reference's `validate(String)` (TopologyProducer.java:159-294)
  * re-expressed as a pure function over the parsed envelope plus the
  * dimension catalog. This is the single source of truth for accept/reject
  * semantics; both the fused pipeline stage and the golden tests call it.
  *
  * Control-flow quirks preserved (SURVEY.md §2.5):
  *  - Q1  non-Answer messages pass through unvalidated (TP:161, TP:172);
  *  - Q2  missing source entity rejects via NPE (TP:198) — which ABORTS the
  *        answer loop: later answers are never evaluated;
  *  - Q3  unparseable input: reference crashes at TP:280; we reject with
  *        reason=MALFORMED, uuid=null (documented divergence);
  *  - Q4  last-answer-wins: `valid` is reassigned per answer (TP:161-273);
  *        a later passing answer overwrites an earlier failure;
  *  - Q5  blacklist-off promotes invalid→valid (TP:283-284);
  *  - Q7/Q8 checksum/regex quirks live in [[Validators]];
  *  - Q9  webdata emission is a side effect only (TP:212-227) — collected
  *        as data here, emitted by the sink, never affects validity. It
  *        fires before a same-answer checksum/regex abort but not after an
  *        earlier-answer abort.
  */
object Evaluator {

  import Reasons._

  /** Per-answer step result. */
  sealed trait Step
  /** Normal path: the loop iteration REASSIGNED `valid` (TP:190-252). */
  final case class Continue(valid: Boolean, reason: String) extends Step
  /** Exception path: catch-all TP:275-277 — message invalid, loop aborted. */
  final case class Abort(reason: String) extends Step

  final case class AnswerEval(step: Step, webdata: Option[String])

  /** One iteration of the answer loop (TP:185-273). */
  def evalAnswer(a: AnswerItem, claims: TokenClaims, cat: Catalog): AnswerEval = {
    // TP:190: userCode equality gate (null sourceCode can never equal)
    if (a.sourceCode == null || claims.userCode != a.sourceCode)
      return AnswerEval(Continue(valid = false, SourceNotUser), None)

    // TP:196-198: fetch source; the reference dereferences sourceBe.getCode()
    // BEFORE the null check → NPE → catch-all → invalid + loop abort (Q2).
    if (!cat.entities.contains(a.sourceCode))
      return AnswerEval(Abort(SourceMissing), None)

    // TP:201-202: target lookup; miss sets valid=false and CONTINUES.
    val targetBe = Option(a.targetCode).flatMap(cat.entities.get)
    if (targetBe.isEmpty)
      return AnswerEval(Continue(valid = false, TargetMissing), None)

    // TP:204: DefUtils.getDEF(targetBe) — a missing DEF has no observable
    // in-repo behavior (external dep); modeled as the exception path.
    val defRow = cat.defAllowed.get(a.targetCode)
    if (defRow.isEmpty)
      return AnswerEval(Abort(DefMissing), None)

    // TP:206: containsEntityAttribute("ATT_" + attributeCode); Java string
    // concat renders a null code as "ATT_null" → simply not allowed.
    val attEntry = "ATT_" + (if (a.attributeCode == null) "null" else a.attributeCode)
    if (!defRow.get.allowed.contains(attEntry))
      return AnswerEval(Continue(valid = false, AttNotAllowed), None)

    // TP:208-209: attribute lookup; null → valid=false, continue.
    val attr = Option(a.attributeCode).flatMap(cat.attributes.get)
    if (attr.isEmpty)
      return AnswerEval(Continue(valid = false, AttUnknown), None)

    // TP:212-227: webdata side output — fires HERE, before checksum/regex,
    // so it survives a same-answer abort below (Q9).
    val webdata =
      if ("LNK_PERSON" == a.attributeCode && "BKT_APPLICATIONS" == a.targetCode
          && "[]" == a.value)
        Some(webdataPayload(targetBe.get, claims))
      else None

    // Checksums run through the allocation-free, branch-only kernels
    // (ChecksumKernels) — no per-char substring, no thrown/caught exception
    // per row. Validators keeps the literal reference port; a parity spec
    // asserts kernel == port on every input class.
    import graft.functions.ChecksumKernels
    def codeToStep(code: Int, failReason: String): Step = code match {
      case ChecksumKernels.Abort => Abort(failReason)
      case ChecksumKernels.Valid => Continue(valid = true, failReason)
      case _ => Continue(valid = false, failReason)
    }
    val step = a.attributeCode match {
      case "PRI_ABN" => // TP:228-229
        codeToStep(ChecksumKernels.abnCode(a.value), AbnFail)
      case "PRI_CREDITCARD" => // TP:230-231
        codeToStep(ChecksumKernels.luhnCode(a.value), LuhnFail)
      case _ => // TP:233-251 regex any-match
        Validators
          .regexAnyOutcome(a.value, attr.get.validations.map(_.regex))
          .fold(Abort(_), ok => Continue(ok, RegexFail))
    }
    AnswerEval(step, webdata)
  }

  /** Synthetic `QDataBaseEntityMessage` JSON (TP:216-223): wraps the target
    * entity with total=1, returnCount=1 and the user token. Deterministic
    * field order; entity codes/names are catalog-controlled (no escaping
    * needed beyond fixtures' plain ASCII).
    */
  def webdataPayload(target: EntityRow, claims: TokenClaims): String =
    s"""{"data_type":"BaseEntity","items":[{"code":"${target.code}","name":"${target.name}","LNK_PERSON":"[]"}],"total":1,"returnCount":1,"token":"${claims.token}"}"""

  /** Full message decision: the `validate` body around the loop
    * (TP:159-294), minus I/O. `enableBlacklist=false` promotes invalid
    * messages to valid (Q5).
    */
  def evalTurn(t: ParsedTurn, cat: Catalog, enableBlacklist: Boolean): TurnDecision = {
    def out(decision: String, reason: String, uuid: String, promoted: Boolean,
        webdata: Seq[String]): TurnDecision =
      TurnDecision(t.conv_id, t.turn_idx, t.role, t.tool, t.ts, t.text,
        decision, reason, uuid, promoted, webdata)

    def rejected(reason: String, uuid: String, webdata: Seq[String]): TurnDecision =
      if (!enableBlacklist) out("valid", reason, uuid, promoted = true, webdata)
      else out("rejected", reason, uuid, promoted = false, webdata)

    val m = t.msg
    // jsonb.fromJson failure (TP:167) → catch-all; from_json PERMISSIVE
    // surfaces it as a null struct.
    if (m == null) return rejected(Malformed, null, Nil)
    // json.getString("msg_type"/"data_type") THROW on a missing/null key
    // (TP:169-170) — even for messages that would not be validated.
    if (m.msg_type == null || m.data_type == null) return rejected(Malformed, null, Nil)
    // TP:172 gate — everything else passes through untouched (Q1).
    if (m.msg_type != "DATA_MSG" || m.data_type != "Answer")
      return out("valid", null, null, promoted = false, Nil)
    // TP:174: token parse; failure → catch-all (and Q3 crash in reference).
    if (m.token == null) return rejected(Malformed, null, Nil)
    val claimsOpt = TokenCodec.decode(m.token)
    if (claimsOpt.isEmpty) return rejected(Malformed, null, Nil)
    val claims = claimsOpt.get

    // TP:180-183: envelope token vs bound POJO token. Both bind the same
    // JSON field, so the check is structurally vacuous here; kept for shape.
    var valid = claims.token == m.token
    var lastReason: String = if (valid) null else TokenMismatch

    // TP:178/185: jsonb binding; a missing `items` key → getItems() null →
    // NPE entering the loop → catch-all → invalid (uuid IS available).
    if (m.items == null) return rejected(Malformed, claims.uuid, Nil)

    val webs = Seq.newBuilder[String]
    var aborted = false
    val it = m.items.iterator
    while (!aborted && it.hasNext) {
      val ev = evalAnswer(it.next(), claims, cat)
      ev.webdata.foreach(webs += _)
      ev.step match {
        case Continue(v, r) => valid = v; lastReason = if (v) null else r
        case Abort(r) => valid = false; lastReason = r; aborted = true
      }
    }

    if (valid) out("valid", null, null, promoted = false, webs.result())
    else rejected(lastReason, claims.uuid, webs.result())
  }
}
