package graft.validate

import java.util.concurrent.ConcurrentHashMap
import java.util.regex.Pattern

/** Scalar validators, faithful to the reference semantics including the
  * exception paths (which the reference converts to "message invalid" via
  * the catch-all at TopologyProducer.java:275-277 — and which also ABORT the
  * per-answer loop, so later answers are never evaluated).
  *
  * Each validator therefore exposes a total `*Outcome` form returning
  * `Right(valid)` for a normal result and `Left(reason)` where the reference
  * would have thrown.
  */
object Validators {

  /** ABN checksum, bit-for-bit with TopologyProducer.java:304-317.
    *
    * Quirks preserved:
    *  - guard is `matches("[0-9]+") && length != 11` (TP:306) — a
    *    NON-numeric string falls through the guard and then throws in
    *    `Integer.parseInt` (TP:311) → reference catch-all → invalid+abort;
    *  - a numeric string of length != 11 returns false normally;
    *  - a short parseable string throws ArrayIndexOutOfBounds in the
    *    weighted fold (TP:314-315) → invalid+abort.
    *
    * May throw, exactly like the reference.
    */
  def isValidABN(abnCode: String): Boolean = {
    if (abnCode.matches("[0-9]+") && abnCode.length != 11) {
      return false
    }
    val weights = Array(10, 1, 3, 5, 7, 9, 11, 13, 15, 17, 19)
    // split by non-word-boundary, exactly like `abnCode.split("\\B")` TP:311
    val abnDigits = abnCode.split("\\B").map(Integer.parseInt)
    val sum = (0 until weights.length).foldLeft(0) { (total, idx) =>
      total + weights(idx) * (if (idx == 0) abnDigits(idx) - 1 else abnDigits(idx))
    }
    sum % 89 == 0
  }

  /** Luhn check, bit-for-bit with TopologyProducer.java:325-340.
    * Quirk Q7: the empty string yields sum 0 → VALID. Any non-digit char
    * throws in parseInt → reference catch-all → invalid+abort.
    * May throw, exactly like the reference.
    */
  def isValidCreditCard(creditCardNumber: String): Boolean = {
    var sum = 0
    var alternate = false
    var i = creditCardNumber.length - 1
    while (i >= 0) {
      var n = Integer.parseInt(creditCardNumber.substring(i, i + 1))
      if (alternate) {
        n *= 2
        if (n > 9) n = (n % 10) + 1
      }
      sum += n
      alternate = !alternate
      i -= 1
    }
    sum % 10 == 0
  }

  /** Total form: Left(reason) where the reference would throw. */
  def abnOutcome(value: String): Either[String, Boolean] =
    try Right(isValidABN(value))
    catch { case _: Exception => Left(graft.model.Reasons.AbnFail) }

  def luhnOutcome(value: String): Either[String, Boolean] =
    try Right(isValidCreditCard(value))
    catch { case _: Exception => Left(graft.model.Reasons.LuhnFail) }

  // -------------------------------------------------------------------------
  // Regex any-match (TopologyProducer.java:233-251).
  //
  // The reference compiles each pattern per record (its own TODO at TP:237
  // flags the cost). We keep exact `Matcher.matches()` (FULL-match) semantics
  // but add the per-executor compiled-pattern cache the reference wished for.
  // -------------------------------------------------------------------------
  private val patternCache = new ConcurrentHashMap[String, Pattern]()

  private def compiled(regex: String): Pattern = {
    val hit = patternCache.get(regex)
    if (hit != null) hit
    else {
      val p = Pattern.compile(regex)
      // benign race: last writer wins, Patterns are immutable
      if (patternCache.size < 65536) patternCache.put(regex, p)
      p
    }
  }

  /** Full-match `value` against `regex` (Java `matcher.matches()`, not the
    * partial-match of Spark's `rlike`). Throws on null value or a bad
    * pattern, like the reference.
    */
  def fullMatch(value: String, regex: String): Boolean =
    compiled(regex).matcher(value).matches()

  /** ANY-match with first-match short-circuit (quirk Q8): valid iff at least
    * one regex in the datatype's validation list full-matches. An empty list
    * yields false (TP:233's `isAnyValid` never set). Left(reason) where the
    * reference would throw (null value → NPE at Matcher; bad pattern →
    * PatternSyntaxException).
    */
  def regexAnyOutcome(value: String, regexes: Seq[String]): Either[String, Boolean] =
    try {
      var any = false
      val it = regexes.iterator
      while (!any && it.hasNext) {
        if (fullMatch(value, it.next())) any = true
      }
      Right(any)
    } catch { case _: Exception => Left(graft.model.Reasons.RegexFail) }
}
