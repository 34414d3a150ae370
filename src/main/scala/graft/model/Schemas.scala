package graft.model

import java.sql.Timestamp
import org.apache.spark.sql.types._

/** Core data model for the engine.
  *
  * The input stream shape comes from BASELINE.json `input_hint`:
  * `(conv_id:string, turn_idx:int, role:string, text:string, tool:string,
  * ts:timestamp)` — a multi-turn conversation/agent transcript table.
  *
  * The payload embedded in `text` mirrors the reference's
  * `QDataAnswerMessage` envelope, observed at
  * reference `src/main/java/life/genny/lauchy/streams/TopologyProducer.java:167-185`
  * (envelope) and `:190-238` (Answer fields).
  */
final case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** One answer item (TopologyProducer.java:190-238 field accesses). */
final case class AnswerItem(
    sourceCode: String,
    targetCode: String,
    attributeCode: String,
    value: String)

/** The parsed envelope (TopologyProducer.java:169-178). */
final case class Envelope(
    msg_type: String,
    data_type: String,
    token: String,
    items: Seq[AnswerItem])

/** Turn with the envelope parsed by `from_json` (null = unparseable JSON). */
final case class ParsedTurn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp,
    msg: Envelope)

/** Validation outcome for one turn. `webdata` carries the synthetic
  * QDataBaseEntityMessage side-output payloads (TopologyProducer.java:212-227)
  * — a side effect only, never affects validity (quirk Q9).
  */
final case class TurnDecision(
    conv_id: String,
    turn_idx: Int,
    role: String,
    tool: String,
    ts: Timestamp,
    text: String,
    decision: String, // "valid" | "rejected"
    reason: String, // null when valid; see Reasons
    uuid: String, // blacklist uuid (null when unavailable, quirk Q3)
    promoted: Boolean, // true when blacklist-off promoted invalid→valid (Q5)
    webdata: Seq[String])

/** Reject-reason taxonomy (FIXTURES.md §4). The reference has a single
  * boolean; reasons are our lineage refinement. `*_FAIL` reasons that arise
  * from exceptions in the reference (catch-all TopologyProducer.java:275-277)
  * keep the specific label of the stage that threw.
  */
object Reasons {
  val TokenMismatch = "TOKEN_MISMATCH"
  val SourceNotUser = "SOURCE_NOT_USER"
  val SourceMissing = "SOURCE_MISSING" // NPE path, quirk Q2 (TP:198)
  val TargetMissing = "TARGET_MISSING"
  val DefMissing = "DEF_MISSING" // DefUtils.getDEF miss → NPE analogue
  val AttNotAllowed = "ATT_NOT_ALLOWED"
  val AttUnknown = "ATT_UNKNOWN"
  val RegexFail = "REGEX_FAIL"
  val AbnFail = "ABN_FAIL"
  val LuhnFail = "LUHN_FAIL"
  val Malformed = "MALFORMED"
}

// ---------------------------------------------------------------------------
// Dimension catalog (stand-ins for the Infinispan/MySQL catalogs the
// reference queries per record, TopologyProducer.java:110-121, 196-208).
// Loaded once and broadcast — replaces per-record remote lookups (S6).
// ---------------------------------------------------------------------------

/** BaseEntity catalog row (lookups at TP:196, TP:201). */
final case class EntityRow(code: String, name: String)

/** DEF whitelist: getDEF(target) + containsEntityAttribute("ATT_"+code)
  * (TP:204-206) flattened to target_code → allowed attribute entries.
  */
final case class DefAllowedRow(target_code: String, def_code: String, allowed: Seq[String])

final case class ValidationRule(regex: String, errormsg: String)

/** Attribute → DataType → validation list (TP:208-251). */
final case class AttributeDefRow(
    attribute_code: String,
    dtt_code: String,
    validations: Seq[ValidationRule])

/** Plain-Scala catalog maps for the fused (broadcast-variable) pipeline. */
final case class Catalog(
    entities: Map[String, EntityRow],
    defAllowed: Map[String, DefAllowedRow],
    attributes: Map[String, AttributeDefRow])

object Schemas {
  /** Spark schema for `from_json` over the tidied text (single parse —
    * fixes the reference's double parse, TP:167 + TP:178).
    */
  val envelope: StructType = StructType(Seq(
    StructField("msg_type", StringType),
    StructField("data_type", StringType),
    StructField("token", StringType),
    StructField("items", ArrayType(StructType(Seq(
      StructField("sourceCode", StringType),
      StructField("targetCode", StringType),
      StructField("attributeCode", StringType),
      StructField("value", StringType)))))))

  val transcript: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType)))
}
