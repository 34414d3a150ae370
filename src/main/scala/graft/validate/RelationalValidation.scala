package graft.validate

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model._

/** The validation predicate decomposed into RELATIONAL operators
  * (SURVEY.md §2.3): posexplode of the items array, three broadcast hash
  * joins against the dimension catalog (replacing the reference's
  * per-record remote lookups, TopologyProducer.java:196-208), per-answer
  * outcome as Catalyst `when` chains, and an order-aware fold back to
  * message granularity via `aggregate` over the position-sorted outcome
  * array — preserving abort/last-answer-wins semantics (quirks Q2/Q4).
  *
  * This variant costs ONE shuffle (the groupBy back to message grain,
  * keyed by (conv_id, turn_idx) — note a hot conv_id does NOT skew it,
  * because turn_idx participates in the key). The fused variant
  * ([[ValidationPipeline]]) costs zero; both must agree row-for-row, and a
  * ScalaTest asserts they do. Kept because every stage before the typed
  * fold is a Column expression — whole-stage codegen, catalyst pruning,
  * and a DuckDB-expressible oracle.
  */
/** Per-answer step encoded as a struct column: kind 'C'ontinue/'A'bort.
  * Top-level (not nested) so the Catalyst encoder codegen can instantiate
  * it — nested case classes force an interpreted fallback.
  */
final case class StepCol(kind: String, valid: Boolean, reason: String)

object RelationalValidation {

  /** Regex ANY-full-match with the per-executor compiled-pattern cache. */
  private val regexStep = udf { (v: String, regexes: Seq[String]) =>
    Validators.regexAnyOutcome(v, if (regexes == null) Nil else regexes) match {
      case Left(r) => StepCol("A", valid = false, r)
      case Right(b) => StepCol("C", b, if (b) null else Reasons.RegexFail)
    }
  }
  private val decodeToken = udf { (t: String) => TokenCodec.decode(t).orNull }

  private def stepStruct(kind: String, reason: String): Column =
    struct(lit(kind).as("kind"), lit(false).as("valid"),
      (if (reason == null) lit(null).cast("string") else lit(reason)).as("reason"))

  private val stepPass: Column =
    struct(lit("C").as("kind"), lit(true).as("valid"),
      lit(null).cast("string").as("reason"))

  /** Map a native checksum-expression code (ChecksumKernels) to a step:
    * the checksum runs inside whole-stage codegen, only the tiny CASE
    * stays as a struct expression.
    */
  private def stepFromCode(code: Column, failReason: String): Column =
    when(code === graft.functions.ChecksumKernels.Abort, stepStruct("A", failReason))
      .when(code === graft.functions.ChecksumKernels.Valid, stepPass)
      .otherwise(stepStruct("C", failReason))

  /** Full relational decision frame: (conv_id, turn_idx, role, tool, ts,
    * text, decision, reason, uuid, promoted, webdata).
    */
  /** @param broadcastDims explicit broadcast hints on the dimension joins
    *   (the right plan while the catalog fits executor memory — pinned in
    *   RelationalSpec). Pass `false` when a dimension has outgrown the
    *   broadcast threshold: a hint would force the broadcast anyway
    *   (driver OOM at a 100x catalog), so the large-catalog path must let
    *   Catalyst fall back to a shuffle join — decisions are identical
    *   either way (agreement-tested).
    */
  def decide(spark: SparkSession, transcripts: DataFrame, entities: DataFrame,
      defAllowed: DataFrame, attributeDefs: DataFrame,
      enableBlacklist: Boolean = true, broadcastDims: Boolean = true): DataFrame = {

    val parsed = ValidationPipeline.parsed(transcripts)
      .withColumn("claims", decodeToken(col("msg.token")))

    val keys = Seq("conv_id", "turn_idx", "role", "tool", "ts", "text")

    // ---- message-level gates (TP:167-178) -------------------------------
    val isAnswer = col("msg").isNotNull &&
      col("msg.msg_type").isNotNull && col("msg.data_type").isNotNull &&
      col("msg.msg_type") === "DATA_MSG" && col("msg.data_type") === "Answer"

    // Non-validated rows: malformed JSON / missing keys / bad token /
    // missing items → MALFORMED; non-Answer messages pass through (Q1).
    val special = parsed
      .filter(!isAnswer || col("claims").isNull || col("msg.items").isNull)
      .select(keys.map(col) ++ Seq(
        when(col("msg").isNull || col("msg.msg_type").isNull || col("msg.data_type").isNull,
          lit(Reasons.Malformed))
          .when(!isAnswer, lit(null).cast("string")) // Q1 pass-through
          .otherwise(lit(Reasons.Malformed)) // bad token / null items
          .as("reason"),
        when(isAnswer, col("claims.uuid")).otherwise(lit(null).cast("string")).as("uuid"),
        array().cast("array<string>").as("webdata")): _*)
      .withColumn("decision",
        when(col("reason").isNull, "valid").otherwise("rejected"))

    // ---- per-answer relational pipeline (V1-V10) ------------------------
    val answers = parsed
      .filter(isAnswer && col("claims").isNotNull && col("msg.items").isNotNull)
      .select(col("conv_id"), col("turn_idx"), col("role"), col("tool"),
        col("ts"), col("text"), col("claims"),
        posexplode_outer(col("msg.items")).as(Seq("pos", "ans")))

    val hint: DataFrame => DataFrame = if (broadcastDims) broadcast else identity
    val se = hint(entities.select(col("code").as("se_code")))
    val te = hint(entities.select(col("code").as("te_code"), col("name").as("te_name")))
    val de = hint(defAllowed.select(col("target_code").as("de_code"), col("allowed")))
    val at = hint(attributeDefs.select(col("attribute_code").as("at_code"),
      col("validations")))

    val joined = answers
      .join(se, col("ans.sourceCode") === col("se_code"), "left") // V3
      .join(te, col("ans.targetCode") === col("te_code"), "left") // V4
      .join(de, col("ans.targetCode") === col("de_code"), "left") // V5
      .join(at, col("ans.attributeCode") === col("at_code"), "left") // V6

    // Reached-attribute predicate (webdata + checksum/regex only run there)
    val attEntry = concat(lit("ATT_"), coalesce(col("ans.attributeCode"), lit("null")))
    val step =
      when(col("ans").isNull, lit(null)) // empty items array: no step
        .when(col("ans.sourceCode").isNull || col("claims.userCode") =!= col("ans.sourceCode"),
          stepStruct("C", Reasons.SourceNotUser)) // V2, TP:190
        .when(col("se_code").isNull, stepStruct("A", Reasons.SourceMissing)) // Q2, TP:198
        .when(col("te_code").isNull, stepStruct("C", Reasons.TargetMissing)) // TP:201
        .when(col("de_code").isNull, stepStruct("A", Reasons.DefMissing)) // TP:204
        .when(!array_contains(col("allowed"), attEntry),
          stepStruct("C", Reasons.AttNotAllowed)) // TP:206
        .when(col("at_code").isNull, stepStruct("C", Reasons.AttUnknown)) // TP:208
        // null checksum value: the reference NPEs (abort) — the null-safe
        // native expressions would yield a null code and fall to Continue,
        // silently diverging from the fused/oracle abort semantics.
        .when(col("ans.attributeCode") === "PRI_ABN" && col("ans.value").isNull,
          stepStruct("A", Reasons.AbnFail))
        .when(col("ans.attributeCode") === "PRI_ABN",
          stepFromCode(graft.functions.ChecksumExpr.abn_check(col("ans.value")),
            Reasons.AbnFail)) // V8, native codegen expression
        .when(col("ans.attributeCode") === "PRI_CREDITCARD" && col("ans.value").isNull,
          stepStruct("A", Reasons.LuhnFail))
        .when(col("ans.attributeCode") === "PRI_CREDITCARD",
          stepFromCode(graft.functions.ChecksumExpr.luhn_check(col("ans.value")),
            Reasons.LuhnFail)) // V9
        .otherwise(regexStep(col("ans.value"),
          transform(col("validations"), v => v.getField("regex")))) // V10

    // Webdata (V7, TP:212-227): only at the reached-attribute point.
    val reachedAttr = col("ans").isNotNull &&
      col("ans.sourceCode").isNotNull && col("claims.userCode") === col("ans.sourceCode") &&
      col("se_code").isNotNull && col("te_code").isNotNull && col("de_code").isNotNull &&
      array_contains(col("allowed"), attEntry) && col("at_code").isNotNull
    val webPayload =
      when(reachedAttr && col("ans.attributeCode") === "LNK_PERSON" &&
          col("ans.targetCode") === "BKT_APPLICATIONS" && col("ans.value") === "[]",
        concat(lit("""{"data_type":"BaseEntity","items":[{"code":""""),
          col("ans.targetCode"), lit("""","name":""""), col("te_name"),
          lit("""","LNK_PERSON":"[]"}],"total":1,"returnCount":1,"token":""""),
          col("claims.token"), lit("\"}")))

    val stepped = joined.select(
      (keys :+ "claims").map(col) ++ Seq(col("pos"), step.as("step"),
        webPayload.as("web")): _*)

    // ---- fold back to message grain (V12: last-answer-wins + abort) -----
    val folded = stepped
      .groupBy(keys.map(col): _*)
      .agg(
        first(col("claims"), ignoreNulls = true).as("claims"),
        sort_array(collect_list(struct(col("pos"), col("step"), col("web")))).as("steps"))
      .withColumn("abort_pos",
        array_min(filter(col("steps"), s => s.getField("step").getField("kind") === "A")
          .getField("pos")))
      .withColumn("fold",
        aggregate(
          // answers after an abort are never evaluated (Q2); the null-step
          // placeholder row of an EMPTY items array (posexplode_outer) is
          // dropped so the fold init (valid=true) survives — loop never ran.
          filter(col("steps"), s => s.getField("step").isNotNull &&
            (col("abort_pos").isNull || s.getField("pos") <= col("abort_pos"))),
          struct(lit(true).as("valid"), lit(null).cast("string").as("reason")),
          (acc, s) => struct(
            s.getField("step").getField("valid").as("valid"),
            s.getField("step").getField("reason").as("reason"))))
      .withColumn("webdata",
        filter(
          transform(
            filter(col("steps"), s => s.getField("web").isNotNull &&
              (col("abort_pos").isNull || s.getField("pos") <= col("abort_pos"))),
            s => s.getField("web")),
          w => w.isNotNull))
      .select(keys.map(col) ++ Seq(
        when(col("fold.valid"), "valid").otherwise("rejected").as("decision"),
        when(col("fold.valid"), lit(null).cast("string"))
          .otherwise(col("fold.reason")).as("reason"),
        when(col("fold.valid"), lit(null).cast("string"))
          .otherwise(col("claims.uuid")).as("uuid"),
        col("webdata")): _*)
      .withColumnRenamed("decision", "decision")

    val specialNorm = special
      .select(keys.map(col) ++ Seq(col("decision"),
        when(col("decision") === "rejected", col("reason"))
          .otherwise(lit(null).cast("string")).as("reason"),
        col("uuid"), col("webdata")): _*)

    val unioned = specialNorm.unionByName(
      folded.select(specialNorm.columns.map(col): _*))

    // V13 / Q5: blacklist off promotes rejections to valid.
    val promoted =
      if (enableBlacklist) unioned.withColumn("promoted", lit(false))
      else unioned
        .withColumn("promoted", col("decision") === "rejected")
        .withColumn("decision", lit("valid"))

    promoted.select("conv_id", "turn_idx", "role", "tool", "ts", "text",
      "decision", "reason", "uuid", "promoted", "webdata")
  }
}
