package graft.fixtures

import java.sql.Timestamp
import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model._
import graft.validate.TokenCodec

/** Deterministic synthetic transcript + dimension-catalog generator.
  *
  * Shape follows BASELINE.json `input_hint` / FIXTURES.md §1: a transcripts
  * table `(conv_id, turn_idx, role, text, tool, ts)` whose `text` carries the
  * reference's `QDataAnswerMessage` JSON envelope for user turns
  * (TopologyProducer.java:167-185) and pass-through chat/tool payloads
  * otherwise, plus the three dimension tables standing in for the
  * Infinispan/MySQL catalogs (TP:110-121, 196-208).
  *
  * Generation is fully deterministic AND distributed: every turn is a pure
  * function of its global row index (splitmix64 bit-mixing — no RNG state,
  * no Date.now), so `spark.range(n).map(makeTurn)` yields identical data at
  * any parallelism, any partitioning, any run. That is what makes the
  * DuckDB oracle, the golden tests, and the scaling benchmark comparable.
  */
object TranscriptGen {

  // ---------------------------------------------------------------- catalog

  val NumUsers = 50
  val NumTargets = 50

  private val commonAllowed = Seq(
    "ATT_PRI_EMAIL", "ATT_PRI_PHONE", "ATT_PRI_NAME", "ATT_PRI_FIRSTNAME",
    "ATT_PRI_ABN", "ATT_PRI_CREDITCARD", "ATT_GHOST", "ATT_PRI_EMPTYLIST")

  def entities: Seq[EntityRow] =
    (0 until NumUsers).map(i => EntityRow(s"PER_USER$i", s"User $i")) ++
      (0 until NumTargets).map(i => EntityRow(s"PER_TARGET$i", s"Target $i")) ++
      Seq(EntityRow("BKT_APPLICATIONS", "Applications Bucket"),
        EntityRow("PER_NODEF", "Entity Without DEF"))

  def defAllowed: Seq[DefAllowedRow] =
    (0 until NumUsers).map(i => DefAllowedRow(s"PER_USER$i", "DEF_PERSON", commonAllowed)) ++
      (0 until NumTargets).map(i => DefAllowedRow(s"PER_TARGET$i", "DEF_PERSON", commonAllowed)) ++
      Seq(DefAllowedRow("BKT_APPLICATIONS", "DEF_BUCKET", Seq("ATT_LNK_PERSON")))
  // PER_NODEF deliberately has no DEF row → DEF_MISSING abort path.

  def attributeDefs: Seq[AttributeDefRow] = Seq(
    AttributeDefRow("PRI_EMAIL", "DTT_EMAIL",
      Seq(ValidationRule("^[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}$", "bad email"))),
    AttributeDefRow("PRI_PHONE", "DTT_PHONE",
      Seq(ValidationRule("^[0-9]{8,12}$", "bad phone"))),
    AttributeDefRow("PRI_NAME", "DTT_NAME", Seq(
      ValidationRule("^[A-Z][a-z]+$", "bad name"),
      ValidationRule("^[A-Za-z ]{2,50}$", "bad name len"))),
    AttributeDefRow("PRI_FIRSTNAME", "DTT_NAME",
      Seq(ValidationRule("^Adam$", "only adam"))), // tidy (Q6) observable
    AttributeDefRow("PRI_ABN", "DTT_ABN", Nil),
    AttributeDefRow("PRI_CREDITCARD", "DTT_CC", Nil),
    AttributeDefRow("LNK_PERSON", "DTT_LINK",
      Seq(ValidationRule("^\\[.*\\]$", "bad link"))),
    AttributeDefRow("PRI_EMPTYLIST", "DTT_EMPTY", Nil) // regex loop → never valid
    // ATT_GHOST is in the DEF whitelist but has no attribute_defs row → ATT_UNKNOWN
  )

  def catalog: Catalog = Catalog(
    entities.map(e => e.code -> e).toMap,
    defAllowed.map(d => d.target_code -> d).toMap,
    attributeDefs.map(a => a.attribute_code -> a).toMap)

  def userUuid(u: Int): String = f"UUID-$u%04d"
  def userEmail(u: Int): String = s"user$u@example.com"
  def userCode(u: Int): String = s"PER_USER$u"
  def userToken(u: Int): String = TokenCodec.encode(userUuid(u), userEmail(u), userCode(u))

  // ------------------------------------------------------------- generation

  /** splitmix64 finalizer — stateless deterministic hash of the row index. */
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  private lazy val mapper = new ObjectMapper()

  private def answerJson(token: String, items: Seq[AnswerItem],
      includeItems: Boolean = true, msgType: String = "DATA_MSG",
      dataType: String = "Answer"): String = {
    val root = mapper.createObjectNode()
    root.put("msg_type", msgType)
    root.put("data_type", dataType)
    root.put("token", token)
    if (includeItems) {
      val arr = root.putArray("items")
      items.foreach { it =>
        val o = arr.addObject()
        o.put("sourceCode", it.sourceCode)
        o.put("targetCode", it.targetCode)
        o.put("attributeCode", it.attributeCode)
        o.put("value", it.value)
      }
    }
    mapper.writeValueAsString(root)
  }

  private def chatJson(role: String, i: Long): String = {
    val root = mapper.createObjectNode()
    root.put("msg_type", "CHAT_MSG")
    root.put("data_type", if (role == "tool") "ToolResult" else "Chat")
    root.put("text", s"turn $i content with words to analyse number ${i % 97}")
    mapper.writeValueAsString(root)
  }

  /** Scenario table: (name, weight). Mix is accept-heavy like a production
    * stream; every reject reason and quirk Q1-Q9 appears (SURVEY.md §5.2).
    */
  val scenarios: Seq[(String, Int)] = Seq(
    "valid_email" -> 40, "valid_phone" -> 10, "valid_name" -> 8,
    "tidy_name" -> 3, "regex_fail" -> 8, "wrong_source" -> 4,
    "source_missing" -> 2, "target_missing" -> 3, "att_not_allowed" -> 3,
    "att_unknown" -> 2, "abn_valid" -> 3, "abn_invalid" -> 2,
    "abn_nonnumeric" -> 1, "abn_wronglen" -> 1, "abn_null" -> 1,
    "luhn_valid" -> 3,
    "luhn_invalid" -> 2, "luhn_empty" -> 1, "luhn_alpha" -> 1,
    "luhn_null" -> 1,
    "webdata" -> 2, "empty_items" -> 1, "missing_items" -> 1,
    "multi_lastwins" -> 2, "multi_abort" -> 1, "multi_fail_last" -> 2,
    "webdata_then_fail" -> 1, "def_missing" -> 1, "token_garbage" -> 1,
    "emptylist_att" -> 1)

  private val totalWeight = scenarios.map(_._2).sum
  private val cumulative: Array[(String, Int)] = {
    var acc = 0
    scenarios.map { case (n, w) => acc += w; (n, acc) }.toArray
  }

  def pickScenario(h: Long): String = {
    val r = java.lang.Long.remainderUnsigned(h, totalWeight.toLong).toInt
    cumulative.find(_._2 > r).get._1
  }

  /** Build the user-turn payload for a scenario. Pure function of
    * (scenario, user u, hash h).
    */
  def userText(scenario: String, u: Int, h: Long): String = {
    val tok = userToken(u)
    val uc = userCode(u)
    val tgt = s"PER_TARGET${java.lang.Long.remainderUnsigned(h >>> 8, NumTargets.toLong).toInt}"
    def one(att: String, value: String, target: String = tgt) =
      answerJson(tok, Seq(AnswerItem(uc, target, att, value)))
    scenario match {
      case "valid_email" => one("PRI_EMAIL", s"user$u@example.com")
      case "valid_phone" => one("PRI_PHONE", "0412345678")
      case "valid_name" => one("PRI_NAME", "Alice")
      // "Adamm" only passes because tidy() rewrites it pre-parse (Q6, TP:148-151)
      case "tidy_name" => one("PRI_FIRSTNAME", "Adamm")
      case "regex_fail" => one("PRI_EMAIL", "not-an-email")
      case "wrong_source" =>
        answerJson(tok, Seq(AnswerItem(s"PER_USER${(u + 1) % NumUsers}", tgt, "PRI_EMAIL", "x@y.co")))
      case "source_missing" => // token userCode matches sourceCode, entity absent → Q2 abort
        val ghost = s"PER_GHOST$u"
        answerJson(TokenCodec.encode(userUuid(u), userEmail(u), ghost),
          Seq(AnswerItem(ghost, tgt, "PRI_EMAIL", "x@y.co")))
      case "target_missing" => one("PRI_EMAIL", "x@y.co", target = "PER_NOSUCH")
      case "att_not_allowed" => one("PRI_FORBIDDEN", "zzz")
      case "att_unknown" => one("GHOST", "zzz") // ATT_GHOST allowed, def absent
      case "abn_valid" => one("PRI_ABN", "51824753556")
      case "abn_invalid" => one("PRI_ABN", "51824753557")
      case "abn_nonnumeric" => one("PRI_ABN", "ABN1234567")
      case "abn_wronglen" => one("PRI_ABN", "123456")
      case "abn_null" => one("PRI_ABN", null) // reference NPEs → abort
      case "luhn_null" => one("PRI_CREDITCARD", null) // reference NPEs → abort
      case "luhn_valid" => one("PRI_CREDITCARD", "4242424242424242")
      case "luhn_invalid" => one("PRI_CREDITCARD", "4242424242424243")
      case "luhn_empty" => one("PRI_CREDITCARD", "") // Q7: valid
      case "luhn_alpha" => one("PRI_CREDITCARD", "4242ABCD")
      case "webdata" => one("LNK_PERSON", "[]", target = "BKT_APPLICATIONS")
      case "empty_items" => answerJson(tok, Nil) // loop never runs → valid
      case "missing_items" => answerJson(tok, Nil, includeItems = false)
      case "multi_lastwins" => // Q4: later pass overwrites earlier fail
        answerJson(tok, Seq(
          AnswerItem(uc, tgt, "PRI_EMAIL", "broken"),
          AnswerItem(uc, tgt, "PRI_EMAIL", s"user$u@example.com")))
      case "multi_abort" => // abort mid-loop; 3rd (webdata) must NOT emit
        answerJson(tok, Seq(
          AnswerItem(uc, tgt, "PRI_EMAIL", s"user$u@example.com"),
          AnswerItem(uc, tgt, "PRI_ABN", "ABN1234567"),
          AnswerItem(uc, "BKT_APPLICATIONS", "LNK_PERSON", "[]")))
      case "multi_fail_last" =>
        answerJson(tok, Seq(
          AnswerItem(uc, tgt, "PRI_EMAIL", s"user$u@example.com"),
          AnswerItem(uc, tgt, "PRI_EMAIL", "broken")))
      case "webdata_then_fail" => // Q9: webdata emitted though message rejects
        answerJson(tok, Seq(
          AnswerItem(uc, "BKT_APPLICATIONS", "LNK_PERSON", "[]"),
          AnswerItem(uc, tgt, "PRI_EMAIL", "broken")))
      case "def_missing" => one("PRI_EMAIL", "x@y.co", target = "PER_NODEF")
      case "token_garbage" =>
        answerJson("not-a-jwt", Seq(AnswerItem(uc, tgt, "PRI_EMAIL", "x@y.co")))
      case "emptylist_att" => one("PRI_EMPTYLIST", "anything")
      case other => sys.error(s"unknown scenario $other")
    }
  }

  val BaseEpoch: Long = 1767225600L // 2026-01-01T00:00:00Z

  /** Pure global-index → Turn. Layout: `turnsPerConv` consecutive indices
    * form one conversation. Roles cycle user/agent/tool. ~4% of turns are
    * late (ts pulled back one hour) to exercise watermarks; a trailing
    * `hotTurns` block all lands in conv 0 (skew fixture).
    */
  def makeTurn(i: Long, nConvs: Long, turnsPerConv: Int, hotTurns: Long): Turn = {
    val gridTurns = nConvs * turnsPerConv
    val (conv, turnIdx) =
      if (i < gridTurns) (i / turnsPerConv, (i % turnsPerConv).toInt)
      else (0L, (turnsPerConv + (i - gridTurns)).toInt) // hot conversation tail
    val h = mix(i)
    val convId = f"CONV_$conv%08d"
    val u = (conv % NumUsers).toInt
    val role = turnIdx % 3 match {
      case 0 => "user"
      case 1 => "agent"
      case _ => "tool"
    }
    val tool = if (role == "tool") (if ((h & 1) == 0) "search" else "calculator") else null
    val text = role match {
      case "user" =>
        if (java.lang.Long.remainderUnsigned(h >>> 16, 29L) == 0L) s"garbage payload $i {{{"
        else userText(pickScenario(h), u, h)
      case _ =>
        if (java.lang.Long.remainderUnsigned(h >>> 16, 53L) == 0L) null // T2 null filter
        else chatJson(role, i)
    }
    val late = java.lang.Long.remainderUnsigned(h >>> 24, 23L) == 0L
    val sec = BaseEpoch + conv * 300L + turnIdx * 7L - (if (late) 3600L else 0L)
    Turn(convId, turnIdx, role, text, tool, new Timestamp(sec * 1000L))
  }

  // ------------------------------------------------------------ materialize

  final case class Paths(dir: String) {
    def transcripts = s"$dir/transcripts.parquet"
    def entities = s"$dir/entities.parquet"
    def defAllowed = s"$dir/def_allowed.parquet"
    def attributeDefs = s"$dir/attribute_defs.parquet"
  }

  def turnsDs(spark: SparkSession, nConvs: Long, turnsPerConv: Int,
      hotTurns: Long): Dataset[Turn] = {
    import spark.implicits._
    val total = nConvs * turnsPerConv + hotTurns
    spark.range(total).map(i => makeTurn(i, nConvs, turnsPerConv, hotTurns))
  }

  /** Scale per sf-dir basename: sf0.001→60 convs, sf0.01→600, sf0.1→6000
    * (10 turns each, +5% hot-conversation tail).
    */
  def scaleOf(sfDir: String): Long = {
    val base = new java.io.File(sfDir).getName.stripPrefix("sf")
    val sf = try base.toDouble catch { case _: Exception => 0.01 }
    math.max(6L, (600000 * sf).toLong / 10)
  }

  /** Deterministic fixture location for a given sf dir (we may not write
    * under /root/testdata, so generated transcripts live in-repo).
    */
  def fixtureDir(sfDir: String): String =
    s"/root/repo/data/tx_${new java.io.File(sfDir).getName}"

  /** Generate-if-missing; idempotent because content is deterministic. */
  def ensure(spark: SparkSession, sfDir: String): Paths = {
    val p = Paths(fixtureDir(sfDir))
    val marker = new java.io.File(p.dir, "_GRAFT_READY")
    if (!marker.exists()) {
      import spark.implicits._
      val nConvs = scaleOf(sfDir)
      val turnsPer = 10
      val hot = (nConvs * turnsPer) / 20
      turnsDs(spark, nConvs, turnsPer, hot)
        .repartition(math.max(4, spark.sparkContext.defaultParallelism))
        .write.mode("overwrite").parquet(p.transcripts)
      entities.toDF().coalesce(1).write.mode("overwrite").parquet(p.entities)
      defAllowed.toDF().coalesce(1).write.mode("overwrite").parquet(p.defAllowed)
      attributeDefs.toDF().coalesce(1).write.mode("overwrite").parquet(p.attributeDefs)
      marker.createNewFile()
    }
    p
  }

  def readTranscripts(spark: SparkSession, p: Paths): DataFrame =
    spark.read.parquet(p.transcripts)
  def readCatalogFrames(spark: SparkSession, p: Paths): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(p.entities), spark.read.parquet(p.defAllowed),
      spark.read.parquet(p.attributeDefs))
}
