package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import graft.fixtures.TranscriptGen
import graft.model._
import graft.validate.{Evaluator, ValidationPipeline}

/** Topology-level golden test (the TopologyTestDriver analogue, SURVEY.md
  * §5): pushes the deterministic sf0.001 fixture corpus through the full
  * Spark pipeline and compares every decision against an INDEPENDENT
  * driver-side evaluation (Jackson parse, reference jsonb semantics). This
  * pins `from_json` plumbing — PERMISSIVE null-struct on malformed input,
  * missing-key → null — to the reference's parse behavior.
  */
class PipelineSpec extends SparkSpec {

  private val mapper = new ObjectMapper()

  /** jsonb.fromJson analogue: null envelope for non-object/unparseable. */
  private def parseRef(text: String): Envelope = {
    val node = try mapper.readTree(text) catch { case _: Exception => return null }
    if (node == null || !node.isObject) return null
    def str(f: String): String = {
      val v = node.get(f)
      if (v == null || v.isNull || !v.isTextual) null else v.asText()
    }
    val items =
      if (!node.has("items") || node.get("items") == null || !node.get("items").isArray) null
      else {
        val it = node.get("items").elements()
        val buf = Seq.newBuilder[AnswerItem]
        while (it.hasNext) {
          val o = it.next()
          def s(f: String) = {
            val v = o.get(f); if (v == null || v.isNull) null else v.asText()
          }
          buf += AnswerItem(s("sourceCode"), s("targetCode"), s("attributeCode"), s("value"))
        }
        buf.result()
      }
    Envelope(str("msg_type"), str("data_type"), str("token"), items)
  }

  test("fused pipeline matches independent reference-semantics evaluation on sf0.001") {
    import spark.implicits._
    val cat = TranscriptGen.catalog
    val turns = TranscriptGen.turnsDs(spark, nConvs = 60, turnsPerConv = 10, hotTurns = 30)

    val got = ValidationPipeline.decide(spark, turns.toDF(), cat)
      .collect().map(d => (d.conv_id, d.turn_idx) -> d).toMap

    val expected = turns.collect().filter(_.text != null).map { t =>
      val tidied = t.text.replaceAll("Adamm", "Adam")
      val pt = ParsedTurn(t.conv_id, t.turn_idx, t.role, tidied, t.tool, t.ts, parseRef(tidied))
      Evaluator.evalTurn(pt, cat, enableBlacklist = true)
    }

    assert(got.size == expected.length, "row counts differ")
    var checked = 0
    expected.foreach { e =>
      val g = got((e.conv_id, e.turn_idx))
      assert(g.decision == e.decision, s"decision @ ${e.conv_id}/${e.turn_idx}: got ${g.decision} ${g.reason}, want ${e.decision} ${e.reason}\n${e.text}")
      assert(g.reason == e.reason, s"reason @ ${e.conv_id}/${e.turn_idx}: got ${g.reason}, want ${e.reason}\n${e.text}")
      assert(g.uuid == e.uuid, s"uuid @ ${e.conv_id}/${e.turn_idx}")
      assert(g.webdata == e.webdata, s"webdata @ ${e.conv_id}/${e.turn_idx}")
      assert(g.text == e.text, "forwarded text must be the tidied text (Q6)")
      checked += 1
    }
    assert(checked > 500)
    // corpus actually exercises the interesting paths
    val reasons = got.values.filter(_.decision == "rejected").groupBy(_.reason).keySet
    assert(reasons.contains(Reasons.RegexFail))
    assert(reasons.contains(Reasons.Malformed))
    assert(got.values.exists(_.webdata.nonEmpty))
  }

  test("decideFast (one-pass Jackson) agrees with decide (from_json) on the corpus") {
    import spark.implicits._
    val turns = TranscriptGen.turnsDs(spark, 50, 10, 25).toDF()
    def canon(d: org.apache.spark.sql.Dataset[graft.model.TurnDecision]) =
      d.collect().map(x => (x.conv_id, x.turn_idx) ->
        (x.decision, x.reason, x.uuid, x.text, x.webdata)).toMap
    val a = canon(ValidationPipeline.decide(spark, turns, TranscriptGen.catalog))
    val b = canon(ValidationPipeline.decideFast(spark, turns, TranscriptGen.catalog))
    assert(a.keySet == b.keySet)
    a.foreach { case (k, v) => assert(b(k) == v, s"mismatch @ $k") }
  }

  test("blacklist-off run promotes every rejection (Q5) and routes nothing to blacklist") {
    import spark.implicits._
    val turns = TranscriptGen.turnsDs(spark, 20, 10, 0).toDF()
    val on = ValidationPipeline.decide(spark, turns, TranscriptGen.catalog, enableBlacklist = true)
    val off = ValidationPipeline.decide(spark, turns, TranscriptGen.catalog, enableBlacklist = false)
    assert(off.filter(_.decision == "rejected").count() == 0)
    assert(off.filter(_.promoted).count() == on.filter(_.decision == "rejected").count())
  }

  test("routes split decisions into valid/rejected/webdata frames") {
    import spark.implicits._
    val turns = TranscriptGen.turnsDs(spark, 30, 10, 0).toDF()
    val dec = ValidationPipeline.decide(spark, turns, TranscriptGen.catalog).toDF().cache()
    val (valid, rejected, webdata) = ValidationPipeline.routes(dec)
    assert(valid.count() + rejected.count() == dec.count())
    assert(rejected.select("uuid").filter(col("uuid").isNotNull).count() > 0)
    assert(webdata.count() ==
      dec.select(explode(col("webdata"))).count())
    dec.unpersist()
  }
}
