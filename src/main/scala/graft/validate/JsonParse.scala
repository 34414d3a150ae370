package graft.validate

import com.fasterxml.jackson.core.{JsonFactory, JsonToken}
import graft.model.{AnswerItem, Envelope}

/** Direct Jackson STREAMING envelope parse, semantics matching
  * `from_json(text, Schemas.envelope)` in PERMISSIVE mode (null envelope
  * for unparseable/non-object input, null fields for missing keys, scalar
  * item values stringified). Used by the fast fused pipeline to parse and
  * evaluate in ONE pass: no Catalyst struct materialization, no encoder
  * deserialization, and no JsonNode tree — the token stream goes straight
  * into the evaluator's case classes. Agreement with the from_json path is
  * corpus-tested (PipelineSpec).
  */
object JsonParse {
  private val factory = new JsonFactory()

  /** tidy() (TopologyProducer.java:148-151): "Adamm" has no regex
    * metacharacters, so replaceAll degenerates to a literal replace; the
    * indexOf guard skips the allocation entirely for the common no-match
    * row.
    */
  def tidy(s: String): String =
    if (s == null || s.indexOf("Adamm") < 0) s else s.replace("Adamm", "Adam")

  def parseEnvelope(text: String): Envelope = {
    if (text == null) return null
    try {
      val p = factory.createParser(text)
      try {
        if (p.nextToken() != JsonToken.START_OBJECT) return null
        var msgType: String = null
        var dataType: String = null
        var token: String = null
        var items: Seq[AnswerItem] = null
        while (p.nextToken() != JsonToken.END_OBJECT) {
          val name = p.currentName()
          p.nextToken()
          name match {
            case "msg_type" => msgType = textOrNull(p)
            case "data_type" => dataType = textOrNull(p)
            case "token" => token = textOrNull(p)
            case "items" =>
              if (p.currentToken() == JsonToken.START_ARRAY) {
                val buf = Seq.newBuilder[AnswerItem]
                while (p.nextToken() != JsonToken.END_ARRAY) {
                  if (p.currentToken() == JsonToken.START_OBJECT) {
                    var sc: String = null; var tc: String = null
                    var ac: String = null; var v: String = null
                    while (p.nextToken() != JsonToken.END_OBJECT) {
                      val fn = p.currentName()
                      p.nextToken()
                      val value = scalarText(p)
                      fn match {
                        case "sourceCode" => sc = value
                        case "targetCode" => tc = value
                        case "attributeCode" => ac = value
                        case "value" => v = value
                        case _ => ()
                      }
                    }
                    buf += AnswerItem(sc, tc, ac, v)
                  } else p.skipChildren()
                }
                items = buf.result()
              } else { p.skipChildren(); items = null }
            case _ => p.skipChildren()
          }
        }
        Envelope(msgType, dataType, token, items)
      } finally p.close()
    } catch { case _: Exception => null }
  }

  /** Envelope fields: textual only (matches from_json string-field null
    * on JSON null; fixtures carry no non-string envelope values).
    */
  private def textOrNull(p: com.fasterxml.jackson.core.JsonParser): String =
    p.currentToken() match {
      case JsonToken.VALUE_STRING => p.getText
      case JsonToken.START_OBJECT | JsonToken.START_ARRAY => p.skipChildren(); null
      case JsonToken.VALUE_NULL => null
      case _ => p.getText
    }

  /** Item fields: scalars stringified (asText analogue), containers null. */
  private def scalarText(p: com.fasterxml.jackson.core.JsonParser): String =
    p.currentToken() match {
      case JsonToken.VALUE_NULL => null
      case JsonToken.START_OBJECT | JsonToken.START_ARRAY => p.skipChildren(); null
      case _ => p.getText
    }
}
