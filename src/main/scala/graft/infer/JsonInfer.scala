package graft.infer

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import graft.types._

import java.util.regex.Pattern
import scala.collection.immutable.TreeMap

/** JSON value → discovered [[graft.types.HType]].
  *
  * Streaming (Jackson `JsonParser`, no DOM) port of the reference's
  * `JsonSchemaFinder.pickType` (reference
  * `src/main/java/org/apache/hadoop/hive/json/JsonSchemaFinder.java:56-134`).
  * Numeric/string classification is *lexical* — it runs on the raw token
  * text, exactly like the reference's `prim.getAsString()` on Gson's
  * `LazilyParsedNumber` — so `1.2e9` is float while `1200000000` is int,
  * and a 40-digit integer is double (JsonSchemaFinder.java:87-95).
  *
  * A single input string may contain several concatenated JSON documents
  * (the reference's `JsonStreamParser` semantics,
  * JsonSchemaFinder.java:239-245); [[inferDoc]] folds them all.
  */
object JsonInfer {

  // The three classifier regexes, ported verbatim
  // (JsonSchemaFinder.java:42-49).
  private val HexPattern = Pattern.compile("^([0-9a-fA-F][0-9a-fA-F])+$")
  private val TimestampPattern = Pattern.compile(
    "^[\"]?([0-9]{4}[-/][0-9]{2}[-/][0-9]{2})[T ]" +
      "([0-9]{2}:[0-9]{2}:[0-9]{2})" +
      "(([ ][-+]?[0-9]{2}([:][0-9]{2})?)|Z)?[\"]?$")
  private val DecimalPattern =
    Pattern.compile("^-?(?<int>[0-9]+)([.](?<fraction>[0-9]+))?$")

  private val MaxDecimalDigits = 38 // JsonSchemaFinder.java:51
  private val MinLong = BigInt("-9223372036854775808")
  private val MaxLong = BigInt("9223372036854775807")

  private val factory = new JsonFactory()

  /** Classify a raw numeric literal (JsonSchemaFinder.java:62-95,
    * including the `Float.MIN_VALUE` quirk at :92 — MIN_VALUE is the
    * smallest *positive* float, so negative sci-notation numbers
    * classify as double; pinned by reference tests). */
  def classifyNumber(text: String): HType = {
    val m = DecimalPattern.matcher(text)
    if (m.matches()) {
      val intDigits = m.group("int").length
      val fraction = m.group("fraction")
      val scale = if (fraction == null) 0 else fraction.length
      if (scale == 0) {
        if (intDigits < 19) {
          val value = text.toLong
          return if (value >= -128 && value < 128) HNum(NumKind.Byte, intDigits, scale)
          else if (value >= -32768 && value < 32768) HNum(NumKind.Short, intDigits, scale)
          else if (value >= -2147483648L && value < 2147483648L) HNum(NumKind.Int, intDigits, scale)
          else HNum(NumKind.Long, intDigits, scale)
        } else if (intDigits == 19) {
          // at 19 digits it may still fit in a long (JsonSchemaFinder.java:79-85)
          val v = BigInt(text)
          if (v >= MinLong && v <= MaxLong) return HNum(NumKind.Long, intDigits, scale)
        }
      }
      if (intDigits + scale <= MaxDecimalDigits)
        return HNum(NumKind.Decimal, intDigits, scale)
    }
    val value = text.toDouble
    if (value >= java.lang.Float.MIN_VALUE && value <= java.lang.Float.MAX_VALUE)
      HNum(NumKind.Float, 0, 0)
    else HNum(NumKind.Double, 0, 0)
  }

  /** Classify a JSON string value (JsonSchemaFinder.java:97-104). */
  def classifyString(str: String): HType =
    if (TimestampPattern.matcher(str).matches()) HStr(StrKind.Timestamp)
    else if (HexPattern.matcher(str).matches()) HStr(StrKind.Binary)
    else HStr(StrKind.Str)

  /** Type of the value whose first token is the parser's current token.
    * On return the parser sits on the value's last token. */
  private def typeOf(p: JsonParser): HType = p.currentToken() match {
    case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => HBool
    case JsonToken.VALUE_NULL => HNull
    case JsonToken.VALUE_NUMBER_INT | JsonToken.VALUE_NUMBER_FLOAT =>
      classifyNumber(p.getText)
    case JsonToken.VALUE_STRING => classifyString(p.getText)
    case JsonToken.START_ARRAY =>
      // element fold with union fallback (JsonSchemaFinder.java:109-123)
      var elem: HType = HNull
      while (p.nextToken() != JsonToken.END_ARRAY) {
        elem = HType.merge(elem, typeOf(p))
      }
      HList(elem)
    case JsonToken.START_OBJECT =>
      // JSON object → struct; sorted fields, duplicate keys last-wins
      // (Gson JsonObject semantics, JsonSchemaFinder.java:124-132)
      var fields = TreeMap.empty[String, HType]
      while (p.nextToken() != JsonToken.END_OBJECT) {
        val name = p.currentName()
        p.nextToken()
        fields = fields.updated(name, typeOf(p))
      }
      HStruct(fields)
    case tok =>
      throw new IllegalArgumentException(s"Unexpected JSON token $tok")
  }

  /** Infer the type of every JSON document concatenated in `text` and
    * merge them. Returns [[HNull]] for empty/blank input.
    *
    * Malformed input does not fail the job: the types of any documents
    * already parsed from the string are kept and the unparseable
    * remainder is ignored. (Divergence from the reference, whose
    * lenient Gson parser either tolerates or crashes the whole run
    * depending on the malformation; at scale a single corrupt record
    * must not kill a 100 TB pass.) */
  def inferDoc(text: String): HType = inferDocCount(text)._1

  /** As [[inferDoc]], also returning the number of top-level documents
    * parsed — the reference's record count is per *document*, not per
    * line (its `parser.hasNext()` loop, JsonSchemaFinder.java:240-245),
    * which matters when one input unit carries many concatenated docs. */
  def inferDocCount(text: String): (HType, Long) = {
    if (text == null) return (HNull, 0L)
    val p = factory.createParser(text)
    try {
      var result: HType = null
      var n = 0L
      try {
        while (p.nextToken() != null) {
          result = HType.merge(result, typeOf(p))
          n += 1
        }
      } catch {
        case _: com.fasterxml.jackson.core.JacksonException => // keep partials
      }
      (if (result == null) HNull else result, n)
    } finally p.close()
  }

  /** Convenience: infer over a local collection (mirrors the reference
    * main loop, JsonSchemaFinder.java:239-245). */
  def inferAll(docs: IterableOnce[String]): HType =
    docs.iterator.foldLeft(HNull: HType)((acc, d) => HType.merge(acc, inferDoc(d)))

  /** [[typeOf]] over an already-parsed Jackson DOM node — the shape
    * [[Materialize]] needs for union-branch selection, where
    * re-serializing the node and re-parsing it through [[inferDoc]]
    * would double-walk every union value. Numeric nodes classify on
    * Jackson's canonical literal rendering, the same text
    * `inferDoc(node.toString)` would see — with one deliberate
    * divergence: a double that overflowed to ±Infinity at parse time
    * re-renders as the QUOTED string "Infinity", which the old
    * round-trip classified as a plain string; here it classifies as
    * the double the raw literal implies (pinned by MaterializeSpec). */
  def inferNode(node: com.fasterxml.jackson.databind.JsonNode): HType = {
    import scala.jdk.CollectionConverters._
    if (node == null || node.isMissingNode || node.isNull) HNull
    else if (node.isBoolean) HBool
    else if (node.isNumber) classifyNumber(node.asText())
    else if (node.isTextual) classifyString(node.textValue())
    else if (node.isArray)
      HList(node.elements().asScala.foldLeft(HNull: HType)(
        (acc, e) => HType.merge(acc, inferNode(e))))
    else // object: sorted fields, same as the streaming TreeMap fold
      HStruct(TreeMap.from(node.properties().asScala.map(
        e => e.getKey -> inferNode(e.getValue))))
  }
}
