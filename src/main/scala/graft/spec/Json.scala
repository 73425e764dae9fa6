package graft.spec

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

import scala.jdk.CollectionConverters._

/** Minimal immutable JSON value ADT.
  *
  * Plays the role of the reference's `JSON::Any` (used throughout
  * /root/reference/src/validator.cr) for *spec* documents and for
  * deep-equality `enum`/`const` comparisons. Parsing is backed by Jackson
  * (ships with Spark); the ADT keeps field order for deterministic
  * serialization (reference golden: spec/fixtures/serialize_result.json).
  */
sealed trait JsonVal {
  /** Render as canonical JSON text (no whitespace, ordered fields). */
  def render: String = this match {
    case JNull       => "null"
    case JBool(b)    => if (b) "true" else "false"
    case n: JNum     => n.renderNum
    case JStr(s)     => JsonVal.quote(s)
    case JArr(items) => items.map(_.render).mkString("[", ",", "]")
    case JObj(fields) =>
      fields.map { case (k, v) => JsonVal.quote(k) + ":" + v.render }
        .mkString("{", ",", "}")
  }
}

case object JNull extends JsonVal
final case class JBool(v: Boolean) extends JsonVal
final case class JStr(v: String) extends JsonVal

/** Numbers normalize so that 100.0 == 100 (numeric equality, as in the
  * reference where Crystal `Float64 == Int64` compares numerically). */
final case class JNum(v: BigDecimal) extends JsonVal {
  private def norm: BigDecimal = {
    val s = v.underlying.stripTrailingZeros
    BigDecimal(s)
  }
  override def equals(o: Any): Boolean = o match {
    case JNum(w) => v.compare(w) == 0
    case _       => false
  }
  override def hashCode: Int = norm.hashCode
  def renderNum: String =
    if (v.isWhole && v.scale <= 0) v.toBigInt.toString
    else if (v.isWhole) v.toBigInt.toString
    else v.underlying.stripTrailingZeros.toPlainString
  def isWholeNum: Boolean = v.isWhole
  def toInt: Int = v.toInt
  def toDouble: Double = v.toDouble
}

final case class JArr(items: Vector[JsonVal]) extends JsonVal

/** Object: ordered for serialization, order-insensitive for equality
  * (JSON object equality is by key set, as in the reference's `node == const`). */
final case class JObj(fields: Vector[(String, JsonVal)]) extends JsonVal {
  lazy val toMap: Map[String, JsonVal] = fields.toMap
  def get(k: String): Option[JsonVal] = toMap.get(k)
  def has(k: String): Boolean = toMap.contains(k)
  def keys: Vector[String] = fields.map(_._1)
  override def equals(o: Any): Boolean = o match {
    case other: JObj => toMap == other.toMap
    case _           => false
  }
  override def hashCode: Int = toMap.hashCode
}

object JsonVal {
  private val mapper = new ObjectMapper()

  def parse(text: String): JsonVal = fromJackson(mapper.readTree(text))

  def fromJackson(n: JsonNode): JsonVal = {
    if (n == null || n.isNull) JNull
    else if (n.isBoolean) JBool(n.booleanValue())
    else if (n.isNumber) JNum(BigDecimal(n.decimalValue()))
    else if (n.isTextual) JStr(n.textValue())
    else if (n.isArray) JArr(n.elements().asScala.map(fromJackson).toVector)
    else if (n.isObject)
      // iterator, not Set.asScala.map — a Scala Set would scramble field order
      JObj(n.properties().iterator().asScala.map(e => e.getKey -> fromJackson(e.getValue)).toVector)
    else throw new IllegalArgumentException(s"unsupported JSON node: $n")
  }

  def quote(s: String): String = {
    val sb = new StringBuilder("\"")
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case '\n'          => sb.append("\\n")
      case '\r'          => sb.append("\\r")
      case '\t'          => sb.append("\\t")
      case c if c < ' '  => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"').toString
  }
}
