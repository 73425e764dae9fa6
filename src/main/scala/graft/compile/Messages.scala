package graft.compile

/** Violation-message catalog, routed through the swappable `I18n` table
  * (analog of /root/reference/src/i18n.cr). Texts mirror the reference's
  * EN_US byte-for-byte (including its "value be greater" grammar quirks) so
  * golden violation rows are comparable against the reference spec suite.
  * Interpolation happens on the driver at compile time — every argument is a
  * spec constant — so the `message` column is always a literal Column. */
object Messages {
  // GenericValidator
  def enumMismatch: String = I18n.get(10)
  def constMismatch(rendered: String): String = s"${I18n.get(11)} $rendered"

  // ObjectValidator
  def notObject: String = I18n.get(20)
  def required(prop: String): String = I18n.get(21, prop)
  def dependentRequired(requiredProp: String, dependentProp: String): String =
    I18n.get(22, requiredProp, dependentProp)
  def minProperties(n: Int): String = I18n.get(23, n.toString)
  def maxProperties(n: Int): String = I18n.get(24, n.toString)
  def additionalProperties: String = I18n.get(25)

  // ArrayValidator
  def notArray: String = I18n.get(30)
  def tupleLength(n: Int): String = I18n.get(31, n.toString)
  def minContains(n: Int): String = I18n.get(32, n.toString)
  def maxContains(n: Int): String = I18n.get(33, n.toString)
  def contains: String = I18n.get(34)
  def minItems(n: Int): String = I18n.get(35, n.toString)
  def maxItems(n: Int): String = I18n.get(36, n.toString)
  def uniqueItems: String = I18n.get(37)

  // StringValidator
  def notString: String = I18n.get(40)
  def minLength(n: Int): String = I18n.get(41, n.toString)
  def maxLength(n: Int): String = I18n.get(42, n.toString)
  def pattern(re: String): String = I18n.get(43, re)
  def format(name: String): String = I18n.get(44, name)

  // NumberValidator
  def notNumber: String = I18n.get(50)
  def notInteger: String = I18n.get(51)
  def minimum(n: BigDecimal): String = I18n.get(52, render(n))
  def maximum(n: BigDecimal): String = I18n.get(53, render(n))
  def exclusiveMinimum(n: BigDecimal): String = I18n.get(54, render(n))
  def exclusiveMaximum(n: BigDecimal): String = I18n.get(55, render(n))
  def multipleOf(n: BigDecimal): String = I18n.get(56, render(n))

  // NullValidator / BooleanValidator
  def notNull: String = I18n.get(60)
  def notBoolean: String = I18n.get(70)

  // CompositeValidator (collapsed single error per composite, validator.cr:503-530)
  def allOf: String = I18n.get(80)
  def anyOf: String = I18n.get(81)
  def oneOf: String = I18n.get(82)
  def not: String = I18n.get(83)

  def composite(kind: String): String = kind match {
    case "allOf" => allOf
    case "anyOf" => anyOf
    case "oneOf" => oneOf
    case "not"   => not
  }

  private def render(n: BigDecimal): String =
    if (n.isWhole) n.toBigInt.toString
    else n.underlying.stripTrailingZeros.toPlainString
}
