package graft.compile

/** Violation-message catalog.
  *
  * Messages are data, not code: the texts mirror the reference's EN_US table
  * byte-for-byte (/root/reference/src/i18n.cr:6-62, including its "value be
  * greater" grammar quirks) so golden violation rows are locale-stable and
  * comparable against the reference spec suite. Interpolation happens on the
  * driver at compile time — every argument is a spec constant — so the
  * `message` column is always a literal (codegen-friendly, zero runtime
  * string work).
  */
object Messages {
  // GenericValidator
  val enumMismatch = "Expected value to be equal to the enum" // 10
  def constMismatch(rendered: String) = s"Expected value to be $rendered" // 11

  // ObjectValidator
  val notObject = "Expected value to be an object" // 20
  def required(prop: String) = s"""Expected required property "$prop" to be set""" // 21
  def dependentRequired(requiredProp: String, dependentProp: String) = // 22
    s"""Expected required property "$requiredProp" to be set when "$dependentProp" is set"""
  def minProperties(n: Int) = s"Expected object to have at least $n properties" // 23
  def maxProperties(n: Int) = s"Expected object to have at most $n properties" // 24
  val additionalProperties = "Expected object not to have additional properties" // 25

  // ArrayValidator
  val notArray = "Expected value to be an array" // 30
  def tupleLength(n: Int) = s"Expected array to be tuple of length $n" // 31
  def minContains(n: Int) = s"Expected array to contain at least $n matched items" // 32
  def maxContains(n: Int) = s"Expected array to contain at most $n matched items" // 33
  val contains = "Expected array to contain at least 1 matched item" // 34
  def minItems(n: Int) = s"Expected array length to be at least $n" // 35
  def maxItems(n: Int) = s"Expected array length to be at most $n" // 36
  val uniqueItems = "Expected array items to be unique" // 37

  // StringValidator
  val notString = "Expected value to be a string" // 40
  def minLength(n: Int) = s"Expected string to have a minimum length of $n" // 41
  def maxLength(n: Int) = s"Expected string to have a maximum length of $n" // 42
  def pattern(re: String) = s"Expected string to match pattern /$re/" // 43
  def format(name: String) = s"""Expected string to match format "$name"""" // 44

  // NumberValidator
  val notNumber = "Expected value to be a number" // 50
  val notInteger = "Expected numeric value to be an integer" // 51
  def minimum(n: BigDecimal) = s"Expected numeric value be greater than or equal to ${render(n)}" // 52
  def maximum(n: BigDecimal) = s"Expected numeric value be less than or equal to ${render(n)}" // 53
  def exclusiveMinimum(n: BigDecimal) = s"Expected numeric value be greater than ${render(n)}" // 54
  def exclusiveMaximum(n: BigDecimal) = s"Expected numeric value be less than ${render(n)}" // 55
  def multipleOf(n: BigDecimal) = s"Expected numeric value to be multiple of ${render(n)}" // 56

  // NullValidator / BooleanValidator
  val notNull = "Expected value to be null" // 60
  val notBoolean = "Expected value to be a boolean" // 70

  // CompositeValidator (collapsed single error per composite, validator.cr:503-530)
  val allOf = "Expected value to match all schemas" // 80
  val anyOf = "Expected value to match any of the schemas" // 81
  val oneOf = "Expected value to match only one of the schemas" // 82
  val not = "Expected value not to match any of the schemas" // 83

  def composite(kind: String): String = kind match {
    case "allOf" => allOf
    case "anyOf" => anyOf
    case "oneOf" => oneOf
    case "not"   => not
  }

  private def render(n: BigDecimal): String =
    if (n.isWhole && n.scale <= 0) n.toBigInt.toString
    else if (n.isWhole) n.toBigInt.toString
    else n.underlying.stripTrailingZeros.toPlainString
}
