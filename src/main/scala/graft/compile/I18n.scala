package graft.compile

/** Swappable message-table support — analog of the reference's `I18N` class
  * (/root/reference/src/i18n.cr:87-117): a lang is a map from the reference's
  * numeric message ids to either a fixed string or an interpolation function.
  * Keys absent from a custom lang fall back to EN_US, exactly like
  * `I18N#get`. Translation is applied when specs are COMPILED (messages are
  * baked into literal Columns), so swap the lang before compiling.
  */
object I18n {

  type Entry = Either[String, Seq[String] => String]

  /** EN_US table — ids and texts mirror i18n.cr:6-62 byte-for-byte. */
  val EnUs: Map[Int, Entry] = Map(
    0 -> Left("schema did not provide any constraints"),
    1 -> Left("root node must be an object"),
    10 -> Left("Expected value to be equal to the enum"),
    11 -> Left("Expected value to be"),
    20 -> Left("Expected value to be an object"),
    21 -> Right(a => s"""Expected required property "${a(0)}" to be set"""),
    22 -> Right(a => s"""Expected required property "${a(0)}" to be set when "${a(1)}" is set"""),
    23 -> Right(a => s"Expected object to have at least ${a(0)} properties"),
    24 -> Right(a => s"Expected object to have at most ${a(0)} properties"),
    25 -> Left("Expected object not to have additional properties"),
    30 -> Left("Expected value to be an array"),
    31 -> Right(a => s"Expected array to be tuple of length ${a(0)}"),
    32 -> Right(a => s"Expected array to contain at least ${a(0)} matched items"),
    33 -> Right(a => s"Expected array to contain at most ${a(0)} matched items"),
    34 -> Left("Expected array to contain at least 1 matched item"),
    35 -> Right(a => s"Expected array length to be at least ${a(0)}"),
    36 -> Right(a => s"Expected array length to be at most ${a(0)}"),
    37 -> Left("Expected array items to be unique"),
    40 -> Left("Expected value to be a string"),
    41 -> Right(a => s"Expected string to have a minimum length of ${a(0)}"),
    42 -> Right(a => s"Expected string to have a maximum length of ${a(0)}"),
    43 -> Right(a => s"Expected string to match pattern /${a(0)}/"),
    44 -> Right(a => s"""Expected string to match format "${a(0)}""""),
    50 -> Left("Expected value to be a number"),
    51 -> Left("Expected numeric value to be an integer"),
    52 -> Right(a => s"Expected numeric value be greater than or equal to ${a(0)}"),
    53 -> Right(a => s"Expected numeric value be less than or equal to ${a(0)}"),
    54 -> Right(a => s"Expected numeric value be greater than ${a(0)}"),
    55 -> Right(a => s"Expected numeric value be less than ${a(0)}"),
    56 -> Right(a => s"Expected numeric value to be multiple of ${a(0)}"),
    60 -> Left("Expected value to be null"),
    70 -> Left("Expected value to be a boolean"),
    80 -> Left("Expected value to match all schemas"),
    81 -> Left("Expected value to match any of the schemas"),
    82 -> Left("Expected value to match only one of the schemas"),
    83 -> Left("Expected value not to match any of the schemas")
  )

  @volatile private var lang: Map[Int, Entry] = Map.empty

  /** Install a custom lang (partial maps fall back to EN_US per key). */
  def setLang(custom: Map[Int, Entry]): Unit = lang = custom

  def reset(): Unit = lang = Map.empty

  def get(key: Int): String =
    lang.getOrElse(key, EnUs(key)) match {
      case Left(s)  => s
      case Right(f) => f(Seq.empty)
    }

  def get(key: Int, args: String*): String =
    lang.getOrElse(key, EnUs(key)) match {
      case Left(s)  => s
      case Right(f) => f(args)
    }
}
