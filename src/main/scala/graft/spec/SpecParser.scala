package graft.spec

/** JSON schema document → `Spec` ADT.
  *
  * Behavioral analog of the reference's define pass
  * (/root/reference/src/define.cr:12-214): type-keyword dispatch, generic
  * fallback when no `type` but ≥1 of enum/const/allOf/anyOf/oneOf/not,
  * fail-fast rejection of impossible schemas (`additionalProperties:false`
  * without `properties`, define.cr:44-46) and of constraint-free schemas
  * (i18n key 0). All failures are driver-side `SpecError`s thrown before any
  * Spark job runs.
  */
object SpecParser {

  private val CompositeKeys = Composite.Kinds
  private val GenericKeys = CompositeKeys ++ Vector("enum", "const")

  def parse(text: String): Spec = parseNode(JsonVal.parse(text))

  /** File entry point — the runtime analog of the reference's compile-time
    * `create_validator` macro (jsonschema.cr:16-18): read schema file, build
    * the spec once at app start; Catalyst codegen is the runtime analog of
    * the emitted code. */
  def parseFile(path: String): Spec =
    parse(java.nio.file.Files.readString(java.nio.file.Paths.get(path)))

  /** Root entry — root must be an object node (reference jsonschema.cr:64-67). */
  def parseNode(node: JsonVal): Spec = node match {
    case o: JObj => define(o)
    case _       => throw SpecError("root node must be an object")
  }

  def parseOpt(text: String): Option[Spec] =
    try Some(parse(text))
    catch { case _: Throwable => None }

  private def define(schema: JObj): Spec = {
    if (isGeneric(schema)) defineGeneric(schema)
    else
      schema.get("type") match {
        case Some(JStr("object"))  => defineObject(schema)
        case Some(JStr("array"))   => defineArray(schema)
        case Some(JStr("string"))  => defineString(schema)
        case Some(JStr("number"))  => defineNumber(schema, integer = false)
        case Some(JStr("integer")) => defineNumber(schema, integer = true)
        case Some(JStr("null"))    => NullSpec
        case Some(JStr("boolean")) => BoolSpec
        case _ => throw SpecError("schema did not provide any constraints")
      }
  }

  private def isGeneric(schema: JObj): Boolean =
    !schema.has("type") && schema.keys.exists(GenericKeys.contains)

  private def defineGeneric(schema: JObj): GenericSpec =
    GenericSpec(
      enumList = enumOf(schema),
      const = schema.get("const"),
      composites = compositesOf(schema)
    )

  private def defineObject(schema: JObj): ObjSpec = {
    val addl = schema.get("additionalProperties")
    if (addl.contains(JBool(false)) && !schema.has("properties"))
      throw SpecError(
        """Expected "object" schema to define "properties" when "additionalProperties" is false""")
    ObjSpec(
      properties = objFields(schema, "properties").map { case (k, v) => k -> define(asObj(v, s"properties.$k")) },
      patternProperties = objFields(schema, "patternProperties").map { case (k, v) =>
        // fail fast on an invalid regex, like Regex.new at define.cr:91
        java.util.regex.Pattern.compile(k)
        k -> define(asObj(v, s"patternProperties.$k"))
      },
      additionalDisabled = addl.contains(JBool(false)),
      additionalProperties = addl.collect { case o: JObj => define(o) },
      required = schema.get("required").map(strArr(_, "required")),
      dependentRequired = objFields(schema, "dependentRequired").map { case (k, v) =>
        k -> strArr(v, s"dependentRequired.$k")
      },
      dependentSchemas = objFields(schema, "dependentSchemas").map { case (k, v) =>
        k -> defineObject(asObj(v, s"dependentSchemas.$k"))
      },
      propertyNames = schema.get("propertyNames").map(v => defineString(asObj(v, "propertyNames"))),
      minProperties = intOpt(schema, "minProperties"),
      maxProperties = intOpt(schema, "maxProperties"),
      enumList = enumOf(schema),
      composites = compositesOf(schema)
    )
  }

  private def defineArray(schema: JObj): ArrSpec = {
    val hasPrefix = schema.has("prefixItems")
    ArrSpec(
      // with prefixItems present, `items` is consulted only as the
      // `false` tuple-close marker (define.cr:116-125)
      items =
        if (hasPrefix) None
        else schema.get("items").map(v => define(asObj(v, "items"))),
      tupleClosed = hasPrefix && schema.get("items").contains(JBool(false)),
      prefixItems = schema.get("prefixItems") match {
        case Some(JArr(xs)) => xs.zipWithIndex.map { case (v, i) => define(asObj(v, s"prefixItems[$i]")) }
        case Some(other)    => throw SpecError(s"prefixItems must be an array, got ${other.render}")
        case None           => Vector.empty
      },
      contains = schema.get("contains").map(v => define(asObj(v, "contains"))),
      minContains = intOpt(schema, "minContains"),
      maxContains = intOpt(schema, "maxContains"),
      minItems = intOpt(schema, "minItems"),
      maxItems = intOpt(schema, "maxItems"),
      uniqueItems = schema.get("uniqueItems").contains(JBool(true)),
      enumList = enumOf(schema),
      composites = compositesOf(schema)
    )
  }

  private def defineString(schema: JObj): StrSpec =
    StrSpec(
      minLength = intOpt(schema, "minLength"),
      maxLength = intOpt(schema, "maxLength"),
      pattern = schema.get("pattern").collect { case JStr(s) =>
        java.util.regex.Pattern.compile(s) // fail fast like Regex.new (define.cr:155)
        s
      },
      format = schema.get("format").collect { case JStr(s) => s },
      enumList = enumOf(schema),
      composites = compositesOf(schema)
    )

  private def defineNumber(schema: JObj, integer: Boolean): NumSpec =
    NumSpec(
      integer = integer,
      multipleOf = numOpt(schema, "multipleOf"),
      minimum = numOpt(schema, "minimum"),
      maximum = numOpt(schema, "maximum"),
      exclusiveMinimum = numOpt(schema, "exclusiveMinimum"),
      exclusiveMaximum = numOpt(schema, "exclusiveMaximum"),
      enumList = enumOf(schema),
      composites = compositesOf(schema)
    )

  private def compositesOf(schema: JObj): Vector[Composite] =
    CompositeKeys.flatMap { kw =>
      schema.get(kw).map {
        case JArr(children) =>
          Composite(kw, children.zipWithIndex.map { case (c, i) => define(asObj(c, s"$kw[$i]")) })
        case other => throw SpecError(s"$kw must be an array of schemas, got ${other.render}")
      }
    }

  // -- helpers -------------------------------------------------------------

  private def enumOf(schema: JObj): Vector[JsonVal] = schema.get("enum") match {
    case Some(JArr(xs)) => xs
    case Some(other)    => throw SpecError(s"enum must be an array, got ${other.render}")
    case None           => Vector.empty
  }

  private def objFields(schema: JObj, key: String): Vector[(String, JsonVal)] =
    schema.get(key) match {
      case Some(o: JObj) => o.fields
      case Some(other)   => throw SpecError(s"$key must be an object, got ${other.render}")
      case None          => Vector.empty
    }

  private def asObj(v: JsonVal, at: String): JObj = v match {
    case o: JObj => o
    case other   => throw SpecError(s"expected schema object at $at, got ${other.render}")
  }

  private def strArr(v: JsonVal, at: String): Vector[String] = v match {
    case JArr(xs) =>
      xs.map {
        case JStr(s) => s
        case other   => throw SpecError(s"expected string in $at, got ${other.render}")
      }
    case other => throw SpecError(s"$at must be an array, got ${other.render}")
  }

  private def intOpt(schema: JObj, key: String): Option[Int] =
    schema.get(key).map {
      case n: JNum if n.isWholeNum => n.toInt
      case other => throw SpecError(s"$key must be an integer, got ${other.render}")
    }

  private def numOpt(schema: JObj, key: String): Option[BigDecimal] =
    schema.get(key).map {
      case JNum(n) => n
      case other   => throw SpecError(s"$key must be a number, got ${other.render}")
    }
}
