package graft.spec

/** Programmatic spec builder — the idiomatic-Scala analog of the reference's
  * fluent DSL (/root/reference/src/fluent.cr:52-472). Immutable: every call
  * returns a new spec (`copy`), so partial specs are shareable.
  *
  * {{{
  * import graft.spec.Fluent._
  * val spec = obj
  *   .required("doc_id", "tokens")
  *   .prop("n_tok", int.min(1).max(8192))
  *   .prop("source", str.enum("web", "books", "code", "wiki"))
  *   .prop("tokens", arr.items(int.min(0).exclusiveMax(50000)).minItems(1))
  * }}}
  */
object Fluent {

  def obj: ObjSpec = ObjSpec()
  def arr: ArrSpec = ArrSpec()
  def str: StrSpec = StrSpec()
  def num: NumSpec = NumSpec()
  def int: NumSpec = NumSpec(integer = true)
  def nul: NullSpec.type = NullSpec
  def bool: BoolSpec.type = BoolSpec
  def generic: GenericSpec = GenericSpec()

  def allOf(children: Spec*): Composite = Composite("allOf", children.toVector)
  def anyOf(children: Spec*): Composite = Composite("anyOf", children.toVector)
  def oneOf(children: Spec*): Composite = Composite("oneOf", children.toVector)
  def not(children: Spec*): Composite = Composite("not", children.toVector)

  implicit final class ObjOps(private val o: ObjSpec) extends AnyVal {
    def prop(name: String, spec: Spec): ObjSpec =
      o.copy(properties = o.properties :+ (name -> spec))
    def patternProp(regex: String, spec: Spec): ObjSpec =
      o.copy(patternProperties = o.patternProperties :+ (regex -> spec))
    def required(names: String*): ObjSpec =
      o.copy(required = Some(o.required.getOrElse(Vector.empty) ++ names))
    def dependentRequired(prop: String, needs: String*): ObjSpec =
      o.copy(dependentRequired = o.dependentRequired :+ (prop -> needs.toVector))
    def dependentSchema(prop: String, schema: ObjSpec): ObjSpec =
      o.copy(dependentSchemas = o.dependentSchemas :+ (prop -> schema))
    def propertyNames(s: StrSpec): ObjSpec = o.copy(propertyNames = Some(s))
    def minProperties(n: Int): ObjSpec = o.copy(minProperties = Some(n))
    def maxProperties(n: Int): ObjSpec = o.copy(maxProperties = Some(n))
    def noAdditional: ObjSpec = o.copy(additionalDisabled = true)
    def additional(spec: Spec): ObjSpec = o.copy(additionalProperties = Some(spec))
    def oEnum(values: JsonVal*): ObjSpec = o.copy(enumList = values.toVector)
    def composite(cs: Composite*): ObjSpec = o.copy(composites = o.composites ++ cs)
  }

  implicit final class ArrOps(private val a: ArrSpec) extends AnyVal {
    def items(spec: Spec): ArrSpec = a.copy(items = Some(spec))
    def prefix(specs: Spec*): ArrSpec = a.copy(prefixItems = specs.toVector)
    def closedTuple: ArrSpec = a.copy(tupleClosed = true)
    def contains(spec: Spec): ArrSpec = a.copy(contains = Some(spec))
    def minContains(n: Int): ArrSpec = a.copy(minContains = Some(n))
    def maxContains(n: Int): ArrSpec = a.copy(maxContains = Some(n))
    def minItems(n: Int): ArrSpec = a.copy(minItems = Some(n))
    def maxItems(n: Int): ArrSpec = a.copy(maxItems = Some(n))
    def unique: ArrSpec = a.copy(uniqueItems = true)
    def aEnum(values: JsonVal*): ArrSpec = a.copy(enumList = values.toVector)
    def composite(cs: Composite*): ArrSpec = a.copy(composites = a.composites ++ cs)
  }

  implicit final class StrOps(private val s: StrSpec) extends AnyVal {
    def minLength(n: Int): StrSpec = s.copy(minLength = Some(n))
    def maxLength(n: Int): StrSpec = s.copy(maxLength = Some(n))
    def pattern(re: String): StrSpec = s.copy(pattern = Some(re))
    def format(name: String): StrSpec = s.copy(format = Some(name))
    def enum(values: String*): StrSpec = s.copy(enumList = values.map(JStr(_): JsonVal).toVector)
    def composite(cs: Composite*): StrSpec = s.copy(composites = s.composites ++ cs)
  }

  implicit final class NumOps(private val n: NumSpec) extends AnyVal {
    def min(v: BigDecimal): NumSpec = n.copy(minimum = Some(v))
    def max(v: BigDecimal): NumSpec = n.copy(maximum = Some(v))
    def exclusiveMin(v: BigDecimal): NumSpec = n.copy(exclusiveMinimum = Some(v))
    def exclusiveMax(v: BigDecimal): NumSpec = n.copy(exclusiveMaximum = Some(v))
    def multipleOf(v: BigDecimal): NumSpec = n.copy(multipleOf = Some(v))
    def enum(values: BigDecimal*): NumSpec =
      n.copy(enumList = values.map(v => JNum(v): JsonVal).toVector)
    def composite(cs: Composite*): NumSpec = n.copy(composites = n.composites ++ cs)
  }

  implicit final class GenericOps(private val g: GenericSpec) extends AnyVal {
    def enumOf(values: JsonVal*): GenericSpec = g.copy(enumList = values.toVector)
    def const(v: JsonVal): GenericSpec = g.copy(const = Some(v))
    def composite(cs: Composite*): GenericSpec = g.copy(composites = g.composites ++ cs)
  }
}
