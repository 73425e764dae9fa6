package graft.spec

/** `Spec` → canonical schema-JSON round-trip serializer.
  *
  * Behavioral analog of the reference's `Validator#to_json`
  * (/root/reference/src/serialize.cr:18-206, golden-tested against
  * spec/fixtures/serialize_result.json). Deterministic output: `type` first,
  * then keywords in define-order, then enum/const, then composites — so
  * `parse(serialize(spec)) == spec` and serialized bytes are stable for
  * spec-hashing (checkpoint lineage keys use `SpecJson.hash`).
  */
object SpecJson {

  def serialize(spec: Spec): String = toJson(spec).render

  /** Stable 64-bit lineage hash of a spec — keys checkpointed metrics rows. */
  def hash(spec: Spec): String = {
    val bytes = serialize(spec).getBytes("UTF-8")
    var h = 0xcbf29ce484222325L // FNV-1a 64
    bytes.foreach { b => h ^= (b & 0xffL); h *= 0x100000001b3L }
    f"$h%016x"
  }

  def toJson(spec: Spec): JObj = spec match {
    case g: GenericSpec =>
      obj(
        enumField(g.enumList) ++
          g.const.map("const" -> _).toVector ++
          compositeFields(g.composites)
      )
    case o: ObjSpec =>
      obj(
        Vector("type" -> JStr("object")) ++
          opt("minProperties", o.minProperties) ++
          opt("maxProperties", o.maxProperties) ++
          o.required.map(r => "required" -> JArr(r.map(JStr))).toVector ++
          o.propertyNames.map(pn => "propertyNames" -> toJson(pn)).toVector ++
          (if (o.additionalDisabled) Vector("additionalProperties" -> JBool(false))
           else o.additionalProperties.map(s => "additionalProperties" -> toJson(s)).toVector) ++
          nonEmptyObj("dependentRequired", o.dependentRequired.map { case (k, v) => k -> JArr(v.map(JStr)) }) ++
          nonEmptyObj("dependentSchemas", o.dependentSchemas.map { case (k, v) => k -> toJson(v) }) ++
          nonEmptyObj("properties", o.properties.map { case (k, v) => k -> toJson(v) }) ++
          nonEmptyObj("patternProperties", o.patternProperties.map { case (k, v) => k -> toJson(v) }) ++
          enumField(o.enumList) ++ compositeFields(o.composites)
      )
    case a: ArrSpec =>
      obj(
        Vector("type" -> JStr("array")) ++
          a.items.map(s => "items" -> (toJson(s): JsonVal)).toVector ++
          (if (a.tupleClosed) Vector("items" -> JBool(false)) else Vector.empty) ++
          (if (a.prefixItems.nonEmpty) Vector("prefixItems" -> JArr(a.prefixItems.map(toJson(_): JsonVal))) else Vector.empty) ++
          a.contains.map(s => "contains" -> (toJson(s): JsonVal)).toVector ++
          opt("minContains", a.minContains) ++ opt("maxContains", a.maxContains) ++
          opt("minItems", a.minItems) ++ opt("maxItems", a.maxItems) ++
          (if (a.uniqueItems) Vector("uniqueItems" -> JBool(true)) else Vector.empty) ++
          enumField(a.enumList) ++ compositeFields(a.composites)
      )
    case s: StrSpec =>
      obj(
        Vector("type" -> JStr("string")) ++
          opt("minLength", s.minLength) ++ opt("maxLength", s.maxLength) ++
          s.pattern.map(p => "pattern" -> JStr(p)).toVector ++
          s.format.map(f => "format" -> JStr(f)).toVector ++
          enumField(s.enumList) ++ compositeFields(s.composites)
      )
    case n: NumSpec =>
      obj(
        Vector("type" -> JStr(if (n.integer) "integer" else "number")) ++
          optN("multipleOf", n.multipleOf) ++
          optN("minimum", n.minimum) ++ optN("maximum", n.maximum) ++
          optN("exclusiveMinimum", n.exclusiveMinimum) ++ optN("exclusiveMaximum", n.exclusiveMaximum) ++
          enumField(n.enumList) ++ compositeFields(n.composites)
      )
    case NullSpec => obj(Vector("type" -> JStr("null")))
    case BoolSpec => obj(Vector("type" -> JStr("boolean")))
  }

  private def obj(fields: Vector[(String, JsonVal)]): JObj = JObj(fields)

  private def opt(k: String, v: Option[Int]): Vector[(String, JsonVal)] =
    v.map(i => k -> (JNum(BigDecimal(i)): JsonVal)).toVector

  private def optN(k: String, v: Option[BigDecimal]): Vector[(String, JsonVal)] =
    v.map(n => k -> (JNum(n): JsonVal)).toVector

  private def enumField(e: Vector[JsonVal]): Vector[(String, JsonVal)] =
    if (e.isEmpty) Vector.empty else Vector("enum" -> JArr(e))

  private def nonEmptyObj(k: String, fields: Vector[(String, JsonVal)]): Vector[(String, JsonVal)] =
    if (fields.isEmpty) Vector.empty else Vector(k -> JObj(fields))

  private def compositeFields(cs: Vector[Composite]): Vector[(String, JsonVal)] =
    cs.map(c => c.kind -> JArr(c.children.map(toJson(_): JsonVal)))
}
