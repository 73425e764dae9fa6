package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spec._

/** Spec parsing, fail-fast rejection, and serialize round-trip — mirrors
  * /root/reference/spec/{json_schema_spec.cr,serialize_spec.cr}. */
class SpecParserSpec extends AnyFunSuite {

  val complex =
    """{"type":"object",
        "minProperties":1,"maxProperties":8,
        "required":["doc_id","tokens"],
        "propertyNames":{"type":"string","pattern":"^[a-z_]+$"},
        "dependentRequired":{"n_tok":["tokens"]},
        "dependentSchemas":{"source":{"type":"object","required":["doc_id"]}},
        "properties":{
          "doc_id":{"type":"string","minLength":1,"format":"uuid"},
          "tokens":{"type":"array","items":{"type":"integer","minimum":0,"exclusiveMaximum":50000},
                    "minItems":1,"maxItems":8192,"uniqueItems":false},
          "n_tok":{"type":"integer","minimum":1,"maximum":8192,"multipleOf":1},
          "source":{"type":"string","enum":["web","books","code","wiki"]}},
        "patternProperties":{"^meta_":{"type":"string"}},
        "additionalProperties":{"type":"null"},
        "anyOf":[{"type":"object","required":["doc_id"]}]}"""

  test("parses every keyword and round-trips through serialize") {
    val spec = SpecParser.parse(complex)
    val json = SpecJson.serialize(spec)
    val reparsed = SpecParser.parse(json)
    assert(reparsed == spec)
    assert(SpecJson.serialize(reparsed) == json) // byte-stable
  }

  test("spec hash is stable and distinguishes specs") {
    val a = SpecParser.parse(complex)
    val b = SpecParser.parse("""{"type":"number","minimum":0}""")
    assert(SpecJson.hash(a) == SpecJson.hash(SpecParser.parse(complex)))
    assert(SpecJson.hash(a) != SpecJson.hash(b))
  }

  test("root node must be an object (jsonschema.cr:64-67)") {
    val e = intercept[SpecError](SpecParser.parse("""[1,2,3]"""))
    assert(e.msg == "root node must be an object")
  }

  test("schema without constraints is rejected (define.cr:36, i18n key 0)") {
    val e = intercept[SpecError](SpecParser.parse("""{"foo":"bar"}"""))
    assert(e.msg == "schema did not provide any constraints")
  }

  test("additionalProperties:false without properties is rejected (define.cr:44-46)") {
    val e = intercept[SpecError](
      SpecParser.parse("""{"type":"object","additionalProperties":false}"""))
    assert(e.msg.contains("""when "additionalProperties" is false"""))
  }

  test("generic dispatch: no type but enum/const/composites (define.cr:39-41)") {
    assert(SpecParser.parse("""{"enum":[1]}""").isInstanceOf[GenericSpec])
    assert(SpecParser.parse("""{"const":5}""").isInstanceOf[GenericSpec])
    assert(SpecParser.parse("""{"anyOf":[{"type":"string"}]}""").isInstanceOf[GenericSpec])
    assert(SpecParser.parse("""{"type":"string"}""").isInstanceOf[StrSpec])
  }

  test("items ignored when prefixItems present except as the false tuple marker (define.cr:116-125)") {
    val dropped = SpecParser.parse(
      """{"type":"array","items":{"type":"string"},"prefixItems":[{"type":"number"}]}""")
      .asInstanceOf[ArrSpec]
    assert(dropped.items.isEmpty && !dropped.tupleClosed)
    val closed = SpecParser.parse(
      """{"type":"array","items":false,"prefixItems":[{"type":"number"}]}""")
      .asInstanceOf[ArrSpec]
    assert(closed.tupleClosed)
  }

  test("invalid regex in pattern fails at define time (define.cr:155)") {
    intercept[Throwable](SpecParser.parse("""{"type":"string","pattern":"["}"""))
  }

  test("parseOpt returns None on invalid schema (from_json?, jsonschema.cr:76-78)") {
    assert(SpecParser.parseOpt("""{"foo":1}""").isEmpty)
    assert(SpecParser.parseOpt("""{"type":"string"}""").isDefined)
  }

  test("unsupported formats are rejected like the reference raises (format.cr:37-76)") {
    intercept[SpecError] {
      val spec = SpecParser.parse("""{"type":"string","format":"iri"}""")
      graft.compile.Compiler.compileColumn(spec, "v", org.apache.spark.sql.types.StringType)
    }
  }
}
