package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.spec._
import graft.spec.Fluent._

/** Byte-golden serialization: the fluent-built spec of the reference's
  * serialize suite (/root/reference/spec/serialize_spec.cr:8-41) must render
  * EXACTLY the reference's golden bytes
  * (spec/fixtures/serialize_result.json, checked in as a test resource —
  * the serialized form IS the cross-implementation contract, like the i18n
  * message table). Round-tripping (`parse(serialize(s)) == s`,
  * ReferenceCorpusSpec) alone would not catch keyword-order or
  * number-rendering drift. */
class SerializeGoldenSpec extends AnyFunSuite {

  test("to_json bytes equal the reference golden (serialize_spec.cr analog)") {
    val spec = obj
      .prop("name", str.minLength(2).maxLength(64))
      .prop("age", int)
      .prop("likes", arr
        .items(str.minLength(3))
        .minItems(3).maxItems(50).unique)
      .prop("is_registered", bool)
      .prop("address", generic.composite(anyOf(
        obj.prop("street", str).prop("city", str)
          .prop("state", generic.enumOf(JStr("AL"), JStr("AK"), JStr("AZ"), JStr("AR")))
          .prop("zipcode", str),
        nul)))

    val golden = new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("src/test/resources/serialize_result.json")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(SpecJson.serialize(spec) == golden)
    // and the round-trip still holds on the same spec
    assert(SpecParser.parse(SpecJson.serialize(spec)) == spec)
  }
}
