package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.compile.VariantCompiler
import graft.run.Validator
import graft.spec.SpecParser

import Harness.spark

/** Dynamic-JSON (variant) mode — EXACT reference parity, including the
  * heterogeneous-value cases the typed-column mode cannot express. Each test
  * mirrors a case from /root/reference/spec/ with the real JSON input. */
class VariantValidatorSpec extends AnyFunSuite {

  /** `validator.validate(JSON.parse(json))` analog → ordered (message, path). */
  def errorsForJson(schemaJson: String, json: String): Vector[(String, String)] = {
    import spark.implicits._
    val df = Seq(("r0", json)).toDF("doc_id", "js")
    Validator.validateJson(df, SpecParser.parse(schemaJson), "js", "doc_id", None)
      .orderedViolations.select("message", "path").collect().toVector
      .map(r => (r.getString(0), r.getString(1)))
  }

  import Harness.{assertError, assertErrors, assertSuccess}

  test("runtime type gates across the whole JSON lattice (basic_* fixtures)") {
    val num = """{"type":"number"}"""
    assertSuccess(errorsForJson(num, "100"))
    assertSuccess(errorsForJson(num, "100.123"))
    assertError(errorsForJson(num, "true"), "Expected value to be a number")
    assertError(errorsForJson(num, "null"), "Expected value to be a number")
    assertError(errorsForJson(num, "[1,2,3]"), "Expected value to be a number")
    assertError(errorsForJson(num, "{}"), "Expected value to be a number")
    assertError(errorsForJson(num, "\"test\""), "Expected value to be a number")

    val str = """{"type":"string"}"""
    assertSuccess(errorsForJson(str, "\"test\""))
    assertError(errorsForJson(str, "10"), "Expected value to be a string")

    val obj = """{"type":"object"}"""
    assertSuccess(errorsForJson(obj, """{"name":"Test"}"""))
    assertError(errorsForJson(obj, "[1,2,3]"), "Expected value to be an object")

    val nul = """{"type":"null"}"""
    assertSuccess(errorsForJson(nul, "null"))
    assertError(errorsForJson(nul, "5"), "Expected value to be null")

    val bool = """{"type":"boolean"}"""
    assertSuccess(errorsForJson(bool, "true"))
    assertError(errorsForJson(bool, "\"true\""), "Expected value to be a boolean")
  }

  test("integer accepts 100.0 (validator.cr:404); rejects fractions") {
    val int = """{"type":"integer"}"""
    assertSuccess(errorsForJson(int, "100"))
    assertSuccess(errorsForJson(int, "100.0"))
    assertError(errorsForJson(int, "10.123"), "Expected numeric value to be an integer")
  }

  test("heterogeneous prefixItems tuple (array_prefix_items fixtures) — golden 3-error order") {
    val schema =
      """{"type":"array","prefixItems":[{"type":"string"},{"type":"number"},{"type":"boolean"}]}"""
    assertSuccess(errorsForJson(schema, """["red", 1, true]"""))
    assertSuccess(errorsForJson(schema, """["red", 1, true, 2, 3]"""))
    assertErrors(errorsForJson(schema, """[1, "green", null]"""), Vector(
      "Expected value to be a string",
      "Expected value to be a number",
      "Expected value to be a boolean"))
  }

  test("prefixItems + items:false tuple close") {
    val schema =
      """{"type":"array","items":false,"prefixItems":[{"type":"string"},{"type":"number"},{"type":"boolean"}]}"""
    assertSuccess(errorsForJson(schema, """["red", 1, true]"""))
    assertError(errorsForJson(schema, """["red", 1, true, 2, 3]"""),
      "Expected array to be tuple of length 3")
  }

  test("items over heterogeneous input (array_items fixture)") {
    val schema = """{"type":"array","items":{"type":"string"}}"""
    assertSuccess(errorsForJson(schema, """["red","yellow","blue"]"""))
    assertError(errorsForJson(schema, "[1]"), "Expected value to be a string")
    assertError(errorsForJson(schema, "[true]"), "Expected value to be a string")
    assertError(errorsForJson(schema, "[null]"), "Expected value to be a string")
    assertError(errorsForJson(schema, "[{}]"), "Expected value to be a string")
  }

  test("uniqueItems with deep equality incl. arrays and objects (array_unique_items)") {
    val schema = """{"type":"array","uniqueItems":true}"""
    assertSuccess(errorsForJson(schema, "[1, 2, 3]"))
    assertSuccess(errorsForJson(schema, """[["first-array"], ["second-array"]]"""))
    assertSuccess(errorsForJson(schema, """[{"object1":"test1"}, {"object2":"test2"}]"""))
    assertError(errorsForJson(schema, "[1,1,2,3]"), "Expected array items to be unique")
    assertError(errorsForJson(schema, """[["first-array"], ["first-array"]]"""),
      "Expected array items to be unique")
    assertError(errorsForJson(schema, """[{"object1":"test1"}, {"object1":"test1"}]"""),
      "Expected array items to be unique")
  }

  test("object keywords over RUNTIME keys: required / limits / propertyNames / additional") {
    val req = """{"type":"object","required":["schema1","schema2"],
                 "properties":{"schema1":{"type":"string"},"schema2":{"type":"string"}}}"""
    assertSuccess(errorsForJson(req, """{"schema1":"a","schema2":"b"}"""))
    assertError(errorsForJson(req, """{"schema1":"a"}"""),
      """Expected required property "schema2" to be set""")

    val limits = """{"type":"object","minProperties":1,"maxProperties":3}"""
    assertSuccess(errorsForJson(limits, """{"name":"Test"}"""))
    assertError(errorsForJson(limits, "{}"), "Expected object to have at least 1 properties")
    assertError(errorsForJson(limits, """{"a":1,"b":2,"c":3,"d":4}"""),
      "Expected object to have at most 3 properties")

    val names = """{"type":"object","propertyNames":{"type":"string","pattern":"^test"}}"""
    assertSuccess(errorsForJson(names, """{"test1":1,"test2":2}"""))
    assertError(errorsForJson(names, """{"test1":1,"invalid":2}"""),
      "Expected string to match pattern /^test/")

    val closed = """{"type":"object","properties":{"a":{"type":"string"}},"additionalProperties":false}"""
    assertSuccess(errorsForJson(closed, """{"a":"x"}"""))
    assertError(errorsForJson(closed, """{"a":"x","name":"Test"}"""),
      "Expected object not to have additional properties")

    val typedAdditional =
      """{"type":"object","properties":{"a":{"type":"string"}},"additionalProperties":{"type":"number"}}"""
    assertSuccess(errorsForJson(typedAdditional, """{"a":"x","extra":5}"""))
    assertError(errorsForJson(typedAdditional, """{"a":"x","extra":"nope"}"""),
      "Expected value to be a number")
  }

  test("present-null vs absent: a null property IS present (JSON semantics)") {
    val req = """{"type":"object","required":["schema1"]}"""
    // reference: has_key? is true for null values → required satisfied
    assertSuccess(errorsForJson(req, """{"schema1":null}"""))
    val typed = """{"type":"object","properties":{"schema1":{"type":"string"}}}"""
    // …but a present null fails the string type gate (validator.cr:348)
    assertError(errorsForJson(typed, """{"schema1":null}"""), "Expected value to be a string")
    assertSuccess(errorsForJson(typed, "{}")) // absent is fine
  }

  test("deeply nested path through dynamic objects (.person.identity.example)") {
    val schema =
      """{"type":"object","properties":{"person":{"type":"object","properties":{
         "identity":{"type":"object","properties":{
         "example":{"type":"string"}}}}}}}"""
    val errs = errorsForJson(schema, """{"person":{"identity":{"example":1}}}""")
    assertError(errs, "Expected value to be a string")
    assert(errs.head._2 == ".person.identity.example")
  }

  test("generic enum across mixed runtime types (generic_enum fixtures)") {
    val nums = """{"enum":[1,0.123]}"""
    assertSuccess(errorsForJson(nums, "1"))
    assertSuccess(errorsForJson(nums, "0.123"))
    assertError(errorsForJson(nums, "5"), "Expected value to be equal to the enum")
    assertError(errorsForJson(nums, "\"Test\""), "Expected value to be equal to the enum")
    assertError(errorsForJson(nums, """{"test":"testing"}"""), "Expected value to be equal to the enum")
    assertError(errorsForJson(nums, "[1,2,3]"), "Expected value to be equal to the enum")

    val mixed = """{"enum":["red", 5, true, null]}"""
    assertSuccess(errorsForJson(mixed, "\"red\""))
    assertSuccess(errorsForJson(mixed, "5"))
    assertSuccess(errorsForJson(mixed, "true"))
    assertSuccess(errorsForJson(mixed, "null"))
    assertError(errorsForJson(mixed, "\"blue\""), "Expected value to be equal to the enum")
  }

  test("const across runtime types (generic_const)") {
    val schema = """{"const":"testing"}"""
    assertSuccess(errorsForJson(schema, "\"testing\""))
    assertError(errorsForJson(schema, "5"), "Expected value to be testing")
    assertError(errorsForJson(schema, "\"purple\""), "Expected value to be testing")
  }

  test("composites over dynamic values") {
    val anyOf = """{"anyOf":[{"type":"string"},{"type":"number"}]}"""
    assertSuccess(errorsForJson(anyOf, "5"))
    assertSuccess(errorsForJson(anyOf, "\"five\""))
    assertError(errorsForJson(anyOf, "true"), "Expected value to match any of the schemas")

    val not = """{"not":[{"type":"string"}]}"""
    assertSuccess(errorsForJson(not, "5"))
    assertError(errorsForJson(not, "\"a string\""), "Expected value not to match any of the schemas")
  }

  test("dependentSchemas over dynamic objects (object_dependent_schemas)") {
    val schema =
      """{"type":"object","dependentSchemas":{"schema1":{"type":"object",
         "required":["schema2"],"properties":{"schema2":{"type":"number"}}}}}"""
    assertSuccess(errorsForJson(schema, """{"schema1":"a","schema2":10}"""))
    assertError(errorsForJson(schema, """{"schema1":"a"}"""),
      """Expected required property "schema2" to be set""")
    assertError(errorsForJson(schema, """{"schema1":"a","schema2":"oops"}"""),
      "Expected value to be a number")
    assertSuccess(errorsForJson(schema, """{"schema2":"oops"}"""))
  }

  test("contains with range limits over dynamic arrays") {
    val schema =
      """{"type":"array","contains":{"type":"integer","multipleOf":5},"minContains":3,"maxContains":5}"""
    assertSuccess(errorsForJson(schema, "[5,10,15]"))
    assertError(errorsForJson(schema, "[5,10]"),
      "Expected array to contain at least 3 matched items")
    assertError(errorsForJson(schema, "[5,10,15,20,25,30]"),
      "Expected array to contain at most 5 matched items")
  }

  test("patternProperties over runtime keys (object_pattern_properties, collapsed)") {
    val schema =
      """{"type":"object","patternProperties":{"String$":{"type":"string"},"Number$":{"type":"number"}}}"""
    assertSuccess(errorsForJson(schema, """{"aString":"x","bNumber":1.5}"""))
    assertError(errorsForJson(schema, """{"aString":42,"bNumber":1.5}"""),
      "Expected value to be a string")
  }
}
