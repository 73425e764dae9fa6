package graft

import org.scalatest.funsuite.AnyFunSuite

import Harness._

/** Mirrors /root/reference/spec/generic_validator_spec.cr and the composite
  * semantics of validator.cr:496-531. */
class GenericValidatorSpec extends AnyFunSuite {

  test("generic enum with numbers (generic_enum_numbers fixture)") {
    val schema = """{"enum":[1,0.123]}"""
    assertSuccess(errorsForValue(schema, "1"))
    assertSuccess(errorsForValue(schema, "cast(0.123 as double)"))
    assertError(errorsForValue(schema, "5"), "Expected value to be equal to the enum")
    assertError(errorsForValue(schema, "'Test'"), "Expected value to be equal to the enum")
    assertError(errorsForValue(schema, "array(1,2,3)"), "Expected value to be equal to the enum")
  }

  test("generic enum with strings; error carries root context") {
    val schema = """{"enum":["red","yellow","blue"]}"""
    assertSuccess(errorsForValue(schema, "'red'"))
    val errs = errorsForValue(schema, "5")
    assertError(errs, "Expected value to be equal to the enum")
    assert(errs.head._2 == ".")
    assertError(errorsForValue(schema, "'purple'"), "Expected value to be equal to the enum")
  }

  test("const (generic_const fixture): unquoted string interpolation in message") {
    val schema = """{"const":"testing"}"""
    assertSuccess(errorsForValue(schema, "'testing'"))
    assertError(errorsForValue(schema, "5"), "Expected value to be testing")
    assertError(errorsForValue(schema, "'purple'"), "Expected value to be testing")
  }

  test("enum/const over fractional-typed arrays render by COLUMN type (1 matches [1.0,2.5])") {
    // a double-array column renders whole numbers as "1.0" in to_json; the
    // driver-side literal must render the same way or equality never holds
    val enumSchema = """{"type":"array","enum":[[1,2.5],[3,4]]}"""
    assertSuccess(errorsForValue(enumSchema, "array(cast(1 as double), cast(2.5 as double))"))
    assertError(errorsForValue(enumSchema, "array(cast(9 as double), cast(9 as double))"),
      "Expected value to be equal to the enum")
    val constSchema = """{"const":[1,2]}"""
    assertSuccess(errorsForValue(constSchema, "array(cast(1 as double), cast(2 as double))"))
    assertSuccess(errorsForValue(constSchema, "array(1, 2)"))
    assertError(errorsForValue(constSchema, "array(cast(1.5 as double))"),
      "Expected value to be [1,2]")
  }

  test("allOf collapses to a single error (validator.cr:510-514)") {
    val schema = """{"allOf":[{"type":"number","minimum":10},{"type":"number","maximum":20}]}"""
    assertSuccess(errorsForValue(schema, "15"))
    assertError(errorsForValue(schema, "25"), "Expected value to match all schemas")
  }

  test("anyOf") {
    val schema = """{"anyOf":[{"type":"string"},{"type":"number"}]}"""
    assertSuccess(errorsForValue(schema, "5"))
    assertSuccess(errorsForValue(schema, "'five'"))
    assertError(errorsForValue(schema, "true"), "Expected value to match any of the schemas")
  }

  test("oneOf: exactly one child must match") {
    val schema = """{"oneOf":[{"type":"integer","multipleOf":5},{"type":"integer","multipleOf":3}]}"""
    assertSuccess(errorsForValue(schema, "10"))
    assertSuccess(errorsForValue(schema, "9"))
    assertError(errorsForValue(schema, "15"), "Expected value to match only one of the schemas")
    assertError(errorsForValue(schema, "7"), "Expected value to match only one of the schemas")
  }

  test("not: all children must be invalid (varargs, validator.cr:523-526)") {
    val schema = """{"not":[{"type":"string"}]}"""
    assertSuccess(errorsForValue(schema, "5"))
    assertError(errorsForValue(schema, "'a string'"), "Expected value not to match any of the schemas")
  }

  test("composites evaluate after typed keywords, appended last (validator.cr:536-544)") {
    val schema = """{"type":"number","minimum":10,"anyOf":[{"type":"integer","multipleOf":2}]}"""
    assertErrors(errorsForValue(schema, "cast(5.5 as double)"), Vector(
      "Expected numeric value be greater than or equal to 10",
      "Expected value to match any of the schemas"))
  }
}
