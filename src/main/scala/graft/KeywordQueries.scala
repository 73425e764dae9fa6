package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.compile.Messages
import graft.run.Validator
import graft.spec.SpecParser

/** Per-keyword driver-oracle battery (VERDICT r1 "Next round" #1).
  *
  * The reference's whole value is its keyword-by-keyword spec suite
  * (/root/reference/spec/object_validator_spec.cr, array_validator_spec.cr,
  * generic_validator_spec.cr); round 1 pinned most keywords only by the
  * engine's OWN tests. These queries put every keyword family through the
  * independent DuckDB gate:
  *
  *  - Each query builds a deterministic JSON document per events row from
  *    `event_id mod K` (a when-chain of LITERAL fixtures — one shape per
  *    residue class, exercising pass AND fail for each keyword), runs the
  *    full dynamic-JSON validator (`Validator.validateJson` →
  *    VariantCompiler), and emits ordered violation rows.
  *  - The oracle never runs a validator: it independently enumerates the
  *    expected (doc_id, constraint_id, path, observed, message) rows per
  *    residue class straight from the fixture design. A disagreement in ANY
  *    gate, guard, observed rendering, or message text breaks the hash.
  *
  * Fixture keys are alphabetical so `to_json(variant)` field order (the
  * variant builder sorts object keys) matches the authored literal.
  */
object KeywordQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/events.parquet")

  /** json column = fixtures(event_id mod fixtures.size). */
  private def jsonFor(fixtures: Seq[String]): Column = {
    val m = pmod(col("event_id"), lit(fixtures.size))
    fixtures.zipWithIndex.tail.foldLeft(when(m === 0, lit(fixtures.head))) {
      case (acc, (fx, i)) => acc.when(m === i, lit(fx))
    }
  }

  private def run(s: SparkSession, dir: String, spec: String,
                  fixtures: Seq[String]): DataFrame =
    Validator.validateJson(
        events(s, dir).select(col("event_id"), jsonFor(fixtures).as("json")),
        SpecParser.parse(spec), "json", docId = "event_id", part = None)
      .violations.drop("rank").drop("part")
      // repartition(1)+local sort, NOT orderBy: a global sort's range
      // sampling executes the whole validation plan twice; the violation
      // set is small, so one exchange + single-task sort halves the query
      .repartition(1).sortWithinPartitions("doc_id", "constraint_id")

  /** One UNION ALL arm of an oracle: all rows of residue class `m` violate
    * `cid` at `path` with the given observed/message literals. */
  private def arm(k: Int, m: Int, cid: String, path: String,
                  observed: String, message: String): String = {
    def q(s: String) = if (s == null) "CAST(NULL AS VARCHAR)"
                       else "'" + s.replace("'", "''") + "'"
    s"""SELECT event_id, ${q(cid)} AS constraint_id, ${q(path)} AS path,
               ${q(observed)} AS observed, ${q(message)} AS message
        FROM events WHERE event_id % $k = $m"""
  }

  private def oracle(k: Int, arms: Seq[(Int, String, String, String, String)]): String =
    s"""SELECT event_id AS doc_id, constraint_id, path, observed, message FROM (
        ${arms.map { case (m, cid, p, o, msg) => arm(k, m, cid, p, o, msg) }
          .mkString("\n UNION ALL\n")}
        ) ORDER BY doc_id, constraint_id"""

  // -- object keywords: required / dependentRequired / dependentSchemas /
  //    minProperties / maxProperties ----------------------------------------

  private val object1Spec =
    """{"type":"object",
       "required":["a"],
       "dependentRequired":{"b":["c"]},
       "dependentSchemas":{"d":{"type":"object","required":["e"]}},
       "minProperties":2,"maxProperties":4,
       "properties":{"a":{"type":"integer","minimum":0}}}"""

  private val object1Fixtures = Seq(
    """{"a":1,"x":2}""",                          // 0: pass
    """{"x":1,"y":2}""",                          // 1: required:a
    """{"a":1,"b":2}""",                          // 2: dependentRequired c-of-b
    """{"a":1,"b":2,"c":3}""",                    // 3: pass
    """{"a":1,"d":4}""",                          // 4: dependentSchemas → required:e
    """{"a":1,"d":4,"e":5}""",                    // 5: pass
    """{"a":1}""",                                // 6: minProperties
    """{"a":-1,"b":1,"c":2,"d":3,"e":4}""")       // 7: maxProperties + .a/minimum

  private val object1Oracle = oracle(8, Seq(
    (1, "./required:a", ".", """{"x":1,"y":2}""", Messages.required("a")),
    (2, "./dependentRequired(b,c)", ".", """{"a":1,"b":2}""",
      Messages.dependentRequired("c", "b")),
    (4, ".~dep(d)/required:e", ".", """{"a":1,"d":4}""", Messages.required("e")),
    (6, "./minProperties", ".", "1", Messages.minProperties(2)),
    (7, "./maxProperties", ".", "5", Messages.maxProperties(4)),
    (7, ".a/minimum", ".a", "-1.0", Messages.minimum(0))))

  // -- object keywords over runtime keys: propertyNames / patternProperties /
  //    additionalProperties(schema) + property type gate ---------------------

  private val object2Spec =
    """{"type":"object",
       "propertyNames":{"maxLength":3},
       "patternProperties":{"^n_":{"type":"number","minimum":0}},
       "properties":{"id":{"type":"integer"}},
       "additionalProperties":{"type":"string"}}"""

  private val object2Fixtures = Seq(
    """{"id":1,"n_a":5,"s":"ok"}""",              // 0: pass
    """{"id":1,"n_a":-2}""",                      // 1: patternProperties value fails
    """{"id":1,"s":7}""",                         // 2: additionalProperties value fails
    """{"id":1,"longname":"x"}""",                // 3: propertyNames maxLength
    """{"id":"x"}""",                             // 4: .id type gate
    """{}""")                                     // 5: pass (empty object)

  private val object2Oracle = oracle(6, Seq(
    (1, "./patternProperties[0]", ".", """["n_a"]""",
      "Expected property values to match schema"),
    (2, "./additionalProperties", ".", """["s"]""", Messages.notString),
    (3, "./propertyNames/maxLength", ".", """["longname"]""", Messages.maxLength(3)),
    (4, ".id/type:number", ".id", "\"x\"", Messages.notNumber)))

  // -- array keywords --------------------------------------------------------

  private val arraySpec =
    """{"type":"object","properties":{
        "xs":{"type":"array","items":{"type":"integer","minimum":0},
              "minItems":1,"maxItems":4,"uniqueItems":true},
        "tup":{"type":"array","prefixItems":[{"type":"integer"},{"type":"string"}],
               "items":false},
        "cs":{"type":"array","contains":{"type":"string"},
              "minContains":1,"maxContains":2},
        "bc":{"type":"array","contains":{"type":"number"}}}}"""

  private val arrayFixtures = Seq(
    """{"cs":["a"],"tup":[1,"x"],"xs":[1,2]}""",  // 0: pass
    """{"xs":[]}""",                              // 1: minItems
    """{"xs":[1,2,3,4,5]}""",                     // 2: maxItems
    """{"xs":[1,1]}""",                           // 3: uniqueItems
    """{"xs":[1,-2]}""",                          // 4: items (element fails)
    """{"tup":[1,2]}""",                          // 5: prefixItems[1]
    """{"tup":[1,"x","extra"]}""",                // 6: items:false tuple close
    """{"cs":[1,2]}""",                           // 7: minContains
    """{"cs":["a","b","c"]}""",                   // 8: maxContains
    """{"bc":[true]}""",                          // 9: bare contains
    """{"xs":5}""")                               // 10: type:array gate

  private val arrayOracle = oracle(11, Seq(
    (10, ".xs/type:array", ".xs", "5", Messages.notArray),
    (1, ".xs/minItems", ".xs", "0", Messages.minItems(1)),
    (2, ".xs/maxItems", ".xs", "5", Messages.maxItems(4)),
    (3, ".xs/uniqueItems", ".xs", "[1,1]", Messages.uniqueItems),
    (4, ".xs/items", ".xs", "[-2]", "Expected array items to match schema"),
    (5, ".tup/prefixItems[1]", ".tup[1]", "[1,2]", Messages.notString),
    (6, ".tup/items:false", ".tup", "3", Messages.tupleLength(2)),
    (7, ".cs/minContains", ".cs", "0", Messages.minContains(1)),
    (8, ".cs/maxContains", ".cs", "3", Messages.maxContains(2)),
    (9, ".bc/contains", ".bc", "[true]", Messages.contains)))

  // -- number/string keywords ------------------------------------------------

  private val numstrSpec =
    """{"type":"object","properties":{
        "n":{"type":"number","exclusiveMinimum":0,"exclusiveMaximum":100,"multipleOf":0.5},
        "s":{"type":"string","minLength":2,"maxLength":5,"pattern":"^[a-z]+$"},
        "u":{"type":"string","format":"uuid"},
        "c":{"const":"fixed"},
        "e":{"enum":[1,"two",true]}}}"""

  private val numstrFixtures = Seq(
    """{"c":"fixed","e":"two","n":2.5,"s":"abc","u":"123e4567-e89b-12d3-a456-426614174000"}""",
    """{"n":0}""",                                // 1: exclusiveMinimum
    """{"n":150}""",                              // 2: exclusiveMaximum
    """{"n":0.3}""",                              // 3: multipleOf
    """{"s":"a"}""",                              // 4: minLength
    """{"s":"abcdef"}""",                         // 5: maxLength
    """{"s":"ABC"}""",                            // 6: pattern
    """{"u":"nope"}""",                           // 7: format
    """{"c":"other"}""",                          // 8: const
    """{"e":2}""",                                // 9: enum
    """{"s":7}""",                                // 10: type:string gate
    """{"n":"x"}""",                              // 11: type:number gate
    // 12: UPPERCASE-hex uuid passes (mutation-found hole: a case-tightened
    // uuid regex shipped green until this row — a wrong rejection here adds
    // a violation row the oracle does not enumerate, breaking the compare)
    """{"u":"123E4567-E89B-12D3-A456-426614174000"}""")

  private val numstrOracle = oracle(13, Seq(
    (10, ".s/type:string", ".s", "7", Messages.notString),
    (11, ".n/type:number", ".n", "\"x\"", Messages.notNumber),
    (1, ".n/exclusiveMinimum", ".n", "0.0", Messages.exclusiveMinimum(0)),
    (2, ".n/exclusiveMaximum", ".n", "150.0", Messages.exclusiveMaximum(100)),
    (3, ".n/multipleOf", ".n", "0.3", Messages.multipleOf(BigDecimal("0.5"))),
    (4, ".s/minLength", ".s", "a", Messages.minLength(2)),
    (5, ".s/maxLength", ".s", "abcdef", Messages.maxLength(5)),
    (6, ".s/pattern", ".s", "ABC", Messages.pattern("^[a-z]+$")),
    (7, ".u/format", ".u", "nope", Messages.format("uuid")),
    (8, ".c/const", ".c", "\"other\"", Messages.constMismatch("fixed")),
    (9, ".e/enum", ".e", "2", Messages.enumMismatch)))

  // -- the full format table (VERDICT r2 #5) ---------------------------------
  // The reference ships 12 format predicates (format.cr:3-31); r2 pinned
  // only uuid through the driver gate (numstr battery). One property per
  // remaining format: fixture 0 passes ALL of them (a regex that wrongly
  // rejects a valid value breaks the hash), each other residue fails
  // exactly one.

  private val formatsSpec =
    """{"type":"object","properties":{
        "d":{"type":"string","format":"date"},
        "dt":{"type":"string","format":"date-time"},
        "du":{"type":"string","format":"duration"},
        "em":{"type":"string","format":"email"},
        "hn":{"type":"string","format":"hostname"},
        "i4":{"type":"string","format":"ipv4"},
        "i6":{"type":"string","format":"ipv6"},
        "jp":{"type":"string","format":"json-pointer"},
        "rjp":{"type":"string","format":"relative-json-pointer"},
        "t":{"type":"string","format":"time"},
        "ur":{"type":"string","format":"uri"}}}"""

  private val formatsFixtures = Seq(
    """{"d":"2023-04-05","dt":"2023-04-05T10:20:30Z","du":"P3Y6M4DT12H30M5S","em":"a.b@example.com","hn":"example.com","i4":"192.168.0.1","i6":"2001:db8::1","jp":"/a/b~1c","rjp":"0#","t":"10:20:30","ur":"https://example.com/x"}""",
    """{"dt":"2023-13-05T10:20:30Z"}""",           // 1: month 13
    """{"d":"04/05/2023"}""",                      // 2: wrong separator
    """{"t":"25:00:00"}""",                        // 3: hour 25
    """{"du":"P"}""",                              // 4: empty duration
    """{"em":"not-an-email"}""",                   // 5: no @
    """{"hn":"-bad.example.com"}""",               // 6: leading hyphen
    """{"i4":"256.1.1.1"}""",                      // 7: octet 256
    """{"i6":"2001:::1"}""",                       // 8: triple colon
    """{"jp":"bad"}""",                            // 9: no leading slash
    """{"rjp":"x/foo"}""",                         // 10: no leading digits
    """{"ur":"not a uri"}""",                      // 11: no scheme
    // 12: case-boundary VALID values pass — lowercase t/z date-time,
    // uppercase email/hostname, uppercase-hex ipv6, uppercase scheme
    // (same mutation-found hole class as the numstr uppercase uuid)
    """{"dt":"2023-04-05t10:20:30z","em":"A.B@EXAMPLE.COM","hn":"EXAMPLE.COM","i6":"2001:DB8::1","ur":"HTTPS://example.com/x"}""")

  private val formatsOracle = oracle(13, Seq(
    (1, ".dt/format", ".dt", "2023-13-05T10:20:30Z", Messages.format("date-time")),
    (2, ".d/format", ".d", "04/05/2023", Messages.format("date")),
    (3, ".t/format", ".t", "25:00:00", Messages.format("time")),
    (4, ".du/format", ".du", "P", Messages.format("duration")),
    (5, ".em/format", ".em", "not-an-email", Messages.format("email")),
    (6, ".hn/format", ".hn", "-bad.example.com", Messages.format("hostname")),
    (7, ".i4/format", ".i4", "256.1.1.1", Messages.format("ipv4")),
    (8, ".i6/format", ".i6", "2001:::1", Messages.format("ipv6")),
    (9, ".jp/format", ".jp", "bad", Messages.format("json-pointer")),
    (10, ".rjp/format", ".rjp", "x/foo", Messages.format("relative-json-pointer")),
    (11, ".ur/format", ".ur", "not a uri", Messages.format("uri"))))

  // -- format:"regex" — validity is "compiles as a regex", which no regex
  //    can itself express: the compilers' ONE UDF path (Formats.regexCompiles,
  //    opt-in per spec). The oracle cannot try-compile either — instead the
  //    FIXTURES fix which strings are valid (generator-contract oracle, like
  //    p_image_meta), so the UDF must agree with Pattern.compile to MATCH. --

  private val formatRegexSpec =
    """{"type":"object","properties":{"r":{"type":"string","format":"regex"}}}"""

  private val formatRegexFixtures = Seq(
    """{"r":"^a+b$"}""",       // 0: pass
    """{"r":"a["}""",          // 1: unclosed character class
    """{"r":"(unclosed"}""",   // 2: unclosed group
    """{"r":"[a-z]{2,3}"}""",  // 3: pass
    """{"r":"*abc"}""",        // 4: dangling quantifier
    """{"r":"x\\d+"}""")       // 5: pass (JSON-escaped backslash → x\d+)

  private val formatRegexOracle = oracle(6, Seq(
    (1, ".r/format", ".r", "a[", Messages.format("regex")),
    (2, ".r/format", ".r", "(unclosed", Messages.format("regex")),
    (4, ".r/format", ".r", "*abc", Messages.format("regex"))))

  // -- composites + null/boolean type gates ----------------------------------

  private val genericSpec =
    """{"type":"object","properties":{
        "ao":{"allOf":[{"type":"number","minimum":10},{"type":"number","maximum":20}]},
        "any":{"anyOf":[{"type":"string"},{"type":"number"}]},
        "oo":{"oneOf":[{"type":"integer","multipleOf":5},{"type":"integer","multipleOf":3}]},
        "no":{"not":[{"type":"string"}]},
        "nl":{"type":"null"},
        "bl":{"type":"boolean"},
        "ce":{"enum":[[1,2],[3,4]]}}}"""

  private val genericFixtures = Seq(
    """{"any":5,"ao":15,"bl":true,"nl":null,"no":7,"oo":10}""", // 0: pass
    """{"ao":25}""",                              // 1: allOf
    """{"any":true}""",                           // 2: anyOf
    """{"oo":15}""",                              // 3: oneOf (both match)
    """{"oo":7}""",                               // 4: oneOf (none match)
    """{"no":"str"}""",                           // 5: not
    """{"nl":5}""",                               // 6: type:null
    """{"bl":"x"}""",                             // 7: type:boolean
    """5""",                                      // 8: root type:object gate
    """{"ce":[1,2]}""",                           // 9: complex enum pass
    """{"ce":[9]}""")                             // 10: complex enum fail

  private val genericOracle = oracle(11, Seq(
    (8, "./type:object", ".", "5", Messages.notObject),
    (10, ".ce/enum", ".ce", "[9]", Messages.enumMismatch),
    (1, ".ao/allOf", ".ao", "25", Messages.allOf),
    (2, ".any/anyOf", ".any", "true", Messages.anyOf),
    (3, ".oo/oneOf", ".oo", "15", Messages.oneOf),
    (4, ".oo/oneOf", ".oo", "7", Messages.oneOf),
    (5, ".no/not", ".no", "\"str\"", Messages.not),
    (6, ".nl/type:null", ".nl", "5", Messages.notNull),
    (7, ".bl/type:boolean", ".bl", "\"x\"", Messages.notBoolean)))

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "v_kw_object" -> ((s, dir) => run(s, dir, object1Spec, object1Fixtures)),
    "v_kw_object_runtime" -> ((s, dir) => run(s, dir, object2Spec, object2Fixtures)),
    "v_kw_array" -> ((s, dir) => run(s, dir, arraySpec, arrayFixtures)),
    "v_kw_numstr" -> ((s, dir) => run(s, dir, numstrSpec, numstrFixtures)),
    "v_kw_formats" -> ((s, dir) => run(s, dir, formatsSpec, formatsFixtures)),
    "v_kw_format_regex" -> ((s, dir) => run(s, dir, formatRegexSpec, formatRegexFixtures)),
    "v_kw_generic" -> ((s, dir) => run(s, dir, genericSpec, genericFixtures)))

  val oracles: Map[String, String] = Map(
    "v_kw_object" -> object1Oracle,
    "v_kw_object_runtime" -> object2Oracle,
    "v_kw_array" -> arrayOracle,
    "v_kw_numstr" -> numstrOracle,
    "v_kw_formats" -> formatsOracle,
    "v_kw_format_regex" -> formatRegexOracle,
    "v_kw_generic" -> genericOracle)
}
