package graft.compile

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType}

import graft.spec._

/** Dynamic-JSON compiler: spec → checks over a Spark 4 VARIANT column.
  *
  * This is the exact-parity mode: like the reference's `validate(JSON::Any)`
  * (/root/reference/src/validator.cr), type gates dispatch on the RUNTIME
  * type of each value (`schema_of_variant`), heterogeneous arrays and
  * dynamic object keys work, and JSON null is distinct from SQL null
  * (present-null vs absent — the distinction the typed-column mode cannot
  * express). All checks remain pure Catalyst expressions; recursion over
  * nested values happens at plan-build time via variant path extraction.
  *
  * Differences from the typed-column `Compiler` (documented):
  *  - patternProperties / additionalProperties over RUNTIME keys collapse to
  *    one check per keyword (offending keys ride in `observed`) instead of
  *    one check per schema column.
  *  - uniqueItems/enum deep-equality uses canonical `to_json` (object key
  *    order sensitivity is inherited from the serialization).
  */
object VariantCompiler {

  // -- runtime type gates ---------------------------------------------------

  private def tpe(v: Column): Column = schema_of_variant(v)
  private def isObj(v: Column): Column = v.isNotNull && tpe(v).startsWith("OBJECT")
  private def isArr(v: Column): Column = v.isNotNull && tpe(v).startsWith("ARRAY")
  private def isStr(v: Column): Column = v.isNotNull && tpe(v) === "STRING"
  private def isNum(v: Column): Column =
    v.isNotNull && tpe(v).rlike("^(BIGINT|INT|SMALLINT|TINYINT|DOUBLE|FLOAT|DECIMAL)")
  private def isBool(v: Column): Column = v.isNotNull && tpe(v) === "BOOLEAN"
  private def isJsonNull(v: Column): Column = v.isNotNull && is_variant_null(v)

  private def asStr(v: Column): Column = try_variant_get(v, "$", "string")
  private def asDbl(v: Column): Column = try_variant_get(v, "$", "double")
  private def asArr(v: Column): Column = try_variant_get(v, "$", "array<variant>")
  private def asMap(v: Column): Column = try_variant_get(v, "$", "map<string,variant>")

  /** Compile a spec against a variant column (root-value mode — the analog
    * of `validator.validate(node)`). */
  def compile(spec: Spec, v: Column): Vector[CompiledCheck] = {
    val cs = specChecks(spec, v, ".", ".", lit(true))
    val ids = cs.map(_.id)
    require(ids.distinct.size == ids.size, s"duplicate constraint ids: ${ids.diff(ids.distinct)}")
    cs.zipWithIndex.map { case (c, i) => c.copy(rank = i) }
  }

  /** Collapsed full-validity predicate (composites / array elements). */
  def pred(spec: Spec, v: Column): Column = spec match {
    case NullSpec => isJsonNull(v)
    case _ =>
      val checks = specChecks(spec, v, ".", ".", lit(true))
      if (checks.isEmpty) v.isNotNull && !is_variant_null(v)
      else checks.map(_.pass).reduce(_ && _)
  }

  private def gateFor(spec: Spec, v: Column): Option[(String, String, Column)] = spec match {
    case _: ObjSpec     => Some(("type:object", Messages.notObject, isObj(v)))
    case _: ArrSpec     => Some(("type:array", Messages.notArray, isArr(v)))
    case _: StrSpec     => Some(("type:string", Messages.notString, isStr(v)))
    case _: NumSpec     => Some(("type:number", Messages.notNumber, isNum(v)))
    case BoolSpec       => Some(("type:boolean", Messages.notBoolean, isBool(v)))
    case NullSpec       => None
    case _: GenericSpec => None
  }

  private def specChecks(spec: Spec, v: Column, path: String, idp: String,
                         present: Column): Vector[CompiledCheck] = {

    def mk(keyword: String, message: String, ok: Column, observed: Column,
           checkPath: String = path, id: String = null, pres: Column = present): CompiledCheck =
      CompiledCheck(
        id = if (id == null) s"$idp/$keyword" else id,
        path = if (checkPath == null) path else checkPath,
        keyword = keyword, message = message, rank = -1,
        pass = when(pres, coalesce(ok, lit(false))).otherwise(lit(true)),
        observed = observed.cast(StringType))

    spec match {
      case NullSpec =>
        Vector(mk("type:null", Messages.notNull, isJsonNull(v), to_json(v)))

      case g: GenericSpec => genericChecks(g, v, path, idp, present, mk)

      case s =>
        val Some((kw, msg, gateOk)) = gateFor(s, v): @unchecked
        val gate = mk(kw, msg, gateOk, to_json(v))
        val p = present && gateOk
        def mkp(keyword: String, message: String, ok: Column, observed: Column,
                checkPath: String = path, id: String = null): CompiledCheck =
          mk(keyword, message, ok, observed, checkPath, id, p)

        gate +: (s match {
          case o: ObjSpec  => objectChecks(o, v, path, idp, p, mkp)
          case a: ArrSpec  => arrayChecks(a, v, path, idp, p, mkp)
          case st: StrSpec => stringChecks(st, v, mkp)
          case n: NumSpec  => numberChecks(n, v, mkp)
          case BoolSpec    => Vector.empty
          case _           => Vector.empty
        })
    }
  }

  private type MkFn = (String, String, Column, Column, String, String) => CompiledCheck

  // -- object keywords over runtime keys ------------------------------------

  private def objectChecks(o: ObjSpec, v: Column, path: String, idp: String,
                           present: Column, mk: MkFn): Vector[CompiledCheck] = {
    val m = asMap(v)
    val keys = map_keys(m)
    def has(prop: String): Column = map_contains_key(m, prop)
    def valueOf(prop: String): Column = try_element_at(m, lit(prop))

    val requiredChecks = o.required.getOrElse(Vector.empty).map { prop =>
      mk(s"required:$prop", Messages.required(prop), has(prop),
         to_json(v), path, s"$idp/required:$prop")
    }

    val depRequiredChecks = o.dependentRequired.flatMap { case (dep, reqs) =>
      reqs.map { req =>
        mk(s"dependentRequired:$req:$dep", Messages.dependentRequired(req, dep),
           when(has(dep), has(req)).otherwise(lit(true)), to_json(v),
           path, s"$idp/dependentRequired($dep,$req)")
      }
    }

    val depSchemaChecks = o.dependentSchemas.flatMap { case (dep, sub) =>
      specChecks(sub, v, path, s"$idp~dep($dep)", present && has(dep))
    }

    // runtime key names validated as strings — collapsed to one check per
    // propertyNames keyword, offending keys in observed
    val propNameChecks = o.propertyNames.toVector.flatMap { ps =>
      strKeywordPredicates(ps).map { case (kw, msg, predFn) =>
        mk(s"propertyNames:$kw", msg,
           forall(keys, k => predFn(k)),
           to_json(filter(keys, k => !predFn(k))),
           path, s"$idp/propertyNames/$kw")
      }
    }

    val minPropChecks = o.minProperties.toVector.map(n =>
      mk("minProperties", Messages.minProperties(n), size(keys) >= n,
         size(keys).cast(StringType), path, null))
    val maxPropChecks = o.maxProperties.toVector.map(n =>
      mk("maxProperties", Messages.maxProperties(n), size(keys) <= n,
         size(keys).cast(StringType), path, null))

    val propChecks = o.properties.flatMap { case (prop, sub) =>
      val sv = valueOf(prop)
      specChecks(sub, sv, childPath(path, prop), childIdp(idp, prop),
                 present && has(prop))
    }

    val patternChecks = o.patternProperties.zipWithIndex.flatMap { case ((re, sub), j) =>
      val matching = filter(keys, k => k.rlike(re))
      Vector(mk(s"patternProperties[$j]", patternPropsMessage(sub),
        forall(matching, k => pred(sub, try_element_at(m, k))),
        to_json(filter(matching, k => !pred(sub, try_element_at(m, k)))),
        path, s"$idp/patternProperties[$j]"))
    }

    val declared = o.properties.map(_._1)
    val patternRes = o.patternProperties.map(_._1)
    def additionalKey(k: Column): Column = {
      val inDeclared = if (declared.isEmpty) lit(false) else k.isin(declared: _*)
      val inPattern = patternRes.foldLeft(lit(false))((acc, re) => acc || k.rlike(re))
      !inDeclared && !inPattern
    }
    val additionalKeys = filter(keys, additionalKey _)

    val additionalChecks =
      if (o.additionalDisabled)
        Vector(mk("additionalProperties", Messages.additionalProperties,
          size(additionalKeys) === 0, to_json(additionalKeys), path, null))
      else o.additionalProperties.toVector.map { sub =>
        mk("additionalProperties", patternPropsMessage(sub),
          forall(additionalKeys, k => pred(sub, try_element_at(m, k))),
          to_json(filter(additionalKeys, k => !pred(sub, try_element_at(m, k)))),
          path, null)
      }

    val enumChecks = enumCheck(o.enumList, v, path, idp, mk)
    val compChecks = compositeChecks(o.composites, v, path, idp, mk)

    (requiredChecks ++ depRequiredChecks ++ depSchemaChecks ++ propNameChecks ++
      minPropChecks ++ maxPropChecks ++ propChecks ++ patternChecks ++
      additionalChecks ++ enumChecks ++ compChecks).toVector
  }

  /** Single-check message for collapsed pattern/additional property checks. */
  private def patternPropsMessage(sub: Spec): String = {
    val cs = specChecks(sub, parse_json(lit("null")), ".", ".", lit(true))
    if (cs.size == 1) cs.head.message else "Expected property values to match schema"
  }

  // -- array keywords -------------------------------------------------------

  private def arrayChecks(a: ArrSpec, v: Column, path: String, idp: String,
                          present: Column, mk: MkFn): Vector[CompiledCheck] = {
    val arr = asArr(v)

    val itemsChecks = a.items.toVector.map { sub =>
      mk("items", itemsMessage(sub), forall(arr, e => pred(sub, e)),
         to_json(filter(arr, e => !pred(sub, e))), path, null)
    }

    val prefixChecks = a.prefixItems.zipWithIndex.map { case (sub, i) =>
      val el = element_at(arr, i + 1)
      mk(s"prefixItems[$i]", itemsMessage(sub),
         when(size(arr) > i, pred(sub, el)).otherwise(lit(true)),
         to_json(v), childIndexPath(path, i), s"$idp/prefixItems[$i]")
    }

    val tupleChecks =
      if (a.tupleClosed)
        Vector(mk("items:false", Messages.tupleLength(a.prefixItems.size),
          size(arr) <= a.prefixItems.size, size(arr).cast(StringType), path, null))
      else Vector.empty

    val containsChecks = a.contains.toVector.flatMap { sub =>
      val matched = size(filter(arr, e => pred(sub, e)))
      val minC = a.minContains.map(n => mk("minContains", Messages.minContains(n),
        matched >= n, matched.cast(StringType), path, null))
      val maxC = a.maxContains.map(n => mk("maxContains", Messages.maxContains(n),
        matched <= n, matched.cast(StringType), path, null))
      val bare = if (a.minContains.isEmpty && a.maxContains.isEmpty)
        Some(mk("contains", Messages.contains, exists(arr, e => pred(sub, e)),
          to_json(v), path, null))
      else None
      (minC ++ maxC ++ bare).toVector
    }

    val minItemsChecks = a.minItems.toVector.map(n =>
      mk("minItems", Messages.minItems(n), size(arr) >= n, size(arr).cast(StringType), path, null))
    val maxItemsChecks = a.maxItems.toVector.map(n =>
      mk("maxItems", Messages.maxItems(n), size(arr) <= n, size(arr).cast(StringType), path, null))

    val uniqueChecks =
      if (a.uniqueItems)
        Vector(mk("uniqueItems", Messages.uniqueItems,
          size(array_distinct(transform(arr, e => to_json(e)))) === size(arr),
          to_json(v), path, null))
      else Vector.empty

    val enumChecks = enumCheck(a.enumList, v, path, idp, mk)
    val compChecks = compositeChecks(a.composites, v, path, idp, mk)

    itemsChecks ++ prefixChecks ++ tupleChecks ++ containsChecks ++
      minItemsChecks ++ maxItemsChecks ++ uniqueChecks ++ enumChecks ++ compChecks
  }

  private def itemsMessage(sub: Spec): String = {
    val cs = specChecks(sub, parse_json(lit("null")), ".", ".", lit(true))
    if (cs.size == 1) cs.head.message else "Expected array items to match schema"
  }

  // -- string keywords ------------------------------------------------------

  /** (keyword, message, plain-string predicate) triples for a StrSpec —
    * shared by string checks and propertyNames key validation. */
  private def strKeywordPredicates(s: StrSpec): Vector[(String, String, Column => Column)] = {
    val minL = s.minLength.toVector.map(n =>
      ("minLength", Messages.minLength(n), (c: Column) => length(c) >= n))
    val maxL = s.maxLength.toVector.map(n =>
      ("maxLength", Messages.maxLength(n), (c: Column) => length(c) <= n))
    val pat = s.pattern.toVector.map(p =>
      ("pattern", Messages.pattern(p), (c: Column) => c.rlike(p)))
    val fmt = s.format.toVector.flatMap { name =>
      if (Formats.unsupported.contains(name))
        throw SpecError(s"""format "$name" is not implemented""")
      if (name == "regex")
        Vector(("format", Messages.format(name), (c: Column) => Formats.regexCompiles(c)))
      else Formats.regexFor(name).map(re =>
        ("format", Messages.format(name), (c: Column) => c.rlike(re))).toVector
    }
    val en = if (s.enumList.nonEmpty) {
      val strs = s.enumList.collect { case JStr(x) => x }
      Vector(("enum", Messages.enumMismatch,
        (c: Column) => if (strs.isEmpty) lit(false) else c.isin(strs: _*)))
    } else Vector.empty
    minL ++ maxL ++ pat ++ fmt ++ en
  }

  private def stringChecks(s: StrSpec, v: Column, mk: MkFn): Vector[CompiledCheck] = {
    val sv = asStr(v)
    strKeywordPredicates(s).map { case (kw, msg, p) =>
      mk(kw, msg, p(sv), sv, null, null)
    } ++ compositeChecksM(s.composites, v, mk)
  }

  // -- number keywords ------------------------------------------------------

  private def numberChecks(n: NumSpec, v: Column, mk: MkFn): Vector[CompiledCheck] = {
    val d = asDbl(v)
    val intChecks =
      if (n.integer)
        Vector(mk("type:integer", Messages.notInteger, d % 1 === 0, d.cast(StringType), null, null))
      else Vector.empty
    def cmp(kw: String, msg: String, ok: Column) = mk(kw, msg, ok, d.cast(StringType), null, null)
    val mins = n.minimum.toVector.map(b => cmp("minimum", Messages.minimum(b), d >= b.toDouble))
    val maxs = n.maximum.toVector.map(b => cmp("maximum", Messages.maximum(b), d <= b.toDouble))
    val emins = n.exclusiveMinimum.toVector.map(b =>
      cmp("exclusiveMinimum", Messages.exclusiveMinimum(b), d > b.toDouble))
    val emaxs = n.exclusiveMaximum.toVector.map(b =>
      cmp("exclusiveMaximum", Messages.exclusiveMaximum(b), d < b.toDouble))
    val mults = n.multipleOf.toVector.map(b =>
      cmp("multipleOf", Messages.multipleOf(b), d % b.toDouble === 0))
    val ens = if (n.enumList.nonEmpty) {
      val nums = n.enumList.collect { case x: JNum => x.toDouble }
      Vector(cmp("enum", Messages.enumMismatch,
        if (nums.isEmpty) lit(false) else d.isin(nums: _*)))
    } else Vector.empty
    intChecks ++ mins ++ maxs ++ emins ++ emaxs ++ mults ++ ens ++
      compositeChecksM(n.composites, v, mk)
  }

  // -- generic / enum / const / composites ----------------------------------

  private def genericChecks(g: GenericSpec, v: Column, path: String, idp: String,
                            present: Column, mk: (String, String, Column, Column, String, String, Column) => CompiledCheck): Vector[CompiledCheck] = {
    def mk6(kw: String, msg: String, ok: Column, obs: Column, p: String, id: String) =
      mk(kw, msg, ok, obs, p, id, present)
    enumCheck(g.enumList, v, path, idp, mk6) ++
      g.const.toVector.map { c =>
        mk6("const", Messages.constMismatch(constRender(c)), constOk(c, v), to_json(v), path, null)
      } ++ compositeChecks(g.composites, v, path, idp, mk6)
  }

  private def enumCheck(enumList: Vector[JsonVal], v: Column, path: String,
                        idp: String, mk: MkFn): Vector[CompiledCheck] =
    if (enumList.isEmpty) Vector.empty
    else Vector(mk("enum", Messages.enumMismatch, enumOk(enumList, v), to_json(v), path, null))

  /** Runtime deep-equality membership across the whole JSON type lattice. */
  private def enumOk(enumList: Vector[JsonVal], v: Column): Column = {
    val strs = enumList.collect { case JStr(s) => s }
    val nums = enumList.collect { case n: JNum => n.toDouble }
    val bools = enumList.collect { case JBool(b) => b }
    val hasNull = enumList.contains(JNull)
    val complex = enumList.collect {
      case a: JArr => a.render
      case o: JObj => o.render
    }
    val branches = Vector(
      if (strs.nonEmpty) Some(isStr(v) && asStr(v).isin(strs: _*)) else None,
      if (nums.nonEmpty) Some(isNum(v) && asDbl(v).isin(nums: _*)) else None,
      if (bools.nonEmpty) Some(isBool(v) && try_variant_get(v, "$", "boolean").isin(bools: _*)) else None,
      if (hasNull) Some(isJsonNull(v)) else None,
      if (complex.nonEmpty) Some((isArr(v) || isObj(v)) && to_json(v).isin(complex: _*)) else None
    ).flatten
    if (branches.isEmpty) lit(false) else branches.reduce(_ || _)
  }

  private def constOk(c: JsonVal, v: Column): Column = c match {
    case JStr(s)  => isStr(v) && asStr(v) === s
    case n: JNum  => isNum(v) && asDbl(v) === n.toDouble
    case JBool(b) => isBool(v) && try_variant_get(v, "$", "boolean") === b
    case JNull    => isJsonNull(v)
    case other    => to_json(v) === other.render
  }

  private def constRender(c: JsonVal): String = c match {
    case JStr(s) => s
    case other   => other.render
  }

  private def compositeChecks(composites: Vector[Composite], v: Column,
                              path: String, idp: String, mk: MkFn): Vector[CompiledCheck] =
    composites.map { c =>
      val preds = c.children.map(ch => coalesce(pred(ch, v), lit(false)))
      val ok =
        if (preds.isEmpty) lit(c.kind == "allOf" || c.kind == "not")
        else c.kind match {
          case "allOf" => preds.reduce(_ && _)
          case "anyOf" => preds.reduce(_ || _)
          case "oneOf" => preds.map(_.cast(IntegerType)).reduce(_ + _) === 1
          case "not"   => !preds.reduce(_ || _)
        }
      mk(c.kind, Messages.composite(c.kind), ok, to_json(v), path,
         if (idp == null) null else s"$idp/${c.kind}")
    }

  private def compositeChecksM(composites: Vector[Composite], v: Column,
                               mk: MkFn): Vector[CompiledCheck] =
    compositeChecks(composites, v, null, null, mk) // path/id filled by mk defaults

  private def childPath(parent: String, prop: String): String =
    if (parent == ".") s".$prop" else s"$parent.$prop"

  private def childIndexPath(parent: String, i: Int): String =
    if (parent == ".") s".[$i]" else s"$parent[$i]"

  private def childIdp(idp: String, prop: String): String =
    if (idp == ".") s".$prop" else s"$idp.$prop"
}
