package graft

import org.scalatest.funsuite.AnyFunSuite

/** VERDICT r4 #3 — static sweep of every DuckDB oracle for uncast integer
  * widening. DuckDB's `sum()` over integer inputs returns HUGEINT (int128);
  * Spark's returns BIGINT. The driver's type-aware hash therefore fails any
  * query whose OUTPUT column is produced by an uncast integer sum even when
  * every value matches (this shipped red twice: r3 p_mixture float-rounding,
  * r4 p_mixture/p_sessions integer width). Two layers now kill the class:
  * tools/oracle_compare.py compares DuckDB-reported types at Verify time
  * (runtime truth), and this spec is the JVM-side tripwire that fails the
  * build the moment a new uncast output sum is introduced — no DuckDB
  * needed, so it runs inside `sbt -batch test`.
  *
  * Rule: an uncast `sum(...)` (optionally windowed) that is DIRECTLY
  * aliased `AS x` where `x` is also an output column name of the query's
  * final top-level SELECT is a hazard, unless whitelisted with a reason.
  * Intermediate sums that are re-cast at their use site (`td::DOUBLE`) or
  * re-aliased downstream never propagate HUGEINT to the output and pass.
  */
class OracleLintSpec extends AnyFunSuite {

  /** (query, alias) pairs proven safe: DuckDB sum(DOUBLE) stays DOUBLE, so
    * double-input sums never widen. l_quantity / l_extendedprice /
    * l_discount are DOUBLE in the testdata parquet (and the runtime type
    * gate confirms the output column types match). */
  private val whitelist: Set[(String, String)] = Set(
    "q1_agg" -> "sum_qty",   // sum(l_quantity) — DOUBLE input
    "q1_agg" -> "revenue"    // sum(l_extendedprice * (1 - l_discount)) — DOUBLE input
  )

  private def matchParen(s: String, open: Int): Int = {
    var d = 0
    var j = open
    while (j < s.length) {
      s.charAt(j) match {
        case '(' => d += 1
        case ')' => d -= 1; if (d == 0) return j
        case _   =>
      }
      j += 1
    }
    -1
  }

  /** Aliases of sum(...)[ OVER (...)] sites with no immediate `::` cast. */
  private def uncastSumAliases(sql: String): Seq[(String, String)] = {
    val sumRe = """(?i)\bsum\s*\(""".r
    sumRe.findAllMatchIn(sql).toSeq.flatMap { m =>
      val close = matchParen(sql, m.end - 1)
      if (close < 0) Seq("<unbalanced>" -> sql.slice(m.start, m.start + 40))
      else {
        var rest = sql.substring(close + 1)
        val overRe = """(?is)^\s*OVER\s*\(""".r
        overRe.findFirstMatchIn(rest).foreach { w =>
          val wc = matchParen(rest, w.end - 1)
          rest = if (wc >= 0) rest.substring(wc + 1) else ""
        }
        if (rest.matches("(?s)^\\s*::.*")) Nil // cast — safe
        else {
          val aliasRe = """(?is)^\s*AS\s+([A-Za-z_][A-Za-z0-9_]*)""".r
          aliasRe.findFirstMatchIn(rest) match {
            case Some(a) => Seq(a.group(1).toLowerCase -> sql.slice(m.start, close + 1))
            case None    => Nil // consumed by arithmetic/comparison — the
                                // enclosing expression carries its own cast
                                // or never reaches the output (runtime gate
                                // verifies output types regardless)
          }
        }
      }
    }
  }

  /** Output column names of the final top-level SELECT. */
  private def finalOutputNames(sql: String): Set[String] = {
    // last SELECT at paren depth 0
    var d = 0
    var lastSel = -1
    val up = sql.toUpperCase
    var i = 0
    while (i < sql.length) {
      sql.charAt(i) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && up.startsWith("SELECT", i) &&
              (i == 0 || !Character.isLetterOrDigit(sql.charAt(i - 1))))
            lastSel = i
      }
      i += 1
    }
    require(lastSel >= 0, s"no top-level SELECT in: ${sql.take(80)}")
    // select list = up to FROM at depth 0 (or end)
    var j = lastSel + 6
    d = 0
    var fromAt = sql.length
    var done = false
    while (j < sql.length && !done) {
      sql.charAt(j) match {
        case '(' => d += 1
        case ')' => d -= 1
        case _ =>
          if (d == 0 && up.startsWith("FROM", j) &&
              !Character.isLetterOrDigit(sql.charAt(j - 1))) { fromAt = j; done = true }
      }
      j += 1
    }
    val list = sql.substring(lastSel + 6, fromAt).replaceFirst("(?is)^\\s*DISTINCT\\b", "")
    // split on depth-0 commas
    val items = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    d = 0
    list.foreach {
      case '(' => d += 1; cur += '('
      case ')' => d -= 1; cur += ')'
      case ',' if d == 0 => items += cur.result(); cur.clear()
      case c => cur += c
    }
    items += cur.result()
    items.map { it =>
      val aliasRe = """(?is).*\bAS\s+([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
      it.trim match {
        case aliasRe(a) => a.toLowerCase
        case bare =>
          // bare column ref (possibly qualified t.x) — take the last segment
          bare.split('.').last.trim.toLowerCase
      }
    }.toSet
  }

  test("no oracle output column is produced by an uncast integer-widening sum") {
    val hazards = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap { case (name, sql) =>
      val outs = finalOutputNames(sql)
      uncastSumAliases(sql).collect {
        // unparseable SQL (unbalanced parens after a sum) must FAIL the
        // lint, not silently skip — the lint degrading to a no-op exactly
        // when the SQL is broken would defeat the tripwire
        case ("<unbalanced>", site) =>
          s"$name: sum( with no matching close paren — oracle SQL is " +
            s"malformed near: $site"
        case (alias, site)
            if outs.contains(alias) && !whitelist.contains(name -> alias) =>
          s"$name: uncast sum aliased '$alias' reaches the output — DuckDB " +
            s"widens to HUGEINT, the driver hash will fail. Cast it " +
            s"(`(…)::BIGINT AS $alias`) or whitelist with a reason. Site: $site"
      }
    }
    assert(hazards.isEmpty, hazards.mkString("\n"))
  }

  test("the lint itself catches the r4 bug class (regression fixture)") {
    val r4Mixture =
      """WITH pk AS (SELECT source, sum(tok) AS tokens FROM d GROUP BY source)
         SELECT source, tokens FROM pk ORDER BY source"""
    val r4Sessions =
      """WITH s AS (SELECT u, sum(CASE WHEN g THEN 1 ELSE 0 END)
                      OVER (PARTITION BY u ORDER BY t) AS session_idx FROM o)
         SELECT u, session_idx, count(*) AS events FROM s GROUP BY u, session_idx"""
    assert(uncastSumAliases(r4Mixture).map(_._1) == Seq("tokens"))
    assert(finalOutputNames(r4Mixture).contains("tokens"))
    assert(uncastSumAliases(r4Sessions).map(_._1) == Seq("session_idx"))
    assert(finalOutputNames(r4Sessions).contains("session_idx"))
    // and the fixed forms pass
    val fixed = r4Mixture.replace("sum(tok) AS", "sum(tok)::BIGINT AS")
    assert(uncastSumAliases(fixed).isEmpty)
  }
}
