package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract wiring guards. `SparkEntry.queries`/`oracleSql` are
  * built by `++` over per-operator maps, where a duplicate key would
  * SILENTLY drop a query (Scala Map last-wins — the round-2 q15b_pivot
  * near-miss). These checks make that loud. */
class ContractSpec extends AnyFunSuite {

  private val queryMaps = Seq(
    "Relational" -> operators.Relational.queries,
    "SemiStructured" -> operators.SemiStructured.queries,
    "TextOps" -> operators.TextOps.queries,
    "Dedup" -> operators.Dedup.queries,
    "Similarity" -> operators.Similarity.queries,
    "Exemplars" -> functions.Exemplars.queries,
    "Multimodal" -> operators.Multimodal.queries,
    "AsofJoin" -> operators.AsofJoin.queries,
    "RangeJoin" -> operators.RangeJoin.queries,
    "Sampling" -> operators.Sampling.queries,
    "Stats" -> operators.Stats.queries,
    "TimeSeries" -> operators.TimeSeries.queries,
    "CorpusPrep" -> operators.CorpusPrep.queries,
    "Behavioral" -> operators.Behavioral.queries,
    "Graph" -> operators.Graph.queries,
    "Quality" -> operators.Quality.queries,
    "ZOrder" -> operators.ZOrder.queries)

  private val oracleMaps = Seq(
    "Relational" -> operators.Relational.oracle,
    "SemiStructured" -> operators.SemiStructured.oracle,
    "TextOps" -> operators.TextOps.oracle,
    "Exemplars" -> functions.Exemplars.oracle,
    "AsofJoin" -> operators.AsofJoin.oracle,
    "RangeJoin" -> operators.RangeJoin.oracle,
    "Dedup" -> operators.Dedup.oracle,
    "Multimodal" -> operators.Multimodal.oracle,
    "Sampling" -> operators.Sampling.oracle,
    "Similarity" -> operators.Similarity.oracle,
    "Stats" -> operators.Stats.oracle,
    "TimeSeries" -> operators.TimeSeries.oracle,
    "CorpusPrep" -> operators.CorpusPrep.oracle,
    "Behavioral" -> operators.Behavioral.oracle,
    "Graph" -> operators.Graph.oracle,
    "Quality" -> operators.Quality.oracle,
    "ZOrder" -> operators.ZOrder.oracle)

  test("no query key collides across operator maps (++ is last-wins)") {
    val all = queryMaps.flatMap { case (n, m) => m.keys.map(_ -> n) }
    val dups = all.groupBy(_._1).filter(_._2.length > 1)
    assert(dups.isEmpty, s"colliding query keys: $dups")
    assert(SparkEntry.queries.size == all.length)
  }

  test("no oracle key collides across operator maps") {
    val all = oracleMaps.flatMap { case (n, m) => m.keys.map(_ -> n) }
    val dups = all.groupBy(_._1).filter(_._2.length > 1)
    assert(dups.isEmpty, s"colliding oracle keys: $dups")
    assert(SparkEntry.oracleSql.size == all.length)
  }

  test("every oracle key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("oracle coverage census (ratchet: only goes up)") {
    val gated = SparkEntry.oracleSql.keySet.size
    val total = SparkEntry.queries.size
    assert(gated >= 164, s"oracle-gated regressed: $gated")
    assert(total >= 175, s"query count regressed: $total")
  }

  test("README's coverage claim equals the shipped surface (single " +
      "source of truth — the prose number may not drift, advice r4/r5)") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), "UTF-8")
    val m = """(\d+) oracle-gated queries \(of (\d+) total\)""".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README no longer states the coverage census"))
    assert(m.group(1).toInt == SparkEntry.oracleSql.size,
      s"README says ${m.group(1)} gated, code has ${SparkEntry.oracleSql.size}")
    assert(m.group(2).toInt == SparkEntry.queries.size,
      s"README says ${m.group(2)} total, code has ${SparkEntry.queries.size}")
  }

  test("every queries key is documented in SURVEY.md (round-3 verdict: " +
      "the shipped surface and the coverage map must not drift)") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val undocumented = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(undocumented.isEmpty,
      s"queries missing from SURVEY.md: ${undocumented.toSeq.sorted}")
  }

  test("oracle SQL contains no un-cast SUM outside a CAST (D6 guard)") {
    // every SUM( in an oracle must be inside CAST(SUM(...) AS ...) or a
    // window/CASE whose outer projection casts — approximate by
    // requiring the literal substring "CAST(SUM" for each "SUM(" usage
    // unless the query opts out (quantile/list aggregates are not SUM).
    // q206 is the documented exception: its nine power sums MUST stay
    // un-cast in the CTE — the HUGEINT intermediates are the exactness
    // (CAST(... AS BIGINT) would overflow at sf0.1: cents² · 6·10⁵
    // rows ≈ 6·10¹⁹), and every path to the output goes through
    // CAST(... AS DOUBLE) in the finale, so no widened type ever
    // reaches the hash gate.
    val exempt = Set("q206_feature_corr")
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      if (!exempt(name)) {
        val sums = "SUM\\(".r.findAllIn(sql).length
        val casted = "CAST\\(SUM\\(".r.findAllIn(sql).length
        assert(sums == casted,
          s"$name: $sums SUM( vs $casted CAST(SUM( — DuckDB widens " +
            "un-cast SUMs to HUGEINT/DECIMAL(38,x), failing the hash gate")
      }
    }
  }

  test("no oracle SUMs a raw DOUBLE fixture column (D2 guard — " +
      "round-13 verdict: q286 summed o_totalprice raw, an IEEE-order-" +
      "dependent value that only coincidentally hash-matched)") {
    // The fixture's fractional DOUBLE columns (FIXTURES.md). Summing one
    // raw is summation-order-dependent; the argument must decimalize
    // (CAST ... AS DECIMAL) or integerize (CAST ... AS BIGINT, e.g.
    // floor(x*100+0.5) cents) BEFORE the SUM. `l_quantity`/`ps_supplycost`
    // are integer-valued doubles on this fixture (FixtureGuardSpec), so
    // they are exempt by omission.
    // Advice r14 hardening: scan case-INsensitively (a lowercase
    // sum(...) used to evade the lint) and require the DECIMAL/BIGINT
    // cast to syntactically ENCLOSE the hazardous column reference —
    // mere co-occurrence (SUM(o_totalprice * CAST(x AS BIGINT))) no
    // longer passes.
    val hazardous =
      "(?i)\\b(o_totalprice|l_extendedprice|l_discount|l_tax|c_acctbal|s_acctbal)\\b".r
    // Balanced-paren spans of `fn(` occurrences (case-insensitive,
    // word-boundary-anchored); returns (argStart, argEnd) exclusive.
    def fnArgSpans(sql: String, fn: String): Seq[(Int, Int)] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
      val pat = ("(?i)\\b" + fn + "\\(").r
      for (m <- pat.findAllMatchIn(sql)) {
        var depth = 1
        var j = m.end
        val start = m.end
        while (j < sql.length && depth > 0) {
          sql.charAt(j) match {
            case '(' => depth += 1
            case ')' => depth -= 1
            case _ =>
          }
          j += 1
        }
        if (depth == 0) out += ((start, j - 1))
      }
      out.toSeq
    }
    // True iff position `pos` (absolute in sql) sits inside some
    // CAST(... AS DECIMAL/BIGINT ...) span.
    def insideSafeCast(sql: String, pos: Int): Boolean =
      fnArgSpans(sql, "CAST").exists { case (s, e) =>
        if (pos < s || pos >= e) false
        else {
          // target type = text after the LAST depth-0 " AS " in the span
          val body = sql.substring(s, e)
          var depth = 0
          var lastAs = -1
          val up = body.toUpperCase
          var i = 0
          while (i < body.length) {
            body.charAt(i) match {
              case '(' => depth += 1
              case ')' => depth -= 1
              case _ =>
                if (depth == 0 && up.startsWith(" AS ", i)) lastAs = i
            }
            i += 1
          }
          lastAs >= 0 && {
            val tpe = up.substring(lastAs + 4).trim
            (tpe.startsWith("DECIMAL") || tpe.startsWith("BIGINT")) &&
              // the column must sit in the casted EXPR, not the type
              pos - s < lastAs
          }
        }
      }
    val bad = SparkEntry.oracleSql.toSeq.flatMap { case (name, sql) =>
      fnArgSpans(sql, "SUM").flatMap { case (s, e) =>
        hazardous.findAllMatchIn(sql.substring(s, e)).collect {
          case m if !insideSafeCast(sql, s + m.start) =>
            s"$name: SUM(${sql.substring(s, e)}) [${m.group(1)} not " +
              "enclosed by a DECIMAL/BIGINT cast]"
        }
      }
    }
    assert(bad.isEmpty,
      s"raw-DOUBLE sums in oracle SQL (order-dependent, latent gate " +
        s"flake):\n${bad.mkString("\n")}")
  }
}
