package graft

import org.scalatest.funsuite.AnyFunSuite

/** Oracle-determinism conventions, hardened from memory into a gate.
  *
  * The differential oracle hashes float values bit-for-bit, and
  * transcendental functions (`ln`, `sqrt`) are only correctly-rounded
  * per-call — Spark's and DuckDB's last ulp can differ, so any raw use
  * in an oracle is a latent cross-engine hash mismatch. The repo-wide
  * convention (q164, q215, q216, …) quantizes them through DECIMAL:
  * `CAST(ln(…) AS DECIMAL(18,9))`, making both engines agree exactly.
  * This spec scans every `SparkEntry.oracleSql` string so a future
  * query can't silently re-introduce the drift; exceptions live in an
  * allowlist that documents why they are safe.
  *
  * (The companion 128-bit rule — no HUGEINT output columns — is linted
  * engine-side by tools/check_oracle.py's DESCRIBE pass.)
  */
class OracleRulesSpec extends AnyFunSuite {

  /** Positions of `ln(`/`sqrt(` not immediately wrapped in `CAST(`. */
  private[graft] def rawTranscendentals(sql: String): Seq[String] = {
    val re = "(?i)\\b(ln|sqrt)\\(".r
    re.findAllMatchIn(sql).flatMap { m =>
      val before = sql.substring(0, m.start).replaceAll("\\s+$", "")
      if (before.toUpperCase.endsWith("CAST(")) None
      else Some(s"${m.group(1)}( at index ${m.start}")
    }.toSeq
  }

  /** query name → why its raw transcendental cannot drift the hash. */
  private val allow: Map[String, String] = Map(
    "q200_ab_test_z" ->
      ("z_score is round(expr, 6) in BOTH engines over magnitudes O(1) — " +
        "six decimals absorb the sub-ulp difference; green since round 4"),
    "q266_benford_audit" ->
      ("ln(1+1/d)/ln(10.0) over the NINE exact rationals d=1..9 — the " +
        "whole ratio is quantized once at the full output scale " +
        "(DECIMAL(18,6), integer-valued after ×10⁶ so the BIGINT cast " +
        "is exact), and every one of the nine constants sits ≥ 4e-5 " +
        "from a 6-dp rounding boundary — far beyond any ulp drift; the " +
        "inner ln(10.0) is what trips the lexical check"),
    "q307_temperature_mixture" ->
      ("same theorem as q285: IEEE sqrt is CORRECTLY ROUNDED (a basic " +
        "op, unlike ln/exp), its input is an exact integer count " +
        "identical on both engines, the ×10⁶ is one double multiply " +
        "of identical operands, and floor() of an identical double is " +
        "identical — the weights are bit-equal BIGINTs by spec, which " +
        "is the whole reason τ=2 (√) is the supported temperature"),
    "q285_central_moments" ->
      ("sqrt is the one transcendental IEEE 754 requires CORRECTLY " +
        "ROUNDED (§9.2 covers ln/exp as recommended-only; sqrt is a " +
        "basic operation like +/×) — java.lang.Math.sqrt and DuckDB's " +
        "libm sqrt both comply, so sqrt of the SAME double (here " +
        "CAST(M2 AS DOUBLE), an identical exact integer on both " +
        "engines) is bit-identical by spec, and the surrounding " +
        "multiply/divide are likewise correctly rounded over identical " +
        "operands in identical association"))

  test("the checker itself catches a seeded violation") {
    assert(rawTranscendentals("SELECT ln(x) FROM t").nonEmpty)
    assert(rawTranscendentals("SELECT nullif(sqrt(x), 0) FROM t").nonEmpty)
    assert(rawTranscendentals(
      "SELECT CAST(ln(x) AS DECIMAL(18,9)) FROM t").isEmpty)
    assert(rawTranscendentals(
      "SELECT CAST( sqrt(x) AS DECIMAL(18,9)) FROM t").isEmpty)
    // names merely containing the letters are not flagged
    assert(rawTranscendentals("SELECT lnp_sum, sqrt2 FROM t").isEmpty)
  }

  test("every oracle quantizes ln/sqrt through DECIMAL (or is adjudicated)") {
    val bad = SparkEntry.oracleSql.toSeq.sortBy(_._1).flatMap {
      case (name, sql) =>
        val raw = rawTranscendentals(sql)
        if (raw.nonEmpty && !allow.contains(name))
          Some(s"$name: ${raw.mkString(", ")}")
        else None
    }
    assert(bad.isEmpty,
      "raw ln()/sqrt() in oracle SQL — wrap in CAST(... AS DECIMAL(p,s)) " +
        "or adjudicate:\n" + bad.mkString("\n"))
    val stale = allow.keySet -- SparkEntry.oracleSql.keySet
    assert(stale.isEmpty, s"allowlist names unknown queries: $stale")
    allow.keys.foreach { name =>
      assert(rawTranscendentals(SparkEntry.oracleSql(name)).nonEmpty,
        s"$name allowlisted but clean — remove the stale entry")
    }
  }
}
