package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the oracle-side null policy — the property a round-6 advisory
  * questioned for q_coaccess_components / q_peer_anomaly (their `users`
  * CTEs read `FROM events` with no explicit null filter). The policy is
  * not per-oracle text: `SparkEntry.withCleanEvents` rewrites EVERY
  * `FROM|JOIN events` reference in every non-exempt oracle to the
  * preprocess subquery mirroring `Tables.cleanEvents`
  * (data_preprocessing.py:29-31's null-drop). These tests make that
  * global rewrite's reach on the questioned CTEs an explicit contract
  * instead of an emergent regex property, so a regression (a new oracle
  * shape the pattern misses, an exemption creeping in) fails HERE with
  * the query name rather than as a hash mismatch on null-bearing driver
  * data three rounds later.
  */
class OraclePolicySpec extends AnyFunSuite {

  private val policy =
    "(SELECT * FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL" +
      " AND event_type IS NOT NULL)"
  private val exempt = Set("q_profile", "q_dq_checks")

  test("every non-exempt oracle's events references all carry the null policy") {
    val bare = """(?i)\b(from|join)\s+events\b""".r
    for ((name, sql) <- SparkEntry.oracleSql if !exempt(name)) {
      // Every surviving `FROM events` must be the one INSIDE the policy
      // subquery (recognizable by the policy's WHERE following it).
      val policyTail =
        " WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL)"
      val unpolicied = bare.findAllMatchIn(sql).filterNot { m =>
        sql.regionMatches(m.end, policyTail, 0, policyTail.length)
      }.toList
      assert(unpolicied.isEmpty,
        s"$name has ${unpolicied.size} unpolicied events reference(s)")
    }
  }

  test("graph-family users CTEs read the policied universe (r6 advisory)") {
    // The advisory's exact concern: `users AS (SELECT DISTINCT user_id
    // FROM events)` must not admit NULL users or users whose only rows
    // are unclean — i.e. the final SQL's users CTE must select from the
    // policy subquery, matching the Spark side's Tables.cleanEvents.
    for (name <- Seq("q_coaccess_components", "q_peer_anomaly")) {
      val sql = SparkEntry.oracleSql(name)
      assert(sql.contains(s"users AS (SELECT DISTINCT user_id FROM $policy events)"),
        s"$name users CTE is not reading the null-policied events universe")
    }
  }

  test("exempt set is exactly the two dirty-row profilers") {
    // q_profile counts the nulls themselves; q_dq_checks grades them.
    // Anything else appearing here would silently drop the policy.
    for (name <- exempt) {
      val sql = SparkEntry.oracleSql(name)
      assert(!sql.contains(policy), s"$name should read raw events")
    }
  }

  test("Bench.jsonEscape keeps any env-supplied adjudication string JSON-safe (r15 advisory)") {
    // Every character class the advisory named: backslash, quote,
    // newline/CR/tab, and the remaining sub-0x20 control range.
    val hostile = "line1\nline2\r\ttabbed \"quoted\" back\\slash \u0001\u001f end"
    val escaped = Bench.jsonEscape(hostile)
    assert(!escaped.exists(_ < 0x20), "no raw control char may survive")
    assert(escaped.contains("\\n") && escaped.contains("\\r") &&
      escaped.contains("\\t") && escaped.contains("\\\"") &&
      escaped.contains("\\\\") && escaped.contains("\\u0001") &&
      escaped.contains("\\u001f"))
    // the escaped form must round-trip through a strict JSON parser
    // (jackson throws on any invalid literal)
    val json = s"""{"adjudication":"$escaped"}"""
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(node.get("adjudication").asText() === hostile,
      "escape must be lossless under a strict JSON round-trip")
    // plain text passes through untouched
    assert(Bench.jsonEscape("host contention, isolated re-run measured 63.7s") ===
      "host contention, isolated re-run measured 63.7s")
  }
}
