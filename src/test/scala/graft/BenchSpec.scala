package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench's contamination defenses are pure functions — provable
  * without timing anything. The scenario under test is round 5's actual
  * failure: `join_or_union` ran 23.8–31.9 s on ALL THREE reps under
  * sustained contention (no rep spread → the spread heuristic is blind),
  * 0.39 s on a quiet rerun; only the previous round's artifact can see it.
  */
class BenchSpec extends AnyFunSuite {

  test("parseQueriesMap reads a real artifact line and survives garbage") {
    val line = """{"metric":"total","value":9.9,"unit":"sec","queries":{"a":0.39,"b":23.81},"raw":{"a":[0.4]},"sf":"x"}"""
    assert(Bench.parseQueriesMap(line) === Map("a" -> 0.39, "b" -> 23.81))
    assert(Bench.parseQueriesMap("not json") === Map.empty)
    assert(Bench.parseQueriesMap("""{"metric":"total"}""") === Map.empty)
  }

  test("scavengeTimes recovers pairs from the driver's truncated wrapper format") {
    // the round driver stores only a front-truncated stdout tail with
    // JSON-escaped quotes — unparseable as JSON, but the pairs are there
    val wrapper = """{"n": 5, "rc": 0, "cpus": 32, "sf": 0.1, "tail": "4054,1.2991],\"join_or_union\":0.37,\"set_except\":[0.82,0.62,0.59],\"load_avg\":{\"before\":1.82,\"after\":1.1,\"cpus\":32},\"reps\":3", "parsed": null}"""
    val got = Bench.scavengeTimes(wrapper)
    assert(got("join_or_union") === 0.37)
    assert(got("set_except") === 0.59)       // min of the rep array
    assert(!got.contains("before") && !got.contains("cpus") && !got.contains("n"))
  }

  test("priorBest takes the per-query minimum across artifacts") {
    // r5's artifact itself is contaminated (join_or_union 23.8 s); the
    // min over history must recover r4's quiet 0.37 s as the reference
    val r4 = """{"queries":{"join_or_union":0.37,"old_only":1.0}}"""
    val r5 = """{"queries":{"join_or_union":23.81,"new_only":0.5}}"""
    assert(Bench.priorBest(Seq(r4, r5, "garbage")) ===
      Map("join_or_union" -> 0.37, "old_only" -> 1.0, "new_only" -> 0.5))
    assert(Bench.priorBest(Seq.empty) === Map.empty)
  }

  test("sustained contention (no spread) is caught by the prior artifact") {
    // all reps slow and tight — invisible to the spread heuristic
    val ok = Seq("join_or_union" -> Seq(23.81, 24.2, 31.9).sorted,
                 "quiet_query" -> Seq(0.2, 0.21, 0.22))
    val prior = Map("join_or_union" -> 0.37, "quiet_query" -> 0.2)
    assert(Bench.retryCandidates(ok, prior) === Seq("join_or_union"))
  }

  test("single starved rep is caught by spread even with no prior") {
    val ok = Seq("q" -> Seq(0.3, 0.31, 9.0))
    assert(Bench.retryCandidates(ok, Map.empty) === Seq("q"))
  }

  test("a slow FIRST rep (cache/JIT fill) is not a spread suspect") {
    // the dedup family caches an intermediate: rep 1 fills, reps 2+ hit —
    // that 5× first-rep "spread" is the cache working, not contention
    assert(Bench.spreadSuspects(Seq("cached_q" -> Seq(1.2, 0.22, 0.23))) ===
      Seq.empty)
    // …but a starved LATER rep still flags
    assert(Bench.spreadSuspects(Seq("starved" -> Seq(0.3, 0.31, 9.0))) ===
      Seq("starved"))
  }

  test("the sub-second band above the floor DOES flag (the r8 escape)") {
    // r8: join_left_count 0.12 s prior → 0.61 s, 5× but exempted by the
    // old 0.5 s floor; at 0.15 it re-measures
    val ok = Seq("join_left_count" -> Seq(0.61, 0.63, 0.66))
    assert(Bench.retryCandidates(ok, Map("join_left_count" -> 0.12)) ===
      Seq("join_left_count"))
  }

  test("genuine growth under the factor, new queries, and fast queries don't flag") {
    val ok = Seq(
      "grew_2x" -> Seq(0.8, 0.82, 0.85),    // exactly 2× prior: at, not over, the trigger
      "brand_new" -> Seq(5.0, 5.1, 5.2),    // no prior entry
      "tiny" -> Seq(0.09, 0.09, 0.1))       // 9× prior but under the 0.15 s floor
    val prior = Map("grew_2x" -> 0.4, "tiny" -> 0.01)
    assert(Bench.retryCandidates(ok, prior) === Seq.empty)
  }

  test("a query that is both spread-suspect and regressed retries once") {
    val ok = Seq("q" -> Seq(2.0, 2.1, 9.0))
    val prior = Map("q" -> 0.3)
    assert(Bench.retryCandidates(ok, prior) === Seq("q"))
  }
}
