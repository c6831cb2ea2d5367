package graft

/** Runs the full api-surface tour (tools/ApiTour — one executed check
  * per public graft.api export, reference twins per API_MAP.md) inside
  * `sbt test`, so the documented surface cannot silently rot between
  * the rounds someone happens to invoke the main. The tour's own
  * `require`s throw on any failed check; the spec additionally pins
  * the check COUNT so a silently-skipped region of the tour (e.g. an
  * early return after a refactor) is itself a failure.
  */
class ApiTourSpec extends SparkSpec {
  test("ApiTour: every api entry point runs and asserts on real data") {
    val n = graft.tools.ApiTour.run(spark, sfDir)
    assert(n >= 71, s"api tour ran only $n checks — tour truncated?")
  }
}
