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
    // doc = spec, mechanically (the ContractSpec pattern): API_MAP.md
    // publishes the tour's check count; a new api entry point must bump
    // both or this fails
    val documented = scala.io.Source.fromFile("API_MAP.md", "UTF-8").getLines()
      .flatMap("ApiTour executes \\*\\*(\\d+)\\*\\* checks".r
        .findFirstMatchIn(_).map(_.group(1).toInt)).toList
    assert(documented.size == 1, "API_MAP.md must state the ApiTour check count once")
    assert(n == documented.head,
      s"api tour ran $n checks; API_MAP.md documents ${documented.head}")
    // SURVEY §8 repeats the count in prose — guard it too (the round-11
    // verdict caught it stale at 96 while API_MAP said 97)
    val survey = scala.io.Source.fromFile("SURVEY.md", "UTF-8").getLines()
      .flatMap("ApiTour` executes (\\d+) checks".r
        .findFirstMatchIn(_).map(_.group(1).toInt)).toList
    assert(survey == List(n),
      s"SURVEY.md says ApiTour executes $survey checks; the tour ran $n")
  }
}
