package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench self-adjudication: the reference parser and the burst detector —
  * the logic that decides which queries get the end-of-run retry sweep
  * when a host-contention burst inflates both back-to-back passes.
  */
class BenchSpec extends AnyFunSuite {

  private val sampleDetail =
    """{"sf":"/root/testdata/sf0.1","cpus":32,"total_sec":95.240,"build_total_sec":44.1,"plan_total_sec":2.1,"exec_total_sec":49.0,"calibration_sec":0.409,"end_calibration_sec":0.287,
      |"per_query":{
      |"q1_agg":{"build_sec":0.010,"plan_sec":0.050,"exec_sec":1.240,"total_sec":1.300,"runs_total_sec":[1.300,1.410]},
      |"recs_lift":{"build_sec":0.020,"plan_sec":0.080,"exec_sec":2.700,"total_sec":2.800,"runs_total_sec":[2.900,2.800]},
      |"tiny_q":{"build_sec":0.001,"plan_sec":0.004,"exec_sec":0.095,"total_sec":0.100,"runs_total_sec":[0.100,0.120]}},
      |"failed":[]}""".stripMargin

  test("reference parser extracts per-query totals and the run calibration, nothing else") {
    val ref = Bench.parseReferenceTotals(sampleDetail)
    assert(ref == Map("q1_agg" -> 1.3, "recs_lift" -> 2.8, "tiny_q" -> 0.1))
    assert(!ref.contains("sf") && !ref.contains("calibration_sec"),
      "top-level scalars must not parse as queries")
    assert(Bench.parseReferenceCalibration(sampleDetail).contains(0.409))
  }

  test("synthetic burst: only the inflated queries are flagged for retry") {
    val ref = Map("a" -> 1.0, "b" -> 2.0, "c" -> 3.0, "d" -> 0.5)
    // burst hit a and c (4× and 2.5×); b and d are at reference
    val measured = Map("a" -> 4.0, "b" -> 2.1, "c" -> 7.5, "d" -> 0.55)
    assert(Bench.suspects(measured, ref, 2.0, calibRatio = 1.0) == Seq("a", "c"),
      "flagged worst-inflation-first")
  }

  test("a uniformly slower host is not a burst: calibration scaling suppresses the sweep") {
    val ref = Map("a" -> 1.0, "b" -> 2.0)
    val measured = Map("a" -> 2.5, "b" -> 5.0) // everything 2.5× — host-slow
    assert(Bench.suspects(measured, ref, 2.0, calibRatio = 1.0).nonEmpty,
      "without calibration context this would retry the world")
    assert(Bench.suspects(measured, ref, 2.0, calibRatio = 2.5).isEmpty,
      "the calibration ratio absorbs uniform slowness")
  }

  test("BENCH_PINS.json parses: pins, calibration, round") {
    val pinsJson =
      """{
        |"round": 18,
        |"calibration_sec": 0.592,
        |"source": "BENCH_DETAIL.json",
        |"pins": {
        |"q1_agg": 1.3,
        |"recs_lift": 2.8
        |}
        |}""".stripMargin
    val (pins, calib, round) = Bench.parsePins(pinsJson)
    assert(pins == Map("q1_agg" -> 1.3, "recs_lift" -> 2.8))
    assert(calib.contains(0.592))
    assert(round.contains(18))
  }

  test("the committed BENCH_PINS.json resolves and parses as a full-suite reference") {
    // the r18 failure mode: the driver forked the bench with a cwd where a
    // RELATIVE lookup found nothing, the sweep no-opped invisibly. The
    // resolver walks cwd's parents and falls back to the canonical
    // checkout path, so a foreign cwd can no longer lose the reference.
    val fromHere = Bench.resolveReference("BENCH_PINS.json", "NO_SUCH_ENV")
    assert(fromHere.isDefined, "pins file must resolve from the repo root")
    val (pins, calib, round) = Bench.parsePins(
      new String(java.nio.file.Files.readAllBytes(fromHere.get), "UTF-8"))
    assert(pins.size >= 200 && calib.isDefined && round.isDefined,
      s"committed pins must cover the suite; got ${pins.size}")
  }

  test("a missing reference resolves to None (the artifact then SAYS reference_missing)") {
    assert(Bench.resolveReference("NO_SUCH_REFERENCE_FILE.json",
      "NO_SUCH_ENV").isEmpty,
      "a nonexistent reference must resolve to None, never a phantom path")
  }

  test("new queries (no reference) and sub-noise references are never retried; cap bounds the sweep") {
    val ref = Map("old" -> 1.0, "tiny" -> 0.1)
    val measured = Map("old" -> 1.1, "tiny" -> 5.0, "brand_new" -> 60.0)
    assert(Bench.suspects(measured, ref, 2.0, 1.0).isEmpty,
      "no reference / sub-200ms reference must not flag")
    val manyRef = (1 to 50).map(i => s"q$i" -> 1.0).toMap
    val manyMeasured = (1 to 50).map(i => s"q$i" -> (10.0 + i)).toMap
    val flagged = Bench.suspects(manyMeasured, manyRef, 2.0, 1.0)
    assert(flagged.size == 20, "retry sweep capped at 20")
    assert(flagged.head == "q50", "worst offender first")
  }
}
