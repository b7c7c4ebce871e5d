package graft

import java.nio.file.Files

/** The round-7 postmortem's harness guarantee, CI-pinned: a query that
  * THROWS must be loud in the artifacts — Verify writes it to
  * errors.json (instead of silently shrinking the driver's ledger) and
  * Bench lists it under "failed" with its time excluded (instead of
  * booking time-to-exception as an 8-13x "speedup"). Both are driven
  * here by pointing the harness at a nonexistent fixture dir, which
  * fails every query at the read — the same failure class as the NTZ
  * drift that motivated the machinery.
  */
class HarnessSpec extends SparkSpec {

  test("Verify records a failing query in errors.json, not silence") {
    val out = Files.createTempDirectory("verify-failtest").toString
    Verify.run(spark, "/nonexistent_fixture_dir", out, Some(Set("q1_pricing", "q_chunk")))
    val errs = Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errs.contains("\"q1_pricing\"") && errs.contains("\"q_chunk\""),
      s"failing queries missing from errors.json: $errs")
    // and no result parquet appeared for them
    assert(!Files.exists(java.nio.file.Paths.get(s"$out/q1_pricing/_SUCCESS")))
  }

  test("Verify writes an empty errors.json when every query succeeds") {
    val out = Files.createTempDirectory("verify-oktest").toString
    Verify.run(spark, sf0001, out, Some(Set("q1_pricing")))
    val errs = Files.readString(java.nio.file.Paths.get(s"$out/errors.json"))
    assert(errs.trim == "{}", s"unexpected errors on a green run: $errs")
    assert(Files.exists(java.nio.file.Paths.get(s"$out/q1_pricing/_SUCCESS")))
  }
}
