package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench harness's self-defending logic (VERDICT r16 item 1):
  * the end-of-suite outlier re-measure decision and the committed-minima
  * resource it reads. Pure-function tests — no SparkSession.
  */
class BenchSpec extends AnyFunSuite {

  test("committed-minima resource loads, is large, and is all-positive") {
    val m = Bench.committedMin
    assert(m.size >= 100, s"expected the full committed roster, got ${m.size}")
    assert(m.values.forall(_ > 0.0))
    // a couple of queries that have been on the roster since round 1
    assert(m.contains("q_traffic_stats"))
    assert(m.contains("q_minhash_dedup"))
  }

  test("a 10-16x blowup on a write-heavy chain is flagged (the r16 driver-run shape)") {
    val committed = Map("q_split_assign_delta2" -> 1.449, "q_corpus_prep_delta2" -> 1.393)
    val results = Map(
      "q_split_assign_delta2" -> Some(29.53),
      "q_corpus_prep_delta2" -> Some(14.39))
    assert(Bench.outliersToRemeasure(results, committed) ===
      Seq("q_corpus_prep_delta2", "q_split_assign_delta2"))
  }

  test("ambient jitter on a cheap query is NOT flagged (absolute floor)") {
    // 0.10 -> 0.35 is >3x but only +0.25 s — re-running it cannot move a
    // 40 s headline and a busy window would trigger dozens of such re-runs
    val committed = Map("q_cheap" -> 0.10)
    assert(Bench.outliersToRemeasure(Map("q_cheap" -> Some(0.35)), committed).isEmpty)
    // just over the absolute floor but under the factor: also not flagged
    assert(Bench.outliersToRemeasure(Map("q_cheap" -> Some(0.29)), committed).isEmpty)
  }

  test("sub-3x swells, new queries, and erroring queries are skipped") {
    val committed = Map("q_known" -> 1.0)
    // 2.9x: under the factor
    assert(Bench.outliersToRemeasure(Map("q_known" -> Some(2.9)), committed).isEmpty)
    // no committed minimum (new this round): skipped
    assert(Bench.outliersToRemeasure(Map("q_new" -> Some(50.0)), committed).isEmpty)
    // erroring query (None): skipped — errors[] already carries it
    assert(Bench.outliersToRemeasure(Map("q_known" -> None), committed).isEmpty)
  }

  test("boundary: flagged exactly when BOTH factor and absolute-excess trip") {
    val committed = Map("q_x" -> 1.0)
    assert(Bench.outliersToRemeasure(Map("q_x" -> Some(3.01)), committed) === Seq("q_x"))
    // factor trips but excess of exactly the floor does not (strict >)
    assert(Bench.outliersToRemeasure(Map("q_x" -> Some(1.75)), committed,
      factor = 1.5, excessFloor = _ => 0.75).isEmpty)
    assert(Bench.outliersToRemeasure(Map("q_x" -> Some(1.76)), committed,
      factor = 1.5, excessFloor = _ => 0.75) === Seq("q_x"))
  }

  test("scaled floor: a 0.1 s-class query swollen 8x IS flagged (the r18 q_token_shards shape)") {
    // r18 driver run: q_token_shards 0.845 s vs 0.107 min (7.9x) slipped
    // the fixed 0.75 s floor by 0.012 s and its inflation reached the
    // headline (VERDICT r18 item 1b). The scaled floor
    // max(0.2, min(0.75, 3x min)) = 0.321 catches it.
    val committed = Map("q_token_shards" -> 0.107)
    assert(Bench.outliersToRemeasure(Map("q_token_shards" -> Some(0.845)), committed) ===
      Seq("q_token_shards"))
    // the floor itself: 3x-min band, the 0.2 s hard floor, the 0.75 s cap
    assert(math.abs(Bench.excessFloorSec(0.107) - 0.321) < 1e-9)
    assert(Bench.excessFloorSec(0.05) === 0.2)
    assert(Bench.excessFloorSec(1.0) === 0.75)
    // ambient jitter on the same query stays un-flagged: +0.25 s excess
    // is under the 0.321 floor even though the 3x factor trips
    assert(Bench.outliersToRemeasure(Map("q_token_shards" -> Some(0.357)), committed).isEmpty)
  }

  test("stable_total clamps unchanged chains to committed minima, passes through the rest") {
    val committed = Map("q_a" -> 0.10, "q_b" -> 2.0)
    val results = Map[String, Option[Double]](
      "q_a" -> Some(0.85),  // contended: clamped to 0.10
      "q_b" -> Some(1.5),   // genuine improvement: the run value is kept
      "q_new" -> Some(3.0)) // no committed minimum: the run value is kept
    assert(math.abs(Bench.stableTotal(results, committed).get - (0.10 + 1.5 + 3.0)) < 1e-9)
    // all-quiet run below every minimum: stable_total == the wall total
    val quiet = Map[String, Option[Double]]("q_a" -> Some(0.09), "q_b" -> Some(1.9))
    assert(math.abs(Bench.stableTotal(quiet, committed).get - (0.09 + 1.9)) < 1e-9)
  }

  test("stable_total is poisoned (None), not flattered, by an erroring query") {
    // VERDICT r19 item 3: an erroring query contributes neither run nor
    // minimum, so folding it as zero would report a LOWER stable_total
    // for a broken run than for a clean one
    val committed = Map("q_a" -> 0.10, "q_b" -> 2.0)
    assert(Bench.stableTotal(
      Map("q_a" -> Some(0.85), "q_b" -> None), committed).isEmpty)
    // a clean run keeps the Some
    assert(Bench.stableTotal(
      Map("q_a" -> Some(0.85), "q_b" -> Some(1.5)), committed).nonEmpty)
  }

  test("stable_clamped counts exactly the queries clamped to their minimum") {
    // ADVICE r19: the clamp count (with stable_min_sum) is what makes a
    // contended window and a regressed window distinguishable from the
    // record alone — stable_total by itself is bounded by Σ minima
    val committed = Map("q_a" -> 0.10, "q_b" -> 2.0, "q_c" -> 1.0)
    val results = Map[String, Option[Double]](
      "q_a" -> Some(0.85),  // clamped
      "q_b" -> Some(1.5),   // below minimum: not clamped
      "q_c" -> Some(1.0),   // exactly the minimum: not clamped (strict <)
      "q_new" -> Some(3.0), // no minimum: not clamped
      "q_err" -> None)      // erroring: not clamped
    assert(Bench.stableClamped(results, committed) === 1)
    assert(Bench.stableClamped(Map("q_a" -> Some(0.09)), committed) === 0)
  }

  test("only the driver-contract shape may write the committed record file") {
    val gate = "/root/testdata/sf0.1"
    assert(Bench.outFileFor(Array.empty, gate) === "bench_out.json")
    // dev-loop subset: never the committed record
    assert(Bench.outFileFor(Array("q_minhash_dedup"), gate) === "bench_out_dev.json")
    // sf1 rehearsal (the r12 gotcha) and any other fixture: dev file
    assert(Bench.outFileFor(Array.empty, "/root/repo/sf1-rehearsal") === "bench_out_dev.json")
    assert(Bench.outFileFor(Array.empty, "/root/testdata/sf0.01") === "bench_out_dev.json")
    // path-equivalent spellings of the gate fixture still route to the
    // committed record (ADVICE r17: a trailing slash or `..` segment
    // used to silently disable the record + re-measure pass)
    assert(Bench.outFileFor(Array.empty, "/root/testdata/sf0.1/") === "bench_out.json")
    assert(Bench.outFileFor(Array.empty, "/root/testdata/../testdata/sf0.1") === "bench_out.json")
    // a symlinked spelling canonicalizes too (ADVICE r18: normalize
    // alone left symlinks routing a legitimate gate run to the dev file)
    val dir = java.nio.file.Files.createTempDirectory("graft-benchspec-link")
    val link = dir.resolve("sf0.1-link")
    try {
      java.nio.file.Files.createSymbolicLink(link, java.nio.file.Paths.get(gate))
      assert(Bench.outFileFor(Array.empty, link.toString) === "bench_out.json")
    } finally {
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.deleteIfExists(dir)
    }
  }

  test("the certified record file is unreachable from the bench writer (VERDICT r19 item 1)") {
    // bench_record.json is written only BY HAND on a record commit; the
    // bench main routes every run — gate shape, dev subset, any fixture
    // — to bench_out.json or bench_out_dev.json, so neither the driver's
    // round-close run nor a dev loop can clobber the certified number
    assert(Bench.RecordFile === "bench_record.json")
    for (args <- Seq(Array.empty[String], Array("q_minhash_dedup"), Array("streaming"));
         dir <- Seq("/root/testdata/sf0.1", "/root/testdata/sf0.01",
           "/root/repo/sf1-rehearsal", "bench_record.json", ""))
      assert(Bench.outFileFor(args, dir) !== Bench.RecordFile)
  }

  test("gate-fixture literal is canonicalized on BOTH sides of the routing compare (ADVICE r19)") {
    // if the gate-fixture literal itself resolves through a symlink,
    // toRealPath(sfDir) lands on the resolved target — comparing it to
    // the unresolved literal would silently route a legitimate gate run
    // to the dev file and disable the record + re-measure self-defense.
    // The production literal contains no symlink in this environment, so
    // the property is pinned through the injectable gateFixture with a
    // literal that IS a symlink: only a compare canonicalizing BOTH
    // sides routes the resolved spelling to the record file.
    import java.nio.file.{Files, Paths}
    val realDir = Files.createTempDirectory("graft-benchspec-gate")
    val linkDir = Files.createTempDirectory("graft-benchspec-gatelink")
    val link = linkDir.resolve("sf0.1")
    try {
      Files.createSymbolicLink(link, realDir)
      val resolved = realDir.toRealPath().toString
      // resolved input vs symlinked literal: the ADVICE r19 case
      assert(Bench.outFileFor(Array.empty, resolved, link.toString) === "bench_out.json")
      // symlinked input vs resolved literal: the ADVICE r18 case, same canon
      assert(Bench.outFileFor(Array.empty, link.toString, resolved) === "bench_out.json")
      // a genuinely different dir still routes to the dev file
      assert(Bench.outFileFor(Array.empty, linkDir.toString, link.toString) === "bench_out_dev.json")
    } finally {
      Files.deleteIfExists(link)
      Files.deleteIfExists(linkDir)
      Files.deleteIfExists(realDir)
    }
  }
}
