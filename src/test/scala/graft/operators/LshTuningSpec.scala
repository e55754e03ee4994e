package graft.operators

import graft.SparkSpec

/** Pins the LSH calibration audit (`q_lsh_tuning`): the exact analytic
  * S-curve arithmetic and the measured justification for the production
  * 16×2 banding on this fixture (VERDICT r16 item 4).
  */
class LshTuningSpec extends SparkSpec {

  test("analytic collision probability is the exact rational, floor-quantized") {
    // production config at the verification threshold: 1-(1-0.5^2)^16
    // = 1 - 75^16/100^16; 1e6·0.75^16 = 10022.59…, ceil 10023
    assert(LshTuning.collideProbMicro(16, 2, 5) === 989977L)
    // degenerate band counts: b=32,r=1 at s=0.5 → 1-(1/2)^32, micro
    // floor = 999999; b=1,r=32 at s=0.5 → 1e6/2^32 rounds to floor 0
    assert(LshTuning.collideProbMicro(32, 1, 5) === 999999L)
    assert(LshTuning.collideProbMicro(1, 32, 5) === 0L)
    // monotone in s for every config; monotone in permissiveness
    // (fewer rows per band ⇒ higher collision prob) at every s
    for ((b, r) <- LshTuning.Configs) {
      val ps = LshTuning.SimGrid.map(LshTuning.collideProbMicro(b, r, _))
      assert(ps == ps.sorted, s"not monotone in s for ($b,$r): $ps")
    }
    for (sn <- LshTuning.SimGrid) {
      val byCfg = LshTuning.Configs.map { case (b, r) =>
        LshTuning.collideProbMicro(b, r, sn)
      }
      assert(byCfg == byCfg.sorted.reverse,
        s"not monotone across configs at s=$sn/10: $byCfg")
    }
  }

  test("measured table: the production 16x2 banding dominates its neighbors on this fixture") {
    val rows = LshTuning.lshTuning(spark, sf).collect()
      .map(r => r.getAs[Int]("bands") -> r).toMap
    assert(rows.keySet === LshTuning.Configs.map(_._1).toSet)
    val nTrue = rows(16).getAs[Long]("n_true")
    assert(nTrue > 0, "fixture sample has no true near-dup pairs")
    def recall(b: Int) = Option(rows(b).getAs[java.lang.Long]("recall_micro"))
      .fold(0L)(_.longValue)
    def precision(b: Int) =
      Option(rows(b).getAs[java.lang.Long]("precision_micro")).map(_.longValue)
    // the 0.9 component-recall design line documented at MinhashBands
    // holds at the pair level for 16x2 on this fixture
    assert(recall(16) >= 900000L, s"16x2 pair recall ${recall(16)} under the design line")
    // vs the more permissive 32x1: recall within a point, precision no
    // worse (on a dup-dense fixture most collisions are true, so the
    // precision gap is small here; production-shaped tails widen it —
    // the analytic p_s30 column is the evidence: 999988 vs 778862
    // collision probability for s=0.3 FALSE positives)
    assert(precision(16).exists(p16 => precision(32).forall(_ <= p16)),
      s"16x2 precision ${precision(16)} worse than 32x1 ${precision(32)}")
    // vs the tighter 8x4: materially higher recall — the reason 8x4
    // (and everything tighter) loses the slot
    assert(recall(8) < recall(16),
      s"8x4 recall ${recall(8)} not below 16x2 ${recall(16)}")
    // sanity: collision counts shrink monotonically as bands narrow
    val cands = LshTuning.Configs.map { case (b, _) => rows(b).getAs[Long]("n_cand") }
    assert(cands == cands.sorted.reverse, s"n_cand not monotone: $cands")
  }
}
