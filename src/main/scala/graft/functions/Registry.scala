package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** One-stop, idempotent registration of every graft native function.
  *
  * Round 1 had each operator call its own `X.register(spark)` on every
  * query invocation; `createOrReplaceTempFunction` logs a WARN on each
  * replacement, which spammed stderr 80+ times per bench run and broke
  * the driver's JSON parse of the bench output (VERDICT r1 item 2 /
  * BENCH_r01 `parsed: null`). Here registration is guarded by a
  * sentinel lookup in the session's function registry, so a session
  * registers each function exactly once and re-entry is a no-op.
  */
object Registry {

  private val Sentinel = FunctionIdentifier("graft_compute_once")

  /** Register all graft functions into `spark`'s session registry,
    * unless this session already has them.
    */
  def ensure(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    if (!reg.functionExists(Sentinel)) synchronized {
      if (!reg.functionExists(Sentinel)) {
        BloomFunctions.register(spark)
        NgramJaccardFunctions.register(spark)
        SketchFunctions.register(spark)
        TextHashFunctions.register(spark)
        VectorFunctions.register(spark)
        ZOrderFunctions.register(spark)
        graft.plans.ComputeOnce.register(spark)
      }
    }
  }
}
