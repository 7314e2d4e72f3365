package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._

/** Probe: does an eager localCheckpoint() populate Observation metrics?
  * (If yes, connectedComponents can fuse its convergence sum into the
  * per-round checkpoint job instead of running a second action.) */
class ObserveCheckpointProbe extends SparkSpec {
  test("localCheckpoint populates observe metrics") {
    import spark.implicits._
    val obs = Observation("probe")
    val df = (1L to 1000L).toDF("x")
      .observe(obs, sum(col("x").cast("decimal(38,0)")).as("s"))
      .localCheckpoint()
    // if the checkpoint job ran the CollectMetrics node, this returns
    // immediately with the sum; otherwise it would block/need an action
    val fut = concurrent.Future(obs.get)(concurrent.ExecutionContext.global)
    val got = concurrent.Await.result(fut, concurrent.duration.Duration("5s"))
    assert(got.nonEmpty, "observe metrics NOT populated by localCheckpoint")
    assert(got("s").asInstanceOf[java.math.BigDecimal].longValueExact() == 500500L)
    df.count()
  }
}
