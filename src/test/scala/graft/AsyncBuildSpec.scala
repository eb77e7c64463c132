package graft

import scala.concurrent.Await
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.util.Try

import org.apache.spark.sql.functions._

import graft.operators.AsyncBuild

/** V17 — BuildAsync + Interrupt (`src/index/index.cc:42-64`,
  * `include/knowhere/index/interrupt.h`): the build is a Spark job group;
  * Interrupt = cancelJobGroup with task interruption.
  */
class AsyncBuildSpec extends SparkSpec {

  test("BuildAsync completes and delivers the build result") {
    val h = AsyncBuild.run(spark, "ok") { spark.range(1000).count() }
    assert(Await.result(h.future, 30.seconds) === 1000L)
  }

  test("Interrupt cancels the running build's jobs") {
    val slow = udf((x: Long) => { Thread.sleep(50); x })
    val h = AsyncBuild.run(spark, "slow") {
      // ~2000 × 50 ms across 4 local cores ≈ 25 s if left alone
      spark.range(2000).repartition(4).select(slow(col("id")).as("x")).agg(sum("x")).head()
    }
    Thread.sleep(500) // let the job start before interrupting
    h.cancel()
    val r = Try(Await.result(h.future, 60.seconds))
    assert(r.isFailure, "cancelled build must not complete normally")
  }
}
