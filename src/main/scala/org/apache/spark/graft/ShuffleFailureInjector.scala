package org.apache.spark.graft

import org.apache.spark.{MapOutputTrackerMaster, SparkEnv, TaskContext}
import org.apache.spark.shuffle.FetchFailedException

/** TEST-ONLY bridge into `private[spark]` scheduler types, used by
  * `graft.tools.RetryProof` to inject a genuine shuffle-fetch failure.
  *
  * Why this exists: a fleet's other routine failure mode beside a dying
  * task is a dying SHUFFLE SOURCE — the reduce task's fetch fails, Spark
  * unregisters that map output, re-runs the map task, and resubmits the
  * reduce stage (`DAGScheduler`'s `FetchFailed` handling). Proving the
  * engine's operators stay bit-identical through that path requires
  * actually throwing `o.a.s.shuffle.FetchFailedException` from a running
  * reduce task, and that class (plus the map-output tracker used to find a
  * live shuffle id) is `private[spark]` — hence this one small object in
  * the `org.apache.spark` namespace. Spark's own scheduler suites inject
  * fetch failures the same way. Nothing outside RetryProof calls this.
  */
object ShuffleFailureInjector {

  /** Ids of every shuffle currently registered with the driver's
    * map-output tracker. Local-mode executors share the driver JVM, so a
    * task-side caller sees the master tracker directly.
    */
  def registeredShuffleIds(): Set[Int] =
    SparkEnv.get.mapOutputTracker match {
      case m: MapOutputTrackerMaster => m.shuffleStatuses.keys.toSet
      case _ => Set.empty
    }

  /** Throw the real fetch-failure the scheduler special-cases: the task
    * fails with `FetchFailed(bm, shuffleId, mapIndex=0, ...)`, the
    * scheduler unregisters map output 0 of `shuffleId` at this block
    * manager, re-runs that map task, and resubmits the reduce stage.
    */
  def throwFetchFailed(shuffleId: Int): Nothing =
    throw new FetchFailedException(
      SparkEnv.get.blockManager.blockManagerId, shuffleId, 0L, 0,
      TaskContext.getPartitionId(),
      s"injected fetch failure (retry proof, shuffle $shuffleId)", null)
}
