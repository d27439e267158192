package org.apache.spark.sql.graftx

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** private[spark] bridge for reading aggregate task metrics around a
  * block of Spark actions. Used by the scale-probe tests: wall-clock on a
  * shared VM includes multi-second host stalls that have nothing to do
  * with the plan under test, while `executorCpuTime` measures the WORK —
  * a quadratic regression burns ~100× CPU at 10× input however noisy the
  * host is. Lives in the org.apache.spark namespace only for
  * `listenerBus.waitUntilEmpty` access (listener events are async; without
  * the flush the last stages of the measured block would be missed). */
object Metrics {

  /** Work counters for one measured block. `cpuSec` excludes GC threads
    * and off-CPU I/O waits, so a spill-/GC-bound regression can be
    * CPU-light — gate it together with `diskSpilledBytes` (host-noise-free
    * like CPU, and the signature of exactly that failure mode).
    * `shuffleRecordsRead` scales with the data actually moved between
    * stages — at 10× input a linear plan reads ~10× shuffle records. */
  final case class TaskWork(cpuSec: Double, shuffleRecordsRead: Long,
      diskSpilledBytes: Long)

  /** Runs `body`, returning (result, total executor CPU seconds of all
    * stages completed during it). */
  def withCpuTime[T](sc: SparkContext)(body: => T): (T, Double) = {
    val (r, w) = withTaskWork(sc)(body)
    (r, w.cpuSec)
  }

  /** Runs `body`, returning (result, aggregate [[TaskWork]] of all stages
    * completed during it). */
  def withTaskWork[T](sc: SparkContext)(body: => T): (T, TaskWork) = {
    val cpuNs = new AtomicLong
    val shuffleRecs = new AtomicLong
    val spilled = new AtomicLong
    val listener = new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        val m = e.stageInfo.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          shuffleRecs.addAndGet(m.shuffleReadMetrics.recordsRead)
          spilled.addAndGet(m.diskBytesSpilled)
        }
      }
    }
    sc.addSparkListener(listener)
    try {
      val result = body
      sc.listenerBus.waitUntilEmpty(30000)
      (result, TaskWork(cpuNs.get / 1e9, shuffleRecs.get, spilled.get))
    } finally sc.removeSparkListener(listener)
  }
}
