package graft

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd, SparkListenerTaskStart}

/**
 * THE executor-CPU accounting harness, shared by every bench main
 * (`Bench`, `BenchScale`) so the two artifacts (BENCH_FULL vs
 * BENCH_SCALE) are measured under ONE drain contract — a fix to the
 * timing-sensitive machinery lands in both by construction.
 *
 * One global accumulator fed by task-end events. The listener bus is
 * asynchronous, so after each action callers [[drainTaskEvents]] until
 * every started task has reported its end event before snapshotting —
 * otherwise a query's tail tasks would be billed to the next query.
 */
private[graft] final class TaskCpuMeter(sc: SparkContext) {
  private val cpuNs = new AtomicLong(0L)
  private val runMs = new AtomicLong(0L)
  private val started = new AtomicLong(0L)
  private val ended = new AtomicLong(0L)

  sc.addSparkListener(new SparkListener {
    override def onTaskStart(e: SparkListenerTaskStart): Unit =
      started.incrementAndGet()
    override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
      if (e.taskMetrics != null) {
        cpuNs.addAndGet(e.taskMetrics.executorCpuTime)
        runMs.addAndGet(e.taskMetrics.executorRunTime)
      }
      ended.incrementAndGet()
    }
  })

  /** Cumulative executor CPU ns observed so far (drain first). */
  def snapshotNs: Long = cpuNs.get

  /** Cumulative executor task RUN time ms (drain first) — wall the
    * tasks spent on executors, CPU or not. The r19 scaling probe read
    * flat wall ratios at sf0.1 because per-query driver fixed cost
    * swamps data work there; task run-time is the quantity that should
    * track the core count on data-bound rows, so the bench artifact
    * carries it per query (r20, PERF_r19 "restore scaling legibility"). */
  def snapshotRunMs: Long = runMs.get

  /** Wait until the listener bus has delivered an end event for every
    * started task. Generous timeout: if a stalled task outlives the
    * drain, its CPU is mis-attributed to the NEXT query — observed
    * smearing whole seconds across alphabetical neighbors under host
    * contention with a 5 s cap. Fallback: the bus CAN drop events under
    * pressure, in which case started never equals ended again — accept
    * a drain once both counters sit still for 2 s, or every later query
    * would spin the full timeout. */
  def drainTaskEvents(): Unit = {
    val t0 = System.currentTimeMillis()
    var stable = 0
    var staticFor = 0
    var prev = (-1L, -1L)
    while (stable < 2 && System.currentTimeMillis() - t0 < 60000) {
      val cur = (started.get, ended.get)
      if (cur._1 == cur._2) stable += 1 else stable = 0
      staticFor = if (cur == prev) staticFor + 1 else 0
      prev = cur
      if (staticFor >= 100) return
      if (stable < 2) Thread.sleep(20)
    }
  }
}
