package graft.tools

import java.lang.management.ManagementFactory

import scala.jdk.CollectionConverters._

import org.apache.spark.SparkContext
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerStageSubmitted}

/** Sampled peak-heap tracker with stage attribution, for the
  * SCALE.md ×100 heap-margin table (round-14 advice #1).
  *
  * A daemon thread samples the JVM heap's used bytes every 20 ms; a
  * SparkListener keeps the set of currently-running stages, so each
  * new peak records WHICH stages were live when it happened. In
  * local[*] the driver and executors share one heap, so this single
  * number IS the process's OOM margin against -Xmx.
  *
  * The sampled value includes not-yet-collected garbage (a high
  * reading can be a healthy young gen about to be collected), so it
  * over-approximates live set — the right direction for a margin
  * check: a query whose SAMPLED peak stays well under Xmx can't have
  * OOMed on live data.
  */
object PeakHeap {
  private val active =
    new java.util.concurrent.ConcurrentHashMap[Int, String]()
  // Peak updates arrive from two threads (the 20 ms sampler and the
  // GC-notification dispatcher); all check-then-act updates and
  // reset() go through this lock so no peak is lost to a concurrent
  // write and a reset can't interleave with a half-applied update.
  private val lock = new Object
  private var peakBytes = 0L
  private var atPeak: Seq[String] = Nil
  private var postGcPeakBytes = 0L
  private var atPostGcPeak: Seq[String] = Nil
  private var oldGenPeakBytes = 0L
  // JVM uptime (ms) at the last reset(): GC notifications describe a
  // collection that ENDED at GcInfo.endTime; one whose end predates
  // the reset belongs to the previous query's cleanup System.gc() and
  // must not be attributed to the new window.
  private var resetUptimeMs = 0L
  @volatile private var started = false
  private var installedOn: String = ""

  /** Heap-pool names (G1: Eden/Survivor/Old), to filter the per-pool
    * after-GC map down to heap. */
  private lazy val heapPoolNames: Set[String] =
    ManagementFactory.getMemoryPoolMXBeans.asScala
      .filter(_.getType == java.lang.management.MemoryType.HEAP)
      .map(_.getName).toSet

  /** Subscribe to GC-completion notifications: each one carries the
    * per-pool usage AFTER the collection, whose heap sum is the
    * surviving footprint — the number an OOM actually compares
    * against Xmx (sampled used-heap saturates at capacity on any
    * busy query because G1 lets the heap fill before collecting;
    * measured: every heavy query "peaks" at ~Xmx by that metric). */
  private def subscribeGc(): Unit =
    ManagementFactory.getGarbageCollectorMXBeans.asScala.foreach {
      case em: javax.management.NotificationEmitter =>
        em.addNotificationListener(
          new javax.management.NotificationListener {
            override def handleNotification(
                n: javax.management.Notification, hb: Any): Unit =
              if (n.getType ==
                  "com.sun.management.gc.notification") {
                val info = com.sun.management
                  .GarbageCollectionNotificationInfo.from(
                    n.getUserData
                      .asInstanceOf[javax.management.openmbean.CompositeData])
                val after = info.getGcInfo.getMemoryUsageAfterGc.asScala
                  .collect { case (k, v) if heapPoolNames(k) => v.getUsed }
                  .sum
                val old = info.getGcInfo.getMemoryUsageAfterGc.asScala
                  .collect { case (k, v) if k.contains("Old") => v.getUsed }
                  .sum
                val stages = active.values.asScala.toSeq.sorted.take(3)
                lock.synchronized {
                  // drop async notifications for GCs that ended before
                  // the current window began
                  if (info.getGcInfo.getEndTime >= resetUptimeMs) {
                    if (after > postGcPeakBytes) {
                      postGcPeakBytes = after
                      atPostGcPeak = stages
                    }
                    if (old > oldGenPeakBytes) oldGenPeakBytes = old
                  }
                }
              }
          }, null, null)
      case _ => ()
    }

  private val listener = new SparkListener {
    override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit = {
      active.put(e.stageInfo.stageId,
        s"s${e.stageInfo.stageId}[${e.stageInfo.numTasks}t] " +
          e.stageInfo.name)
      ()
    }
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      active.remove(e.stageInfo.stageId)
      ()
    }
  }

  /** Idempotent per SparkContext (Bench recycles contexts); starts the
    * sampler thread once per JVM. */
  def install(sc: SparkContext): Unit = synchronized {
    if (installedOn != sc.applicationId) {
      sc.addSparkListener(listener)
      installedOn = sc.applicationId
      active.clear()
    }
    if (!started) {
      started = true
      subscribeGc()
      val t = new Thread(() => {
        val mx = ManagementFactory.getMemoryMXBean
        while (true) {
          val used = mx.getHeapMemoryUsage.getUsed
          val stages = active.values.asScala.toSeq.sorted.take(3)
          lock.synchronized {
            if (used > peakBytes) {
              peakBytes = used
              atPeak = stages
            }
          }
          Thread.sleep(20)
        }
      }, "graft-peakheap-sampler")
      t.setDaemon(true)
      t.start()
    }
  }

  def reset(): Unit = lock.synchronized {
    peakBytes = 0L; atPeak = Nil
    postGcPeakBytes = 0L; atPostGcPeak = Nil
    oldGenPeakBytes = 0L
    resetUptimeMs = ManagementFactory.getRuntimeMXBean.getUptime
  }
  /** Peak old-gen usage after any GC — promoted-survivor footprint
    * (still an over-estimate of live: mixed collections reclaim old
    * regions incrementally). */
  def oldGenPeakGb: Double = lock.synchronized(oldGenPeakBytes / 1e9)
  def peakGb: Double = lock.synchronized(peakBytes / 1e9)
  /** Max heap surviving any GC during the window — the live-footprint
    * (OOM-margin) metric. 0.0 when no GC ran in the window (footprint
    * never even forced a collection). */
  def postGcPeakGb: Double = lock.synchronized(postGcPeakBytes / 1e9)
  /** The stages live at the moment of the peak sample ("" when the
    * peak fell between stages — driver-side work). */
  def peakStage: String = lock.synchronized(atPeak.mkString(" | "))
  /** The stages live at the worst post-GC snapshot. */
  def postGcPeakStage: String =
    lock.synchronized(atPostGcPeak.mkString(" | "))
  def xmxGb: Double = Runtime.getRuntime.maxMemory / 1e9
  /** Instantaneous used heap — read by Bench right after its forced
    * inter-query System.gc() to record the post-forced-GC FLOOR next
    * to the post-GC PEAK (round-16 advice #3): the peak includes
    * everything that survived any GC mid-query (to-be-freed caches,
    * unpersist backlog), while the floor is what is STILL live once
    * the harness has collected everything collectable — a saturated
    * peak with a low floor is elastic pressure, not OOM risk. */
  def heapUsedNowGb: Double =
    ManagementFactory.getMemoryMXBean.getHeapMemoryUsage.getUsed / 1e9
}
