package graft.tools

/** Session-level stability tuning shared by the harness mains
  * (Bench / Verify / ScaleBench), from the round-15 heap-margin
  * campaign — made SCALE-CONDITIONAL in round 16 after the A/B
  * attribution of the sf0.1 floor slip (SCALE.md "Round-16 floor
  * attribution"):
  *
  *  - spill read-ahead: the read-ahead thread allocates its buffers
  *    inside JNI critical regions; under 32 heavily-spilling tasks
  *    those regions starve the JDK-17 G1 GCLocker (measured "Retried
  *    waiting for GCLocker too often" → spurious OOM at the ×100
  *    fixture). But the SAME read-ahead measurably HELPS the
  *    spill-heavy dedup queries at small SF (A/B full-registry runs:
  *    q113 2.82→1.89 s, q163 3.87→2.99, q112/q232/q233 −0.4..−0.8 s
  *    with read-ahead on at sf0.1, where spills are small and the
  *    GCLocker never starves). So the off-switch keys on the MEASURED
  *    fixture size — the GCLocker-starvation regime needs big spills —
  *    with GRAFT_READ_AHEAD overriding for experiments.
  *  - spark.buffer.pageSize is NOT overridden by default. An
  *    experiment pinning it to 2 MB to avoid humongous G1
  *    allocations backfired: the many-small-pages regime made
  *    q247's big hash relations OOM where the default page sizing
  *    ran clean (TaskMemoryManager "Failed to allocate a page"
  *    storms). GRAFT_PAGE_SIZE overrides for experiments.
  *
  * The companion JVM-level flags live in build.sbt javaOptions /
  * tools/run_direct.sh: -XX:+UnlockDiagnosticVMOptions
  * -XX:GCLockerRetryAllocationCount=64.
  */
object HarnessConf {

  /** Fixture-size threshold above which spill read-ahead is disabled:
    * the ×100 fixture is ~1.6 GB, sf0.1 is ~18 MB — the starvation
    * regime sits orders of magnitude above the floor fixtures. */
  private val ReadAheadOffBytes = 256L * 1024 * 1024

  /** Same threshold, exported for the harness mains' other
    * scale-conditional defaults (Bench's inter-query GC policy:
    * "auto" protects the sf0.1 floor from per-query Full-GC cache
    * clearing, but at ×100 the deterministic broadcast reclamation is
    * worth the GC — measured: two auto-mode ×100 sweeps ran +10-16%
    * over the round-15 always-GC pair on shared queries, with the
    * broadcast-heavy MinHash family carrying the regression). */
  def isBigFixture(sfDir: String): Boolean =
    dirBytes(sfDir) > ReadAheadOffBytes

  private def dirBytes(dir: String): Long =
    try {
      // full recursive walk (round-16 advice): a nested/partitioned
      // parquet fixture under-measured by a one-level listing would
      // be misclassified as small and re-enable spill read-ahead in
      // exactly the big-spill GCLocker-starvation regime the
      // scale-conditional default exists to avoid
      def walk(f: java.io.File): Long =
        if (f.isDirectory) {
          val kids = f.listFiles()
          if (kids == null) 0L else kids.map(walk).sum
        } else f.length()
      val d = new java.io.File(dir)
      if (!d.isDirectory) 0L else walk(d)
    } catch { case _: Throwable => 0L }

  /** Tuning for a session that will read `sfDir`. */
  def tuning(sfDir: String): Map[String, String] = {
    val readAhead = sys.env.get("GRAFT_READ_AHEAD").getOrElse {
      if (dirBytes(sfDir) > ReadAheadOffBytes) "false" else "true"
    }
    Map("spark.unsafe.sorter.spill.read.ahead.enabled" -> readAhead) ++
      sys.env.get("GRAFT_PAGE_SIZE")
        .filter(_ != "default")
        .map("spark.buffer.pageSize" -> _)
  }
}
