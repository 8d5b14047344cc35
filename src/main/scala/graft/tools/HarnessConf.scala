package graft.tools

/** Session-level stability tuning shared by the harness mains
  * (Bench / Verify / ScaleBench), from the round-15 heap-margin
  * campaign:
  *
  *  - spill read-ahead OFF: the read-ahead thread allocates its
  *    buffers inside JNI critical regions; under 32 spilling tasks
  *    those regions starve the JDK-17 G1 GCLocker (measured
  *    "Retried waiting for GCLocker too often" → spurious OOM).
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
  def tuning: Map[String, String] =
    Map("spark.unsafe.sorter.spill.read.ahead.enabled" ->
      sys.env.getOrElse("GRAFT_READ_AHEAD", "false")) ++
      sys.env.get("GRAFT_PAGE_SIZE")
        .filter(_ != "default")
        .map("spark.buffer.pageSize" -> _)
}
