package graft

/** Shared session config helpers for the driver-contract mains. */
object GraftSession {
  /** Whole-stage-codegen compile cache size. Spark's default is 100
    * entries — sized for a handful of long-running queries, not for
    * an engine that executes hundreds of distinct plans (and, with
    * AQE, several codegen stages per plan) in one session. At the
    * default the cache thrashes: every task set re-enters Janino
    * compilation and 31 of 32 task threads queue on the compile
    * cache's per-key lock (measured with JFR on w08: 53.8 s of
    * monitor-wait in a 40 s window; raising the cache cut the query's
    * steady wall 10.5 s → 7.4 s and halved its task CPU). The value
    * is workload-shaped (distinct codegen units), not machine-shaped
    * — the same setting is right on a cluster driver. Generated
    * classes are small; 10k entries is a few hundred MB worst case. */
  val CodegenCacheEntries = "10000"

  /** Shuffle-merge copy strategy for THIS host. The bypass-merge
    * shuffle writer concatenates its per-reducer files with
    * FileChannel.transferTo, which the JDK implements via mmap — and
    * on this microVM mmap is disproportionately expensive (the same
    * host quirk that puts spark.local.dir on /dev/shm). JFR/jstack
    * during x105 showed 23 of 32 task threads inside
    * FileChannelImpl.map0; flipping to the plain buffered copy cut
    * x105's summed task run time 77 s → 18 s and its wall ~9.6 →
    * ~8.0 s. On ordinary cluster hardware transferTo is the right
    * default — this constant is the LOCAL harness tuning, overridable
    * per deployment via --conf spark.file.transferTo=true. */
  val FileTransferTo = "false"
  /** Shuffle/spill directory on tmpfs: this build host is a microVM
    * where file syscalls are disproportionately expensive; putting
    * Spark's local dirs in memory removes multi-second stalls. Falls
    * back to /tmp when /dev/shm is unavailable. Created eagerly —
    * Spark expects the configured root to exist. */
  lazy val localDir: String = {
    val preferred = java.nio.file.Paths.get("/dev/shm/spark-local")
    try {
      java.nio.file.Files.createDirectories(preferred)
      preferred.toString
    } catch {
      case _: Exception =>
        val fb = java.nio.file.Paths.get("/tmp/spark-local")
        java.nio.file.Files.createDirectories(fb)
        fb.toString
    }
  }
}
