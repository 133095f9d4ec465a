package graft

/** Shared session config helpers for the driver-contract mains. */
object GraftSession {
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
