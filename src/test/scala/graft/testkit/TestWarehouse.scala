package graft.testkit

/** Run a Cli-driven test body against a FRESH warehouse (via the
  * `-Dgraft.warehouse` hook): reruns can't trip put's 60 s recent-update
  * guard on leftovers, and tests can't see each other's files.
  *
  * The `graft.warehouse` system property is GLOBAL mutable state, so
  * bodies are serialized on a lock and the previous value is restored on
  * exit (nesting-safe). Suites in this project run sequentially (no
  * Test/testForkedParallel) — the lock makes that assumption explicit
  * rather than load-bearing. */
object TestWarehouse {
  private val lock = new Object
  def withFresh[T](body: => T): T = lock.synchronized {
    val wh = java.nio.file.Files.createTempDirectory("graft_test_wh").toString
    val prev = sys.props.get("graft.warehouse")
    sys.props("graft.warehouse") = wh
    try body finally prev match {
      case Some(v) => sys.props("graft.warehouse") = v
      case None => sys.props.remove("graft.warehouse")
    }
  }
}
