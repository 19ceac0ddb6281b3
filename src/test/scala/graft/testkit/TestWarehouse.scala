package graft.testkit

/** Run a Cli-driven test body against a FRESH warehouse (via the
  * `-Dgraft.warehouse` hook): reruns can't trip put's 60 s recent-update
  * guard on leftovers, and tests can't see each other's files. The
  * property is set before anything can fail and always removed. */
object TestWarehouse {
  def withFresh[T](body: => T): T = {
    val wh = java.nio.file.Files.createTempDirectory("graft_test_wh").toString
    sys.props("graft.warehouse") = wh
    try body finally sys.props.remove("graft.warehouse")
  }
}
