package graft.util

/** Shared thread plumbing for the serving-side pools (hybrid two-worker,
  * multi-repo fan-out): one place for the named-daemon-thread contract
  * instead of per-call-site anonymous factories. */
object Threads {

  /** A ThreadFactory producing daemon threads named `<prefix>-<n>` —
    * daemons so a stuck search can never pin the JVM. */
  def namedDaemonFactory(prefix: String): java.util.concurrent.ThreadFactory =
    new java.util.concurrent.ThreadFactory {
      private val n = new java.util.concurrent.atomic.AtomicInteger(0)
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, s"$prefix-${n.getAndIncrement()}")
        t.setDaemon(true)
        t
      }
    }
}
