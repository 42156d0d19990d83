package graft.operators

/** Test-only forked-JVM probe for the writer lease: the interesting
  * half of the protocol is mutual exclusion between two PROCESSES
  * (heartbeat keeping a long night alive, stale takeover after the
  * holder dies, exactly-one-winner on a takeover re-race), which the
  * in-process lease table cannot exercise. IncrementalSpec forks this
  * main in a second JVM against the same artifact root.
  *
  * Modes (all with staleMs = 3000 so the spec's waits stay short):
  *   hold <ms>  acquire, print HELD, sleep <ms> (heartbeating), release
  *   try <ms>   attempt acquire; if won hold <ms> then print WON,
  *              else print LOST (fail-loud ConcurrentNightWriter)
  */
object LeaseProbe {
  def main(args: Array[String]): Unit = {
    val d = Incremental.Dirs(args(0))
    val ms = args(2).toLong
    args(1) match {
      case "hold" =>
        Incremental.withWriterLock(d, staleMs = 3000L) {
          println("HELD"); System.out.flush()
          Thread.sleep(ms)
        }
        println("RELEASED")
      case "try" =>
        try {
          Incremental.withWriterLock(d, staleMs = 3000L)(Thread.sleep(ms))
          println("WON")
        } catch {
          case _: Incremental.ConcurrentNightWriter => println("LOST")
        }
    }
    System.out.flush()
  }
}
