package graft.io

/** In-band accounting of SESSION-STAGING time — the seconds a query's
  * timed window spends building memoized staged frames/replay corpora
  * ([[StagedFrame.memo]], the streaming `Stage.memo`) rather than running
  * its own computation. Staging is paid by the FIRST consumer of each
  * staged key in a session (streams run 1 rep, so their minima can't
  * amortize it away); the bench reads this clock around every query and
  * reports the split so a reader can separate "the stream got slower"
  * from "this invocation happened to pay the staging I/O" without
  * changing what is measured (the total still includes staging).
  */
object StageClock {

  private val total = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Cumulative staging seconds this session. */
  def totalSecs: Double = total.get() / 1e9

  /** Time `build`, charging its wall-clock to the staging account. */
  def timed[T](build: => T): T = {
    val t0 = System.nanoTime()
    try build finally total.addAndGet(System.nanoTime() - t0)
  }
}
