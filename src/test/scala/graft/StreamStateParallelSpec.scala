package graft

import org.scalatest.funsuite.AnyFunSuite

/** StreamState.inParallel's settle contract (r14 ADVICE): any outcome
  * — success, action failure, or an interrupt of the WAITING batch
  * thread — propagates only after every action has finished, so a
  * caller's batch-retry cleanup can never race a still-running write.
  */
class StreamStateParallelSpec extends AnyFunSuite {
  import graft.streaming.StreamState.inParallel

  test("all actions run; one failure propagates its ORIGINAL exception after every action settled") {
    val ran = new java.util.concurrent.atomic.AtomicInteger(0)
    val boom = new IllegalStateException("boom")
    val slowDone = new java.util.concurrent.atomic.AtomicBoolean(false)
    val e = intercept[IllegalStateException] {
      inParallel(
        () => { Thread.sleep(50); ran.incrementAndGet(); throw boom },
        () => { Thread.sleep(300); ran.incrementAndGet(); slowDone.set(true) },
        () => { ran.incrementAndGet(); () })
    }
    assert(e eq boom) // unwrapped, not an ExecutionException
    assert(ran.get == 3)
    // the failure waited for the SLOWEST action, not just its own
    assert(slowDone.get)
  }

  test("interrupting the waiting thread forwards to workers but still settles every action before propagating") {
    val settled = new java.util.concurrent.atomic.AtomicInteger(0)
    val sawInterrupt = new java.util.concurrent.atomic.AtomicBoolean(false)
    val result = new java.util.concurrent.atomic.AtomicReference[String]("none")
    val caller = new Thread(() => {
      try {
        inParallel(
          () => { // interrupt-aware action: bails early when forwarded
            try Thread.sleep(5000)
            catch { case _: InterruptedException => sawInterrupt.set(true) }
            settled.incrementAndGet(); ()
          },
          () => { // interrupt-oblivious action: runs to completion
            val t0 = System.nanoTime()
            var x = 1L
            while ((System.nanoTime() - t0) < 400e6)
              x = x * 6364136223846793005L + 1L
            if (x == 42L) println("")
            settled.incrementAndGet(); ()
          })
        result.set("returned")
      } catch {
        case _: InterruptedException => result.set("interrupted")
        case t: Throwable => result.set(s"other:$t")
      }
    })
    caller.start()
    Thread.sleep(100)
    caller.interrupt()
    caller.join(10000)
    assert(!caller.isAlive)
    // BOTH actions settled before anything propagated — including the
    // CPU-bound one that ignores interrupts
    assert(settled.get == 2)
    assert(sawInterrupt.get) // the forward reached the sleeping action
    assert(result.get == "interrupted")
  }

  test("empty and single-action fast paths") {
    inParallel() // no-op
    var ran = false
    inParallel(() => { ran = true })
    assert(ran)
  }
}
