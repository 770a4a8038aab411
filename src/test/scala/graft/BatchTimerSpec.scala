package graft

import graft.streaming.BatchTimer
import org.scalatest.funsuite.AnyFunSuite

/** The scenario artifact's per-batch recorder: epoch discipline (r13
  * ADVICE — a micro-batch thread still inside timed() when stop()
  * drains must not leak its sample into the NEXT scenario's p95),
  * transparency when disabled, and the note() face.
  */
class BatchTimerSpec extends AnyFunSuite {

  test("disabled: timed is transparent, note records nothing") {
    // never enabled here — timed must just run the body
    var ran = false
    val r = BatchTimer.timed("off") { ran = true; 42 }
    assert(ran && r == 42)
    BatchTimer.note("off", 1.0)
    BatchTimer.start()
    assert(BatchTimer.stop().isEmpty) // nothing leaked in while disabled
  }

  test("samples and notes drain per epoch; a straggler from a stopped epoch never lands in the next one") {
    BatchTimer.start()
    BatchTimer.timed("a") { () }
    BatchTimer.note("a.rounds", 3.0)
    // a thread that captured THIS epoch but finishes after stop():
    // simulate by grabbing the closure now and firing it post-stop
    val latch = new java.util.concurrent.CountDownLatch(1)
    val straggler = new Thread(() => {
      BatchTimer.timed("straggler") { latch.await() }
    })
    straggler.start()
    Thread.sleep(50) // let it enter timed() under the current epoch
    val drained = BatchTimer.stop()
    assert(drained.map(_._1).sorted == Seq("a", "a.rounds"))
    // scenario 2 starts; the straggler completes DURING it
    BatchTimer.start()
    latch.countDown()
    straggler.join()
    BatchTimer.timed("b") { () }
    val second = BatchTimer.stop()
    // the straggler's sample carries the OLD epoch — filtered out
    assert(second.map(_._1) == Seq("b"),
      s"straggler leaked into the next scenario: $second")
  }

  test("p95 is nearest-rank") {
    assert(BatchTimer.p95(Nil) == -1.0)
    assert(BatchTimer.p95(Seq(5.0)) == 5.0)
    val xs = (1 to 100).map(_.toDouble)
    assert(BatchTimer.p95(xs) == 95.0)
  }
}
