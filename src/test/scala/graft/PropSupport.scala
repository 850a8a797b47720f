package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property-check helper (the scalatestplus
  * bridge isn't in the offline cache). Draws `n` samples from a Gen
  * with fixed seeds so failures reproduce.
  */
trait PropSupport {
  def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      val a = gen.pureApply(Gen.Parameters.default, Seed(i.toLong))
      try f(a)
      catch {
        case e: Throwable =>
          throw new AssertionError(s"property failed for sample #$i: $a", e)
      }
    }

  def forAllN2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 100)(f: (A, B) => Unit): Unit =
    forAllN(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  def forAllN3[A, B, C](ga: Gen[A], gb: Gen[B], gc: Gen[C], n: Int = 100)(
      f: (A, B, C) => Unit): Unit =
    forAllN(Gen.zip(ga, gb, gc), n) { case (a, b, c) => f(a, b, c) }
}
