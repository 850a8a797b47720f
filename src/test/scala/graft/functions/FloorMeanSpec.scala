package graft.functions

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropSupport

/** The algebra that makes FloorMean safe to partial-aggregate: reducing
  * any split of the input and merging must equal reducing the whole. */
class FloorMeanSpec extends AnyFunSuite with PropSupport {

  private def reduceAll(xs: Seq[Long]): (Long, Long) =
    xs.foldLeft(FloorMean.zero)(FloorMean.reduce)

  test("merge of any split equals reduce of the whole (partial-agg law)") {
    val gen = Gen.zip(Gen.listOf(Gen.chooseNum(0L, 65535L)), Gen.chooseNum(0, 100))
    forAllN(gen) { case (xs, cut) =>
      val i = if (xs.isEmpty) 0 else cut % (xs.length + 1)
      val (a, b) = xs.splitAt(i)
      assert(FloorMean.merge(reduceAll(a), reduceAll(b)) == reduceAll(xs))
    }
  }

  test("finish truncates toward zero like the pyramid reducer") {
    forAllN(Gen.nonEmptyListOf(Gen.chooseNum(0L, 65535L))) { xs =>
      assert(FloorMean.finish(reduceAll(xs)) == xs.sum / xs.length)
    }
    assert(FloorMean.finish(FloorMean.zero) == 0L) // empty group guard
  }
}
