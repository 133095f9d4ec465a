package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Pure-function properties of the bounded-heap buffer — no Spark
  * session needed. The split property is the one partial aggregation
  * relies on: any partitioning of the input into map-side buffers,
  * merged in any order, must equal the sequential fold. */
class TopKPerKeySpec extends AnyFunSuite {

  private val agg = new TopKPerKey(3)

  private def fold(xs: Seq[Scored]): Seq[Scored] =
    xs.foldLeft(agg.zero)(agg.reduce).toSeq

  private def reference(xs: Seq[Scored]): Seq[Scored] =
    xs.sortBy(s => (-s.value, s.id)).take(3)

  // small value/id domains force value ties and id collisions — the
  // cases where a sloppy comparator would diverge from the window SQL
  private val scoredGen: Gen[Scored] = for {
    v <- Gen.chooseNum(-10, 10)
    id <- Gen.chooseNum(0L, 20L)
  } yield Scored(v / 2.0, id)

  private val listGen = Gen.listOf(scoredGen)

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (1 to n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("sequential fold equals sort-and-take reference") {
    samples(listGen, 200).foreach { xs =>
      assert(fold(xs) == reference(xs), s"input: $xs")
    }
  }

  test("any split of the input, merged in either order, equals the fold") {
    samples(Gen.zip(listGen, Gen.chooseNum(0, 100)), 200).foreach {
      case (xs, cutPct) =>
        val (a, b) = xs.splitAt(xs.length * cutPct / 100)
        val ba = a.foldLeft(agg.zero)(agg.reduce)
        val bb = b.foldLeft(agg.zero)(agg.reduce)
        assert(agg.merge(ba, bb).toSeq == reference(xs), s"input: $xs")
        assert(agg.merge(bb, ba).toSeq == reference(xs), s"input: $xs")
    }
  }

  test("buffer never exceeds k and stays sorted") {
    samples(listGen, 200).foreach { xs =>
      val buf = fold(xs)
      assert(buf.length <= 3)
      assert(buf == buf.sortBy(s => (-s.value, s.id)))
    }
  }
}
