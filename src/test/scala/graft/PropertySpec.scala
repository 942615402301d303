package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.util.Durations

/** ScalaCheck-generator property coverage (SURVEY.md §5.4) — sampled
  * through plain funsuite (no scalatestplus bridge in the offline env).
  */
class PropertySpec extends AnyFunSuite {

  private def samples[A](g: Gen[A], n: Int = 300): Seq[A] =
    Iterator.continually(g.sample).flatten.take(n).toSeq

  test("Durations: normalize is idempotent and unit-consistent") {
    val units = Map("s" -> 1L, "sec" -> 1L, "seconds" -> 1L,
      "m" -> 60L, "min" -> 60L, "h" -> 3600L, "hours" -> 3600L,
      "d" -> 86400L, "days" -> 86400L)
    val gen = for {
      n <- Gen.choose(1, 100000)
      u <- Gen.oneOf(units.keys.toSeq)
    } yield (n, u)
    samples(gen).foreach { case (n, u) =>
      val canonical = Durations.normalize(s"$n$u")
      assert(Durations.normalize(canonical) == canonical)
      assert(Durations.toSeconds(s"$n $u") == n * units(u))
    }
  }

  test("sliding-window arithmetic: events ≥ W-S ms in are in exactly W/S windows") {
    val w = 60L; val s = 10L
    samples(Gen.choose(60000L, 10000000L)).foreach { tMs =>
      val tS = tMs / 1000.0
      val base = math.floor(tS / s).toLong * s
      val starts = (0L until (w / s)).map(k => base - k * s)
        .filter(st => st <= tS && tS < st + w)
      assert(starts.size == w / s,
        s"event at ${tMs}ms must be in ${w / s} windows, got ${starts.size}")
    }
  }

  test("minhash affine permutations stay in range without overflow") {
    import graft.extra.Dedup
    val gen = for {
      h <- Gen.choose(0L, (1L << 48) - 1)
      i <- Gen.choose(0, 15)
    } yield (h, i)
    samples(gen).foreach { case (h, i) =>
      assert(h * Dedup.minhashA(i) >= 0, "no overflow for 48-bit h")
      val v = (h * Dedup.minhashA(i) + Dedup.minhashB(i)) % Dedup.MinhashP
      assert(v >= 0 && v < Dedup.MinhashP)
    }
  }

  test("simhash token hash: shift invariance under identical strings, range bound") {
    import graft.extra.Dedup
    val tok = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
    samples(tok, 100).foreach { t =>
      // pure recomputation of the expression semantics
      val h = t.foldLeft(0L)((acc, c) => (acc * 31 + c.toInt) % (1 << Dedup.SimhashBits))
      assert(h >= 0 && h < (1 << Dedup.SimhashBits))
    }
  }
}
