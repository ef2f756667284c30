package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Multimodal

/** The mathematical core of the dup-planted media fixtures, stated as
  * PROPERTIES instead of fixture measurements: both perceptual kernels
  * are gradient-based, so a uniform level shift that does not WRAP the
  * sample range leaves the hash bit-identical — this is exactly why
  * [[Multimodal.dupMedia]]'s +m brightness re-encode and
  * [[Multimodal.dupAudio]]'s +m DC re-level produce structurally
  * identical within-group hashes (the "slightly re-encoded re-upload"
  * model), and why the fixture generators go to such lengths to change
  * the gradient SHAPE across groups (the measured fixture-entropy
  * lessons in their Scaladocs). The wrap caveat is also exercised: a
  * shift that wraps one sampled pixel CAN flip bits — the few-bit
  * tolerance the Hamming thresholds exist for. Generators driven with
  * explicit seeds, the EventCdcSpec convention (no scalatestplus
  * bridge in the offline cache).
  */
class PerceptualInvarianceSpec extends AnyFunSuite {

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("dHash is invariant under any non-wrapping uniform brightness shift") {
    val gen = for {
      w <- Gen.choose(9, 48)
      h <- Gen.choose(8, 48)
      seed <- Gen.choose(1L, 5000L)
      m <- Gen.choose(1, 54)
    } yield (w, h, seed, m)
    (0 until 60).foreach { i =>
      val (w, h, seed, m) = sample(gen, i.toLong)
      // pixels in [0, 200]: +m <= 54 never wraps the 8-bit range
      val px = Array.tabulate(w * h) { k =>
        (((seed * 31 + (k % w) * 7 + (k / w) * 13) % 201 + 201) % 201).toInt
      }
      val shifted = px.map(_ + m)
      assert(Multimodal.dHash(px, w, h) == Multimodal.dHash(shifted, w, h),
        s"dHash must ignore a +$m level shift at ${w}x$h seed=$seed")
    }
  }

  test("dHash brightness invariance BREAKS at the wrap boundary (the tolerance's reason)") {
    // one sampled pixel at 255 wraps under +1 in mod-256 arithmetic;
    // its gradient sign can flip — construct the wrap explicitly
    val (w, h) = (18, 8)
    val px = Array.fill(w * h)(100)
    px(w / 9) = 255 // the (gx=0, gy=0) right-neighbor sample
    val wrapped = px.map(v => (v + 1) % 256)
    val (h1hi, h1lo) = Multimodal.dHash(px, w, h)
    val (h2hi, h2lo) = Multimodal.dHash(wrapped, w, h)
    val d = java.lang.Long.bitCount(h1hi ^ h2hi) + java.lang.Long.bitCount(h1lo ^ h2lo)
    assert(d <= 3, s"a single wrapped sample must cost at most a few bits, got $d")
  }

  test("audioFingerprint is invariant under any non-clipping uniform DC shift") {
    val gen = for {
      n <- Gen.choose(64, 700)
      seed <- Gen.choose(1L, 5000L)
      m <- Gen.choose(1, 500)
    } yield (n, seed, m)
    (0 until 60).foreach { i =>
      val (n, seed, m) = sample(gen, 1000L + i)
      val s = Array.tabulate(n)(f => ((seed * 131 + f.toLong * 17) % 30001 - 15000).toInt)
      val shifted = s.map(_ + m) // |s| <= 15000, +m <= 500: no int16 clip
      assert(Multimodal.audioFingerprint(s) == Multimodal.audioFingerprint(shifted),
        s"fingerprint must ignore a +$m DC shift at n=$n seed=$seed")
    }
  }

  test("audioFingerprint distinguishes shape changes (coefficient scatter, the fixture lesson)") {
    // two signals with the same DC but different quadratic SHAPE must
    // not collide — the dupAudio lesson 3: group identity must live in
    // the coefficients, or DC-invariance makes groups twins
    val n = 256
    val a = Array.tabulate(n)(f => ((31L * f * f + 17L * f) % 32003 - 16001).toInt)
    val b = Array.tabulate(n)(f => ((50L * f * f + 24L * f) % 32003 - 16001).toInt)
    val (ahi, alo) = Multimodal.audioFingerprint(a)
    val (bhi, blo) = Multimodal.audioFingerprint(b)
    val d = java.lang.Long.bitCount(ahi ^ bhi) + java.lang.Long.bitCount(alo ^ blo)
    assert(d > 6, s"different gradient shapes must exceed the dup threshold, got hamming $d")
  }
}
