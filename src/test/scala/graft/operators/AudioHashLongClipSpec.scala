package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Regression for the Int-overflow bin-boundary bug: `b * n / Bins` with
  * Int arithmetic wraps once b*n exceeds 2^31 — i.e. any clip past
  * ~33 M frames (a ~12.5-minute mono 44.1 kHz recording), well inside
  * what a real crawl carries. The wrapped product lands in-range-but-
  * wrong for n ≳ 67 M, silently mis-binning the clip into a WRONG
  * fingerprint with decoded=true. Long arithmetic in the boundary
  * computation makes the bin rule exact for every n an Int frame count
  * can represent. Lives in package graft.operators to reach the
  * private[operators] `fingerprintOf` directly — a 70 M-frame WAV byte
  * array would be ~140 MB, but the bin rule itself needs no codec.
  */
class AudioHashLongClipSpec extends AnyFunSuite {

  test("70M-frame clip (b*n overflows Int): strictly increasing ramp " +
    "yields all-64-bits-set, decreasing ramp yields zero") {
    val n = 70_000_000 // 31 * n > 2^31: every bin boundary past b=30 wraps in Int
    // amplitude = frame index: each of the 65 bins holds ~1.07M frames,
    // bin means are strictly increasing midpoints, so every adjacent
    // delta bit must be set.
    assert(AudioHash.fingerprintOf(n, 1, (f, _) => f.toLong) == -1L,
      "increasing ramp over a 70M-frame clip must set all 64 bits")
    // Mirror: strictly decreasing amplitudes clear every bit.
    assert(AudioHash.fingerprintOf(n, 1, (f, _) => (n - f).toLong) == 0L,
      "decreasing ramp over a 70M-frame clip must clear all 64 bits")
  }

  test("bin boundaries partition the frame range exactly at large n " +
    "(each frame visited once: mean of a constant signal is exact)") {
    val n = 67_000_000 // the in-range-but-wrong Int-wrap regime
    // Constant amplitude: every bin mean is 42, no bit set. Under the
    // wrapped Int boundaries some bins straddled garbage ranges and the
    // invariants below failed.
    assert(AudioHash.fingerprintOf(n, 1, (_, _) => 42L) == 0L)
  }
}
