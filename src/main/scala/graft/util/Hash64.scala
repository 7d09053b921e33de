package graft.util

/** Deterministic 64-bit mixing (SplitMix64, public domain — Steele et al.,
  * "Fast Splittable Pseudorandom Number Generators", OOPSLA 2014).
  * Used by the synthetic transcript generator so every row is a pure
  * function of (seed, conv, turn) — no wall clock, no RNG state.
  */
object Hash64 {
  def mix(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** Hash a tuple of longs under a seed. */
  def h(seed: Long, parts: Long*): Long =
    parts.foldLeft(mix(seed))((acc, p) => mix(acc ^ p))

  /** Uniform in [0, n) — uses floorMod so negative hashes are fine. */
  def mod(x: Long, n: Long): Long = java.lang.Math.floorMod(x, n)
}
