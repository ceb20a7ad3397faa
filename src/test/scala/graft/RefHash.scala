package graft

/** The documented [[graft.ext.Sampling.hash64]] formula, independently
  * restated on plain JVM longs (split into 31-bit halves → per-half
  * multiply + xor-shift → combining multiply → final xor-shift) so specs
  * can cross-check survivor sets and orders without touching Spark. */
object RefHash {

  def hash64(key: Long, seed: Long): Long = {
    // splitmix64-style lane-seed derivation (full 64-bit seed enters).
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    val sLo = z & 0x7FFFFFFFL
    val sHi = (z >>> 31) & 0x7FFFFFFFL
    val k0 = key & 0x7FFFFFFFL
    val k1 = key >>> 31 // upper 32 bits, whole — no fold, no 2^62 family
    val h1 = ((k0 + sLo) & 0x7FFFFFFFL) * 2654435761L
    val g1 = h1 ^ (h1 >>> 31) // unmasked: low lane stays injective
    val h2 = (k1 + sHi) * 486187739L
    val g2 = (h2 ^ (h2 >>> 31)) & 0x7FFFFFFFL
    val h3 = g1 ^ (g2 * 2654435761L)
    h3 ^ (h3 >>> 29)
  }

  def bucket(key: Long, seed: Long): Long = hash64(key, seed) % 10000L

  /** The [[graft.ext.Sampling.orderKey]] wrap-mix finalizer restated:
    * low 31 bits through a WRAPPED odd multiply to the high position
    * (breaking hash64's order-preserving no-wrap low lane), hash bits
    * 32..62 below. */
  def orderKey(key: Long, seed: Long): Long = {
    val h = hash64(key, seed)
    val a = ((h & 0x7FFFFFFFL) * 2654435761L) & 0x7FFFFFFFL
    a * 2147483648L + ((h >>> 32) & 0x7FFFFFFFL)
  }
}
