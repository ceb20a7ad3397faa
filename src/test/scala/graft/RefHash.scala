package graft

/** The documented [[graft.ext.Sampling.hash64]] formula, independently
  * restated on plain JVM longs (split into 31-bit halves → per-half
  * multiply + xor-shift → combining multiply → final xor-shift) so specs
  * can cross-check survivor sets and orders without touching Spark. */
object RefHash {

  def hash64(key: Long, seed: Long): Long = {
    val s = seed & 0x7FFFFFFFL
    val k0 = key & 0x7FFFFFFFL
    val k1 = key >>> 31 // upper 32 bits, whole — no fold, no 2^62 family
    val h1 = ((k0 + s) & 0x7FFFFFFFL) * 2654435761L
    val g1 = (h1 ^ (h1 >>> 31)) & 0x7FFFFFFFL
    val h2 = (k1 + s) * 486187739L
    val g2 = (h2 ^ (h2 >>> 31)) & 0x7FFFFFFFL
    val h3 = (g1 ^ g2) * 2654435761L
    h3 ^ (h3 >>> 29)
  }

  def bucket(key: Long, seed: Long): Long = hash64(key, seed) % 10000L
}
