package graft

/** The documented [[graft.ext.Sampling.hash64]] formula, independently
  * restated on plain JVM longs (split into 31-bit halves → per-half
  * multiply + xor-shift → combining multiply → final xor-shift) so specs
  * can cross-check survivor sets and orders without touching Spark. */
object RefHash {

  def hash64(key: Long, seed: Long): Long = {
    val s = seed & 0x7FFFFFFFL
    val k0 = key & 0x7FFFFFFFL
    val k1r = key >>> 31
    val k1 = (k1r ^ (k1r >>> 31)) & 0x7FFFFFFFL
    val h1 = ((k0 + s) & 0x7FFFFFFFL) * 2654435761L
    val g1 = (h1 ^ (h1 >>> 31)) & 0x7FFFFFFFL
    val h2 = ((k1 + s) & 0x7FFFFFFFL) * 2246822519L
    val g2 = (h2 ^ (h2 >>> 31)) & 0x7FFFFFFFL
    val h3 = (g1 ^ g2) * 2654435761L
    h3 ^ (h3 >>> 29)
  }

  def bucket(key: Long, seed: Long): Long = hash64(key, seed) % 10000L
}
