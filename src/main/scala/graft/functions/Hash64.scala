package graft.functions

import java.nio.charset.StandardCharsets

/** JVM-side XXH64 (the public xxHash 64-bit algorithm), bit-identical to
  * Spark's `xxhash64` column function at the same seed (Spark hashes the
  * UTF-8 bytes of a string with seed 42). Lets per-partition fast paths
  * (e.g. [[graft.dedup.MinHash.signatureDataset]]) produce hashes that
  * agree with the codegen'd Column form, and gives shingle identities a
  * true 64 bits of entropy (birthday collisions ~n²/2⁶⁵ — negligible at
  * corpus scale, unlike a 32-bit-seeded mix whose ~n²/2³³ collisions
  * would silently poison exact-Jaccard verification).
  */
object Hash64 {

  private final val P1 = 0x9e3779b185ebca87L
  private final val P2 = 0xc2b2ae3d27d4eb4fL
  private final val P3 = 0x165667b19e3779f9L
  private final val P4 = 0x85ebca77c2b2ae63L
  private final val P5 = 0x27d4eb2f165667c5L

  /** Spark's xxhash64 seed for column hashing. */
  final val SparkSeed = 42L

  /** splitmix64's golden-ratio increment. */
  final val Golden = 0x9e3779b97f4a7c15L

  /** The splitmix64 avalanche finalizer (Steele et al.) — the single
    * shared implementation behind every derived-seed / fingerprint-mix
    * use in the library (MinHash permutation seeds, winnow fingerprint
    * finalization, hyperplane generation). */
  @inline def mix64(x: Long): Long = {
    var z = x
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** One splitmix64 draw for a given seed: mix64(seed + Golden). */
  @inline def splitmix64(seed: Long): Long = mix64(seed + Golden)

  /** xxhash64 of a string's UTF-8 bytes with Spark's seed — matches
    * `functions.xxhash64(col)` on a StringType column. */
  def xxhash64String(s: String): Long =
    xxhash64(s.getBytes(StandardCharsets.UTF_8), SparkSeed)

  def xxhash64(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var h: Long = 0L
    var i = 0
    if (len >= 32) {
      var v1 = seed + P1 + P2
      var v2 = seed + P2
      var v3 = seed
      var v4 = seed - P1
      val limit = len - 32
      while (i <= limit) {
        v1 = round(v1, readLong(bytes, i))
        v2 = round(v2, readLong(bytes, i + 8))
        v3 = round(v3, readLong(bytes, i + 16))
        v4 = round(v4, readLong(bytes, i + 24))
        i += 32
      }
      h = java.lang.Long.rotateLeft(v1, 1) + java.lang.Long.rotateLeft(v2, 7) +
        java.lang.Long.rotateLeft(v3, 12) + java.lang.Long.rotateLeft(v4, 18)
      h = mergeRound(h, v1)
      h = mergeRound(h, v2)
      h = mergeRound(h, v3)
      h = mergeRound(h, v4)
    } else {
      h = seed + P5
    }
    h += len
    while (i + 8 <= len) {
      h ^= round(0L, readLong(bytes, i))
      h = java.lang.Long.rotateLeft(h, 27) * P1 + P4
      i += 8
    }
    if (i + 4 <= len) {
      h ^= (readInt(bytes, i) & 0xffffffffL) * P1
      h = java.lang.Long.rotateLeft(h, 23) * P2 + P3
      i += 4
    }
    while (i < len) {
      h ^= (bytes(i) & 0xffL) * P5
      h = java.lang.Long.rotateLeft(h, 11) * P1
      i += 1
    }
    h ^= h >>> 33
    h *= P2
    h ^= h >>> 29
    h *= P3
    h ^= h >>> 32
    h
  }

  @inline private def round(acc: Long, input: Long): Long =
    java.lang.Long.rotateLeft(acc + input * P2, 31) * P1

  @inline private def mergeRound(acc: Long, v: Long): Long =
    (acc ^ round(0L, v)) * P1 + P4

  @inline private def readLong(b: Array[Byte], i: Int): Long =
    (b(i) & 0xffL) |
      ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) |
      ((b(i + 3) & 0xffL) << 24) |
      ((b(i + 4) & 0xffL) << 32) |
      ((b(i + 5) & 0xffL) << 40) |
      ((b(i + 6) & 0xffL) << 48) |
      ((b(i + 7) & 0xffL) << 56)

  @inline private def readInt(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) |
      ((b(i + 1) & 0xff) << 8) |
      ((b(i + 2) & 0xff) << 16) |
      ((b(i + 3) & 0xff) << 24)
}
