package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable universal hash family: `h_i(s) = (a_i * w(s) + b_i)
  * mod P`, where `w(s)` is the first 8 hex chars of `md5(s)` read as an
  * unsigned 32-bit integer, folded below 2^30 so every intermediate
  * stays under 2^61 (safe under ANSI overflow checking — and under
  * engines like DuckDB whose BIGINT arithmetic errors on overflow
  * rather than wrapping).
  *
  * Three synchronized forms of the same function:
  *  - [[h]] — a Catalyst `Column` (codegen'd md5 + integer ops);
  *  - [[hBytes]] — JVM-side, for imperative sketch aggregates
  *    ([[CountMinAgg]]'s portable mode) — bit-identical to [[h]];
  *  - [[hSql]] — ANSI SQL text for the DuckDB oracles.
  *
  * Why this family exists next to the xxhash64-seeded ones: xxhash64 is
  * engine-internal, so sketches built on it (MinHash signatures,
  * SimHash planes, Count-Min grids) can only get rows-only driver
  * checks. md5 is bit-identical across Spark, DuckDB, and every other
  * engine that ships RFC 1321, which upgrades those sketch queries to
  * full hash-compare oracles. The affine step costs one md5 per VALUE
  * (not per value*seed) plus two integer ops per seed — cheaper than
  * k independent md5s and a standard Carter-Wegman construction.
  */
object PortableHash {
  /** Modulus: 2^31 - 1 (Mersenne prime). */
  val P = 2147483647L

  /** The md5 word is folded below 2^30: a_i < P < 2^31, so
    * a_i * (w % M) < 2^61 — no 64-bit overflow on any engine. */
  val M = 1L << 30

  // Deterministic per-seed coefficients from a fixed SplitMix64-style
  // scramble (computed JVM-side only; the plans and oracle SQL embed
  // the resulting LITERALS, so nothing below needs to be portable).
  private def scramble(k: Long): Long = {
    var z = k + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  def a(i: Int): Long = Math.floorMod(scramble(2L * i), P - 1) + 1
  def b(i: Int): Long = Math.floorMod(scramble(2L * i + 1), P)

  /** First 8 md5 hex chars as an unsigned 32-bit value (Column form). */
  def md5w(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** Seeded portable hash in [0, P) (Column form). */
  def h(c: Column, i: Int): Column =
    (lit(a(i)) * (md5w(c) % lit(M)) + lit(b(i))) % lit(P)

  /** `md5w` over raw bytes (JVM form) — matches [[md5w]] on the UTF-8
    * encoding of the same string. */
  def md5wBytes(bytes: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    // first 4 digest bytes == first 8 hex chars, big-endian
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Seeded portable hash (JVM form) — bit-identical to [[h]]. */
  def hBytes(bytes: Array[Byte], i: Int): Long =
    (a(i) * (md5wBytes(bytes) % M) + b(i)) % P

  /** `md5w` as DuckDB SQL over expression text `e`. */
  def md5wSql(e: String): String =
    s"CAST(concat('0x', substring(md5(CAST($e AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** Seeded portable hash as DuckDB SQL. */
  def hSql(e: String, i: Int): String =
    s"((${a(i)} * (${md5wSql(e)} % $M) + ${b(i)}) % $P)"
}
