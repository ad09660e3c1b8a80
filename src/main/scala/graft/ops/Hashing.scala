package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic hashing primitives.
  *
  * Every dedup/similarity operator here must be verifiable against a
  * DuckDB oracle, so hashes are derived from md5 (identical in any
  * engine) rather than engine-private hash functions: the first 15 hex
  * chars (60 bits, always positive in an int64) become the integer
  * hash. Universal-hash family h_i(x) = (a_i * (x mod p) + b_i) mod p
  * with p = 2^31 - 1 keeps every intermediate below 2^62 — no overflow
  * in either engine's int64 arithmetic.
  */
object Hashing {
  /** Mersenne prime 2^31-1: (a*(x%p)+b) stays within int64. */
  val P31: Long = 2147483647L

  /** 60-bit integer hash from md5 (identical in Spark and DuckDB:
    * `('0x' || substr(md5(x),1,15))::BIGINT`) — computed digest-bytes
    * -> long by a codegen expression ([[graft.functions.Md5Hex64]]);
    * no per-row hex-string round trip.
    */
  def hex64(c: Column): Column = graft.functions.Md5Hex64Fn(c)

  /** Driver-side twin of [[hex64]] — byte-identical derivation, for
    * precomputing small deterministic parameter tables (LSH hyperplane
    * weights) as literals instead of per-row md5 evaluation.
    */
  def hex64Local(s: String): Long =
    graft.functions.Md5Hex64Math.hashBytes(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** i-th universal hash of an already-hex64'd value. */
  def universal(x: Column, a: Column, b: Column): Column =
    (a * (x % P31) + b) % P31

  /** Deterministic per-index hash parameters (odd multipliers). */
  def hashParams(numHashes: Int): Seq[(Int, Long, Long)] =
    (0 until numHashes).map { i =>
      (i, 2L * i + 1L, (i * 40503L + 12345L) % P31)
    }
}
