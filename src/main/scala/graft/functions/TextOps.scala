package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline column builders: tokenization, shingling, and the
  * md5-derived 32-bit token/shingle hashes used by the dedup family.
  *
  * Everything is built from codegen'd built-ins (split/transform/aggregate/
  * md5/conv) — per-row narrow work that needs no shuffle and no UDF. The
  * hash is defined as the first 8 hex chars of md5, interpreted as an
  * integer: md5 is available bit-identically in DuckDB, which is what lets
  * the dedup operators keep exact SQL oracles.
  */
object TextOps {

  /** Lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** 32-bit integer hash of a string: first 8 hex chars of md5. */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** Distinct word 3-gram shingles of a token array. */
  def shingles3(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ",
          element_at(toks, i),
          element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** The minhash family: affine mixes of ONE base hash per shingle,
    * h_i = (a_i * h + b_i) mod P. One md5 pass over the shingles, then 8
    * cheap integer transforms — 8x less hashing than hashing per (shingle,
    * i) pair, and the integer arithmetic replays exactly in DuckDB.
    * a_i * h stays < 2^49, so no 64-bit overflow on either engine.
    */
  val MinhashP = 2147483647L // 2^31 - 1
  def minhashA(i: Int): Long = 100003L + 7919L * i
  def minhashB(i: Int): Long = 12345L + 1000003L * i

  /** MinHash component i over a pre-hashed shingle array (array<long>).
    * Null when the shingle set is empty (short docs never band-join).
    */
  def minhash(hashesCol: Column, i: Int): Column =
    array_min(transform(hashesCol, h =>
      (lit(minhashA(i)) * h + lit(minhashB(i))) % lit(MinhashP)))

  /** Rolling polynomial fingerprint of the token sequence:
    * fold h -> (h * 31 + hash32(token)) mod 2^20, left-to-right from 0.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(transform(toks, t => hash32(t)), lit(0L),
      (h, x) => (h * 31 + x) % 1048576)
}
