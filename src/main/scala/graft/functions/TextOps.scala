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

  /** MinHash component i: min over shingles of hash32(i + ":" + shingle).
    * Null when the shingle set is empty (short docs never band-join).
    */
  def minhash(shingleCol: Column, i: Int): Column =
    array_min(transform(shingleCol, s =>
      hash32(concat(lit(i.toString), lit(":"), s))))

  /** Rolling polynomial fingerprint of the token sequence:
    * fold h -> (h * 31 + hash32(token)) mod 2^20, left-to-right from 0.
    */
  def rollingFingerprint(toks: Column): Column =
    aggregate(transform(toks, t => hash32(t)), lit(0L),
      (h, x) => (h * 31 + x) % 1048576)
}
