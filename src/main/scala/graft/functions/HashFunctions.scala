package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything here is built from `md5` + integer arithmetic so the exact
  * same values are computable in any SQL engine (the DuckDB correctness
  * oracle re-derives them) — deliberately NOT `xxhash64`/`hash`, whose
  * murmur3 seeds are Spark-specific. All expressions are built-in Catalyst
  * (codegen-friendly, no UDFs).
  */
object HashFunctions {

  /** Prime modulus for MinHash permutations (< 2^31 so products of two
    * residues fit comfortably in a signed 64-bit long).
    */
  val MinHashPrime: Long = 2147483629L

  /** 60-bit hash of a string: first 15 hex digits of md5, base-16 decoded.
    * Portable: `('0x' || substr(md5(x),1,15))::BIGINT` in DuckDB.
    */
  def md5Long(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** MinHash permutation constants — small enough that `a*h + b` never
    * overflows a long for `h < MinHashPrime`.
    */
  def minHashA(j: Int): Long = (j + 1L) * 1299721L % MinHashPrime
  def minHashB(j: Int): Long = (j * 7919L + 104729L) % MinHashPrime

  /** Per-token 60-bit hashes reduced mod MinHashPrime — compute this ONCE
    * into its own projected column, then derive all k permutations from
    * it: md5 is the expensive part and must not be re-evaluated per
    * permutation (k× the work) or, worse, be inlined into a lambda body.
    */
  def tokenHashes(tokens: Column): Column =
    transform(tokens, t => md5Long(t) % MinHashPrime)

  /** MinHash value for permutation `j` over pre-reduced token hashes:
    * `min_h ((a_j * h + b_j) mod P)` — pure integer lambda, cheap per
    * element.
    */
  def minHashFromHashes(hashes: Column, j: Int): Column =
    array_min(transform(hashes, h =>
      (lit(minHashA(j)) * h + lit(minHashB(j))) % MinHashPrime))

  /** Full k-permutation MinHash signature from pre-reduced token hashes. */
  def minHashSignatureFromHashes(hashes: Column, k: Int): Column =
    array((0 until k).map(j => minHashFromHashes(hashes, j)): _*)

  /** MinHash value for permutation `j` over a token array. Convenience
    * form; prefer `tokenHashes` + `minHashFromHashes` when computing more
    * than one permutation.
    */
  def minHash(tokens: Column, j: Int): Column =
    minHashFromHashes(tokenHashes(tokens), j)

  /** Full k-permutation MinHash signature as an array column. Re-hashes
    * the tokens k times — only for one-off use; operators materialize
    * `tokenHashes` first.
    */
  def minHashSignature(tokens: Column, k: Int): Column =
    array((0 until k).map(j => minHash(tokens, j)): _*)

  /** `bits`-wide SimHash over an array of 60-bit token hashes: bit b is set
    * iff more token hashes have bit b set than unset.
    */
  def simHash(tokenHashes: Column, bits: Int): Column =
    (0 until bits).map { b =>
      val vote = aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + (shiftright(h, b).bitwiseAND(1) * 2 - 1))
      when(vote > 0, lit(1L << b)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Polynomial rolling fingerprint of a string (base 257 mod 2^31-1) —
    * an order-sensitive document fingerprint, cheap to recompute anywhere.
    */
  def rollingFingerprint(c: Column): Column =
    aggregate(
      transform(
        // drop the trailing "" that Java's split-with-limit -1 keeps
        filter(split(c, ""), ch => ch =!= ""),
        ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, x) => (acc * 257L + x) % 2147483647L)
}
