package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import TextFunctions.{charHash, P}

/** MinHash and SimHash signatures as pure column expressions over
  * word-shingle arrays. Hash family is explicit affine arithmetic mod P
  * so signatures are reproducible across engines and stable across
  * releases (document-identity hashes must never change under you).
  */
object Hashing {

  /** h_i(x) = ((37 + 101·i)·x + 7 + 139·i) mod P — cheap affine family;
    * i is bounded (≤ a few dozen) so coefficients stay ≪ 2^31 and
    * products ≪ 2^62.
    */
  def affine(i: Int, h: Column): Column =
    pmod(lit(37L + 101L * i) * h + lit(7L + 139L * i), lit(P))

  /** k-element MinHash signature over the shingles of a doc:
    * sig[i] = min over shingles s of h_i(charHash(s)) (min is
    * multiset-invariant, so deduplicating shingles first is a no-op).
    * Computed by the codegen kernel [[Kernels.minhashSig]].
    */
  def minhashSignature(shingles: Column, k: Int): Column =
    Kernels.minhashSig(shingles, k)

  /** LSH band keys: the signature split into `bands` contiguous rows,
    * each rendered "b:v1-v2-..." — docs sharing any band key are
    * candidate duplicates.
    *
    * A doc with NO shingles (fewer than n words, or null text) has an
    * all-null signature and therefore NO minhash identity: it gets an
    * EMPTY band array (explode drops it everywhere), never candidate
    * pairs. Without this, concat_ws's null-skipping would render every
    * such doc to the same degenerate keys ("0", "1", …) and ALL short
    * docs — regardless of content — would pair as near-duplicates
    * (eval sets routinely contain two-word answers, and fuzzy
    * decontamination would then flag every short train doc). This also
    * matches the SQL oracle mirrors, whose `'0-' || sg[1] || …`
    * renders NULL band keys that never equi-join.
    */
  def lshBandKeys(sig: Column, k: Int, bands: Int): Column = {
    val rows = k / bands
    val keys = array((0 until bands).map(b =>
      concat_ws("-", (lit(b.toString) +: (0 until rows).map(r =>
        element_at(sig, b * rows + r + 1).cast("string"))): _*)): _*)
    when(element_at(sig, 1).isNotNull, keys)
      .otherwise(array().cast("array<string>"))
  }

  /** 32-bit SimHash over token array: bit j is set iff
    * sum over tokens of (2·bit_j(charHash(tok)) − 1) > 0.
    * Tokens are NOT deduplicated (multiplicity is signal).
    */
  def simhash32(tokens: Column): Column = Kernels.simhash32(tokens)

  /** byte b (0..3) of a simhash — blocking key for hamming-bounded
    * joins: two 32-bit values within hamming distance 3 agree on at
    * least one of the 4 bytes (pigeonhole).
    */
  def simhashBlock(sh: Column, b: Int): Column =
    pmod(shiftright(sh, 8 * b), lit(256L))

  /** 63-bit simhash over the same shingle array — the scale
    * fingerprint (see [[Kernels.simhash63Eval]]).
    */
  def simhash63(tokens: Column): Column = Kernels.simhash63(tokens)

  /** block b (0..3) of a 63-bit simhash: 16/16/16/15-bit slices —
    * same hamming ≤ 3 pigeonhole, 65536 values per block instead of
    * 256, so blocked-join buckets stay sparse as the corpus grows.
    */
  def simhash63Block(sh: Column, b: Int): Column =
    if (b < 3) pmod(shiftright(sh, 16 * b), lit(65536L))
    else shiftright(sh, 48)
}
