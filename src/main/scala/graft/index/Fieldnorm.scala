package graft.index

/** Lucene-style 1-byte fieldnorm quantization (SURVEY §7.3 risk 1).
  *
  * The reference's Tantivy backend stores each document's field length as
  * ONE byte (the fieldnorm id) and BM25 scores against the DECODED —
  * quantized — length, trading ~7% relative length precision above the
  * exact range for 8x less norm storage. This engine scores exact lengths
  * by default (rank-identical on every tested corpus); building with
  * [[FtsIndexBuilder.Config.quantizeNorms]] reproduces the quantized
  * regime: every posting's dl is round-tripped through the 1-byte code at
  * build time, so ALL query paths (cluster scorer, WAND, driver cache)
  * see the same quantized lengths with no score-path branching.
  *
  * Encoding: the public Lucene `SmallFloat` norm scheme (intToByte4 /
  * byte4ToInt, a 4-bit-mantissa pseudo-float over one byte) — small
  * lengths are EXACT (0..23), larger ones keep 4 significant bits.
  * Tantivy's own table differs in its exact break points (exact to 40,
  * then coarser) but is bit-for-bit unavailable offline; the documented
  * deviation is the break-point table, not the mechanism. The
  * differential spec asserts the property that matters: top-k ranking on
  * the reference query battery is stable between exact and quantized
  * builds.
  */
object Fieldnorm {

  /** 4-bit-mantissa code of a non-negative long (Lucene
    * SmallFloat.longToInt4): values 0-7 exact, then 3 mantissa bits +
    * exponent. Monotone, idempotent through [[int4ToLong]]. */
  def longToInt4(i: Long): Int = {
    require(i >= 0, s"norm must be non-negative, got $i")
    val numBits = 64 - java.lang.Long.numberOfLeadingZeros(i)
    if (numBits < 4) i.toInt
    else {
      val shift = numBits - 4
      ((i >>> shift).toInt & 0x07) | ((shift + 1) << 3)
    }
  }

  def int4ToLong(i: Int): Long = {
    val bits = (i & 0x07).toLong
    val shift = (i >>> 3) - 1
    if (shift == -1) bits else (bits | 0x08L) << shift
  }

  private val MaxInt4 = longToInt4(Int.MaxValue)
  private val NumFreeValues = 255 - MaxInt4

  /** One-byte norm code (0-255) of a doc length: identity below
    * [[NumFreeValues]] (= 24 free exact values), pseudo-float above
    * (Lucene SmallFloat.intToByte4). */
  def intToByte4(i: Int): Int = {
    require(i >= 0, s"norm must be non-negative, got $i")
    if (i < NumFreeValues) i
    else NumFreeValues + longToInt4((i - NumFreeValues).toLong)
  }

  def byte4ToInt(b: Int): Int =
    if (b < NumFreeValues) b
    else (NumFreeValues + int4ToLong(b - NumFreeValues)).toInt

  /** The doc length BM25 sees under 1-byte norms: encode + decode. */
  def quantize(dl: Long): Long =
    byte4ToInt(intToByte4(math.min(dl, Int.MaxValue).toLong.toInt)).toLong
}
