package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels behind the custom Catalyst expressions
  * ([[graft.expressions]]). Each is the SAME integer/IEEE arithmetic as
  * the HOF formulations in [[PortableHash]]/[[VectorFns]] and the DuckDB
  * oracle — just executed as a tight JVM loop instead of per-element
  * interpreted lambdas (the HOF path costs ~100ns/element in
  * interpretation overhead; these run the whole signature in one call).
  */
object HashKernels {
  final val P: Long = 2147483647L // 2^31 - 1

  @inline private def aCoef(i: Int): Long = 1L + i.toLong * 604297L
  @inline private def bCoef(i: Int): Long = i.toLong * 8191L + 12289L

  /** splitmix-style avalanche finisher over a 31-bit hash, masked back
    * to 31 bits — the JVM twin of Sketches' portable SQL mix (poly-31
    * of short decimal strings is non-uniform in its low bits; the
    * finisher restores Poisson-like bucket occupancy — measured in
    * SCALE.md round 9).
    */
  def mix31(h0: Long): Long = {
    var h = ((h0 ^ (h0 >>> 16)) * 73244475L) % 4294967296L
    h = ((h ^ (h >>> 16)) * 73244475L) % 4294967296L
    (h ^ (h >>> 16)) % 2147483648L
  }

  /** poly-31 over Unicode code points, mod P — `PortableHash.wordHash`. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % P
      i += Character.charCount(cp)
    }
    h
  }

  /** distinct 3-gram shingle hashes of a text — the fused twin of
    * `PortableHash.sparkShingleHashesHof` (split on ' ', drop empties,
    * hash each "w1 w2 w3" shingle char-wise). Uses H(ab) = H(a)·31^|b| +
    * H(b) (mod P) to combine per-word hashes instead of materializing
    * shingle strings; identical arithmetic to the char fold. Output
    * order is first-occurrence, but every consumer (minhash, simhash,
    * intersect counts) is order-free.
    */
  def shingleHashes(text: UTF8String): ArrayData = {
    val words = text.toString.split(' ').filter(_.nonEmpty)
    val n = words.length
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    // per-word char hash and 31^len (mod P)
    val wh = new Array[Long](n)
    val wp = new Array[Long](n)
    var i = 0
    while (i < n) {
      val w = words(i)
      var h = 0L; var p = 1L
      var j = 0
      while (j < w.length) {
        val cp = w.codePointAt(j)
        h = (h * 31L + cp) % P
        p = (p * 31L) % P
        j += Character.charCount(cp)
      }
      wh(i) = h; wp(i) = p
      i += 1
    }
    val SpaceH = 32L // ' '
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - 3) {
      // H("w1 w2 w3") via modular concat combine
      var h = wh(i)
      h = (h * 31L + SpaceH) % P
      h = (h * wp(i + 1) + wh(i + 1)) % P
      h = (h * 31L + SpaceH) % P
      h = (h * wp(i + 2) + wh(i + 2)) % P
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** k=12 minhash signature over an array<long> of feature hashes;
    * empty input → all P (same as the HOF fold's init).
    */
  def minhashSig(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](PortableHash.MinhashK)
    var i = 0
    while (i < PortableHash.MinhashK) {
      val a = aCoef(i); val b = bCoef(i)
      var m = P
      var j = 0
      while (j < n) {
        val v = (a * hashes.getLong(j) + b) % P
        if (v < m) m = v
        j += 1
      }
      out(i) = m
      i += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit simhash as 4 × 16-bit band values over feature hashes. */
  def simhashBands(hashes: ArrayData): ArrayData = {
    val n = hashes.numElements()
    val out = new Array[Long](PortableHash.SimhashBands)
    var b = 0
    while (b < PortableHash.SimhashBands) {
      var band = 0L
      var j = 0
      while (j < PortableHash.SimhashBandBits) {
        val i = b * PortableHash.SimhashBandBits + j
        val a = aCoef(i); val bc = bCoef(i)
        var vote = 0L
        var k = 0
        while (k < n) {
          // ((a·h + b) mod P) mod 2 → ±1 vote, same as the SQL twin
          vote += ((a * hashes.getLong(k) + bc) % P) % 2L * 2L - 1L
          k += 1
        }
        if (vote > 0) band |= (1L << j)
        j += 1
      }
      out(b) = band
      b += 1
    }
    new GenericArrayData(out)
  }

  /** exact Jaccard of two distinct-element long arrays (sort + merge —
    * no boxing); same value as
    * size(array_intersect(a,b)) / (size(a)+size(b)-size(array_intersect)).
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 || nb == 0) return 0.0
    val xs = new Array[Long](na); val ys = new Array[Long](nb)
    var i = 0
    while (i < na) { xs(i) = a.getLong(i); i += 1 }
    i = 0
    while (i < nb) { ys(i) = b.getLong(i); i += 1 }
    java.util.Arrays.sort(xs); java.util.Arrays.sort(ys)
    var j = 0; var inter = 0
    i = 0
    while (i < na && j < nb) {
      if (xs(i) == ys(j)) { inter += 1; i += 1; j += 1 }
      else if (xs(i) < ys(j)) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter)
  }

  /** cosine similarity of two array<double> vectors — IDENTICAL op
    * order to the HOF twin (`VectorFns.sparkCosineHof`) and the DuckDB
    * oracle: sequential dot, sequential self-dots, dot/(sqrt·sqrt).
    */
  def cosineSim(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    var dot = 0.0
    var i = 0
    while (i < n) { dot += a.getDouble(i) * b.getDouble(i); i += 1 }
    var na = 0.0
    i = 0
    while (i < n) { na += a.getDouble(i) * a.getDouble(i); i += 1 }
    var nb = 0.0
    i = 0
    while (i < n) { nb += b.getDouble(i) * b.getDouble(i); i += 1 }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** random-hyperplane LSH bucket per table over an array<double> vector
    * — `VectorFns.sparkLshBuckets`, same plane-coefficient PRN.
    */
  def lshBuckets(vec: ArrayData): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](VectorFns.LshTables)
    var t = 0
    while (t < VectorFns.LshTables) {
      var bucket = 0L
      var p = 0
      while (p < VectorFns.LshBits) {
        val idx = t * VectorFns.LshBits + p
        var dot = 0.0
        var j = 0
        while (j < dim && j < VectorFns.Dim) {
          val c = ((idx.toLong * 64L + j) * 2654435761L % P % 2001L - 1000L).toDouble / 1000.0
          dot += vec.getDouble(j) * c
          j += 1
        }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** parameterized-geometry twin of [[lshBuckets]] — `tables` sign-sketch
    * tables of `bits` planes each, same plane-coefficient PRN and the
    * same plane-index stream t·bits+p (so tables=16/bits=4 reproduces
    * the contract buckets bit-for-bit; asserted in KernelSpec). The
    * compiled spelling of `VectorFns.sparkLshBucketsParam`'s HOF spec:
    * the sweep/rule gates (embed_geometry_sweep, embed_bits_rule) and
    * the off-floor production geometry evaluate tables·bits·Dim
    * multiply-adds per vector — interpreted lambda eval per element in
    * the HOF, one compiled loop per row here. Identical arithmetic,
    * identical results.
    */
  def lshBucketsParam(vec: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var p = 0
      while (p < bits) {
        val idx = t * bits + p
        var dot = 0.0
        var j = 0
        while (j < dim && j < VectorFns.Dim) {
          val c = ((idx.toLong * 64L + j) * 2654435761L % P % 2001L - 1000L).toDouble / 1000.0
          dot += vec.getDouble(j) * c
          j += 1
        }
        if (dot > 0) bucket |= (1L << p)
        p += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** JL random projection Dim→ProjDim — the compiled twin of
    * [[VectorFns.sparkProjectHof]]: same coefficient stream (offset
    * past the LSH plane indices), same strict left-to-right double
    * fold, so results are bit-identical to the HOF spec and the DuckDB
    * oracle.
    */
  def project(vec: ArrayData): ArrayData = {
    val dim = vec.numElements()
    val out = new Array[Double](VectorFns.ProjDim)
    var j0 = 0
    while (j0 < VectorFns.ProjDim) {
      val idx = (j0 + VectorFns.LshTables * VectorFns.LshBits).toLong
      var s = 0.0
      var i = 0
      while (i < dim && i < VectorFns.Dim) {
        val c = ((idx * 64L + i) * 2654435761L % P % 2001L - 1000L).toDouble / 1000.0
        s += vec.getDouble(i) * c
        i += 1
      }
      out(j0) = s
      j0 += 1
    }
    new GenericArrayData(out)
  }
}
