package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Shingle/MinHash kernels shared by interpreted eval and generated code.
  *
  * Why this exists: the round-1 shingling plan (`posexplode` + `lead()` over
  * a per-doc window) put every (id, pos, token) row through an Exchange
  * before any aggregate could combine — at corpus scale that shuffle IS the
  * corpus. Computing the hashed-shingle array (and the whole MinHash
  * signature) per row, map-side, removes that Exchange entirely: the only
  * shuffles left in MinHash-LSH dedup are the band-bucket candidate join and
  * the verify join, both linear in near-dup density.
  *
  * The generated code calls these static methods — one JIT-compiled call per
  * row (not per element), so it costs the same as inlining the loops while
  * keeping eval and codegen byte-identical.
  */
object ShingleHash {

  /** `|distinct(a) ∩ b|` for long arrays — open-addressed primitive hash
    * sets, no boxing, no result array; called from [[IntersectCountExpr]]
    * codegen. Equals `size(array_intersect(a, b))` including NULL-element
    * semantics (a NULL present in both sides counts once) — persisted
    * index tables read their hash arrays back as containsNull=true, so the
    * kernel cannot assume null-free input.
    */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 || nb == 0) return 0
    // power-of-two capacity ≥ 2n keeps load factor ≤ 0.5
    def cap(n: Int): Int = Integer.highestOneBit(math.max(4, n) * 2 - 1) << 1
    def slot(v: Long, mask: Int): Int =
      (((v ^ (v >>> 32)).toInt * 0x9E3779B1) >>> 1) & mask
    val bCap = cap(nb); val bMask = bCap - 1
    val bTab = new Array[Long](bCap)
    val bUsed = new Array[Boolean](bCap)
    var bHasNull = false
    var i = 0
    while (i < nb) {
      if (b.isNullAt(i)) bHasNull = true
      else {
        val v = b.getLong(i)
        var j = slot(v, bMask)
        while (bUsed(j) && bTab(j) != v) j = (j + 1) & bMask
        if (!bUsed(j)) { bUsed(j) = true; bTab(j) = v }
      }
      i += 1
    }
    // dedup matched elements of a (array_intersect counts duplicates once)
    val sCap = cap(math.min(na, nb)); val sMask = sCap - 1
    val sTab = new Array[Long](sCap)
    val sUsed = new Array[Boolean](sCap)
    var seenNull = false
    var cnt = 0
    i = 0
    while (i < na) {
      if (a.isNullAt(i)) {
        if (bHasNull && !seenNull) { seenNull = true; cnt += 1 }
      } else {
        val v = a.getLong(i)
        var j = slot(v, bMask)
        while (bUsed(j) && bTab(j) != v) j = (j + 1) & bMask
        if (bUsed(j)) { // v ∈ b; count once
          var k = slot(v, sMask)
          while (sUsed(k) && sTab(k) != v) k = (k + 1) & sMask
          if (!sUsed(k)) { sUsed(k) = true; sTab(k) = v; cnt += 1 }
        }
      }
      i += 1
    }
    cnt
  }

  /** First band (rowsPerBand consecutive positions) where the two MinHash
    * signatures agree elementwise, -1 if none — early-exit primitive loop,
    * called from [[FirstAgreeingBandExpr]] codegen.
    */
  def firstAgreeingBand(x: ArrayData, y: ArrayData, rowsPerBand: Int): Int = {
    val n = math.min(x.numElements(), y.numElements()) / rowsPerBand
    var bd = 0
    while (bd < n) {
      var i = bd * rowsPerBand
      val end = i + rowsPerBand
      var ok = true
      while (ok && i < end) {
        if (x.getLong(i) != y.getLong(i)) ok = false
        i += 1
      }
      if (ok) return bd
      bd += 1
    }
    -1
  }

  private val TokenSeed = 42L
  // FNV-64 prime for the order-sensitive window combine; murmur3 fmix64
  // avalanches the result so the low 31 bits (used by MinHash mod 2^31-1)
  // carry full entropy.
  private val Poly = 0x100000001b3L

  private def fmix64(h0: Long): Long = {
    var h = h0
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  /** Hashed word n-gram shingles of a UTF-8 string, in document order.
    * Tokenization matches `split(text, " ")` with limit -1: segments between
    * 0x20 bytes, keeping empty segments from leading/trailing/consecutive
    * spaces (0x20 never occurs inside a multi-byte UTF-8 sequence, so a byte
    * scan is exact). Texts with fewer than n tokens yield an empty array.
    * May contain duplicates; set consumers `array_distinct` downstream.
    */
  /** Per-token xxhash64 of the space-separated tokens of `s`, in order. */
  private def tokenHashes(s: UTF8String): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val len = s.numBytes
    var spaces = 0
    var i = 0
    while (i < len) {
      if (Platform.getByte(base, off + i) == 0x20) spaces += 1
      i += 1
    }
    val tokenHash = new Array[Long](spaces + 1)
    var t = 0
    var start = 0
    i = 0
    while (i <= len) {
      if (i == len || Platform.getByte(base, off + i) == 0x20) {
        tokenHash(t) = XXH64.hashUnsafeBytes(base, off + start, i - start, TokenSeed)
        t += 1
        start = i + 1
      }
      i += 1
    }
    tokenHash
  }

  def compute(s: UTF8String, n: Int): Array[Long] = {
    val tokenHash = tokenHashes(s)
    val nTok = tokenHash.length
    if (nTok < n) return Array.emptyLongArray
    val out = new Array[Long](nTok - n + 1)
    var p = 0
    while (p < out.length) {
      var h = TokenSeed
      var k = 0
      while (k < n) { h = h * Poly + tokenHash(p + k); k += 1 }
      out(p) = fmix64(h)
      p += 1
    }
    out
  }

  /** 64-bit SimHash over the distinct space-separated tokens: bit j of the
    * result is set iff Σ_distinct-words (bit j of hash(w) ? +1 : -1) > 0.
    * One pass per row — the round-1 formulation exploded distinct words into
    * a 64-sum aggregate whose Exchange carried the word stream.
    */
  def simhash(s: UTF8String): Long = {
    val th = tokenHashes(s)
    java.util.Arrays.sort(th) // distinct via sort + skip-equal, no hash set
    val counts = new Array[Int](64)
    var i = 0
    while (i < th.length) {
      if (i == 0 || th(i) != th(i - 1)) {
        val h = th(i)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** 60-bit SimHash with md5-derived token hashes — the ORACLE-PARITY
    * variant of [[simhash]]: every piece of the arithmetic (md5, the
    * first-15-hex-chars truncation, the +/-1 votes on bits 0..59, the
    * `> 0` sign rule) is expressible identically in any engine, so the
    * whole simhash pipeline becomes cross-engine checkable. Tokenization
    * matches `string_split(text, ' ')` in DuckDB / `split(text, ' ', -1)`
    * in Spark (empty segments kept); votes are over DISTINCT tokens. The
    * fast xxhash-based [[simhash]] stays the production default — md5 costs
    * ~4x per token; this variant buys bit-identical verification.
    */
  def simhashMd5(s: UTF8String): Long = {
    val tokens = new java.util.HashSet[String]()
    s.toString.split(" ", -1).foreach(tokens.add)
    val md = md5Local.get()
    val counts = new Array[Int](60)
    val it = tokens.iterator()
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 15 hex chars = top 60 bits of the big-endian digest prefix
      var top = 0L
      var i = 0
      while (i < 8) { top = (top << 8) | (d(i) & 0xFFL); i += 1 }
      val h = top >>> 4
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
    }
    var fp = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  /** Distinct 28-bit md5 hashes of the distinct word n-gram shingles — the
    * ORACLE-PARITY shingle kernel, one tight pass per row where the
    * round-8 formulation ran three interpreted higher-order functions
    * (transform/array_distinct chains cost d19 ~2x DuckDB on identical
    * SQL). Arithmetic is element-for-element the SQL statement both
    * engines agree on: `split(text, ' ')` keeping empties, shingles joined
    * by ' ' (distinct, first-occurrence order), per-shingle
    * `conv(substring(md5(s),1,7),16,10)` = the digest's top 28 bits,
    * distinct again. Texts with fewer than n tokens yield an empty array
    * (callers filter those rows out, as the oracle does).
    */
  def md5ShingleHashes(s: UTF8String, n: Int): Array[Long] = {
    val words = s.toString.split(" ", -1)
    if (words.length < n) return Array.emptyLongArray
    val shingles = new java.util.LinkedHashSet[String]()
    var i = 0
    while (i + n <= words.length) {
      val sb = new java.lang.StringBuilder()
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(words(i + k))
        k += 1
      }
      shingles.add(sb.toString)
      i += 1
    }
    val md = md5Local.get()
    val out = new java.util.LinkedHashSet[java.lang.Long]()
    val it = shingles.iterator()
    while (it.hasNext) {
      md.reset()
      val d = md.digest(it.next().getBytes(java.nio.charset.StandardCharsets.UTF_8))
      // first 7 hex chars = top 28 bits of the big-endian digest prefix
      var top = 0L
      var j = 0
      while (j < 4) { top = (top << 8) | (d(j) & 0xFFL); j += 1 }
      out.add(top >>> 4)
    }
    val arr = new Array[Long](out.size)
    val oit = out.iterator()
    var p = 0
    while (oit.hasNext) { arr(p) = oit.next(); p += 1 }
    arr
  }

  private val MersennePrime = 2147483647L // 2^31 - 1

  /** MinHash signature over an array of shingle hashes: sig(j) =
    * min_h pmod(a(j) * pmod(h, P) + b(j), P) with P = 2^31-1. a/b < 2^31 so
    * the products stay under 2^63 — no overflow under ANSI arithmetic.
    * Returns null for an empty array (doc too short to shingle), mirroring
    * the row-based formulation where such docs produced no signature row.
    */
  def minhashSig(hashes: ArrayData, a: Array[Long], b: Array[Long]): Array[Long] = {
    val m = hashes.numElements()
    if (m == 0) return null
    val sig = Array.fill(a.length)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      val hm = ((h % MersennePrime) + MersennePrime) % MersennePrime
      var j = 0
      while (j < a.length) {
        val v = (a(j) * hm + b(j)) % MersennePrime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    sig
  }

  /** Densified one-permutation MinHash signature (OPH — Li, Owen & Zhang
    * 2012; rotation densification after Shrivastava & Li 2014): ONE pass
    * binning `bin = h mod k` with a per-bin running min — k slots from one
    * hash evaluation per shingle, where classic MinHash pays k affine
    * transforms per shingle. Empty bins densify from the circularly
    * nearest occupied bin with a distance penalty:
    * `sig(j) = min over occupied j' of ((j' − j + k) mod k) · c + occ(j')`
    * — a deterministic, engine-statable rule (one min-fold on both sides;
    * no iterative probing to diverge on). `c` must exceed every input hash
    * so an occupied bin always keeps its own min (distance 0 beats any
    * borrow) and `(k−1)·c + h` must stay in a long. Null for empty input.
    */
  def ophSig(hashes: ArrayData, k: Int, c: Long): Array[Long] = {
    val m = hashes.numElements()
    if (m == 0) return null
    val occ = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < m) {
      val h = hashes.getLong(i)
      val b = (((h % k) + k) % k).toInt
      if (h < occ(b)) occ(b) = h
      i += 1
    }
    val sig = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < k) {
      if (occ(j) != Long.MaxValue) {
        var d = 0
        while (d < k) {
          val t = (j - d + k) % k // the bin that borrows occ(j) at distance d
          val v = d.toLong * c + occ(j)
          if (v < sig(t)) sig(t) = v
          d += 1
        }
      }
      j += 1
    }
    sig
  }

  /** DSIR importance log-weight of a text: sum of the trained log-ratio
    * at each feature's bucket — unigrams in token order, then bigrams in
    * token order (the same visit order as the HOF fold and the oracle's
    * list arithmetic, so the double sum is bit-identical), rounded
    * half-up to 6 dp like `round(col, 6)`. Bucket = top 28 md5 bits mod
    * `r.length`, the corpus-wide cross-engine hash convention.
    */
  def dsirWeight(s: UTF8String, r: Array[Double]): Double = {
    val toks = s.toString.split(" ", -1)
    val md = md5Local.get()
    def bucket(f: String): Int = {
      md.reset()
      val d = md.digest(f.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val top32 = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      ((top32 >>> 4) % r.length).toInt
    }
    var sum = 0.0
    var i = 0
    while (i < toks.length) { sum += r(bucket(toks(i))); i += 1 }
    i = 0
    while (i < toks.length - 1) { sum += r(bucket(toks(i) + " " + toks(i + 1))); i += 1 }
    BigDecimal(sum).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** Mean token NLL under a trained unigram LM — the same ordered fold as
    * the HOF formulation (`-coalesce(logp(tok), oov)` summed in token
    * order, divided by the token count, rounded half-up to 6 dp), one
    * tight pass per row. `split(text, ' ')` keeping empties, so the count
    * and lookups match `string_split` in the oracle.
    */
  def lmNll(s: UTF8String, vocab: java.util.HashMap[String, java.lang.Double],
      oov: Double): Double = {
    val toks = s.toString.split(" ", -1)
    var sum = 0.0
    var i = 0
    while (i < toks.length) {
      val p = vocab.get(toks(i))
      sum += (if (p == null) -oov else -p.doubleValue())
      i += 1
    }
    BigDecimal(sum / toks.length)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
  }

  /** ColBERT-style MaxSim score of one document against a fixed query-token
    * matrix — the whole r04 scoring loop (chunk → signed-feature-hash
    * embedding → per-token best-chunk cosine → sum) in one tight pass per
    * row. Arithmetic is element-for-element the HOF formulation it
    * replaces ([[graft.operators.Retrieval.hashedEmbedding]] + per-token
    * `array_max`): tokens from `split(text, ' ')` dropping empties, chunk
    * vectors scatter-added from (word, "p:"+first-3-chars) features with
    * bucket = top-28 md5 bits mod dim and sign = 8th-hex-digit parity,
    * cosine accumulated in index order with the zero-norm → 0.0 guard,
    * each sim rounded half-up to 6 dp BEFORE the max (the `simSafe`
    * contract), missing-chunk tokens contributing 0.0. `q` is the
    * flattened nTok x dim query matrix from `hashedQueryVec`.
    */
  def maxSimScore(s: UTF8String, q: Array[Double], dim: Int, chunkWords: Int): Double = {
    val nTok = q.length / dim
    val all = s.toString.split(" ", -1)
    var nw = 0
    var i = 0
    while (i < all.length) { if (all(i).nonEmpty) { all(nw) = all(i); nw += 1 }; i += 1 }
    val maxima = new Array[Double](nTok)
    val seen = new Array[Boolean](nTok)
    val md = md5Local.get()
    val cv = new Array[Double](dim)
    var cStart = 0
    while (cStart < nw) {
      java.util.Arrays.fill(cv, 0.0)
      val end = math.min(cStart + chunkWords, nw)
      var wi = cStart
      while (wi < end) {
        val w = all(wi)
        var f = 0
        while (f < 2) {
          val feat =
            if (f == 0) w
            else "p:" + UTF8String.fromString(w).substringSQL(1, 3).toString
          md.reset()
          val d = md.digest(feat.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          // bucket: first 7 hex chars (top 28 bits) mod dim; sign: 8th hex
          // digit (low nibble of byte 3) parity — hashedEmbedding verbatim
          var top = 0L
          var j = 0
          while (j < 4) { top = (top << 8) | (d(j) & 0xFFL); j += 1 }
          val b = ((top >>> 4) % dim).toInt
          cv(b) += (if ((d(3) & 0x0F) % 2 == 0) 1.0 else -1.0)
          f += 1
        }
        wi += 1
      }
      var nc = 0.0
      i = 0
      while (i < dim) { nc += cv(i) * cv(i); i += 1 }
      var t = 0
      while (t < nTok) {
        val off = t * dim
        var dot = 0.0
        var nq = 0.0
        var j = 0
        while (j < dim) {
          val qv = q(off + j); val cj = cv(j)
          dot += qv * cj; nq += qv * qv
          j += 1
        }
        val sim =
          if (nq == 0.0 || nc == 0.0) 0.0
          else BigDecimal(dot / (math.sqrt(nq) * math.sqrt(nc)))
            .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
        if (!seen(t) || sim > maxima(t)) { maxima(t) = sim; seen(t) = true }
        t += 1
      }
      cStart += chunkWords
    }
    var score = 0.0
    var t = 0
    while (t < nTok) { score += (if (seen(t)) maxima(t) else 0.0); t += 1 }
    score
  }
}

/** `shingle_hashes(text, n)`: array<long> of hashed word n-gram shingles,
  * computed in one pass per row inside whole-stage codegen — no explode, no
  * window, no shuffle.
  */
case class ShingleHashExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHash.compute(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHash.compute($v, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `minhash_signature(hashes)`: numHashes-wide MinHash signature computed
  * per row. The affine parameters ride along as codegen reference objects.
  * NULL for empty input arrays (short docs carry no signature).
  *
  * Parameters are held as `IndexedSeq`s (value equality), not `Array`s —
  * `Array` fields compare by reference, so two expressions built from equal
  * parameter sets would fail `semanticEquals` and silently defeat
  * subexpression elimination and plan canonicalization.
  */
case class MinHashSigExpr(child: Expression, aSeq: IndexedSeq[Long], bSeq: IndexedSeq[Long])
    extends UnaryExpression {
  require(aSeq.length == bSeq.length && aSeq.nonEmpty)

  @transient private lazy val a: Array[Long] = aSeq.toArray
  @transient private lazy val b: Array[Long] = bSeq.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_signature"

  override def nullSafeEval(input: Any): Any = {
    val sig = ShingleHash.minhashSig(input.asInstanceOf[ArrayData], a, b)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", b, "long[]")
    val sig = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, v =>
      s"""long[] $sig = graft.functions.ShingleHash.minhashSig($v, $aRef, $bRef);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `oph_signature(hashes, k, c)`: densified one-permutation MinHash
  * signature — see [[ShingleHash.ophSig]]. One hash-array pass per row
  * inside whole-stage codegen; k and the densification constant are
  * compile-time literals in the generated code.
  */
case class OphSigExpr(child: Expression, k: Int, c: Long) extends UnaryExpression {
  require(k >= 2, "oph_signature needs at least 2 bins")
  require(c > 0 && (k - 1).toLong <= Long.MaxValue / c,
    s"densification constant $c overflows at $k bins")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<bigint>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "oph_signature"

  override def nullSafeEval(input: Any): Any = {
    val sig = ShingleHash.ophSig(input.asInstanceOf[ArrayData], k, c)
    if (sig == null) null else new GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sig = ctx.freshName("sig")
    nullSafeCodeGen(ctx, ev, v =>
      s"""long[] $sig = graft.functions.ShingleHash.ophSig($v, $k, ${c}L);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `md5_shingle_hashes(text, n)`: distinct 28-bit md5 hashes of the
  * distinct word n-gram shingles, one pass per row inside whole-stage
  * codegen — see [[ShingleHash.md5ShingleHashes]]. The md5 verification
  * family's counterpart of [[ShingleHashExpr]].
  */
case class Md5ShingleHashesExpr(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "shingle size must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingle_hashes"

  override def nullSafeEval(input: Any): Any =
    new GenericArrayData(ShingleHash.md5ShingleHashes(input.asInstanceOf[UTF8String], n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleHash.md5ShingleHashes($v, $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `dsir_weight(text)`: the DSIR importance log-weight — unigrams then
  * space-joined bigrams, each bucketed by the 28-bit md5 convention into
  * the trained log-ratio array, summed in feature order and rounded
  * half-up to 6 dp. One tight pass per row inside whole-stage codegen
  * where the HOF formulation (`transform`/`aggregate`/`element_at`) ran
  * interpreted at ~10x the cost — the d19 `Md5ShingleHashesExpr` lesson
  * applied to c10. The sum visits features in the SAME order as the HOF
  * fold and the oracle's list arithmetic, so the doubles are
  * bit-identical.
  *
  * Ratios are held as an `IndexedSeq` (value equality) for the same
  * canonicalization reason as [[MinHashSigExpr]].
  */
case class DsirWeightExpr(child: Expression, rSeq: IndexedSeq[Double])
    extends UnaryExpression {
  require(rSeq.nonEmpty, "dsir_weight needs a non-empty ratio array")

  @transient private lazy val r: Array[Double] = rSeq.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dsir_weight"

  override def nullSafeEval(input: Any): Any =
    ShingleHash.dsirWeight(input.asInstanceOf[UTF8String], r)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val rRef = ctx.addReferenceObj("dsirRatios", r, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleHash.dsirWeight($v, $rRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `maxsim_score(text)`: ColBERT-style late-interaction score against a
  * fixed query matrix, one tight codegen'd pass per row — the interpreted
  * HOF formulation (nested `transform`/`aggregate` chunk embeddings) is
  * the same arithmetic at ~10x the cost (r04). The query matrix rides as
  * a codegen reference object; held as an `IndexedSeq` for expression
  * canonicalization (the [[MinHashSigExpr]] rule).
  */
case class MaxSimScoreExpr(child: Expression, qSeq: IndexedSeq[Double],
    dim: Int, chunkWords: Int) extends UnaryExpression {
  require(dim > 0 && chunkWords > 0 && qSeq.nonEmpty && qSeq.length % dim == 0,
    s"maxsim_score needs dim > 0, chunkWords > 0, |q| a positive multiple of dim")

  @transient private lazy val q: Array[Double] = qSeq.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "maxsim_score"

  override def nullSafeEval(input: Any): Any =
    ShingleHash.maxSimScore(input.asInstanceOf[UTF8String], q, dim, chunkWords)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qRef = ctx.addReferenceObj("maxsimQ", q, "double[]")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ShingleHash.maxSimScore($v, $qRef, $dim, $chunkWords)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `lm_nll(text)`: mean token negative log-likelihood under a trained
  * unigram LM, one tight pass per row inside whole-stage codegen — the
  * interpreted HOF formulation (`aggregate`/`transform`/`element_at` over
  * a map literal) is the same ordered arithmetic at ~5x the cost. Vocab
  * rides as a codegen reference object (one HashMap per task, not a
  * per-row map literal); held as a sorted `IndexedSeq` for expression
  * canonicalization (the [[MinHashSigExpr]] rule).
  */
case class LmScoreExpr(child: Expression, vocabSeq: IndexedSeq[(String, Double)],
    oov: Double) extends UnaryExpression {

  @transient private lazy val vocab: java.util.HashMap[String, java.lang.Double] = {
    val m = new java.util.HashMap[String, java.lang.Double](vocabSeq.length * 2)
    vocabSeq.foreach { case (t, p) => m.put(t, java.lang.Double.valueOf(p)) }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "lm_nll"

  override def nullSafeEval(input: Any): Any =
    ShingleHash.lmNll(input.asInstanceOf[UTF8String], vocab, oov)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vRef = ctx.addReferenceObj("lmVocab", vocab, "java.util.HashMap")
    defineCodeGen(ctx, ev, v =>
      s"graft.functions.ShingleHash.lmNll($v, $vRef, ${oov}D)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash64(text)`: the 64-bit SimHash fingerprint, one pass per row
  * inside whole-stage codegen.
  */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    ShingleHash.simhash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleHash.simhash($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `simhash_md5(text)`: the 60-bit oracle-parity SimHash (md5 token
  * hashes) — see [[ShingleHash.simhashMd5]].
  */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case _: StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects a string argument, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override def nullSafeEval(input: Any): Any =
    ShingleHash.simhashMd5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.ShingleHash.simhashMd5($v)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `first_agreeing_band(sigA, sigB)`: index of the FIRST band
  * (`rowsPerBand` consecutive signature positions) where the two MinHash
  * signatures agree elementwise, or -1 if none — the streaming LSH join's
  * exactly-once emission test (st09). One early-exit primitive loop inside
  * whole-stage codegen, replacing an interpreted
  * `element_at(filter(sequence(...), slice === slice), 1)` chain that was
  * re-evaluated per joined candidate row. Identical semantics: the join's
  * `a.band === first_agreeing_band(...)` treats the old NULL and the new
  * -1 the same (both fail the equality).
  */
case class FirstAgreeingBandExpr(left: Expression, right: Expression, rowsPerBand: Int)
    extends BinaryExpression {
  require(rowsPerBand > 0, "rowsPerBand must be positive")

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // containsNull must be false: the kernel reads getLong, which would
    // silently treat a NULL slot as 0 where the slice===slice formulation
    // this replaces evaluated to NULL — reject at analysis instead
    case (ArrayType(LongType, false), ArrayType(LongType, false)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint> not null, array<bigint> not null), got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "first_agreeing_band"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    ShingleHash.firstAgreeingBand(x, y, rowsPerBand)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.ShingleHash.firstAgreeingBand($a, $b, $rowsPerBand)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** `|distinct(a) ∩ b|` over two `array<bigint>` columns — the
  * count `size(array_intersect(a, b))` computes, without materializing the
  * intersection ARRAY the generic expression builds per row (a
  * GenericArrayData of boxed results that exists only to be counted and
  * discarded). Every dedup verify stage evaluates this once per candidate
  * pair over 100s-long hash arrays, so the allocation-free primitive loop
  * is the difference between the verify stage being intersection-bound and
  * join-bound (optimization guide: eliminate non-codegen/allocating
  * expressions in the hot path). Distinct-of-a semantics match
  * array_intersect exactly (duplicates in `a` count once), though every
  * caller passes distinct-by-construction sets anyway.
  */
case class IntersectCountExpr(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    // containsNull is allowed: persisted index tables round-trip hash
    // arrays through parquet as containsNull=true, and the kernel
    // implements array_intersect's NULL-element rule directly
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (array<bigint>, array<bigint>), got $other")
  }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "intersect_count"

  override def nullSafeEval(a: Any, b: Any): Any =
    ShingleHash.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ShingleHash.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object ShingleFunctions {
  /** Hashed word n-gram shingles of a text column, in document order. */
  def shingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashExpr(ColumnBridge.expression(text), n))

  /** Distinct 28-bit md5 shingle hashes (oracle-parity family). */
  def md5ShingleHashes(text: Column, n: Int): Column =
    ColumnBridge.column(Md5ShingleHashesExpr(ColumnBridge.expression(text), n))

  /** 64-bit SimHash fingerprint of a text column. */
  def simhash64(text: Column): Column =
    ColumnBridge.column(SimHash64Expr(ColumnBridge.expression(text)))

  /** 60-bit oracle-parity SimHash (md5 token hashes). */
  def simhashMd5(text: Column): Column =
    ColumnBridge.column(SimHashMd5Expr(ColumnBridge.expression(text)))

  /** MinHash signature (length = a.length) over a shingle-hash array column;
    * NULL when the array is empty.
    */
  def minhashSignature(hashes: Column, a: Array[Long], b: Array[Long]): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(hashes),
      a.toIndexedSeq, b.toIndexedSeq))

  /** Densified one-permutation MinHash signature (k bins, densification
    * constant c); NULL when the hash array is empty.
    */
  def ophSignature(hashes: Column, k: Int, c: Long): Column =
    ColumnBridge.column(OphSigExpr(ColumnBridge.expression(hashes), k, c))

  /** `|distinct(a) ∩ b|` ≡ `size(array_intersect(a, b))` for long arrays
    * (incl. NULL elements), without materializing the intersection
    * (verify-stage hot path).
    */
  def intersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCountExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** First band where two MinHash signatures agree elementwise, -1 if none
    * (st09's exactly-once emission test).
    */
  def firstAgreeingBand(sigA: Column, sigB: Column, rowsPerBand: Int): Column =
    ColumnBridge.column(FirstAgreeingBandExpr(
      ColumnBridge.expression(sigA), ColumnBridge.expression(sigB), rowsPerBand))

  /** DSIR importance log-weight under a trained log-ratio array. */
  def dsirWeight(text: Column, ratios: Array[Double]): Column =
    ColumnBridge.column(DsirWeightExpr(ColumnBridge.expression(text),
      ratios.toIndexedSeq))

  /** ColBERT-style MaxSim score against a flattened nTok x dim query
    * matrix (from `Retrieval.hashedQueryVec`).
    */
  def maxSimScore(text: Column, q: Array[Double], dim: Int, chunkWords: Int): Column =
    ColumnBridge.column(MaxSimScoreExpr(ColumnBridge.expression(text),
      q.toIndexedSeq, dim, chunkWords))

  /** Mean token NLL under a trained unigram LM (sorted vocab for
    * canonical expression equality).
    */
  def lmNll(text: Column, vocab: Map[String, Double], oovLogp: Double): Column =
    ColumnBridge.column(LmScoreExpr(ColumnBridge.expression(text),
      vocab.toIndexedSeq.sortBy(_._1), oovLogp))
}
