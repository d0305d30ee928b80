package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hash primitives used across dedup / fingerprinting.
  *
  * The reference engine exposes `fnv_hash()` as a builtin
  * (apache-impala-4.1.0/be/src/exprs/math-functions-ir.cc:438,
  * be/src/util/hash-util.h:121); we re-derive FNV-1 64-bit from the
  * public FNV spec (Fowler–Noll–Vo) rather than translating that code.
  * Implementations are plain static JVM methods so generated Java
  * (whole-stage codegen) can call them directly.
  */
object HashImpl {
  final val FnvPrime: Long = 1099511628211L
  final val FnvSeed: Long = -3750763034362895579L // 0xcbf29ce484222325

  /** FNV-1 64-bit (multiply then xor, matching the reference's variant). */
  def fnv64(bytes: Array[Byte]): Long = {
    var h = FnvSeed
    var i = 0
    while (i < bytes.length) { h = (h * FnvPrime) ^ (bytes(i) & 0xffL); i += 1 }
    h
  }

  def fnv64(s: UTF8String): Long = fnv64(s.getBytes)

  final val MurmurPrime: Long = 0xc6a4a7935bd1e995L
  final val MurmurR: Int = 47

  /** MurmurHash2 64-bit (Appleby's public-domain murmur2, 64A variant),
    * the algorithm behind the reference's `murmur_hash()` builtin
    * (apache-impala-4.1.0/be/src/util/hash-util.h:127,
    * be/src/exprs/expr-test.cc:5500). Little-endian 8-byte blocks,
    * seed 0; matches the published test vector for 'hello world'. */
  def murmur2_64(bytes: Array[Byte], seed: Long): Long = {
    val len = bytes.length
    var h = seed ^ (len.toLong * MurmurPrime)
    val nBlocks = len / 8
    var i = 0
    while (i < nBlocks) {
      val base = i * 8
      var k = 0L
      var b = 7
      while (b >= 0) { k = (k << 8) | (bytes(base + b) & 0xffL); b -= 1 }
      k *= MurmurPrime
      k ^= k >>> MurmurR
      k *= MurmurPrime
      h ^= k
      h *= MurmurPrime
      i += 1
    }
    val tail = nBlocks * 8
    val rem = len & 7
    var j = rem - 1
    while (j >= 0) { h ^= (bytes(tail + j) & 0xffL) << (8 * j); j -= 1 }
    if (rem > 0) h *= MurmurPrime
    h ^= h >>> MurmurR
    h *= MurmurPrime
    h ^= h >>> MurmurR
    h
  }

  def murmur2_64(s: UTF8String): Long = murmur2_64(s.getBytes, 0L)

  /** SimHash-64 over a token array: per-token 64-bit hash votes on each
    * bit; the sign of each bit's tally forms the signature. Public
    * algorithm (Charikar 2002, "Similarity estimation techniques from
    * rounding algorithms"). */
  def simhash64(tokens: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = tokens.numElements()
    var t = 0
    while (t < n) {
      if (!tokens.isNullAt(t)) {
        val h = fnv64(tokens.getUTF8String(t))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  /** Winnowing-style document fingerprint (Schleimer et al., SIGMOD'03):
    * minimum of the rolling polynomial hashes of all k-byte grams.
    * Deterministic, content-defined; equal prefixes/suffixes don't
    * perturb it the way a whole-string hash does. */
  def fingerprint64(s: UTF8String, k: Int): Long = {
    val bytes = s.getBytes
    if (bytes.length == 0) return 0L
    val kk = math.min(k, bytes.length)
    val B = 257L
    // precompute B^(k-1) for the rolling update
    var bk = 1L
    var i = 0
    while (i < kk - 1) { bk *= B; i += 1 }
    var h = 0L
    i = 0
    while (i < kk) { h = h * B + (bytes(i) & 0xffL); i += 1 }
    var min = h
    i = kk
    while (i < bytes.length) {
      h = (h - (bytes(i - kk) & 0xffL) * bk) * B + (bytes(i) & 0xffL)
      if (h < min) min = h
      i += 1
    }
    min
  }

  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** splitmix64 finalizer (Steele et al. 2014, public domain). */
  def splitmix64(x0: Long): Long = {
    var z = x0 + -7046029254386353131L // golden gamma
    z = (z ^ (z >>> 30)) * -4658895280553007687L
    z = (z ^ (z >>> 27)) * -7723592293110705685L
    z ^ (z >>> 31)
  }

  /** Jaccard similarity of two SORTED distinct long arrays by merge
    * walk — no per-row hash-set allocation (array_intersect builds one
    * per invocation; at 625k pairs/task that dominates the stage). */
  def jaccardSorted(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements(); val nb = b.numElements()
    if (na == 0 && nb == 0) return 0.0
    var i = 0; var j = 0; var common = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common.toDouble / (na + nb - common)
  }

  /** |A∩B| of two sorted long arrays — the same merge walk as
    * [[jaccardSorted]] returning the raw count (the containment
    * family's verify primitive: thresholds compare the count in
    * integers, so no float ever decides a pair). */
  def intersectCountSorted(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var common = 0L
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { common += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    common
  }

  /** Tokenize (lowercase, whitespace), hash each token, combine each run
    * of k consecutive token hashes into a shingle hash, return the
    * SORTED DISTINCT shingle hashes — the whole dedup feature pipeline
    * in one pass with no intermediate strings. Equivalent information
    * to hashing k-word shingle text (any 1:1 recombination of token
    * hashes works; we chain splitmix64). Docs shorter than k tokens
    * produce one whole-doc shingle. */
  def hashedShingles(s: UTF8String, k: Int): Array[Long] = {
    require(k > 0, s"hashed_shingles: k must be positive, got $k")
    val bytes = s.toLowerCase.getBytes
    // token hashes via FNV over byte runs between whitespace
    var tokens = new Array[Long](16)
    var nTok = 0
    var h = FnvSeed
    var inTok = false
    var i = 0
    while (i <= bytes.length) {
      // must match the \s+ class used by Dedup.tokens and the composed
      // path: space, tab, LF, CR, FF, VT — else fused and composed
      // shingles diverge on docs containing form-feed/vertical-tab
      val ws = i == bytes.length || bytes(i) == ' ' || bytes(i) == '\t' ||
        bytes(i) == '\n' || bytes(i) == '\r' || bytes(i) == '\f' || bytes(i) == 0x0b
      if (ws) {
        if (inTok) {
          if (nTok == tokens.length) tokens = java.util.Arrays.copyOf(tokens, nTok * 2)
          tokens(nTok) = h; nTok += 1; h = FnvSeed; inTok = false
        }
      } else {
        h = (h * FnvPrime) ^ (bytes(i) & 0xffL); inTok = true
      }
      i += 1
    }
    if (nTok == 0) return Array.emptyLongArray
    val kk = math.min(k, nTok)
    val out = new Array[Long](nTok - kk + 1)
    var j = 0
    while (j < out.length) {
      var sh = 0L
      var m = 0
      while (m < kk) { sh = splitmix64(sh ^ tokens(j + m)); m += 1 }
      out(j) = sh
      j += 1
    }
    java.util.Arrays.sort(out)
    // dedup in place
    var w = 0
    var r = 0
    while (r < out.length) {
      if (w == 0 || out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == out.length) out else java.util.Arrays.copyOf(out, w)
  }

  /** All `perms` MinHash minima in ONE pass over the hashed-shingle
    * array. Composing this from 16 builtin `transform`+`array_min`
    * expressions generates 16 loops and megabytes of Janino code; one
    * fused loop is what a 100 TB scan wants. */
  def minhashSig(sh: ArrayData, perms: Int): Array[Long] = {
    val out = Array.fill(perms)(Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val v = sh.getLong(i)
      var p = 0
      while (p < perms) {
        val h = splitmix64(v ^ (p.toLong * 0x9e3779b97f4a7c15L))
        if (h < out(p)) out(p) = h
        p += 1
      }
      i += 1
    }
    out
  }
}

/** `fnv_hash(string) -> bigint` as a native Catalyst expression with
  * whole-stage codegen (no UDF boxing; stays inside WholeStageCodegen). */
case class FnvHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = HashImpl.fnv64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.fnv64($c)")
  override protected def withNewChildInternal(newChild: Expression): FnvHash64 = copy(child = newChild)
  override def prettyName: String = "fnv_hash"
}

/** `murmur_hash(string) -> bigint` as a native Catalyst expression —
  * the reference's murmur builtin surfaced with whole-stage codegen. */
case class MurmurHash2_64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = HashImpl.murmur2_64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.murmur2_64($c)")
  override protected def withNewChildInternal(newChild: Expression): MurmurHash2_64 = copy(child = newChild)
  override def prettyName: String = "murmur_hash"
}

/** `simhash64(array<string>) -> bigint` — near-dup signature over a
  * pre-tokenized document. */
case class SimHash64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any = HashImpl.simhash64(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.simhash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 = copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** `minhash_sig(array<bigint>, perms) -> array<bigint>` — fused MinHash
  * signature over pre-hashed shingles. */
case class MinHashSig(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(a: Any, p: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashImpl.minhashSig(a.asInstanceOf[ArrayData], p.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, p) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.HashImpl.minhashSig($a, $p))")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): MinHashSig =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "minhash_sig"
}

/** `hashed_shingles(text, k) -> array<bigint>`: sorted distinct k-word
  * shingle hashes in one fused pass. */
case class HashedShingles(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType, IntegerType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(s: Any, k: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      HashImpl.hashedShingles(s.asInstanceOf[UTF8String], k.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, k) =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(graft.functions.HashImpl.hashedShingles($s, $k))")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): HashedShingles =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "hashed_shingles"
}

/** `jaccard_sorted(array<bigint>, array<bigint>) -> double` over
  * pre-sorted distinct arrays. */
case class JaccardSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.jaccardSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.jaccardSorted($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): JaccardSorted =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "jaccard_sorted"
}

/** `intersect_count_sorted(array<bigint>, array<bigint>) -> bigint` —
  * fused sorted-merge intersection size (no intermediate array, unlike
  * array_intersect + size). */
case class IntersectCountSorted(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    HashImpl.intersectCountSorted(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashImpl.intersectCountSorted($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): IntersectCountSorted =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "intersect_count_sorted"
}

/** `fingerprint64(string) -> bigint` — winnowing-lite rolling-hash
  * document fingerprint over 8-byte grams. */
case class Fingerprint64(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    HashImpl.fingerprint64(input.asInstanceOf[UTF8String], 8)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashImpl.fingerprint64($c, 8)")
  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 = copy(child = newChild)
  override def prettyName: String = "fingerprint64"
}
