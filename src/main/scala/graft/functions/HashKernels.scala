package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernels for the text-dedup hash signatures.
  *
  * The SQL formulations in [[graft.ops.Dedup]] (nested
  * `aggregate`/`transform` higher-order functions) are semantically right
  * but Spark does not codegen higher-order functions — every lambda step
  * is interpreted with boxed Longs and per-step array allocation. These
  * kernels compute bit-identical results (same `xxhash64` chain: seed 42,
  * hashLong/hashInt composition — see HashExpression) in one JVM loop per
  * row over the raw UTF-8 bytes, zero copies, and the expressions below
  * emit a static call so the surrounding projection stays inside
  * whole-stage codegen. Parity with the SQL forms is asserted in
  * OpsSpec ("native kernels match the SQL reference forms").
  *
  * At 100 TB the signature computation is the dominant map-side cost of
  * the dedup pipeline (the joins only see candidates); a ~10× faster
  * kernel is a ~10× cheaper stage, no plan change.
  */
object HashKernels {

  /** MinHash signature: per hash family k, min over shingles of
    * xxhash64(xxhash64(shingle), k). Shingles are `shingleSize`-codepoint
    * windows (SQL-substring semantics: at least one shingle, short text
    * yields the whole text). */
  def minhash(s: UTF8String, shingleSize: Int, numHashes: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    // codepoint start offsets (one pass; UTF-8 char = 1..4 bytes)
    val starts = new Array[Int](nBytes + 2)
    var i = 0
    var nChars = 0
    while (i < nBytes) {
      starts(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
    }
    starts(nChars) = nBytes
    val numShingles = math.max(nChars - shingleSize + 1, 1)
    val mins = new Array[Long](numHashes)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var p = 0
    while (p < numShingles) {
      val bStart = starts(p)
      val bEnd = starts(math.min(p + shingleSize, nChars))
      // xxhash64(shingle) then the per-family remix prefix, once per shingle
      val h = XXH64.hashUnsafeBytes(base, off + bStart, bEnd - bStart, 42L)
      val hl = XXH64.hashLong(h, 42L)
      var k = 0
      while (k < numHashes) {
        val hk = XXH64.hashInt(k, hl)
        if (hk < mins(k)) mins(k) = hk
        k += 1
      }
      p += 1
    }
    new GenericArrayData(mins)
  }

  /** DISTINCT hashed shingles: xxhash64 of each `shingleSize`-codepoint
    * window (same windows and hashing as [[minhash]]), deduplicated with
    * an open-addressing long set. Hashed 8-byte postings keep the
    * inverted-index shuffle of the exact-Jaccard join ~2-5× smaller than
    * string shingles, and the dedup happens in the kernel instead of an
    * interpreted array_distinct over allocated substrings. */
  def shingleHashes(s: UTF8String, shingleSize: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val nBytes = s.numBytes
    val starts = new Array[Int](nBytes + 2)
    var i = 0
    var nChars = 0
    while (i < nBytes) {
      starts(nChars) = i
      nChars += 1
      i += UTF8String.numBytesForFirstByte(Platform.getByte(base, off + i))
    }
    starts(nChars) = nBytes
    val numShingles = math.max(nChars - shingleSize + 1, 1)
    // open addressing, 0 = empty slot (hash value 0 tracked separately)
    var cap = java.lang.Integer.highestOneBit(math.max(numShingles, 4)) * 4
    val table = new Array[Long](cap)
    val maskT = cap - 1
    var sawZero = false
    val out = new Array[Long](numShingles)
    var n = 0
    var p = 0
    while (p < numShingles) {
      val bStart = starts(p)
      val bEnd = starts(math.min(p + shingleSize, nChars))
      val h = XXH64.hashUnsafeBytes(base, off + bStart, bEnd - bStart, 42L)
      if (h == 0L) {
        if (!sawZero) { sawZero = true; out(n) = 0L; n += 1 }
      } else {
        var slot = (h ^ (h >>> 32)).toInt & maskT
        var cur = table(slot)
        while (cur != 0L && cur != h) { slot = (slot + 1) & maskT; cur = table(slot) }
        if (cur == 0L) { table(slot) = h; out(n) = h; n += 1 }
      }
      p += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, n))
  }

  /** |A ∩ B| for two long arrays whose elements are distinct within each
    * array (ShingleHashes guarantees that): open-addressing set over the
    * smaller side, probe with the larger. One JVM loop per candidate pair
    * vs interpreted array_intersect + size — the verification inner loop
    * of the exact-verified LSH pipelines. */
  def intersectCount(a: ArrayData, b: ArrayData): Int = {
    val (small, large) = if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0
    val cap = java.lang.Integer.highestOneBit(math.max(n, 4)) * 4
    val table = new Array[Long](cap)
    val maskT = cap - 1
    var sawZero = false
    var i = 0
    while (i < n) {
      val h = small.getLong(i)
      if (h == 0L) sawZero = true
      else {
        var slot = (h ^ (h >>> 32)).toInt & maskT
        while (table(slot) != 0L && table(slot) != h) slot = (slot + 1) & maskT
        table(slot) = h
      }
      i += 1
    }
    var count = 0
    val m = large.numElements()
    var j = 0
    while (j < m) {
      val h = large.getLong(j)
      if (h == 0L) { if (sawZero) count += 1 }
      else {
        var slot = (h ^ (h >>> 32)).toInt & maskT
        while (table(slot) != 0L && table(slot) != h) slot = (slot + 1) & maskT
        if (table(slot) == h) count += 1
      }
      j += 1
    }
    count
  }

  @inline private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0B || b == '\f' || b == '\r'

  /** 64-bit SimHash over `\s+`-separated tokens (Java-regex split
    * semantics with limit -1: leading/trailing separators yield empty
    * tokens, exactly like split(text, '\\s+')): per bit, sign of the
    * ±1 vote sum across token hashes. */
  def simhash(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val counts = new Array[Int](64)

    @inline def vote(tokStart: Int, tokEnd: Int): Unit = {
      val h = XXH64.hashUnsafeBytes(base, off + tokStart, tokEnd - tokStart, 42L)
      var b = 0
      while (b < 64) {
        counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
        b += 1
      }
    }

    var i = 0
    var tokenStart = 0
    while (i < n) {
      if (isWs(Platform.getByte(base, off + i))) {
        vote(tokenStart, i)
        var j = i + 1
        while (j < n && isWs(Platform.getByte(base, off + j))) j += 1
        tokenStart = j
        i = j
      } else i += 1
    }
    vote(tokenStart, n) // final token ("" when text is empty or ends in \s)

    var sh = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sh |= 1L << b
      b += 1
    }
    sh
  }

  /** 64-bit SimHash with MD5 word hashes — the oracle-recomputable
    * variant: xxhash64 is Spark-private, but MD5 is identical in every
    * engine, so DuckDB can rebuild this hash from
    * `md5(word)` hex digits and cross-check emitted near-dup pairs
    * end-to-end (CORRECTNESS gate q22). Tokens are maximal non-whitespace
    * runs (== regexp_split_to_array + drop-empties in the oracle; no
    * empty-token votes, unlike [[simhash]]'s Java-split semantics). Bit b
    * of a word's hash is bit (7 − b%8) of MD5 byte b/8 — the natural
    * bit order of the hex string, so the oracle indexes hex digit b/4.
    * Zero tokens → hash 0. The production path stays [[simhash]]
    * (~5× faster: no digest allocation); parity of the *pair semantics*
    * is what OpsSpec asserts. */
  private val md5Digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhashMd5(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    val counts = new Array[Int](64)
    val md = md5Digest.get() // per-thread reuse; getInstance per row costs ~30% of the kernel
    var i = 0
    while (i < n) {
      if (!isWs(bytes(i))) {
        val start = i
        while (i < n && !isWs(bytes(i))) i += 1
        md.reset()
        md.update(bytes, start, i - start)
        val d = md.digest()
        var b = 0
        while (b < 64) {
          val bit = (d(b >> 3) >> (7 - (b & 7))) & 1
          counts(b) += (if (bit == 1) 1 else -1)
          b += 1
        }
      } else i += 1
    }
    var sh = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sh |= 1L << b
      b += 1
    }
    sh
  }
}

/** Codegen'd MinHash signature column (array<bigint> of length
  * `numHashes`). */
case class MinHashSignature(child: Expression, shingleSize: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleSize > 0 && numHashes > 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override protected def nullSafeEval(v: Any): Any =
    HashKernels.minhash(v.asInstanceOf[UTF8String], shingleSize, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.HashKernels.minhash($c, $shingleSize, $numHashes)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd distinct-hashed-shingle column (array<bigint>). */
case class ShingleHashes(child: Expression, shingleSize: Int) extends UnaryExpression {
  require(shingleSize > 0)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_hashes"

  override protected def nullSafeEval(v: Any): Any =
    HashKernels.shingleHashes(v.asInstanceOf[UTF8String], shingleSize)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.shingleHashes($c, $shingleSize)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd |A ∩ B| of two array<bigint> columns with per-array-distinct
  * elements. */
case class IntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true; case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs two array<bigint> columns, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.intersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.intersectCount($a, $b)")

  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Codegen'd MD5-word-hash SimHash column (oracle-recomputable variant). */
case class SimHashMd5(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(v: Any): Any =
    HashKernels.simhashMd5(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhashMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Codegen'd 64-bit SimHash column. */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs a string column, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    HashKernels.simhash(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.simhash($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
