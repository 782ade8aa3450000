package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Shared 64-bit mixing (Murmur3 fmix64 finalizer — public constant set). */
object Mix {
  @inline def mix64(x0: Long): Long = {
    var x = x0
    x ^= x >>> 33; x *= 0xff51afd7ed558ccdL
    x ^= x >>> 33; x *= 0xc4ceb9fe1a85ec53L
    x ^= x >>> 33; x
  }

  /** FNV-1a 64-bit over UTF-8 bytes. */
  def hashBytes(b: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < b.length) { h ^= b(i) & 0xffL; h *= 0x100000001b3L; i += 1 }
    h
  }

  def tokenize(s: UTF8String): Array[String] = {
    // Locale.ROOT: cluster JVMs may run under locales (tr_TR) where the
    // default lowercase mapping diverges for ASCII 'I'
    val t = s.toString.toLowerCase(java.util.Locale.ROOT).trim
    if (t.isEmpty) Array.empty else t.split("\\s+")
  }
}

/** Distinct 64-bit hashes of word `n`-shingles of a text column (whole text
  * if shorter than n tokens). Native eval: one pass, no per-lambda
  * interpretation — the signature stage of MinHash dedup is CPU-bound at
  * 100 TB, so this is the hot loop.
  */
object ShingleHashes {
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = Mix.tokenize(s)
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    if (toks.length < n) {
      seen.add(Mix.hashBytes(toks.mkString(" ").getBytes("UTF-8")))
    } else {
      var i = 0
      while (i <= toks.length - n) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(Mix.hashBytes(sb.toString.getBytes("UTF-8")))
        i += 1
      }
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }
}

case class ShingleHashes(child: Expression, n: Int = 3)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected input type ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  // full codegen (no CodegenFallback row materialization): the generated
  // code calls the static compute directly, keeping whole-stage codegen
  // spans unbroken around this expression.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleHashes$$.MODULE$$.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** k-permutation MinHash signature over an array of 64-bit shingle hashes.
  * Permutation p of hash h is mix64(h ^ seed(p)); signature entry p is the
  * minimum over shingles. Tight long loop: k*|shingles| mixes per row.
  */
object MinHashSig {
  private val seedCache = new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  def seeds(k: Int): Array[Long] = seedCache.computeIfAbsent(k,
    kk => Array.tabulate(kk)(p => Mix.mix64(0x9e3779b97f4a7c15L * (p + 1))))

  def compute(input: ArrayData, k: Int): ArrayData = {
    val hashes = input.toLongArray()
    val ss = seeds(k)
    val sig = new Array[Long](k)
    var p = 0
    while (p < k) {
      var min = Long.MaxValue
      val seed = ss(p)
      var i = 0
      while (i < hashes.length) {
        val v = Mix.mix64(hashes(i) ^ seed)
        if (v < min) min = v
        i += 1
      }
      sig(p) = min
      p += 1
    }
    new GenericArrayData(sig)
  }
}

case class MinHashSig(child: Expression, k: Int = 64)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected input type ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    MinHashSig.compute(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig$$.MODULE$$.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** 64-bit SimHash of a text column: unigram token hashes vote per bit
  * (+1/-1), bit set iff the sum is non-negative. Packed long output.
  */
object SimHash64 {
  def compute(s: UTF8String): Long = {
    val toks = Mix.tokenize(s)
    val counts = new Array[Int](64)
    var i = 0
    while (i < toks.length) {
      val h = Mix.hashBytes(toks(i).getBytes("UTF-8"))
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counts(b) >= 0) out |= (1L << b); b += 1 }
    out
  }
}

case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected input type ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash64"

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** 64-bit polynomial rolling hash (base 31, wrapping) over normalized text
  * (lowercased, whitespace collapsed to single spaces) — a content
  * fingerprint stable under case/whitespace noise. Wrapping long arithmetic
  * in the JVM, immune to ANSI overflow checking.
  */
object Fingerprint64 {
  def compute(input: UTF8String): Long = {
    val norm = input.toString.toLowerCase(java.util.Locale.ROOT).trim.replaceAll("\\s+", " ")
    var h = 1125899906842597L
    var i = 0
    while (i < norm.length) { h = h * 31L + norm.charAt(i); i += 1 }
    h
  }
}

case class Fingerprint64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected input type ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_fingerprint64"

  override protected def nullSafeEval(input: Any): Any =
    Fingerprint64.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Fingerprint64$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
    copy(child = newChild)
}

/** DEFLATE-compressed byte length of a text column (zlib level 6) — the
  * classic compression-ratio quality signal (CCNet/Gopher-style): highly
  * repetitive or templated documents compress far below natural prose.
  * Deterministic for a given zlib, but not reproducible in SQL, so the
  * operator is spec-pinned rather than oracled.
  */
object DeflateLen {
  // per-task-thread zlib state, reset() per row — allocating/destroying a
  // native Deflater per row would put a malloc/free pair on the hot path
  private val deflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue(): java.util.zip.Deflater =
      new java.util.zip.Deflater(6)
  }
  private val buf = new ThreadLocal[Array[Byte]] {
    override def initialValue(): Array[Byte] = new Array[Byte](8192)
  }

  def compute(s: UTF8String): Int = {
    val d = deflater.get()
    d.reset()
    d.setInput(s.getBytes)
    d.finish()
    val b = buf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(b)
    total
  }
}

case class DeflateLen(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected input type ${child.dataType}")
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def prettyName: String = "graft_deflate_len"

  override protected def nullSafeEval(input: Any): Any =
    DeflateLen.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.DeflateLen$$.MODULE$$.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature of a float-vector column, packed into a
  * long (`bits` low bits). Hyperplane components are deterministic
  * pseudo-random units derived from (bit, dim) — no stored model. Bit b is
  * set iff dot(vec, r_b) >= 0.
  */
object HyperplaneSig {
  @inline private def unit(b: Int, i: Int): Double =
    (Mix.mix64(b.toLong * 0x9e3779b97f4a7c15L ^ i.toLong * 0xc2b2ae3d27d4eb4fL) %
      1000001L).toDouble / 1000000.0

  def compute(input: ArrayData, bits: Int): Long = {
    val vec = input.toFloatArray()
    var out = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var i = 0
      while (i < vec.length) { dot += vec(i) * unit(b, i); i += 1 }
      if (dot >= 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

case class HyperplaneSig(child: Expression, bits: Int = 16)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
        child.dataType.asInstanceOf[ArrayType].elementType == FloatType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName: unexpected input type ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hyperplane_sig"

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneSig.compute(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HyperplaneSig$$.MODULE$$.compute($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}
