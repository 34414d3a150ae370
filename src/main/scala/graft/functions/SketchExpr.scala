package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native sketch kernels for the dedup/similarity operators.
  *
  * Each replaces a Catalyst HOF pipeline (`aggregate`/`transform`/
  * `zip_with` — CodegenFallback, one interpreted lambda dispatch plus an
  * intermediate array PER ELEMENT) with a single static loop. Hash
  * arithmetic is kept EXACTLY equal to the HOF form it replaces — the
  * same `xxhash64(...)` chaining (seed 42, int then payload) — so sketch
  * outputs are bit-identical; parity specs assert it on fixture corpora.
  */
object SketchKernels {
  private final val Seed = 42L

  /** minhash_sig: sig[k] = min over shingles s of xxhash64(k, s). */
  def minhashSig(shingles: ArrayData, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      val s = shingles.getUTF8String(i)
      var k = 0
      while (k < numHashes) {
        // xxhash64(lit(k): int, s: string) == string hashed with the
        // int-hash of k as its seed
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
          s.numBytes, XXH64.hashInt(k, Seed))
        if (h < sig(k)) sig(k) = h
        k += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** simhash64: bit j set iff sum over words of ±1 (sign = bit j of
    * xxhash64(word)) is positive.
    */
  def simhash64(words: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = words.numElements()
    var i = 0
    while (i < n) {
      val w = words.getUTF8String(i)
      val h = XXH64.hashUnsafeBytes(w.getBaseObject, w.getBaseOffset,
        w.numBytes, Seed)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var fp = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) fp |= (1L << j); j += 1 }
    fp
  }

  /** hyperplane_code: bit j (j < planes) set iff
    * sum over dims d of (bit 7 of xxhash64(j, d) == 1 ? v[d] : -v[d]) > 0.
    */
  def hyperplaneCode(v: ArrayData, planes: Int): Long = {
    val n = v.numElements()
    var code = 0L
    var j = 0
    while (j < planes) {
      val hj = XXH64.hashInt(j, Seed)
      var proj = 0.0
      var d = 0
      while (d < n) {
        val x = v.getDouble(d)
        val bit = (XXH64.hashInt(d, hj) >>> 7) & 1L
        proj += (if (bit == 1L) x else -x)
        d += 1
      }
      if (proj > 0) code |= (1L << j)
      j += 1
    }
    code
  }

  /** splitmix64 finalizer — identical to `TranscriptGen.mix`. Exists as a
    * native kernel because the arithmetic NEEDS mod-2^64 wraparound,
    * which ANSI-mode Column multiplication refuses (ARITHMETIC_OVERFLOW);
    * Java long arithmetic wraps by definition.
    */
  def splitmix64(x0: Long): Long = {
    var x = x0 + 0x9e3779b97f4a7c15L
    x = (x ^ (x >>> 30)) * 0xbf58476d1ce4e5b9L
    x = (x ^ (x >>> 27)) * 0x94d049bb133111ebL
    x ^ (x >>> 31)
  }

  /** < 2^56: acc*31 + codepoint never overflows a Long. The single source
    * of the polynomial-hash modulus (TextMetrics.FpMod aliases it).
    */
  final val FpMod = 72057594037927931L

  private final val SpaceSep = UTF8String.fromString(" ")

  /** word_ngrams: the " "-joined n-gram array of a word array, optionally
    * distinct (first-occurrence order — array_distinct semantics). One
    * static loop replacing the HOF chain `array_distinct(transform(
    * arrays_zip(n shifted slices), concat_ws))` — n slice arrays, a zip
    * struct per gram and an interpreted lambda dispatch per gram, per row.
    * Gram VALUES are byte-identical (same words, same single-space join).
    */
  def wordNgrams(words: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val cnt = words.numElements() - (n - 1)
    if (cnt <= 0) return new GenericArrayData(new Array[Any](0))
    val out = new java.util.ArrayList[AnyRef](cnt)
    val seen = if (distinct) new java.util.HashSet[UTF8String](cnt * 2) else null
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < cnt) {
      var j = 0
      while (j < n) { parts(j) = words.getUTF8String(i + j); j += 1 }
      val gram = UTF8String.concatWs(SpaceSep, parts: _*)
      if (seen == null || seen.add(gram)) out.add(gram)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** char_fp: polynomial rolling hash over the CODE POINTS of a string —
    * acc = (acc*31 + cp) mod FpMod. Identical to the HOF fold
    * `aggregate(transform(split(s, ''), ascii), 0, pmod(acc*31 + c))`:
    * Spark's `split(s, '')` yields one element per code point and `ascii`
    * is the first code point (0 for the empty string, which contributes
    * acc*31 + 0 — reproduced here by the empty loop over an empty
    * string since acc starts at 0). All operands are non-negative, so
    * `%` equals `pmod`.
    */
  def charFp(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    val len = str.length
    while (i < len) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % FpMod
      i += Character.charCount(cp)
    }
    acc
  }

  /** span_window_hashes: per-word [[charFp]] fingerprints, then the
    * length-`w` window polynomial hashes acc = (acc*31 + wfp) mod FpMod —
    * the SpanDedup kernel as ONE static pass (word fps computed once,
    * each window a tight inner fold) instead of a transform + arrays_zip
    * of w shifted slices + an interpreted fold lambda per window. Empty
    * result below w words (the HOF guards `sequence(1, 0)` explicitly;
    * here the loop simply doesn't run).
    */
  def spanWindowHashes(words: ArrayData, w: Int): ArrayData = {
    val n = words.numElements()
    val cnt = n - (w - 1)
    if (cnt <= 0) return new GenericArrayData(new Array[Long](0))
    val wfps = new Array[Long](n)
    var i = 0
    while (i < n) { wfps(i) = charFp(words.getUTF8String(i)); i += 1 }
    val out = new Array[Long](cnt)
    i = 0
    while (i < cnt) {
      var acc = 0L
      var j = 0
      while (j < w) { acc = (acc * 31 + wfps(i + j)) % FpMod; j += 1 }
      out(i) = acc
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchKernels.minhashSig(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.minhashSig($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  override def prettyName: String = "minhash_sig"
}

case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchKernels.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

case class HyperplaneCode(child: Expression, planes: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchKernels.hyperplaneCode(v.asInstanceOf[ArrayData], planes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.hyperplaneCode($c, $planes)")
  override protected def withNewChildInternal(c: Expression): HyperplaneCode = copy(child = c)
  override def prettyName: String = "hyperplane_code"
}

case class SplitMix64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchKernels.splitmix64(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.splitmix64($c)")
  override protected def withNewChildInternal(c: Expression): SplitMix64 = copy(child = c)
  override def prettyName: String = "splitmix64"
}

case class WordNgrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchKernels.wordNgrams(v.asInstanceOf[ArrayData], n, distinct)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.SketchKernels.wordNgrams($c, $n, $distinct)")
  override protected def withNewChildInternal(c: Expression): WordNgrams = copy(child = c)
  override def prettyName: String = "word_ngrams"
}

case class CharFp(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    SketchKernels.charFp(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.charFp($c)")
  override protected def withNewChildInternal(c: Expression): CharFp = copy(child = c)
  override def prettyName: String = "char_fp"
}

case class SpanWindowHashes(child: Expression, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    SketchKernels.spanWindowHashes(v.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SketchKernels.spanWindowHashes($c, $w)")
  override protected def withNewChildInternal(c: Expression): SpanWindowHashes = copy(child = c)
  override def prettyName: String = "span_window_hashes"
}

object SketchExpr {
  import org.apache.spark.sql.GraftColumnBridge
  def minhash_sig(c: Column, numHashes: Int): Column =
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(c), numHashes))
  def splitmix64(c: Column): Column =
    GraftColumnBridge.column(SplitMix64(GraftColumnBridge.expression(c)))
  def simhash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))
  def hyperplane_code(c: Column, planes: Int): Column =
    GraftColumnBridge.column(HyperplaneCode(GraftColumnBridge.expression(c), planes))
  def word_ngrams(c: Column, n: Int, distinct: Boolean): Column =
    GraftColumnBridge.column(WordNgrams(GraftColumnBridge.expression(c), n, distinct))
  def char_fp(c: Column): Column =
    GraftColumnBridge.column(CharFp(GraftColumnBridge.expression(c)))
  def span_window_hashes(c: Column, w: Int): Column =
    GraftColumnBridge.column(SpanWindowHashes(GraftColumnBridge.expression(c), w))
}
