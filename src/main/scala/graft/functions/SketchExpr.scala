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
}
