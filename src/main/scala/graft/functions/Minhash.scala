package graft.functions

import graft.dedup.Dedup
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for per-row minhash band buckets — the
  * codegen tier of the extension preference order (SURVEY §7.3): one pass
  * over the shingle array computes all k universal-hash minima and the
  * band keys, instead of k interpreted `transform` traversals (higher-order
  * lambdas are CodegenFallback in Spark — ~10× interpretation overhead on
  * the streaming dedup map side, where this work rides every row).
  *
  * BIT-IDENTICAL to the batch `Dedup.lshCandidates` banding (and therefore
  * to `StreamingDedup` semantics): the shingle hash is the first 4 md5
  * bytes as an unsigned big-endian int masked to 31 bits — exactly
  * `conv(substring(md5(s),1,8),16,10) & 0x7fffffff` — the permutations are
  * `(a_s·h + b_s) mod (2^61−1)` with `Dedup.minhashCoef` constants, and a
  * band key is `band + ":" + md5(minima joined by "|")` over the decimal
  * string forms, matching `concat_ws`/`cast(string)`/`md5`.
  * PropertySpec/StreamingDedupSpec pin the equality through the batch
  * pair-set parity tests.
  *
  * `TextOps.shingles` never yields an empty array (short docs degenerate
  * to one whole-text shingle), so every doc is banded, matching batch; a
  * genuinely empty input array defensively yields an empty bucket array
  * (an `explode` then drops the row).
  */
case class MinhashBuckets(child: Expression, k: Int, bands: Int)
    extends UnaryExpression {
  require(k > 0 && bands > 0 && k % bands == 0,
    s"k ($k) must be a positive multiple of bands ($bands)")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_buckets needs array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_buckets"

  private lazy val aCoefs: Array[Long] = Array.tabulate(k)(Dedup.minhashCoef("a", _))
  private lazy val bCoefs: Array[Long] = Array.tabulate(k)(Dedup.minhashCoef("b", _))

  override protected def nullSafeEval(input: Any): Any =
    MinhashBuckets.buckets(input.asInstanceOf[ArrayData], aCoefs, bCoefs, bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", aCoefs, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bCoefs, "long[]")
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val mins = ctx.freshName("mins")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val helper = ctx.addReferenceObj("minhashHelper", MinhashBuckets,
        "graft.functions.MinhashBuckets$")
      // the element/permutation loops are generated Java; the md5 calls
      // (shingle hash, band-key digest) delegate to the companion's statics
      s"""
         |final int $n = $c.numElements();
         |if ($n == 0) {
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(new org.apache.spark.unsafe.types.UTF8String[0]);
         |} else {
         |  final long[] $mins = new long[$k];
         |  java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $h = $helper.hash31($c.getUTF8String($i));
         |    for (int $j = 0; $j < $k; $j++) {
         |      final long $v = ($aRef[$j] * $h + $bRef[$j]) % ${Dedup.minhashP}L;
         |      if ($v < $mins[$j]) $mins[$j] = $v;
         |    }
         |  }
         |  ${ev.value} = $helper.bandKeys($mins, $bands);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashBuckets =
    copy(child = newChild)
}

object MinhashBuckets extends Serializable {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 bytes of the UTF8 string as an unsigned big-endian int,
    * masked to 31 bits — `conv(substring(md5(s),1,8),16,10) & 0x7fffffff`.
    */
  def hash31(s: UTF8String): Long = {
    val dg = md5.get()
    dg.reset()
    val d = dg.digest(s.getBytes)
    (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) & 0x7fffffffL
  }

  private val hexChars = "0123456789abcdef".toCharArray

  /** `band + ":" + md5hex(minima joined by "|")` per band — matches
    * `concat_ws(":", band, md5(concat_ws("|", m...cast(string))))`.
    */
  def bandKeys(mins: Array[Long], bands: Int): GenericArrayData = {
    val r = mins.length / bands
    val out = new Array[UTF8String](bands)
    val dg = md5.get()
    var b = 0
    while (b < bands) {
      val joined = new java.lang.StringBuilder
      var i = 0
      while (i < r) {
        if (i > 0) joined.append('|')
        joined.append(mins(b * r + i))
        i += 1
      }
      dg.reset()
      val d = dg.digest(joined.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val hex = new Array[Char](32)
      var x = 0
      while (x < 16) {
        hex(2 * x) = hexChars((d(x) >> 4) & 0xf)
        hex(2 * x + 1) = hexChars(d(x) & 0xf)
        x += 1
      }
      out(b) = UTF8String.fromString(b.toString + ":" + new String(hex))
      b += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  /** Interpreted twin of the generated code — shared by `nullSafeEval`. */
  private[functions] def buckets(arr: ArrayData, as: Array[Long],
                                 bs: Array[Long], bands: Int): GenericArrayData = {
    val n = arr.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val k = as.length
    val mins = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = hash31(arr.getUTF8String(i))
      var j = 0
      while (j < k) {
        val v = (as(j) * h + bs(j)) % Dedup.minhashP
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    bandKeys(mins, bands)
  }

  /** Column form: band buckets of a shingle-array column. */
  def minhashBucketsExpr(shingles: Column, k: Int, bands: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      MinhashBuckets(
        org.apache.spark.sql.GraftSqlBridge.expression(shingles), k, bands))
}
