package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Production-scale BPE segmentation as ONE native expression — the
  * tokenizer-apply path for real merge counts (30k+), replacing the
  * chained per-merge `aggregate` folds whose Catalyst tree grew (and
  * re-evaluated) linearly per merge.
  *
  * Algorithm: the standard greedy lowest-merge-rank loop (the shape every
  * production BPE tokenizer applies): split the word to characters, then
  * repeatedly merge the adjacent pair with the LOWEST training rank
  * (leftmost occurrence on rank ties — ranks are unique, so the tie is
  * only positional) until no adjacent pair is a trained merge. This is
  * equivalent to replaying the training passes in order
  * ([[graft.text.Bpe.applyMerge]] chained per merge) because a merge can
  * only create symbols that participate in LATER-ranked merges: any merge
  * consuming a symbol produced at rank k was necessarily learned after
  * step k, so processing ranks greedily-minimal visits exactly the
  * pairs each sequential pass would, in the same left-to-right order.
  * Precondition (guaranteed by [[graft.text.Bpe.train]] by construction):
  * the merge list is WELL-FORMED — each side is a single character or the
  * product of an earlier merge. An ill-formed list (a rank-0 merge
  * consuming a rank-5 product) has no sequential-pass equivalent and is
  * applied rank-greedily as-is. LmSpec pins the equivalence against the
  * fold chain on randomly-trained (vocab, merge-list) instances across
  * several (seed, alphabet, merges) combinations; the
  * `bpe_merges`/`bpe_encode` oracle gates hash-check it against DuckDB's
  * unrolled iteration chain.
  *
  * Cost per row is O(len²) in the WORD length and independent of the
  * merge count — the rank table rides along once per executor as a
  * codegen reference object (a plain java.util.HashMap; ~30k entries for
  * a production tokenizer is single-digit MB), not as expression tree.
  * Plan depth is therefore flat in the number of merges: iteration 500 of
  * training analyzes the same 1-node expression as iteration 1.
  *
  * The reference (`finmlkit`) has no BPE; this is beyond-reference surface
  * for the LLM-corpus pipeline (tokenizer training over the `documents`
  * table).
  */
case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bpe_segment needs string, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "bpe_segment"
  // the rank table is payload, not plan: keep treeString size independent
  // of the merge count
  override def toString: String = s"bpe_segment($child, ${merges.size} merges)"
  override def sql: String = s"bpe_segment(${child.sql}, ${merges.size} merges)"

  /** Catalyst canonicalization / semanticEquals and case-class equality
    * would otherwise WALK the full merge list (30k pairs for a production
    * tokenizer) on every plan comparison — partially undoing the "rank
    * table is payload, not plan" goal during analysis (round-7 advice).
    * Compare an MD5 digest of the list instead: computed once per
    * expression instance, 16 bytes thereafter.
    */
  @transient private lazy val mergesDigest: String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    merges.foreach { case (l, r) =>
      md.update(l.getBytes("UTF-8")); md.update(' '.toByte)
      md.update(r.getBytes("UTF-8")); md.update('\n'.toByte)
    }
    java.util.Base64.getEncoder.encodeToString(md.digest)
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, mergesDigest, Integer.valueOf(merges.size))
  override def equals(obj: Any): Boolean = obj match {
    case other: BpeSegmentExpr =>
      child == other.child && merges.size == other.merges.size &&
        mergesDigest == other.mergesDigest
    case _ => false
  }

  /** rank table: "l r" -> training step (0-based; lower merges first).
    * Symbols match ^[a-z]+$ so the space separator can never collide.
    */
  @transient private lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.putIfAbsent(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    BpeSegmentExpr.segment(input.asInstanceOf[UTF8String], ranks)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ranksRef = ctx.addReferenceObj("bpeRanks", ranks, "java.util.HashMap")
    val helper = ctx.addReferenceObj("bpeHelper", BpeSegmentExpr,
      "graft.functions.BpeSegmentExpr$")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $helper.segment($c, $ranksRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeSegmentExpr =
    copy(child = newChild)
}

object BpeSegmentExpr extends Serializable {

  /** Greedy lowest-rank merge loop over one word. Words are short (the
    * vocab filter is ^[a-z]+$ tokens), so the quadratic scan beats any
    * heap bookkeeping in practice.
    */
  def segment(word: UTF8String, ranks: java.util.HashMap[String, Integer]): GenericArrayData = {
    val w = word.toString
    val n = w.length
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val syms = new java.util.ArrayList[String](n)
    // split by CODE POINT, not char: the fold twin's regexp "." matches
    // code points, and charAt would shear astral-plane surrogates
    var i = 0
    while (i < n) {
      val cp = w.codePointAt(i)
      val len = Character.charCount(cp)
      syms.add(w.substring(i, i + len))
      i += len
    }
    if (!ranks.isEmpty) {
      var merging = true
      while (merging && syms.size > 1) {
        var bestRank = Integer.MAX_VALUE
        var bestIdx = -1
        var j = 0
        val m = syms.size - 1
        while (j < m) {
          val r = ranks.get(syms.get(j) + " " + syms.get(j + 1))
          if (r != null && r.intValue < bestRank) { bestRank = r.intValue; bestIdx = j }
          j += 1
        }
        if (bestIdx < 0) merging = false
        else {
          syms.set(bestIdx, syms.get(bestIdx) + syms.get(bestIdx + 1))
          syms.remove(bestIdx + 1)
        }
      }
    }
    val out = new Array[Any](syms.size)
    var k = 0
    while (k < syms.size) { out(k) = UTF8String.fromString(syms.get(k)); k += 1 }
    new GenericArrayData(out)
  }

  /** Column form: segmented symbol array of a word column under an
    * ordered merge list.
    */
  def bpeSegmentExpr(word: Column, merges: Seq[(String, String)]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      BpeSegmentExpr(
        org.apache.spark.sql.GraftSqlBridge.expression(word), merges))
}
