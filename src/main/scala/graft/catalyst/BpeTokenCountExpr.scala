package graft.catalyst

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass learned-BPE token counter — the hot-path form of
  * [[graft.operators.Bpe]]'s replace-chain application.
  *
  * The declarative chain (`encode → fold of 20 replaces → count`)
  * materializes ~21 intermediate UTF8Strings per row; at sf1's 50k-doc
  * corpus that is the whole cost of q35 (measured 11.3 s vs 2.3 s for
  * the old regex chunker). This expression runs the IDENTICAL merge
  * procedure token-wise in one pass — per word: start from chars, for
  * each merge in learned order fuse adjacent (a,b) pairs
  * leftmost-nonoverlapping (the same semantics as a string `replace`:
  * after a fusion the scan continues past the fused token) — with one
  * small String[] per word and no full-document copies.
  *
  * Equivalence to the chain is exact on the corpus alphabet ([a-z ]; no
  * '<'/'>' in text — the bracket encoding's precondition, see [[Bpe]]),
  * pinned by BpeSpec against both the chain column and an independent
  * sequential implementation. The merge table is plan-time state
  * (embedded via `addReferenceObj`), so the per-row call sits inside
  * whole-stage codegen like the other native kernels.
  */
case class BpeTokenCountExpr(child: Expression, merges: Seq[String])
    extends UnaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bpe_token_count requires a string argument, got ${child.dataType.simpleString}")

  // Every token value lives in a CLOSED set: single chars (id = char
  // code) or the result of an earlier merge (id ≥ 0x10000) — so tokens
  // are ints and a merge pass is integer compares with zero allocation.
  // Fused ids are canonicalized BY STRING: two merges yielding the same
  // token text get the same id (token equality is text equality in the
  // replace-chain semantics being mirrored). A pair component that is
  // neither a single char nor an earlier fusion can never occur in a
  // stream; its id is -1 (matches nothing).
  @transient private lazy val (pairA, pairB, fusedIds) = {
    val fusedId = new java.util.HashMap[String, Integer]
    def idOf(c: String): Int =
      if (c.length == 1) c.charAt(0).toInt
      else Option(fusedId.get(c)).map(_.intValue).getOrElse(-1)
    val a = new Array[Int](merges.length)
    val b = new Array[Int](merges.length)
    val f = new Array[Int](merges.length)
    merges.zipWithIndex.foreach { case (m, i) =>
      val parts = m.substring(1, m.length - 1).split("><", -1)
      require(parts.length == 2, s"malformed merge '$m'")
      a(i) = idOf(parts(0)); b(i) = idOf(parts(1))
      val text = parts(0) + parts(1)
      val existing = fusedId.get(text)
      f(i) = if (existing != null) existing.intValue else 0x10000 + i
      if (existing == null) fusedId.put(text, 0x10000 + i)
    }
    (a, b, f)
  }

  /** Token count of one document (called from generated code). */
  def count(s: UTF8String): Int = {
    val str = s.toString
    val n = str.length
    var total = 0
    var ws = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        total += countWord(str, ws, i)
        ws = i + 1
      }
      i += 1
    }
    total
  }

  private def countWord(str: String, s: Int, e: Int): Int = {
    val len = e - s
    if (len == 0) return 0
    val toks = new Array[Int](len)
    var i = 0
    while (i < len) { toks(i) = str.charAt(s + i).toInt; i += 1 }
    var m = len
    var k = 0
    val nMerges = merges.length
    while (k < nMerges && m > 1) {
      val a = pairA(k); val b = pairB(k); val f = fusedIds(k)
      var r = 0; var w = 0
      while (r < m) {
        if (r + 1 < m && toks(r) == a && toks(r + 1) == b) {
          toks(w) = f; r += 2 // fused token is not rescanned this pass
        } else { toks(w) = toks(r); r += 1 }
        w += 1
      }
      m = w
      k += 1
    }
    m
  }

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCounter", this,
      classOf[BpeTokenCountExpr].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.count($s);")
  }

  override protected def withNewChildInternal(newChild: Expression): BpeTokenCountExpr =
    copy(child = newChild)
}
