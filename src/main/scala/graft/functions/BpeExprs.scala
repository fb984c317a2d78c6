package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE merge kernels (Sennrich et al. 2016, "Neural Machine Translation
  * of Rare Words with Subword Units"). The merge application is ONE
  * greedy left-to-right pass per learned merge: scan the symbol list,
  * and whenever (syms[i], syms[i+1]) == (a, b) emit the merged token and
  * continue AFTER it (i += 2) — `merge_vocab`'s `(?<!\S)a\sb(?!\S)`
  * re.sub semantics, which handles runs of identical symbols correctly
  * ("aaaaaa" under (a,a) → [aa,aa,aa], NOT the [aa,a,aa,a] a naive
  * two-pass string replace produces — the r17 ADVICE divergence this
  * kernel replaces).
  *
  * EQUIVALENCE TO THE ORACLE: the DuckDB oracle applies the same merge
  * as "replace the leftmost ` a b ` occurrence, repeat to fixpoint" (a
  * recursive CTE). That equals the single greedy pass: replacing the
  * leftmost pair (i, i+1) with a+b can never create a NEW occurrence at
  * or before position i (that would need b == a+b or a == a+b, both
  * impossible for non-empty symbols), so every subsequent leftmost
  * occurrence lies strictly to the right — the rescans collectively
  * walk left-to-right exactly once.
  *
  * Symbols are CODEPOINTS (plus the `</w>` end-of-word marker), matching
  * DuckDB `string_split(w, '')` — not UTF-16 code units, so surrogate
  * pairs stay whole.
  *
  * Scala objects emit static forwarders, so generated code calls
  * `graft.functions.BpeKernels.…` directly and the expressions stay
  * inside whole-stage codegen (the HashKernels pattern).
  */
object BpeKernels {
  private val EOW = UTF8String.fromString("</w>")

  /** word → its round-0 symbol array: one UTF8String per codepoint, then
    * the end-of-word marker (suffix merges must differ from prefix
    * merges — `st` in "star" vs "best</w>"). */
  def initSyms(word: UTF8String): ArrayData = {
    val s = word.toString
    val out = new java.util.ArrayList[UTF8String](s.length + 1)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val n = Character.charCount(cp)
      out.add(UTF8String.fromString(s.substring(i, i + n)))
      i += n
    }
    out.add(EOW)
    new GenericArrayData(out.toArray)
  }

  /** One greedy left-to-right merge pass of (a, b) → a+b over a symbol
    * array — the training-round corpus update. */
  def mergePass(syms: ArrayData, a: UTF8String, b: UTF8String): ArrayData = {
    val n = syms.numElements()
    val merged = UTF8String.concat(a, b)
    val out = new java.util.ArrayList[UTF8String](n)
    var i = 0
    while (i < n) {
      val cur = syms.getUTF8String(i)
      if (i + 1 < n && a.equals(cur) && b.equals(syms.getUTF8String(i + 1))) {
        out.add(merged); i += 2
      } else {
        out.add(cur); i += 1
      }
    }
    new GenericArrayData(out.toArray)
  }

  /** Encode one word against a learned merge list (parallel arrays a, b,
    * merged, in learned order — one greedy pass each) and return the
    * token count. Works from the word's OWN codepoints, so
    * out-of-vocabulary words encode from characters plus whatever
    * learned merges apply — real BPE OOV behavior, no training-vocab
    * join (the r17 ADVICE fix). In-place compaction: zero allocation
    * per pass beyond the initial symbol array. */
  def tokenCount(word: UTF8String, ma: Array[UTF8String],
                 mb: Array[UTF8String], mm: Array[UTF8String]): Long = {
    val s = word.toString
    val syms = new Array[UTF8String](s.codePointCount(0, s.length) + 1)
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = UTF8String.fromString(s.substring(i, i + w))
      n += 1
      i += w
    }
    syms(n) = EOW
    n += 1
    var m = 0
    while (m < ma.length && n > 1) {
      val a = ma(m); val b = mb(m); val merged = mm(m)
      var r = 0
      var o = 0
      while (r < n) {
        if (r + 1 < n && a.equals(syms(r)) && b.equals(syms(r + 1))) {
          syms(o) = merged; r += 2
        } else {
          syms(o) = syms(r); r += 1
        }
        o += 1
      }
      n = o
      m += 1
    }
    n.toLong
  }

  /** Encode one word and return the token ARRAY (same fold as
    * [[tokenCount]]; `tokenCount` = its length without the allocation). */
  def tokens(word: UTF8String, ma: Array[UTF8String],
             mb: Array[UTF8String], mm: Array[UTF8String]): ArrayData = {
    val s = word.toString
    var syms = new Array[UTF8String](s.codePointCount(0, s.length) + 1)
    var i = 0
    var n = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      syms(n) = UTF8String.fromString(s.substring(i, i + w))
      n += 1
      i += w
    }
    syms(n) = EOW
    n += 1
    var m = 0
    while (m < ma.length && n > 1) {
      val a = ma(m); val b = mb(m); val merged = mm(m)
      var r = 0
      var o = 0
      while (r < n) {
        if (r + 1 < n && a.equals(syms(r)) && b.equals(syms(r + 1))) {
          syms(o) = merged; r += 2
        } else {
          syms(o) = syms(r); r += 1
        }
        o += 1
      }
      n = o
      m += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(syms, n).asInstanceOf[Array[Any]])
  }
}

/** word STRING → ARRAY<STRING> of codepoint symbols + `</w>`. */
case class BpeInitSyms(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_init_syms"
  override protected def nullSafeEval(w: Any): Any =
    BpeKernels.initSyms(w.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeKernels.initSyms($c)")
  override protected def withNewChildInternal(newChild: Expression): BpeInitSyms =
    copy(child = newChild)
}

/** One greedy merge pass of the driver-chosen pair (a, b) over an
  * ARRAY<STRING> symbol column — the per-round training update. The pair
  * rides as reference objects (one collected row per round — the
  * codebook-collect pattern), so generated code is a single static call. */
case class BpeMergePassExpr(child: Expression, a: String, b: String)
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<STRING>, got $t")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_merge_pass"
  @transient private lazy val aU = UTF8String.fromString(a)
  @transient private lazy val bU = UTF8String.fromString(b)
  override protected def nullSafeEval(syms: Any): Any =
    BpeKernels.mergePass(syms.asInstanceOf[ArrayData], aU, bU)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ar = ctx.addReferenceObj("graftBpeA", aU,
      "org.apache.spark.unsafe.types.UTF8String")
    val br = ctx.addReferenceObj("graftBpeB", bU,
      "org.apache.spark.unsafe.types.UTF8String")
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernels.mergePass($c, $ar, $br)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeMergePassExpr =
    copy(child = newChild)
}

/** word STRING → ARRAY<STRING> of its BPE tokens under a learned merge
  * list — the materialized encode (BpeTokenCount's count is `size` of
  * this); feeds the vocabulary export (l_bpe_vocab). */
case class BpeTokens(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_bpe_tokens"
  @transient private lazy val ma = merges.map(p => UTF8String.fromString(p._1)).toArray
  @transient private lazy val mb = merges.map(p => UTF8String.fromString(p._2)).toArray
  @transient private lazy val mm = merges.map(p => UTF8String.fromString(p._1 + p._2)).toArray
  override protected def nullSafeEval(w: Any): Any =
    BpeKernels.tokens(w.asInstanceOf[UTF8String], ma, mb, mm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = "org.apache.spark.unsafe.types.UTF8String[]"
    val mar = ctx.addReferenceObj("graftBpeMa", ma, t)
    val mbr = ctx.addReferenceObj("graftBpeMb", mb, t)
    val mmr = ctx.addReferenceObj("graftBpeMm", mm, t)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernels.tokens($c, $mar, $mbr, $mmr)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokens =
    copy(child = newChild)
}

/** word STRING → BIGINT token count under a learned merge list (applied
  * in order, one greedy pass each — see [[BpeKernels.tokenCount]]). The
  * model rides as reference objects: kilobytes for any realistic merge
  * count, generated code constant-size in K — a chained-replace column
  * tree would grow the plan linearly in K and cannot survive a 30k-merge
  * production model. */
case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
  extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bpe_token_count"
  @transient private lazy val ma = merges.map(p => UTF8String.fromString(p._1)).toArray
  @transient private lazy val mb = merges.map(p => UTF8String.fromString(p._2)).toArray
  @transient private lazy val mm = merges.map(p => UTF8String.fromString(p._1 + p._2)).toArray
  override protected def nullSafeEval(w: Any): Any =
    BpeKernels.tokenCount(w.asInstanceOf[UTF8String], ma, mb, mm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = "org.apache.spark.unsafe.types.UTF8String[]"
    val mar = ctx.addReferenceObj("graftBpeMa", ma, t)
    val mbr = ctx.addReferenceObj("graftBpeMb", mb, t)
    val mmr = ctx.addReferenceObj("graftBpeMm", mm, t)
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeKernels.tokenCount($c, $mar, $mbr, $mmr)")
  }
  override protected def withNewChildInternal(newChild: Expression): BpeTokenCount =
    copy(child = newChild)
}

/** Column-API surface for the BPE expressions (the HashExprs pattern). */
object BpeExprs {
  private def expr(c: Column) = GraftSqlBridge.expression(c)
  def initSyms(word: Column): Column =
    GraftSqlBridge.column(BpeInitSyms(expr(word)))
  def mergePass(syms: Column, a: String, b: String): Column =
    GraftSqlBridge.column(BpeMergePassExpr(expr(syms), a, b))
  def tokenCount(word: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokenCount(expr(word), merges))
  def tokens(word: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokens(expr(word), merges))
}
