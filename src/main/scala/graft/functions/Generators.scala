package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram (shingle) kernels — the text-pipeline fan-out that the
  * built-in spelling (`explode(transform(sequence(...), i ->
  * concat_ws(...)))`) evaluates as interpreted higher-order functions per
  * row. Two Spark surfaces over one kernel:
  *
  *  - [[WordNGramArray]]: scalar ARRAY<STRING> expression with doGenCode —
  *    compose with the built-in `explode`, which keeps the Generate inside
  *    whole-stage codegen (the hot path; used by LlmOps.shingleHashes);
  *  - [[WordNGrams]]: a true Generator (UDTF) for the SQL surface —
  *    `LATERAL VIEW graft_shingles(text, 3) t AS shingle` — covering the
  *    §2.7 UDTF category with genuine row-generating semantics.
  *
  * Tokenization contract: split on single spaces keeping empties (Java
  * `split(" ", -1)`), identical to Spark `split(text, ' ')` and DuckDB
  * `string_split(text, ' ')`, so oracle SQL replays it exactly.
  */
object NGramKernels {
  /** All n-grams of the space-split words of `s`, joined by single spaces;
    * empty array when there are fewer than n words. */
  def wordNGrams(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    val m = words.length - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        val sb = new java.lang.StringBuilder
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(words(i + j))
          j += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Poly-31-mod-P hash of every n-WORD window of `s` — bit-identical to
    * polyHash(wordNGrams(s, n)(i)) (the fold walks each word's code
    * points with a single space folded between words) WITHOUT
    * materializing the joined shingle strings: the shingle family
    * (minhash/simhash/jaccard/winnow/dup-ngrams) only ever consumes the
    * hash, and the per-window string build + re-walk was pure allocation
    * cost on the hot path. */
  def wordNGramHashes(s: UTF8String, n: Int): ArrayData = {
    val words = s.toString.split(" ", -1)
    val m = words.length - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val P = HashKernels.P
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        var acc = 0L
        var j = 0
        while (j < n) {
          if (j > 0) acc = (acc * 31 + ' '.toInt) % P
          val w = words(i + j)
          var si = 0
          while (si < w.length) {
            val cp = w.codePointAt(si)
            acc = (acc * 31 + cp) % P
            si += Character.charCount(cp)
          }
          j += 1
        }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** Poly-31-mod-P hash of every n-CODE-POINT window of `s` — the hashed
    * character-n-gram feature stream (hashing-trick features, the DSIR
    * precedent) as ONE long[] per document: no per-gram string
    * allocation, the cost that made the substr spelling of l_langid
    * 2–4× slower at sf10. Each window hash is the polyHash fold over the
    * window's code points, i.e. sqlPoly(t[i:i+n-1]) in the DuckDB oracle
    * for text whose graphemes are single code points (this corpus):
    * windows here step over CODE POINTS while DuckDB's bracket slicing
    * steps over grapheme clusters, so combining sequences (e + U+0301)
    * would yield different gram streams — the same "ASCII or BMP,
    * no combining marks" caveat polyHash documents (r11 ADVICE). */
  def charNGramHashes(s: UTF8String, n: Int): ArrayData = {
    val str = s.toString
    // code-point array (BMP + astral safe), usually == char array for
    // this corpus but the contract is code points, matching DuckDB
    val cps = new Array[Int](str.codePointCount(0, str.length))
    var ci = 0; var si = 0
    while (si < str.length) {
      val cp = str.codePointAt(si)
      cps(ci) = cp; ci += 1; si += Character.charCount(cp)
    }
    val m = cps.length - n + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val P = HashKernels.P
      val out = new Array[Any](m)
      var i = 0
      while (i < m) {
        var acc = 0L
        var j = 0
        while (j < n) { acc = (acc * 31 + cps(i + j)) % P; j += 1 }
        out(i) = acc
        i += 1
      }
      new GenericArrayData(out)
    }
  }
}

object WinnowKernels {
  /** DISTINCT w-window minima of a positional hash array — the winnowing
    * fingerprint selection as ONE compiled pass (see [[WinnowMinArray]]).
    * O(n·w) with w a small constant; first-occurrence order matches
    * array_distinct over the window-min sequence. Empty output when the
    * array holds fewer than w hashes (the HOF spelling's
    * size >= w guard, absorbed). */
  def winnowMins(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    val m = n - w + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new Array[Any](m)
      var cnt = 0
      var i = 0
      while (i < m) {
        var mn = hs.getLong(i)
        var j = i + 1
        while (j < i + w) {
          val v = hs.getLong(j)
          if (v < mn) mn = v
          j += 1
        }
        if (seen.add(mn)) { out(cnt) = mn; cnt += 1 }
        i += 1
      }
      new GenericArrayData(if (cnt == m) out else out.take(cnt))
    }
  }
}

/** Scalar fused shingle-hash expression: ARRAY<BIGINT> of
  * polyHash(word n-gram) for every window — see
  * NGramKernels.wordNGramHashes. Pair with the built-in `explode`. */
case class WordNGramHashArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_ngram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    NGramKernels.wordNGramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramKernels.wordNGramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNGramHashArray =
    copy(child = newChild)
}

/** Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken) over a
  * positional hash array: ARRAY<BIGINT> of the DISTINCT w-window minima,
  * codegen'd to one static kernel call — composes with
  * [[WordNGramHashArray]] so the whole fingerprint build is two compiled
  * calls per document. Replaces the interpreted
  * transform(sequence)/slice/array_min/array_distinct HOF chain, whose
  * per-window interpreted tree walk dominated BOTH winnow rows at sf10
  * (the build, shared via winnowKept, was ~3/4 of l_winnow_lsh's
  * 20 s; the kernel runs it at scan speed). First-occurrence order,
  * exactly array_distinct's. */
case class WinnowMinArray(child: Expression, w: Int) extends UnaryExpression {
  require(w >= 1, s"winnow window must be >= 1, got $w")
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<BIGINT>, got $t")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnow_mins"
  override protected def nullSafeEval(input: Any): Any =
    WinnowKernels.winnowMins(input.asInstanceOf[ArrayData], w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WinnowKernels.winnowMins($c, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowMinArray =
    copy(child = newChild)
}

/** Scalar hashed char-n-gram expression: ARRAY<BIGINT> of the poly-hashes
  * of every n-code-point window, codegen'd to one static kernel call.
  * Pair with the built-in `explode`. */
case class CharNGramHashArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_char_ngram_hashes"
  override protected def nullSafeEval(input: Any): Any =
    NGramKernels.charNGramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramKernels.charNGramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharNGramHashArray =
    copy(child = newChild)
}

/** Scalar n-gram expression: ARRAY<STRING> of word n-grams, codegen'd to a
  * single static kernel call. Pair with the built-in `explode`. */
case class WordNGramArray(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"n-gram width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngram_array"
  override protected def nullSafeEval(input: Any): Any =
    NGramKernels.wordNGrams(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.NGramKernels.wordNGrams($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): WordNGramArray =
    copy(child = newChild)
}

/** Generator (UDTF) surface: one output row per n-gram, column `shingle`.
  * Registered as SQL function `graft_shingles` for LATERAL VIEW use.
  * Generators run inside GenerateExec (its own operator, not a codegen'd
  * Project), so CodegenFallback here costs nothing extra; the codegen hot
  * path is WordNGramArray + explode. */
case class WordNGrams(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {
  require(n >= 1, s"n-gram width must be >= 1, got $n")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def elementSchema: StructType =
    StructType(Seq(StructField("shingle", StringType, nullable = false)))
  override def prettyName: String = "graft_shingles"
  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Iterator.empty
    else {
      val arr = NGramKernels.wordNGrams(v.asInstanceOf[UTF8String], n)
      (0 until arr.numElements()).iterator
        .map(i => InternalRow(arr.getUTF8String(i)))
    }
  }
  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object Generators {
  /** n-gram width from the SQL literal argument (must be foldable). */
  private[functions] def literalN(e: Expression): Int = {
    require(e.foldable, s"n-gram width must be a literal, got $e")
    e.eval() match {
      case i: Int => i
      case l: Long => l.toInt
      case other => throw new IllegalArgumentException(s"n-gram width must be integral, got $other")
    }
  }

  def wordNGramArray(c: Column, n: Int): Column =
    GraftSqlBridge.column(WordNGramArray(GraftSqlBridge.expression(c), n))

  def charNGramHashArray(c: Column, n: Int): Column =
    GraftSqlBridge.column(CharNGramHashArray(GraftSqlBridge.expression(c), n))

  def wordNGramHashArray(c: Column, n: Int): Column =
    GraftSqlBridge.column(WordNGramHashArray(GraftSqlBridge.expression(c), n))

  def winnowMinArray(c: Column, w: Int): Column =
    GraftSqlBridge.column(WinnowMinArray(GraftSqlBridge.expression(c), w))
}
