package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, JavaCode, TrueLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Shared compute kernels, called from both interpreted eval and the
  * generated Java (Scala objects emit static forwarders, so codegen can
  * invoke `graft.functions.HashKernels.polyHash(...)` directly). Each
  * kernel's arithmetic is the EXACT contract the DuckDB oracles replay
  * (LlmOps): integer poly-hash mod 1e9+7 over code points; float→double
  * per-element casts with a left-to-right double accumulation.
  */
object HashKernels {
  final val P = 1000000007L

  /** fold (acc*31 + codePoint) % P — identical to
    * `aggregate(split(s,''), 0L, (acc,c) -> (acc*31+ascii(c)) % P)` and to
    * DuckDB `list_reduce(list_prepend(0, list_transform(string_split(s,''),
    * c -> ascii(c))), ...)` for any ASCII or BMP input. */
  def polyHash(s: UTF8String): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * 31 + cp) % P
      i += Character.charCount(cp)
    }
    acc
  }

  /** Σ double(a_i) * double(b_i), left-to-right — the zip_with/aggregate
    * fold and DuckDB's list_reduce(list_prepend(0.0,...)) bit-for-bit.
    * Mismatched lengths FAIL (a dimension bug must surface as an error,
    * not a silently-truncated plausible cosine — the DuckDB twin errors on
    * the out-of-bounds index too). */
  def dotFF(a: ArrayData, b: ArrayData): Double = {
    val n = a.numElements()
    if (b.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_vec_dot: embedding dimensions differ (${n} vs ${b.numElements()})")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  /** Argmax-cosine cell id against a driver-resident codebook: returns
    * cids(k*) where k* maximizes dotFF(e, cb(k)) / (nrm · cnorms(k)).
    * Each per-centroid dot uses the EXACT dotFF accumulation (ascending
    * index, double acc), so every cosine is bit-identical to the oracle's
    * per-pair list_reduce; the strict `>` keeps the FIRST maximum, i.e.
    * the smallest cid when cids ascend — the oracle's row_number
    * (cos DESC, cid ASC) tie. A loop over a reference-object codebook
    * keeps generated-code size CONSTANT in K, where a literal
    * least(struct...) tree blows the JVM's 64 KB method limit, and avoids
    * the N×K row materialization a broadcast cross-join + argmax
    * aggregate pays (measured 21× superlinear at sf10 before this). */
  def bestCell(e: ArrayData, nrm: Double, cb: Array[Array[Float]],
               cnorms: Array[Double], cids: Array[Long]): Long = {
    val n = e.numElements()
    var best = Double.NegativeInfinity
    var bi = 0
    var k = 0
    while (k < cb.length) {
      val c = cb(k)
      if (c.length != n)
        throw new IllegalArgumentException(
          s"graft_best_cell: centroid ${cids(k)} has dim ${c.length}, embedding has $n")
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += e.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      val cos = acc / (nrm * cnorms(k))
      if (cos > best) { best = cos; bi = k }
      k += 1
    }
    cids(bi)
  }

  /** Top-2 argmax-cosine cell ids against a driver-resident codebook —
    * the nprobe=2 twin of [[bestCell]] (l_semdedup_p2): ONE pass over the
    * K centroids yields [best, second] (a second bestCell call would
    * re-pay the N×K dot products). Strict `>` at BOTH ranks replicates
    * row_number (cos DESC, cid ASC) rn = 1, 2 when centroids are iterated
    * in ascending-cid order: the FIRST maximum takes rank 1, the next
    * tied (or next-best) value takes rank 2. FAIL-LOUD on degenerate
    * input (all-NaN cosines from a zero-norm embedding never satisfy
    * either `>` and would otherwise return a fabricated cell; DuckDB
    * sorts NaN first, so silence here would be silent divergence). */
  def top2Cells(e: ArrayData, nrm: Double, cb: Array[Array[Float]],
                cnorms: Array[Double], cids: Array[Long]): ArrayData = {
    val n = e.numElements()
    var best = Double.NegativeInfinity
    var second = Double.NegativeInfinity
    var bi = -1
    var si = -1
    var k = 0
    while (k < cb.length) {
      val c = cb(k)
      if (c.length != n)
        throw new IllegalArgumentException(
          s"graft_top2_cells: centroid ${cids(k)} has dim ${c.length}, embedding has $n")
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += e.getFloat(i).toDouble * c(i).toDouble
        i += 1
      }
      val cos = acc / (nrm * cnorms(k))
      if (cos > best) { second = best; si = bi; best = cos; bi = k }
      else if (cos > second) { second = cos; si = k }
      k += 1
    }
    if (bi < 0 || si < 0)
      throw new IllegalArgumentException(
        "graft_top2_cells: fewer than 2 comparable cosines " +
          "(zero-norm embedding, or codebook smaller than 2)")
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      Array(cids(bi), cids(si)))
  }

  /** Σ double(v_i) * double((a*(i+1) + b) % P − (P−1)/2) — the integer-
    * coefficient LSH hyperplane dot (coefficients < 2^30 are exactly
    * representable, so the double product is well-defined). */
  def planeDot(v: ArrayData, a: Long, b: Long): Double = {
    val half = (P - 1) / 2
    val n = v.numElements()
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += v.getFloat(i).toDouble * ((a * (i + 1) + b) % P - half).toDouble
      i += 1
    }
    acc
  }
}

/** Polynomial string hash as a native Catalyst expression. The built-in
  * spelling (`aggregate(split(s,''), ...)`) is a higher-order function:
  * Catalyst cannot codegen the lambda, so every row walks an interpreted
  * expression tree per CHARACTER — measured ~100× slower than this kernel
  * and the dominant cost of the whole LLM suite. This expression stays
  * inside whole-stage codegen (a single static call per row). */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_poly_hash"
  override protected def nullSafeEval(input: Any): Any =
    HashKernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** Dot product of two float vectors with double accumulation — replaces the
  * interpreted `aggregate(zip_with(...))` fold in the cosine operators. */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {
  private def isFloatArray(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def checkInputDataTypes(): TypeCheckResult =
    if (isFloatArray(left.dataType) && isFloatArray(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs ARRAY<FLOAT> inputs, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_vec_dot"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashKernels.dotFF(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.HashKernels.dotFF($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

/** Codebook argmax-cosine assignment (see HashKernels.bestCell): left =
  * embedding ARRAY<FLOAT>, right = its precomputed norm DOUBLE; the
  * codebook rides the expression as driver-resident reference objects
  * (kilobytes at SEM_MAX_K), so generated code is one static call whose
  * size is constant in K. */
case class CodebookBestCell(left: Expression, right: Expression,
    codebook: Array[Array[Float]], cnorms: Array[Double], cids: Array[Long])
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (ARRAY<FLOAT>, DOUBLE), got $l / $r")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_best_cell"
  override protected def nullSafeEval(e: Any, nrm: Any): Any =
    HashKernels.bestCell(e.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
      codebook, cnorms, cids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("graftCodebook", codebook, "float[][]")
    val cn = ctx.addReferenceObj("graftCnorms", cnorms, "double[]")
    val ci = ctx.addReferenceObj("graftCids", cids, "long[]")
    defineCodeGen(ctx, ev,
      (e, n) => s"graft.functions.HashKernels.bestCell($e, $n, $cb, $cn, $ci)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CodebookBestCell =
    copy(left = newLeft, right = newRight)
}

/** Top-2 codebook assignment (see HashKernels.top2Cells): same shape as
  * [[CodebookBestCell]] but returns ARRAY<LONG> [best, second] from one
  * pass — the nprobe=2 cell probing of l_semdedup_p2. */
case class CodebookTopCells(left: Expression, right: Expression,
    codebook: Array[Array[Float]], cnorms: Array[Double], cids: Array[Long])
  extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(FloatType, _), DoubleType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs (ARRAY<FLOAT>, DOUBLE), got $l / $r")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_top2_cells"
  override protected def nullSafeEval(e: Any, nrm: Any): Any =
    HashKernels.top2Cells(e.asInstanceOf[ArrayData], nrm.asInstanceOf[Double],
      codebook, cnorms, cids)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("graftCodebook", codebook, "float[][]")
    val cn = ctx.addReferenceObj("graftCnorms", cnorms, "double[]")
    val ci = ctx.addReferenceObj("graftCids", cids, "long[]")
    defineCodeGen(ctx, ev,
      (e, n) => s"graft.functions.HashKernels.top2Cells($e, $n, $cb, $cn, $ci)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): CodebookTopCells =
    copy(left = newLeft, right = newRight)
}

/** LSH hyperplane projection: dot of a float vector with the deterministic
  * integer-coefficient plane (a, b) — see LlmOps.l_ann_lsh. */
case class PlaneDot(child: Expression, a: Long, b: Long) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName needs ARRAY<FLOAT>, got $t")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_plane_dot"
  override protected def nullSafeEval(v: Any): Any =
    HashKernels.planeDot(v.asInstanceOf[ArrayData], a, b)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HashKernels.planeDot($c, ${a}L, ${b}L)")
  override protected def withNewChildInternal(newChild: Expression): PlaneDot =
    copy(child = newChild)
}

/** One-pass text-quality kernel backing [[TextQualityStats]]. Replicates
  * EXACTLY, in one walk over the lowercased string:
  *  - n_tokens  = size(split(lower(s), ' '))        — Java regex split with
  *    limit -1 keeps leading/interior/trailing empty segments, so the
  *    count is #spaces + 1 on ANY input (incl. empty);
  *  - stop_hits = size(filter(tokens, t ∈ STOPWORDS)) — region compare,
  *    no substring allocation (stopwords are ≤ 3 chars);
  *  - n_symbols = size(regexp_extract_all(lower(s), '[^a-z0-9 ]', 0)) —
  *    one count per code point outside [a-z0-9 ];
  *  - n_subtokens = size(regexp_extract_all(s, '[a-z]+|[0-9]|[^a-z0-9 ]', 0))
  *    over the RAW string (case matters: an uppercase letter is a symbol
  *    match, not part of a run) — leftmost-first alternation means each
  *    position starts a maximal lowercase run, a single digit, or a
  *    single non-[a-z0-9 ] code point; spaces match nothing. Java regex
  *    and DuckDB's RE2 agree on this pattern (both take the first
  *    matching alternative; greedy [a-z]+ is maximal in both), so the
  *    structural count below replicates either engine exactly.
  * The HOF spelling walks an interpreted expression tree per TOKEN and
  * the regexps materialize every match to count them — this kernel is the
  * same values at scan speed (the quality gate is the shape that runs on
  * every ingested document at 100 TB). Equality with the built-in
  * spellings is property-tested in HashExprsSpec. */
object TextKernels {
  /** Must mirror LlmOps.STOPWORDS (the oracle SQL interpolates the same
    * list); equality is pinned by LlmOpsSpec + the l_quality_filter row. */
  private val STOP = Array("the", "a", "of", "and", "to", "in")

  private def isStop(s: String, off: Int, len: Int): Boolean = {
    var k = 0
    while (k < STOP.length) {
      if (STOP(k).length == len && s.regionMatches(off, STOP(k), 0, len))
        return true
      k += 1
    }
    false
  }

  def qualityCounts(s: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val str = s.toLowerCase.toString
    val n = str.length
    var nTok = 1L; var stop = 0L; var sym = 0L
    var tokStart = 0
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        val len = i - tokStart
        if (len >= 1 && len <= 3 && isStop(str, tokStart, len)) stop += 1
        if (i < n) nTok += 1
        tokStart = i + 1
        i += 1
      } else {
        val cp = str.codePointAt(i)
        if (!((cp >= 'a' && cp <= 'z') || (cp >= '0' && cp <= '9'))) sym += 1
        i += Character.charCount(cp)
      }
    }
    // subtokens walk the RAW string (case-sensitive): a maximal [a-z]+
    // run counts once; every other non-space code point counts once
    val raw = s.toString
    val rn = raw.length
    var sub = 0L; var inRun = false
    var j = 0
    while (j < rn) {
      val c = raw.charAt(j)
      if (c >= 'a' && c <= 'z') {
        if (!inRun) { sub += 1; inRun = true }
        j += 1
      } else {
        inRun = false
        if (c == ' ') j += 1
        else { sub += 1; j += Character.charCount(raw.codePointAt(j)) }
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, stop, sym, sub))
  }
}

/** (n_tokens, stop_hits, n_symbols) of a document in ONE codegen'd pass —
  * see [[TextKernels.qualityCounts]] for the exact built-in spelling each
  * field replicates. */
case class TextQualityStats(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName needs STRING, got ${child.dataType}")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("stop_hits", LongType, nullable = false),
    StructField("n_symbols", LongType, nullable = false),
    StructField("n_subtokens", LongType, nullable = false)))
  override def prettyName: String = "graft_text_quality"
  override protected def nullSafeEval(input: Any): Any =
    TextKernels.qualityCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.qualityCounts($c)")
  override protected def withNewChildInternal(newChild: Expression): TextQualityStats =
    copy(child = newChild)
}

/** Bloom-filter membership probe over a long key, codegen'd. The sketch
  * arrives as a FOLDABLE binary child (the serialized filter), is
  * deserialized ONCE per plan/task — never per row — and the generated
  * code is a single virtual call on the deserialized filter, so the probe
  * stays inside whole-stage codegen (a boxed `udf` here breaks codegen
  * for the whole stage and boxes every key on what is by construction the
  * 100 TB fact-scan hot path). Same design as Spark's own runtime-filter
  * `BloomFilterMightContain`: the bytes ride the plan, and the scheduler
  * broadcasts task binaries per stage, so the sketch ships to each
  * executor once per stage — an explicit `Broadcast` would buy nothing.
  *
  * NULL key → NULL (dropped by a Filter, matching "prune unknown keys");
  * NULL sketch → NULL for every row. */
case class BloomMightContainLong(sketch: Expression, key: Expression)
    extends BinaryExpression {
  override def left: Expression = sketch
  override def right: Expression = key
  override def checkInputDataTypes(): TypeCheckResult =
    if (!sketch.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs a constant (foldable) BINARY sketch")
    else (sketch.dataType, key.dataType) match {
      case (BinaryType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (s, k) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs (BINARY, BIGINT) inputs, got ($s, $k)")
    }
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  @transient private lazy val filter: BloomFilter = {
    val bytes = sketch.eval().asInstanceOf[Array[Byte]]
    if (bytes == null) null
    else BloomFilter.readFrom(new java.io.ByteArrayInputStream(bytes))
  }

  override protected def nullSafeEval(sketchBytes: Any, k: Any): Any =
    filter.mightContainLong(k.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (filter == null) {
      ev.copy(isNull = TrueLiteral, value = JavaCode.defaultLiteral(dataType))
    } else {
      val bf = ctx.addReferenceObj("graftBloomFilter", filter,
        classOf[BloomFilter].getName)
      val keyEv = key.genCode(ctx)
      ev.copy(code = code"""
        ${keyEv.code}
        boolean ${ev.isNull} = ${keyEv.isNull};
        boolean ${ev.value} = false;
        if (!${ev.isNull}) {
          ${ev.value} = $bf.mightContainLong(${keyEv.value});
        }""")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomMightContainLong =
    copy(sketch = newLeft, key = newRight)
}

object HashExprs {
  private def expr(c: Column) = GraftSqlBridge.expression(c)

  def polyHash(c: Column): Column = GraftSqlBridge.column(PolyHash(expr(c)))
  def vecDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(FloatVecDot(expr(a), expr(b)))
  def planeDot(v: Column, a: Long, b: Long): Column =
    GraftSqlBridge.column(PlaneDot(expr(v), a, b))
  def bestCell(emb: Column, nrm: Column, cb: Array[Array[Float]],
               cnorms: Array[Double], cids: Array[Long]): Column =
    GraftSqlBridge.column(CodebookBestCell(expr(emb), expr(nrm), cb, cnorms, cids))
  def topCells(emb: Column, nrm: Column, cb: Array[Array[Float]],
               cnorms: Array[Double], cids: Array[Long]): Column =
    GraftSqlBridge.column(CodebookTopCells(expr(emb), expr(nrm), cb, cnorms, cids))
  def bloomMightContain(sketch: Column, key: Column): Column =
    GraftSqlBridge.column(BloomMightContainLong(expr(sketch), expr(key)))
  def textQuality(c: Column): Column =
    GraftSqlBridge.column(TextQualityStats(expr(c)))
}
