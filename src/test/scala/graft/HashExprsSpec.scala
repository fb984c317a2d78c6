package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.HashExprs

/** The native codegen expressions must be BIT-IDENTICAL to the interpreted
  * built-in spellings they replace — that equality is what keeps the
  * DuckDB oracles valid (the oracles replay the built-in spelling). */
class HashExprsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("PolyHash == aggregate(split) fold on arbitrary ASCII strings") {
    val strs = samples(Gen.listOf(Gen.choose(32.toChar, 126.toChar)).map(_.mkString), 300) :+
      "" :+ "a" :+ "the quick brown fox"
    val df = strs.toDF("s").select(
      HashExprs.polyHash(col("s")).as("fast"),
      expr("aggregate(split(s, ''), 0L, (acc, c) -> (acc * 31 + ascii(c)) % 1000000007)").as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0L)
    assert(df.filter(col("fast") < 0 || col("fast") >= 1000000007L).count() === 0L)
  }

  test("FloatVecDot == zip_with/aggregate fold, bit-exact") {
    val vecs = samples(Gen.listOfN(16,
      Gen.choose(-1000000, 1000000).map(_ / 1000.0f)), 200).map(_.toArray)
    val df = vecs.zip(vecs.reverse).toDF("a", "b").select(
      HashExprs.vecDot(col("a"), col("b")).as("fast"),
      expr("aggregate(zip_with(a, b, (x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, x) -> acc + x)").as("slow"))
    // bit-exact: compare as raw doubles, no tolerance
    assert(df.filter(col("fast") =!= col("slow")).count() === 0L)
  }

  test("PlaneDot == explicit integer-coefficient spelling, bit-exact") {
    val vecs = samples(Gen.listOfN(64,
      Gen.choose(-1000000, 1000000).map(_ / 1000.0f)), 100).map(_.toArray)
    val (a, b) = (2654435761L % 1000000007L, 97531L)
    val df = vecs.toDF("v").select(
      HashExprs.planeDot(col("v"), a, b).as("fast"),
      expr(s"aggregate(zip_with(v, sequence(1, size(v)), (x, i) -> cast(x as double) * " +
        s"cast(($a * cast(i as long) + $b) % 1000000007 - 500000003 as double)), 0D, (acc, x) -> acc + x)").as("slow"))
    assert(df.filter(col("fast") =!= col("slow")).count() === 0L)
  }

  test("FloatVecDot fails loudly on mismatched dimensions") {
    val df = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
      .select(HashExprs.vecDot(col("a"), col("b")).as("d"))
    val e = intercept[Exception] { df.collect() }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("dimensions differ")),
      s"expected a dimension error, got: ${msgs(e)}")
  }

  test("SQL surface: graft functions register and evaluate (96354 = poly('abc'))") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    assert(spark.sql("SELECT graft_poly_hash('abc') AS h").head().getLong(0) === 96354L)
    assert(spark.sql(
      "SELECT graft_vec_dot(array(1.0F, 2.0F), array(3.0F, 4.0F)) AS d").head().getDouble(0) === 11.0)
    val q = spark.sql(
      "SELECT graft_text_quality('the quick brown fox!') AS q").head().getStruct(0)
    assert((q.getLong(0), q.getLong(1), q.getLong(2)) === ((4L, 1L, 1L)))
  }

  test("TextQualityStats == the HOF/regexp spellings it replaces, on adversarial strings") {
    val word = Gen.oneOf("the", "a", "of", "and", "to", "in", "The", "AND",
      "fox", "thé", "42", "a,b", "", "...", "¡é!", "x")
    val gen = for {
      ws <- Gen.listOf(word)
      sep <- Gen.oneOf(" ", "  ", " \t")
    } yield ws.mkString(sep)
    val strs = samples(gen, 250) ++ Seq("", " ", "  ", "a  b ", " the ",
      "the the the", "Thé Quick BROWN fox!! 99 of,and to", "\ta\tb", "🙂 𝒳 of")
    val df = strs.toDF("s").select(
      HashExprs.textQuality(col("s")).as("q"),
      expr("size(split(lower(s), ' '))").cast("long").as("nt"),
      expr("size(filter(split(lower(s), ' '), t -> t = 'the' or t = 'a' or " +
        "t = 'of' or t = 'and' or t = 'to' or t = 'in'))").cast("long").as("sh"),
      expr("size(regexp_extract_all(lower(s), '[^a-z0-9 ]', 0))").cast("long").as("sy"),
      expr("size(regexp_extract_all(s, '[a-z]+|[0-9]|[^a-z0-9 ]', 0))").cast("long").as("st"))
    val bad = df.filter(col("q.n_tokens") =!= col("nt") ||
      col("q.stop_hits") =!= col("sh") || col("q.n_symbols") =!= col("sy") ||
      col("q.n_subtokens") =!= col("st"))
    assert(bad.count() === 0L, s"kernel drift:\n${bad.take(5).mkString("\n")}")
    // non-foldable input (a local Seq constant-folds to LocalTableScan)
    val plan = spark.range(10)
      .select(HashExprs.textQuality(concat_ws(" ", lit("the"), col("id").cast("string"))).as("q"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"TextQualityStats fell out of codegen:\n$plan")
  }

  test("BloomMightContainLong: interpreted == codegen'd, nulls propagate, SQL registers") {
    import org.apache.spark.util.sketch.BloomFilter
    val bf = BloomFilter.create(100, 0.01)
    (1L to 50L).foreach(bf.putLong)
    val bos = new java.io.ByteArrayOutputStream(); bf.writeTo(bos)
    val bytes = bos.toByteArray
    val keys = ((1L to 50L) ++ (1000L to 1050L)).map(java.lang.Long.valueOf) :+
      null.asInstanceOf[java.lang.Long]
    val df = keys.toDF("k")
      .select(col("k"), HashExprs.bloomMightContain(lit(bytes), col("k")).as("might"))
    val rows = df.collect().map(r =>
      (Option(r.get(0)).map(_.asInstanceOf[Long]), if (r.isNullAt(1)) None else Some(r.getBoolean(1))))
    // no false negatives; NULL key -> NULL result (a Filter drops it)
    rows.foreach {
      case (Some(k), m) if k <= 50L => assert(m === Some(true), s"false negative on $k")
      case (None, m) => assert(m === None, "null key must yield null, not false/true")
      case _ => ()
    }
    // pruning bites on the non-member range (fpp 1%)
    val falsePos = rows.count { case (Some(k), Some(true)) => k >= 1000L; case _ => false }
    assert(falsePos < 10, s"$falsePos false positives out of 51 non-members")
    // the same eval through the SQL registry (binary literal via unhex)
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val hex = bytes.map("%02X".format(_)).mkString
    assert(spark.sql(
      s"SELECT graft_bloom_might_contain(X'$hex', 7L) AS m").head().getBoolean(0))
    assert(!spark.sql(
      s"SELECT graft_bloom_might_contain(X'$hex', 123456789L) AS m").head().getBoolean(0))
    // a NON-foldable sketch is rejected at analysis, not silently re-read per row
    val err = intercept[Exception] {
      keys.toDF("k").select(
        HashExprs.bloomMightContain(expr("CAST(CONCAT('x', k) AS BINARY)"), col("k"))).collect()
    }
    assert(err.getMessage.toLowerCase.contains("foldable"), err.getMessage)
  }

  test("CodebookBestCell == the max(struct(cos, -cid)) derivation, and stays codegen'd") {
    val dim = 16
    val cb = samples(Gen.listOfN(dim,
      Gen.choose(-1000000, 1000000).map(_ / 1000.0f)), 32).map(_.toArray).toArray
    val cids = cb.indices.map(_.toLong * 3 + 5).toArray // non-contiguous ids
    val cnorms = cb.map(c => math.sqrt(c.map(x => x.toDouble * x.toDouble).sum))
    val vecs = samples(Gen.listOfN(dim,
      Gen.choose(-1000000, 1000000).map(_ / 1000.0f)), 300).map(_.toArray)
    val base = vecs.toDF("v").select(col("v"),
      HashExprs.vecDot(col("v"), col("v")).as("sq"))
      .select(col("v"), sqrt(col("sq")).as("nrm"))
    val fast = base.select(
      HashExprs.bestCell(col("v"), col("nrm"), cb, cnorms, cids).as("cell"))
    // slow path: explicit per-centroid cosine columns + greatest-struct
    val slow = base.select(org.apache.spark.sql.functions.greatest(cb.indices.map { k =>
      struct((HashExprs.vecDot(col("v"), lit(cb(k))) / (col("nrm") * lit(cnorms(k)))).as("cos"),
        lit(-cids(k)).as("ncid"))
    }: _*).getField("ncid").as("ncell"))
    val both = fast.withColumn("rid", monotonically_increasing_id())
      .join(slow.withColumn("rid", monotonically_increasing_id()), "rid")
    assert(both.filter(col("cell") =!= -col("ncell")).count() === 0L)
    // the local relation above constant-folds (which exercises the
    // interpreted nullSafeEval path); a repartition forces a real
    // Project for the codegen assertion
    val shuffled = base.repartition(2).select(
      HashExprs.bestCell(col("v"), col("nrm"), cb, cnorms, cids).as("cell"))
    shuffled.collect() // finalize the AQE plan so codegen stars materialize
    val plan = shuffled.queryExecution.executedPlan.toString
    assert(plan.contains(") Project") && plan.contains("*("),
      s"CodebookBestCell fell out of codegen:\n$plan")
  }

  test("CodebookTopCells rank 1 == bestCell; rank 2 == the row_number rn=2 derivation") {
    val dim = 8
    val cb = samples(Gen.listOfN(dim,
      Gen.choose(-1000000, 1000000).map(_ / 1000.0f)), 16).map(_.toArray).toArray
    val cids = cb.indices.map(_.toLong * 2 + 1).toArray
    val cnorms = cb.map(c => math.sqrt(c.map(x => x.toDouble * x.toDouble).sum))
    val vecs = samples(Gen.listOfN(dim,
      Gen.choose(-1000000, 1000000).map(_ / 1000.0f)), 200).map(_.toArray)
    val base = vecs.toDF("v").select(col("v"),
      HashExprs.vecDot(col("v"), col("v")).as("sq"))
      .select(col("v"), sqrt(col("sq")).as("nrm"))
    val fast = base.select(
      HashExprs.topCells(col("v"), col("nrm"), cb, cnorms, cids).as("cs"),
      HashExprs.bestCell(col("v"), col("nrm"), cb, cnorms, cids).as("best"))
    // rank 1 must equal the single-probe kernel on every row
    assert(fast.filter(element_at(col("cs"), 1) =!= col("best")).count() === 0L)
    // rank 2 via the greatest-struct derivation EXCLUDING the rank-1 cell:
    // among the remaining centroids, the max (cos DESC, cid ASC) is rn=2
    val withBest = base.select(col("v"), col("nrm"),
      HashExprs.topCells(col("v"), col("nrm"), cb, cnorms, cids).as("cs"))
    val slow2 = withBest.select(col("cs"),
      org.apache.spark.sql.functions.greatest(cb.indices.map { k =>
        struct(
          when(lit(cids(k)) === element_at(col("cs"), 1), lit(Double.NegativeInfinity))
            .otherwise(HashExprs.vecDot(col("v"), lit(cb(k))) / (col("nrm") * lit(cnorms(k))))
            .as("cos"),
          lit(-cids(k)).as("ncid"))
      }: _*).getField("ncid").as("ncell2"))
    assert(slow2.filter(element_at(col("cs"), 2) =!= -col("ncell2")).count() === 0L)
    // ties at the top: identical centroids must land rank 1 = smaller cid,
    // rank 2 = the duplicate's cid (row_number order)
    val dupCb = Array(cb(0), cb(0), cb(1))
    val dupIds = Array(10L, 20L, 30L)
    val dupNorms = Array(cnorms(0), cnorms(0), cnorms(1))
    val tied = base.limit(50).select(
      HashExprs.topCells(col("v"), col("nrm"), dupCb, dupNorms, dupIds).as("cs"))
    assert(tied.filter(element_at(col("cs"), 1) === 10L &&
      element_at(col("cs"), 2) =!= 20L).count() === 0L,
      "tied top cosine must yield [smaller cid, duplicate cid]")
  }

  test("expressions stay inside whole-stage codegen") {
    // codegen'd spans print with the "*(stageId)" prefix; an interpreted
    // fallback would print a bare "Project"
    val plan = spark.range(10).select(HashExprs.polyHash(col("id").cast("string")).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"PolyHash fell out of codegen:\n$plan")
  }
}
