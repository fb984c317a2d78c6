package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Generators

/** Word-n-gram kernels: the scalar array expression (codegen hot path) and
  * the Generator/UDTF (SQL LATERAL VIEW surface) must agree with each
  * other and with the built-in higher-order-function spelling. */
class GeneratorsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val wordGen = Gen.listOf(
    Gen.oneOf(Gen.alphaLowerStr.map(_.take(6)), Gen.const(""))).map(_.mkString(" "))

  test("WordNGramArray == transform/sequence built-in spelling (incl. empty words)") {
    val strs = samples(wordGen, 300) :+ "" :+ "a b" :+ "a b c" :+ " a  b " :+ "x y z w"
    val df = strs.toDF("s").select(
      Generators.wordNGramArray(col("s"), 3).as("fast"),
      when(size(split(col("s"), " ")) >= 3,
        transform(sequence(lit(0), size(split(col("s"), " ")) - 3),
          i => concat_ws(" ",
            element_at(split(col("s"), " "), i + 1),
            element_at(split(col("s"), " "), i + 2),
            element_at(split(col("s"), " "), i + 3))))
        .otherwise(array().cast("array<string>")).as("slow"))
    assert(df.filter(not(col("fast") <=> col("slow"))).count() === 0L)
  }

  test("WordNGramHashArray == polyHash of every WordNGramArray shingle") {
    val strs = samples(wordGen, 300) :+ "" :+ "a b" :+ "a b c" :+ " a  b " :+ "x y z w"
    val df = strs.toDF("s").select(
      Generators.wordNGramHashArray(col("s"), 3).as("fast"),
      transform(Generators.wordNGramArray(col("s"), 3),
        g => graft.functions.HashExprs.polyHash(g)).as("slow"))
    assert(df.filter(not(col("fast") <=> col("slow"))).count() === 0L)
  }

  test("CharNGramHashArray == polyHash of the substr windows (incl. unicode)") {
    val strs = samples(wordGen, 300) :+ "" :+ "ab" :+ "abc" :+ "ñçü日本語テスト" :+ " a b "
    val df = strs.toDF("s").select(
      Generators.charNGramHashArray(col("s"), 3).as("fast"),
      when(length(col("s")) >= 3,
        transform(sequence(lit(1), length(col("s")) - 2),
          i => graft.functions.HashExprs.polyHash(col("s").substr(i, lit(3)))))
        .otherwise(array().cast("array<bigint>")).as("slow"))
    assert(df.filter(not(col("fast") <=> col("slow"))).count() === 0L)
  }

  test("WinnowMinArray == transform/slice/array_min/array_distinct HOF spelling") {
    val w = 4
    // random positional hash arrays, including duplicates and short inputs
    val arrGen = Gen.listOf(Gen.choose(0L, 50L))
    val arrs = samples(arrGen, 300) ++ Seq(Nil, List(7L), List(3L, 3L, 3L, 3L, 3L))
    val df = arrs.map(a => Tuple1(a)).toDF("hs").select(
      graft.functions.Generators.winnowMinArray(col("hs"), w).as("fast"),
      when(size(col("hs")) >= w,
        array_distinct(transform(sequence(lit(0), size(col("hs")) - w),
          i => array_min(slice(col("hs"), i + 1, lit(w))))))
        .otherwise(array().cast("array<bigint>")).as("slow"))
    assert(df.filter(not(col("fast") <=> col("slow"))).count() === 0L)
  }

  test("UDTF graft_shingles (LATERAL VIEW) == explode(WordNGramArray)") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    val docs = Tables.documents(spark, TestSpark.sfDir).limit(100).cache()
    docs.createOrReplaceTempView("gen_docs")
    val viaUdtf = spark.sql(
      """SELECT doc_id, shingle FROM gen_docs
        |LATERAL VIEW graft_shingles(lower(text), 3) t AS shingle""".stripMargin)
      .groupBy("doc_id", "shingle").count()
    val viaArray = docs.select(col("doc_id"),
      explode(Generators.wordNGramArray(lower(col("text")), 3)).as("shingle"))
      .groupBy("doc_id", "shingle").count()
    assert(viaUdtf.exceptAll(viaArray).count() === 0L)
    assert(viaArray.exceptAll(viaUdtf).count() === 0L)
    docs.unpersist()
  }

  test("null and short inputs generate zero rows, not errors") {
    val df = Seq(Some("one two"), Some(""), None, Some("a b c"))
      .toDF("s")
    val exploded = df.select(explode(Generators.wordNGramArray(col("s"), 3)).as("g"))
    assert(exploded.collect().map(_.getString(0)).toSeq === Seq("a b c"))
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    df.createOrReplaceTempView("gen_null_docs")
    val viaUdtf = spark.sql(
      "SELECT shingle FROM gen_null_docs LATERAL VIEW graft_shingles(s, 3) t AS shingle")
    assert(viaUdtf.collect().map(_.getString(0)).toSeq === Seq("a b c"))
  }

  test("explode(WordNGramArray) keeps Generate inside whole-stage codegen") {
    val plan = spark.range(10)
      .select(explode(Generators.wordNGramArray(
        concat_ws(" ", lit("a"), col("id").cast("string"), lit("b"), lit("c")), 3)).as("g"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Generate explode"), s"missing Generate:\n$plan")
    assert("\\*\\(\\d+\\) Generate".r.findFirstIn(plan).isDefined,
      s"Generate fell out of whole-stage codegen:\n$plan")
  }

  test("SQL literal width: non-literal or non-integral n is rejected") {
    org.apache.spark.sql.GraftSqlBridge.registerFunctions(spark)
    spark.range(3).selectExpr("cast(id as string) AS s", "cast(id as int) AS k")
      .createOrReplaceTempView("gen_width_docs")
    intercept[Exception] {
      spark.sql("SELECT graft_ngram_array(s, k) FROM gen_width_docs").collect()
    }
  }
}
