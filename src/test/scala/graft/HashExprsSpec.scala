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
  }

  test("expressions stay inside whole-stage codegen") {
    // codegen'd spans print with the "*(stageId)" prefix; an interpreted
    // fallback would print a bare "Project"
    val plan = spark.range(10).select(HashExprs.polyHash(col("id").cast("string")).as("h"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"PolyHash fell out of codegen:\n$plan")
  }
}
