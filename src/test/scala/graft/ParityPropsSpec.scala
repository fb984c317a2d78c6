package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.CloudEventFns
import graft.operators.CtsParity

/** Property-based checks (SURVEY §5.3): ScalaCheck generators produce
  * adversarial fixtures, evaluated in one Spark pass per property (one DF
  * of samples, assert over all rows — not one Spark job per sample). */
class ParityPropsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  private val segGen: Gen[Option[String]] = Gen.oneOf(
    Gen.const(None),
    Gen.const(Some("")),
    Gen.const(Some("...")),
    Gen.alphaNumStr.map(s => Some(s.take(12))),
    Gen.listOfN(6, Gen.oneOf(Gen.alphaNumChar, Gen.const('.'), Gen.const(' ')))
      .map(cs => Some(cs.mkString)))

  test("property: event type is lowercase and never ends in a dot") {
    val rows = samples(for {
      a <- segGen; b <- segGen; c <- segGen; d <- segGen
    } yield (a, b, c, d), 300)
    val out = rows.toDF("a", "b", "c", "d")
      .select(CloudEventFns.eventType(col("a"), col("b"), col("c"), col("d")).as("t"))
      .as[String].collect()
    assert(out.length === 300)
    assert(out.forall(t => !t.endsWith(".")), "found type ending in '.'")
    assert(out.forall(t => t === t.toLowerCase), "found non-lowercased type")
  }

  test("property: subject is the name iff non-blank, else the id") {
    val rows = samples(for {
      n <- Gen.oneOf(Gen.const(None), Gen.const(Some("")), Gen.const(Some("  ")),
        Gen.alphaNumStr.map(s => Some(s.take(8))))
      i <- Gen.alphaNumStr.map(_.take(8))
    } yield (n, i), 200)
    val out = rows.toDF("n", "i")
      .select(col("n"), col("i"),
        CloudEventFns.subject(col("n"), col("i")).as("s"))
      .as[(Option[String], String, String)].collect()
    out.foreach { case (n, i, s) =>
      val expected = n.filter(_.trim.nonEmpty).getOrElse(i)
      assert(s === expected, s"subject($n, $i)")
    }
  }

  test("property: dedup output is key-unique and idempotent") {
    val ids = samples(Gen.chooseNum(0L, 50L), 400)
    val df = ids.map(i => (i, s"payload-$i")).toDF("event_id", "v")
    val dedup = df.dropDuplicates("event_id")
    assert(dedup.count() === ids.distinct.length.toLong)
    assert(dedup.dropDuplicates("event_id").count() === dedup.count())
    assert(dedup.groupBy("event_id").count().filter(col("count") > 1).count() === 0L)
  }

  test("property: graph nodes lose no ACTION and edges reference only existing nodes") {
    val ce = CtsParity.toCloudEvents(CtsParity.eventsAsTraces(
      Tables.events(spark, TestSpark.sfDir))).cache()
    val nodes = CtsParity.nodes(ce).cache()
    val edges = CtsParity.edges(ce).cache()
    // every distinct trace id becomes exactly one ACTION node
    val nIds = ce.select(col("id")).distinct().count()
    assert(nodes.filter(col("kind") === "ACTION").count() === nIds)
    // referential integrity: each edge endpoint exists as a node of its kind
    val nodeKeys = nodes.select(col("kind"), col("key"))
    val srcDangling = edges.select(col("src_kind").as("kind"), col("src_key").as("key"))
      .except(nodeKeys).count()
    val dstDangling = edges.select(col("dst_kind").as("kind"), col("dst_key").as("key"))
      .except(nodeKeys).count()
    assert(srcDangling === 0L, "dangling edge sources")
    assert(dstDangling === 0L, "dangling edge destinations")
    ce.unpersist(); nodes.unpersist(); edges.unpersist()
  }

  private def edgeDf(pairs: (String, String)*) =
    pairs.map { case (a, b) => ("E", "N", a, "N", b) }
      .toDF("rel", "src_kind", "src_key", "dst_kind", "dst_key")

  test("property: pageRank equals an independent in-memory fixed-point reference on random graphs") {
    val graphs = samples(for {
      n <- Gen.chooseNum(3, 25)
      m <- Gen.chooseNum(n, 3 * n)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1); b <- Gen.chooseNum(0, n - 1)
        if a != b
      } yield (s"n$a", s"n$b"))
    } yield es.distinct, 8)
    graphs.filter(_.nonEmpty).foreach { es =>
      val got = CtsParity.pageRank(edgeDf(es: _*), iters = 4)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // reference: same integer arithmetic, plain Scala maps
      val links = es.map { case (a, b) => (s"N|$a", s"N|$b") }
      val verts = links.flatMap(e => Seq(e._1, e._2)).distinct
      val outdeg = links.groupBy(_._1).view.mapValues(_.size.toLong).toMap
      var rank = verts.map(_ -> 1000000000L).toMap
      for (_ <- 1 to 4) {
        val in = links.groupBy(_._2).view.mapValues(
          _.map { case (s2, _) => rank(s2) / outdeg(s2) }.sum).toMap
        rank = verts.map(v => v -> (150000000L + 85L * in.getOrElse(v, 0L) / 100L)).toMap
      }
      assert(got === rank, s"pageRank mismatch on ${es.size}-edge graph")
    }
  }

  test("pageRank: 2-cycle conserves mass exactly; star concentrates on the hub") {
    // A↔B: every node's rank is a fixed point at exactly 1.0 (scaled 1e9):
    // 150e6 + (85 * 1e9) div 100 = 1e9. Integer arithmetic makes this an
    // EXACT assertion — a float implementation could only assert ±eps.
    val cyc = CtsParity.pageRank(edgeDf("a" -> "b", "b" -> "a"), iters = 5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(cyc === Map("N|a" -> 1000000000L, "N|b" -> 1000000000L))

    // 3 leaves → hub (hub dangling): leaves get no in-mass (150e6); hub
    // stabilizes at 150e6 + (85 * 3*150e6) div 100 = 532.5e6 from iter 2 on.
    val star = CtsParity.pageRank(
      edgeDf("l1" -> "hub", "l2" -> "hub", "l3" -> "hub"), iters = 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(star("N|hub") === 532500000L)
    assert(star("N|l1") === 150000000L && star("N|l2") === 150000000L &&
      star("N|l3") === 150000000L)
  }
}
