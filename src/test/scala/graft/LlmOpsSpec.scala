package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioural checks of the LLM-pipeline suite on the sf0.001 corpus
  * (500 docs, 25 planted near-dup pairs). The DuckDB oracle covers
  * hash-equality; these assert the *semantics* (LSH recall, dedup shape,
  * ranking monotonicity) that a hash-match alone wouldn't explain. */
class LlmOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val d = TestSpark.sfDir

  private def run(name: String) = LlmOps.queries(name)(spark, d)

  test("minhash-LSH finds exactly the exact-Jaccard near-dup pairs (no false results)") {
    val lsh = run("l_minhash_lsh").select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("l_ngram_jaccard").select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(exact), "LSH produced a pair below the Jaccard threshold")
    assert(exact.subsetOf(lsh), s"LSH missed ${(exact -- lsh).size} true near-dup pairs")
    assert(exact.nonEmpty, "corpus should contain planted near-dups")
  }

  test("near-dup pairs are ordered, above threshold, with consistent set sizes") {
    run("l_ngram_jaccard").collect().foreach { r =>
      val (d1, d2, shared, n1, n2, j) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(d1 < d2)
      assert(j >= 0.5 && j <= 1.0)
      assert(shared <= math.min(n1, n2))
      assert(j === shared.toDouble / (n1 + n2 - shared))
    }
  }

  test("html extraction strips boilerplate blocks and decodes entities") {
    import spark.implicits._
    // adversarial text: raw & < > must survive the escape→decode round
    // trip, and internal whitespace must normalize to single spaces
    val rows = Seq(
      (0L, "alpha & beta <tag> done"),
      (7L, "  spaced   out\ttext "),
      (12L, "plain words"))
      .toDF("doc_id", "text")
    val got = LlmOps.htmlExtractProjection(rows).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3)))
      .toMap
    val tagline = "Read more & subscribe <now>"
    assert(got(0L) === (("Doc 0", 1L, s"alpha & beta <tag> done $tagline")))
    assert(got(7L) === (("Doc 7", 4L, s"spaced out text $tagline")))
    assert(got(12L) === (("Doc 12", 1L, s"plain words $tagline")))
    // nothing from the removed blocks leaks into the main text: the
    // script body's "<ad>" literal, style rules, nav/aside/footer words
    val html = LlmOps.docHtml(rows).select("html").collect().map(_.getString(0))
    assert(html.exists(_.contains("<ad>")), "fixture must plant the script-body tag")
    got.values.foreach { case (_, _, main) =>
      Seq("<ad>", "margin", "sec", "sponsored", "example", "track(").foreach(w =>
        assert(!main.contains(w), s"boilerplate '$w' leaked into: $main"))
    }
  }

  test("property: html construct+extract round-trips random adversarial texts") {
    import spark.implicits._
    // alphabet deliberately includes the escape metacharacters and the
    // entity fragments (lt/gt/amp/;) so random draws form strings like
    // "&lt;" or "a&amp;b" — the escape→decode pair must round-trip them
    // exactly (decode order &amp;-last is what this falsifies)
    val rnd = new scala.util.Random(2020L)
    val alphabet = "ab &<>\t\n;ltgampq".toCharArray
    val tricky = Seq("&lt;", "&amp;", "&gt;", "&amp;lt;", "a&b<c>d",
      "<script>", "</article>", "   ", "& lt;&a mp;")
    val texts = (0 until 48).map { i =>
      if (i < tricky.length) tricky(i)
      else (0 until (1 + rnd.nextInt(60)))
        .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
    }
    val rows = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val got = LlmOps.htmlExtractProjection(rows).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getString(3)))
      .toMap
    val tagline = "Read more & subscribe <now>"
    texts.zipWithIndex.foreach { case (t, i) =>
      val want = (t.replaceAll("\\s+", " ").trim + " " + tagline).trim
      val (title, links, main) = got(i.toLong)
      assert(main === want,
        s"roundtrip failed for codepoints ${t.map(_.toInt).mkString(",")}")
      assert(title === s"Doc $i" && links === i % 4 + 1)
    }
  }

  test("property: url admission across random ordered batch splits equals the batch row") {
    // any doc_id-ordered micro-batching of the feed (including empty
    // batches) must reproduce the batch row's duplicate groups through
    // the maintained index — the first-come ≡ min-id equivalence the
    // s_url_dedup oracle contract rests on
    val docsT = Tables.documents(spark, d)
    val end = docsT.agg(max(col("doc_id"))).head().getLong(0) + 1L
    val want = run("l_url_dedup").collect().map(_.toSeq).toSeq
    val rnd = new scala.util.Random(777L)
    for (trial <- 0 until 3) {
      val cuts = (Seq(0L, end) ++
        Seq.fill(1 + rnd.nextInt(3))(rnd.nextLong().abs % end))
        .distinct.sorted
      val idxDir = graft.streaming.StreamingOps.tmp(s"prop-url-idx-$trial-")
      val admDir = graft.streaming.StreamingOps.tmp(s"prop-url-adm-$trial-")
      cuts.sliding(2).zipWithIndex.foreach { case (Seq(lo, hi), b) =>
        LlmOps.urlAdmitBatch(
          docsT.filter(col("doc_id") >= lo && col("doc_id") < hi),
          b.toLong, idxDir, admDir)
      }
      val got = LlmOps.urlAdmitGroups(spark, admDir).collect().map(_.toSeq).toSeq
      assert(got === want, s"trial $trial split at ${cuts.mkString(",")}")
    }
  }

  test("ivfpq rerank: occupancy rule, defensive knob parse, persisted meta") {
    // the occupancy rule the r19 sf10 sweep measured: 2.5k/cell sits at
    // the ceiling on the 256 floor, 25k/cell derives the ~1k that
    // recovers it
    assert(LlmOps.ivfPqRerankFor(0L) === 256)
    assert(LlmOps.ivfPqRerankFor(2500L) === 256)
    assert(LlmOps.ivfPqRerankFor(25000L) === 1000)
    assert(LlmOps.ivfPqRerankFor(1000000L) === 40000)
    // knob parse: read per call (post-load changes visible), failures
    // name the knob instead of crashing class-load opaquely
    try {
      sys.props("graft.ivfpq.rerank") = "64"
      assert(LlmOps.ivfPqRerankOverride === Some(64))
      sys.props("graft.ivfpq.rerank") = "not-a-number"
      val e1 = intercept[IllegalArgumentException](LlmOps.ivfPqRerankOverride)
      assert(e1.getMessage.contains("GRAFT_IVFPQ_RERANK"))
      sys.props("graft.ivfpq.rerank") = "-3"
      val e2 = intercept[IllegalArgumentException](LlmOps.ivfPqRerankOverride)
      assert(e2.getMessage.contains("positive"))
    } finally sys.props.remove("graft.ivfpq.rerank")
    // the trained index persists its computed bound under _meta, and the
    // underscore keeps it invisible to plain index readers
    val dir = graft.streaming.StreamingOps.tmp("spec-ivfpq-")
    LlmOps.trainIvfPqIndex(spark, d, dir)
    val meta = spark.read.parquet(s"$dir/_meta").collect()
    assert(meta.length === 1)
    val occ = meta(0).getAs[Long]("max_occupancy")
    assert(meta(0).getAs[Long]("rerank") === LlmOps.ivfPqRerankFor(occ).toLong)
    val index = spark.read.parquet(dir)
    assert(!index.columns.contains("rerank"),
      "the _meta sidecar leaked into the index read")
    assert(index.count() === Tables.embeddings(spark, d).count())
    // an index trained UNDER a live override still persists the
    // occupancy-rule value: the override is a serve-time knob, and
    // baking it into _meta would diverge from the oracle's
    // override-or-occupancy fallback once the override is unset
    val dir2 = graft.streaming.StreamingOps.tmp("spec-ivfpq2-")
    try {
      sys.props("graft.ivfpq.rerank") = "64"
      LlmOps.trainIvfPqIndex(spark, d, dir2)
    } finally sys.props.remove("graft.ivfpq.rerank")
    val meta2 = spark.read.parquet(s"$dir2/_meta").head()
    assert(meta2.getAs[Long]("rerank") ===
      LlmOps.ivfPqRerankFor(meta2.getAs[Long]("max_occupancy")).toLong,
      "_meta must carry the occupancy-rule value, not a transient override")
  }

  test("exact dedup collapses every mirrored doc into a 2-copy group") {
    val groups = run("l_exact_dedup").collect()
    assert(groups.length === 500)
    assert(groups.forall(_.getLong(1) === 2L), "every group must pair original+mirror")
    // canon id is always the original (mirror ids are offset by 100000)
    assert(groups.forall(_.getLong(0) < 100000L))
  }

  test("simhash near-dups are a high-precision subset of exact near-dups") {
    val sim = run("l_simhash").select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("l_ngram_jaccard").select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(sim.nonEmpty)
    assert((sim -- exact).isEmpty, "simhash flagged a pair that is not a true near-dup")
  }

  test("cosine top-k: 3 ranked neighbors per query, scores sorted and in [-1,1]") {
    val rows = run("l_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._1).distinct.length === 5)
    rows.groupBy(_._1).foreach { case (_, g) =>
      val sorted = g.sortBy(_._2)
      assert(sorted.map(_._2).toSeq === Seq(1L, 2L, 3L))
      assert(sorted.sliding(2).forall { case Array(a, b) => a._4 >= b._4 })
    }
    assert(rows.forall(r => r._4 >= -1.0000001 && r._4 <= 1.0000001))
  }

  test("ANN-LSH never beats brute force and probes only the query's bucket") {
    val brute = run("l_cosine_topk").filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ann = run("l_ann_lsh").filter(col("rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    ann.foreach { case (q, cos) =>
      assert(cos <= brute(q) + 1e-12, s"ANN rank-1 above brute-force rank-1 for query $q")
    }
  }

  test("quality filter: keep agrees with reason and drops exist for real rules") {
    val rows = run("l_quality_filter").collect()
    assert(rows.length === Tables.documents(spark, d).count())
    rows.foreach { r =>
      assert(r.getAs[Boolean]("keep") === (r.getAs[String]("reason") == "ok"))
      assert(Set("ok", "too_short", "token_len", "symbols", "stopwords")(r.getAs[String]("reason")))
    }
    val reasons = rows.map(_.getAs[String]("reason")).toSet
    assert(reasons.contains("ok"), "filter must keep something")
    assert(reasons.size >= 2, "filter must also drop something")
  }

  test("stratified sample is deterministic and respects per-language rates") {
    val a = run("l_sample").collect().map(_.getLong(0)).toSeq
    val b = run("l_sample").collect().map(_.getLong(0)).toSeq
    assert(a === b, "content-hash sampling must be reproducible")
    val byLang = run("l_sample").groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val totals = Tables.documents(spark, d).groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // rates are 10% en / 50% zh / 25% rest; allow generous hash-binomial slack
    assert(byLang("en").toDouble / totals("en") < 0.25)
    assert(byLang("zh").toDouble / totals("zh") > 0.3)
  }

  test("repetition score is bounded and consistent with its counts") {
    run("l_repetition").collect().foreach { r =>
      val (n, u, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(u >= 1L && u <= n)
      assert(ratio >= 0.0 && ratio < 1.0)
      assert(math.abs(ratio - (1.0 - u.toDouble / n)) < 1e-15)
    }
  }

  test("text stats are internally consistent") {
    run("l_text_stats").collect().foreach { r =>
      val nTok = r.getAs[Long]("n_tokens")
      val nDis = r.getAs[Long]("n_distinct_tokens")
      val ttr = r.getAs[Double]("ttr")
      val fp = r.getAs[Long]("fingerprint")
      assert(nTok >= 1L)
      assert(nDis >= 1L && nDis <= nTok)
      assert(math.abs(ttr - nDis.toDouble / nTok) < 1e-15)
      assert(fp >= 0L && fp < 1000000007L)
      assert(r.getAs[Double]("quality") > 0.0 && r.getAs[Double]("quality") <= 1.0)
    }
  }

  test("dedup clusters: transitive closure of the near-dup pairs, one keeper each") {
    val pairs = run("l_minhash_lsh").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val clusters = run("l_dedup_clusters").collect()
      .map(r => (r.getLong(1), r.getLong(0), r.getLong(2), r.getBoolean(3))) // doc -> (cluster, n, keep)
    val label = clusters.map { case (doc, c, _, _) => doc -> c }.toMap
    // every paired doc is clustered, and both ends share a label
    pairs.foreach { case (a, b) =>
      assert(label.contains(a) && label.contains(b), s"pair ($a,$b) unclustered")
      assert(label(a) === label(b), s"pair ($a,$b) split across clusters")
    }
    // labels are canonical: cluster id is the min member, exactly one keep
    // per cluster, n_members consistent
    clusters.groupBy(_._2).foreach { case (c, members) =>
      assert(members.map(_._1).min === c, s"cluster $c not labelled by min member")
      assert(members.count(_._4) === 1, s"cluster $c keeper count != 1")
      assert(members.forall(_._3 === members.length.toLong), s"cluster $c bad n_members")
      assert(members.length >= 2, s"cluster $c is a singleton — pairs can't produce those")
    }
    // only paired docs appear
    val paired = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    assert(clusters.map(_._1).toSet === paired, "cluster membership must equal paired docs")
  }

  test("connectedComponents survives an adversarial 500-doc chain (pointer jumping)") {
    import spark.implicits._
    // one shared-prefix chain: doc i near-dups doc i+1 — diameter 499.
    // plain 1-hop min propagation needs one pass per hop and would trip
    // the 25-pass fail-loud cap; pointer jumping converges in O(log n)
    val chain = (0L until 499L).map(i => (i, i + 1)).toDF("d1", "d2")
    val labels = LlmOps.connectedComponents(chain).collect()
    assert(labels.length === 500)
    assert(labels.forall(_.getLong(1) === 0L),
      "the whole chain must collapse to the min-id label")
  }

  test("property: connectedComponents matches a local union-find on random graphs") {
    import spark.implicits._
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val gen = for {
      n <- Gen.chooseNum(2, 40)
      m <- Gen.chooseNum(1, 80)
      es <- Gen.listOfN(m, for {
        a <- Gen.chooseNum(0, n - 1)
        b <- Gen.chooseNum(0, n - 1) if a != b
      } yield (math.min(a, b).toLong, math.max(a, b).toLong))
    } yield es.distinct
    // 6 independent random graphs, vertex ids offset so one Spark CC run
    // covers them all without cross-graph merging
    val all = (0 until 6).flatMap(i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).toSeq.flatMap(
        _.map { case (a, b) => (i * 1000L + a, i * 1000L + b) }))
    val got = LlmOps.connectedComponents(all.toDF("d1", "d2")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // ground truth: path-compressed union-find, canonical label = min member
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    all.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val expect = all.flatMap { case (a, b) => Seq(a, b) }.distinct
      .groupBy(find).flatMap { case (_, vs) => val m = vs.min; vs.map(_ -> m) }
    assert(got === expect)
  }

  test("pack: bins fill sequentially per bucket, every doc placed exactly once") {
    val rows = run("l_pack").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.map(_._1).distinct.length === rows.length, "each doc placed once")
    rows.groupBy(_._2).foreach { case (bucket, docs) =>
      val ordered = docs.sortBy(_._1)
      // running total consistency: tokens_before = sum of earlier docs
      ordered.foldLeft(0L) { case (acc, (id, _, bin, n, before)) =>
        assert(before === acc, s"doc $id in bucket $bucket: bad running total")
        assert(bin === before / 256, s"doc $id: bin must be tokens_before / cap")
        acc + n
      }
      // bins are contiguous from 0 within the bucket
      val bins = ordered.map(_._3)
      assert(bins.head === 0L)
      assert(bins.sliding(2).forall(w => w.last - w.head <= math.max(1,
        (ordered.map(_._4).max / 256) + 1)), "bins advance without wild jumps")
    }
  }

  test("chunk: strided windows cover every token of every doc") {
    val chunks = run("l_chunk").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val nTokens = run("l_text_stats").collect()
      .map(r => (r.getLong(0), r.getAs[Long]("n_tokens"))).toMap
    chunks.groupBy(_._1).foreach { case (doc, cs) =>
      val ordered = cs.sortBy(_._2)
      assert(ordered.map(_._2) === (0L until ordered.length).toArray.toSeq,
        s"doc $doc chunk numbering")
      ordered.foreach { case (_, cno, start, n) =>
        assert(start === cno * 48 + 1, "stride-48 starts")
        assert(n >= 1 && n <= 64, "chunk length within window")
      }
      // last chunk reaches the final token
      val (_, _, lastStart, lastN) = ordered.last
      assert(lastStart + lastN - 1 === nTokens(doc), s"doc $doc tail covered")
    }
  }

  test("bm25: scores positive, descending, and only for docs containing a term") {
    val rows = run("l_bm25").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length === 10)
    assert(rows.map(_._3).sliding(2).forall(w => w.head >= w.last), "scores descend")
    assert(rows.forall(_._3 > 0.0), "BM25 scores of matching docs are positive")
    assert(rows.forall(r => r._2 >= 1 && r._2 <= 3), "n_terms within query size")
    // every returned doc really contains at least one query term
    val ids = rows.map(_._1)
    val hits = Tables.documents(spark, d)
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"),
        (lower(col("text")).contains("spark") ||
          lower(col("text")).contains("join") ||
          lower(col("text")).contains("stream")).as("hit"))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(ids.forall(hits(_)), "top-10 docs must contain a query term")
  }

  test("heavy hitters: sketch pass loses no truly frequent token (answer is exact)") {
    val got = run("l_heavy_hitters").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = Tables.documents(spark, d)
      .select(explode(split(lower(col("text")), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 200)
      .orderBy(col("n").desc, col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty, "corpus should have frequent vocabulary at this threshold")
    assert(got.toSeq === want.toSeq,
      "count-min candidates + exact verify must equal the direct exact answer")
  }

  test("mixture: per-language take hits the exact integer budget, never exceeding the corpus") {
    val w = Map("en" -> 40L, "de" -> 15L, "es" -> 15L, "fr" -> 15L, "zh" -> 15L)
    val n = Tables.documents(spark, d).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val t = w.keys.map(l => n(l) * 100L / w(l)).min
    val expect = w.map { case (l, wt) => l -> (t * wt / 100L) }
    val kept = run("l_mixture").groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    expect.foreach { case (l, e) =>
      assert(kept.getOrElse(l, 0L) === e, s"lang $l take mismatch")
      assert(e <= n(l), s"lang $l take exceeds corpus")
    }
  }

  test("lm score: log-probs non-positive, bigram counts consistent with token counts") {
    val rows = run("l_lm_score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    // MLE: C(w1,w2) <= C(w1) ⇒ every bigram log-prob <= 0, so is the mean
    assert(rows.forall(_._3 <= 0.0), "a bigram cannot be more likely than its prefix")
    // each doc contributes exactly (n_tokens - 1) bigrams
    val nTok = Tables.documents(spark, d)
      .select(col("doc_id"), size(split(lower(col("text")), " ")).cast("long").as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, nBg, _) =>
      assert(nBg === nTok(id) - 1, s"doc $id bigram count off")
    }
  }

  test("embedding components respect the fixed-point positivity contract") {
    // quantization adds OFF = 2^20 after floor(c*1e6); components at or
    // below -1.048576 would break the floor-vs-truncate division
    // agreement l_kmeans/l_pq rely on (see LlmOps.quantizedEmbeddings)
    val mn = Tables.embeddings(spark, d)
      .select(min(expr("array_min(embedding)")).cast("double")).collect()(0).getDouble(0)
    assert(mn > -1.048576, s"embedding component $mn violates the offset contract")
  }

  test("pq: every vector quantized in every subspace, codes in range") {
    val rows = run("l_pq").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables.embeddings(spark, d).count()
    // per-subspace cell populations partition the corpus
    rows.groupBy(_._1).foreach { case (sub, cells) =>
      assert(cells.map(_._3).sum === n, s"subspace $sub lost vectors")
    }
    assert(rows.map(_._1).distinct.sorted.toSeq === (0L until 8L))
    assert(rows.forall(r => r._2 >= 0L && r._2 < 4L), "code out of range")
    assert(rows.forall(_._4 >= 0L), "squared error cannot be negative")
  }

  test("kmeans: full coverage, deterministic rerun, and k respected") {
    val out = run("l_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val n = Tables.embeddings(spark, d).count()
    assert(out.map(_._2).sum === n, "every vector assigned to exactly one cluster")
    assert(out.length <= 8 && out.nonEmpty)
    assert(out.map(_._1).distinct.length === out.length, "cluster ids unique")
    assert(out.forall(_._3 >= 0L), "inertia non-negative")
    // integer arithmetic ⇒ bit-identical rerun (float k-means cannot claim this)
    val again = run("l_kmeans").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === again.toSeq)
  }

  test("pii scrub: every planted class detected; clean docs round-trip byte-identical") {
    val rows = run("l_pii_scrub").collect()
    assert(rows.length === 500)
    def g(r: org.apache.spark.sql.Row, i: Int) = r.getLong(i)
    rows.foreach { r =>
      val id = g(r, 0)
      if (id % 7 == 0) assert(g(r, 2) >= 1, s"doc $id: planted email missed")
      else if (id % 7 == 3) assert(g(r, 3) >= 1, s"doc $id: planted phone missed")
      else if (id % 7 == 5) assert(g(r, 4) >= 1, s"doc $id: planted IP missed")
      else assert(g(r, 2) + g(r, 3) + g(r, 4) === 0, s"doc $id: false positive")
    }
    // non-planted docs must pass through UNTOUCHED: redacted fingerprint
    // and length equal the raw text's (l_text_stats is the reference);
    // planted docs must NOT (the placeholder rewrite changed the bytes)
    val raw = run("l_text_stats").select("doc_id", "fingerprint", "n_chars_calc")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    rows.foreach { r =>
      val id = g(r, 0)
      val cleanFpLen = (g(r, 6), g(r, 5))
      if (Seq(0L, 3L, 5L).contains(id % 7))
        assert(cleanFpLen !== raw(id), s"doc $id: PII survived redaction")
      else
        assert(cleanFpLen === raw(id), s"doc $id: clean text was altered")
    }
  }

  test("pii detector: exact counts on seeded random corpora (property)") {
    import spark.implicits._
    val rnd = new scala.util.Random(911L)
    def word() = (1 to 1 + rnd.nextInt(7)).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val docsWithPii = (0 until 200).map { i =>
      val words = scala.collection.mutable.Buffer.fill(5 + rnd.nextInt(30))(word())
      val (ne, np, ni) = (rnd.nextInt(3), rnd.nextInt(3), rnd.nextInt(3))
      def insert(s: String): Unit = words.insert(rnd.nextInt(words.length + 1), s)
      (1 to ne).foreach(j => insert(s"u$j@ex$j.com"))
      (1 to np).foreach(j => insert(f"+1-${100 + rnd.nextInt(900)}%d-${rnd.nextInt(10000)}%04d"))
      (1 to ni).foreach(_ => insert(Seq.fill(4)(rnd.nextInt(256)).mkString(".")))
      // doc_id ≡ 1,2,4,6 mod 7: keeps the in-query planted fixture out of
      // the way so the expected counts are exactly the inserted ones
      val id = Seq(1L, 2L, 4L, 6L)(i % 4) + 7L * i
      (id, "en", words.mkString(" "), ne.toLong, np.toLong, ni.toLong)
    }
    val df = docsWithPii.map(t => (t._1, t._2, t._3))
      .toDF("doc_id", "lang", "text")
    val out = LlmOps.piiProjection(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    docsWithPii.foreach { case (id, _, _, ne, np, ni) =>
      assert(out(id) === ((ne, np, ni)), s"doc $id: wrong detection counts")
    }
  }

  test("pii detector: a span inside an earlier class is counted once, not twice") {
    import spark.implicits._
    // the local-part of the email is itself phone-shaped (+1-555-1234@…):
    // the email detector redacts it first, so the phone detector — which
    // runs on the ALREADY-redacted text — must not tally it again. The
    // trailing standalone phone still counts. Same for an IP-shaped
    // quad inside an email's domain-ish local part vs a standalone IP.
    val df = Seq(
      (1L, "en", "mail me at +1-555-1234@corp.io or call +1-555-9999 ok"),
      (2L, "en", "from 10.1.2.3@ex.com vs host 10.9.8.7 tonight"))
      .toDF("doc_id", "lang", "text")
    val out = LlmOps.piiProjection(df).collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(1L) === ((1L, 1L, 0L)), "phone-shaped email local part double-counted")
    assert(out(2L) === ((1L, 0L, 1L)), "ip-shaped email local part double-counted")
  }

  test("dup-ngram fraction: near-dup pair members show cross-doc duplication") {
    val rows = run("l_dup_ngrams").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    rows.values.foreach { case (n, dup, f) =>
      assert(dup >= 0 && dup <= n)
      assert(f === dup.toDouble / n)
    }
    val paired = run("l_ngram_jaccard").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(paired.nonEmpty)
    paired.foreach { id =>
      val r = rows.get(id)
      assert(r.isDefined, s"doc $id is in a near-dup pair but absent from l_dup_ngrams")
      assert(r.get._2 > 0, s"doc $id is in a near-dup pair but shows no shared 5-grams")
    }
    // the corpus at large is clean: the median unpaired doc is not duplicated
    val fracs = rows.collect { case (id, (_, _, f)) if !paired(id) => f }.toSeq.sorted
    assert(fracs(fracs.size / 2) < 0.5, "median unpaired doc should not look duplicated")
  }

  test("dup-spans: span stats are internally consistent and flag the near-dup members") {
    val rows = run("l_dup_spans").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getLong(4), r.getLong(5))).toMap
    rows.values.foreach { case (n, dup, f, spans, longest) =>
      assert(dup >= 0 && dup <= n, "covered tokens cannot exceed the doc")
      assert(f === dup.toDouble / n)
      assert((spans == 0) == (dup == 0), "spans and covered tokens must agree on emptiness")
      assert(longest <= dup, "one span cannot cover more than all spans")
      if (spans > 0) {
        assert(longest >= 5, "a duplicated 5-gram covers at least 5 tokens")
        assert(dup <= spans * longest, "sum over spans bounded by count * max")
      }
    }
    // every member of an exact near-dup pair shares >= one 5-gram run
    val paired = run("l_ngram_jaccard").collect()
      .flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(paired.nonEmpty)
    paired.foreach { id =>
      assert(rows.get(id).exists(_._4 > 0),
        s"doc $id is in a near-dup pair but l_dup_spans found no repeated span")
    }
  }

  test("dup-spans keep1: covers a subset of the aggressive set, canonical copies survive") {
    val agg = run("l_dup_spans").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val k1 = run("l_dup_spans_keep1").collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(agg.keySet == k1.keySet)
    k1.foreach { case (id, dk) =>
      assert(dk <= agg(id), s"doc $id: keep1 covers more than the aggressive cut")
    }
    assert(k1.values.sum < agg.values.sum,
      "keep1 must exempt at least the canonical occurrences")
    assert(agg.exists { case (id, v) => v > 0 && k1(id) == 0 },
      "a doc holding only canonical occurrences should be fully exempt")
  }

  test("dup-spans apply: cut equals the covered set, untouched docs pass through verbatim") {
    val stats = run("l_dup_spans").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val applied = run("l_dup_spans_apply").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val orig = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(applied.keySet == orig.keySet, "apply must emit the whole corpus")
    applied.foreach { case (id, (n, kept, text)) =>
      stats.get(id) match {
        case Some((nt, dup)) =>
          assert(n == nt && kept == n - dup,
            s"doc $id: kept $kept != n_tokens $n - covered $dup")
        case None =>
          assert(n < 5 && kept == n, s"doc $id is gramless but was cut")
      }
      if (stats.get(id).forall(_._2 == 0L))
        assert(text == orig(id).toLowerCase,
          s"doc $id has no covered span but its text changed")
      else
        assert(text.length < orig(id).length, s"doc $id was covered but not cut")
    }
    assert(applied.values.exists(_._2 == 0L),
      "fixture should contain at least one fully-duplicated doc cut to empty")
  }

  test("dup-spans keep1 apply: one copy survives, cut agrees with keep1 detect") {
    val k1stats = run("l_dup_spans_keep1").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val k1app = run("l_dup_spans_keep1_apply").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val aggApp = run("l_dup_spans_apply").collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    val orig = Tables.documents(spark, d).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(k1app.keySet == orig.keySet, "keep1 apply must emit the whole corpus")
    k1app.foreach { case (id, (n, kept, text)) =>
      k1stats.get(id) match {
        case Some((nt, dup)) =>
          assert(n == nt && kept == n - dup,
            s"doc $id: keep1 kept $kept != n_tokens $n - keep1 covered $dup")
        case None =>
          assert(n < LlmOps.DUPSPAN_K && kept == n, s"doc $id is gramless but was cut")
      }
      assert(kept >= aggApp(id),
        s"doc $id: keep1 apply kept fewer tokens than the aggressive cut")
      if (k1stats.get(id).forall(_._2 == 0L))
        assert(text == orig(id).toLowerCase,
          s"doc $id has no non-canonical span but its text changed")
    }
    // the exemption is real: some doc cut by the aggressive policy keeps
    // MORE under keep1 (its canonical copy survives)
    assert(k1app.exists { case (id, (_, kept, _)) => kept > aggApp(id) },
      "keep1 must exempt at least one canonical occurrence from the cut")
    // canonical survival, measured: with planted duplication, surviving
    // copies must exist
    val (nDup, survived) = LlmOps.dupSpanKeep1Survival(spark, d)
    assert(nDup > 0L, "fixture should contain duplicated grams")
    assert(survived > 0L, "no canonical copy survived the keep1 cut")
  }

  test("dup-spans K-sensitivity: covered@K+2 is contained in covered@K") {
    val k = LlmOps.DUPSPAN_K
    def coveredSet(kk: Int) = LlmOps.dupSpanCoveredAt(spark, d, kk).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val atK = coveredSet(k)
    val atK2 = coveredSet(k + 2)
    assert(atK.nonEmpty, "fixture should contain duplicated grams at K")
    assert(atK2.subsetOf(atK),
      s"${(atK2 -- atK).size} positions covered at K+2 escape the K cover")
    assert(atK2.size < atK.size,
      "longer grams must strictly shrink coverage on this fixture")
  }

  test("importance: target-language docs dominate a deterministic top-50") {
    val rows = run("l_importance").collect()
    assert(rows.length === 50)
    assert(rows.count(_.getString(1) == "en") >= 40,
      "importance scoring must surface the target-language slice")
    val keys = rows.map(r => (r.getLong(4), r.getLong(0)))
    assert(keys.sliding(2).forall { case Array((s1, d1), (s2, d2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2)
    }, "rows must be (score_avg desc, doc_id) ordered")
    rows.foreach { r =>
      assert(r.getLong(2) >= 1L, "n_feats must be positive")
      assert(r.getLong(3) >= r.getLong(2), "score_sum below n_feats is impossible")
    }
    // all-integer model ⇒ bit-identical rerun
    val again = run("l_importance").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("winnow: containment pairs are consistent and catch the planted near-dups") {
    val rows = run("l_winnow").collect()
    assert(rows.nonEmpty, "planted near-dups must surface as containment pairs")
    rows.foreach { r =>
      val (d1, d2, shared, n1, n2, c) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(d1 < d2)
      assert(shared <= math.min(n1, n2), "shared fingerprints exceed a set size")
      assert(c >= 0.5 && c <= 1.0)
      assert(c === shared.toDouble / math.min(n1, n2))
    }
    // J >= 0.5 over the FULL shingle sets implies heavy overlap of any
    // uniform-ish subsample: the winnowed containment pairs must overlap
    // the exact-Jaccard pair set (both detect the planted duplications)
    val win = rows.map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = run("l_ngram_jaccard").select("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(win.intersect(exact).nonEmpty,
      "winnow containment and exact Jaccard disagree on every planted pair")
  }

  test("semdedup: greedy-by-id within cells, verdicts consistent with the LSH pairs") {
    val rows = run("l_semdedup").collect()
    val n = Tables.embeddings(spark, d).count()
    assert(rows.length.toLong === n, "one verdict per vector")
    val cell = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val keep = rows.map(r => r.getLong(0) -> r.getLong(3)).toMap
    rows.foreach { r =>
      val (v, c, dupOf, k) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(k == 0L || k == 1L)
      if (k == 1L) assert(dupOf == -1L, s"kept vector $v carries a dup_of")
      else {
        assert(dupOf >= 0 && dupOf < v, "dup_of must be an earlier vector")
        assert(cell(dupOf) == c, "dup_of must sit in the same cell")
      }
    }
    // each cell's smallest id is the greedy anchor — always kept
    rows.groupBy(_.getLong(1)).foreach { case (_, rs) =>
      val anchor = rs.map(_.getLong(0)).min
      assert(keep(anchor) == 1L, s"cell anchor $anchor was dropped")
    }
    // every LSH-verified near-dup pair that shares a cell must drop the
    // later member (LSH pairs are exact-cosine-verified, so no FPs)
    run("l_embed_neardup").collect().foreach { r =>
      val (v1, v2) = (r.getLong(0), r.getLong(1))
      if (cell(v1) == cell(v2))
        assert(keep(v2) == 0L, s"same-cell near-dup $v2 of $v1 was kept")
    }
  }

  test("langid: one deterministic argmax verdict per doc over the corpus langs") {
    val rows = run("l_langid").collect()
    val langs = Tables.documents(spark, d).select("lang").distinct()
      .collect().map(_.getString(0)).toSet
    val nDocs = Tables.documents(spark, d).count()
    assert(rows.length.toLong === nDocs, "every doc gets exactly one verdict")
    assert(rows.map(_.getLong(0)).distinct.length === rows.length)
    rows.foreach { r =>
      assert(langs.contains(r.getString(1)), "lang column must round-trip")
      assert(langs.contains(r.getString(2)), "prediction outside the profile set")
      assert(r.getLong(3) > 0L, "integer profile score must be positive")
    }
    // all-integer scoring ⇒ bit-identical rerun despite the shuffled sums
    val again = run("l_langid").collect()
    assert(rows.map(_.toSeq).toSeq === again.map(_.toSeq).toSeq)
  }

  test("embed-neardup: the bits→tables dial holds recall at cosine 0.9 and stays bounded") {
    // the coupling the r9/r11 advice asked for: as bits grows, L follows.
    // Pin the operating points so a silent constant change (or a recall
    // target drift) shows up as a test diff, not a quality regression at
    // the 100 TB tier no gate can see.
    val dial = (2 to 16).map(b => b -> LlmOps.enrTablesFor(b))
    // floor at small bits (test/gate SFs must keep the r9 result shape)
    assert(dial.takeWhile(_._1 <= 11).forall(_._2 == 4), s"floor broken: $dial")
    // monotone non-decreasing, bounded by the plane-constant table
    assert(dial.sliding(2).forall(w => w.head._2 <= w.last._2))
    assert(dial.last._2 <= 16)
    // every chosen L actually achieves the target (or is the cap)
    dial.foreach { case (b, l) =>
      assert(LlmOps.enrRecall(0.9, b, l) >= 0.5 || l == 16,
        s"bits=$b L=$l misses the 0.9-cosine recall target")
    }
  }

  test("winnowKept memo: running both winnow rows caches the fingerprint frame ONCE") {
    // r12 ADVICE: each winnowKept call used to persist a FRESH copy of
    // the identical frame — a harness step running both rows cached it
    // twice (4 entries total). With the memo, l_winnow + l_winnow_lsh
    // together add exactly 3 distinct frames — the SHARED fingerprint
    // frame, the LSH row's set frame, and its minhash signature frame —
    // and re-invoking adds none.
    val spark = TestSpark.spark
    spark.catalog.clearCache()
    def nCached = spark.sparkContext.getPersistentRDDs.size
    SparkEntry.queries("l_winnow")(spark, TestSpark.sfDir).collect()
    SparkEntry.queries("l_winnow_lsh")(spark, TestSpark.sfDir).collect()
    val afterBoth = nCached
    assert(afterBoth <= 3, s"expected <=3 cache entries, found $afterBoth")
    SparkEntry.queries("l_winnow")(spark, TestSpark.sfDir).collect()
    assert(nCached === afterBoth, "re-invocation must reuse the memoized frame")
    // the memo survives a harness clearCache: the re-asserted persist
    // re-caches the SAME frame instead of silently running uncached
    spark.catalog.clearCache()
    SparkEntry.queries("l_winnow")(spark, TestSpark.sfDir).collect()
    assert(nCached >= 1, "persist must be re-asserted after clearCache")
    spark.catalog.clearCache()
  }

  test("memoized frames: a sweep over every memoized row holds a bounded cache") {
    // r14 verdict task: pin a GLOBAL CacheManager entry bound after a
    // harness sweep over all memoized rows — the winnow pair shares ONE
    // fingerprint frame (+2 row-local persists), the dup-spans family
    // shares ONE positional-gram frame and (round 16) ONE keep1 covered
    // frame across its detect/apply pair; re-sweeping adds nothing.
    val spark = TestSpark.spark
    spark.catalog.clearCache()
    def nCached = spark.sparkContext.getPersistentRDDs.size
    val memoRows = Seq("l_winnow", "l_winnow_lsh", "l_dup_spans",
      "l_dup_spans_apply", "l_dup_spans_keep1", "l_dup_spans_keep1_apply")
    memoRows.foreach(q => SparkEntry.queries(q)(spark, TestSpark.sfDir).collect())
    val afterSweep = nCached
    assert(afterSweep <= 5,
      s"expected <=5 cache entries after the memo sweep, found $afterSweep")
    memoRows.foreach(q => SparkEntry.queries(q)(spark, TestSpark.sfDir).collect())
    assert(nCached === afterSweep, "re-sweeping must not add cache entries")
    spark.catalog.clearCache()
  }

  test("ivfpq: shortlist re-rank is exact-metric and bounded by the IVF probe") {
    // the composed row's contract: (1) per query exactly ranks 1..3 with
    // exact cosine non-increasing; (2) ivfpq searches a SUBSET of the
    // IVF row's probed-cell candidates (the ADC top-256 shortlist), so
    // its best exact cosine can never beat l_ivf_ann's — the subset
    // theorem that pins the composition to the same probe geometry;
    // (3) it still finds true neighbors (recall vs exact top-3 > 0;
    // measured 7/15 at sf0.001, equal to the IVF probe ceiling).
    val byQ = run("l_ivfpq_ann").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(byQ.size === 5 && byQ.values.forall(_.length == 3))
    byQ.values.foreach { rows =>
      assert(rows.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L))
      val cos = rows.sortBy(_._2).map(_._4)
      assert(cos.zip(cos.tail).forall { case (a, b) => a >= b - 1e-12 },
        s"re-ranked cosine must be non-increasing: ${cos.toSeq}")
    }
    val ivfTop1 = run("l_ivf_ann").collect()
      .filter(_.getLong(1) == 1L).map(r => r.getLong(0) -> r.getDouble(3)).toMap
    byQ.foreach { case (q, rows) =>
      val top1 = rows.filter(_._2 == 1L).head._4
      assert(top1 <= ivfTop1(q) + 1e-9,
        s"query $q: ivfpq top-1 cosine $top1 beats ivf ${ivfTop1(q)} — not a subset")
    }
    val exact = run("l_cosine_topk").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSet
    val hits = byQ.values.flatten.count(t => exact.contains((t._1, t._3)))
    assert(hits > 0, "ivfpq must retain some of the exact top-3")
  }

  test("keep1 covered memo: streams on the first access, persists on the second") {
    // r16 verdict task 3: the unconditional persist made the detect row
    // pay a MEMORY_AND_DISK cache write under Bench's clear-cache
    // protocol (+0.5 s in-suite). Contract now: ONE consumer streams the
    // frame through (no cache entry beyond the grams memo), a SECOND
    // consumer asserts the persist — the detect→inspect→apply session
    // caches from that moment on, and a lone benched row pays nothing.
    val spark = TestSpark.spark
    spark.catalog.clearCache()
    LlmOps.dupSpanKeep1MemoReset()
    def nCached = spark.sparkContext.getPersistentRDDs.size
    SparkEntry.queries("l_dup_spans_keep1")(spark, TestSpark.sfDir).collect()
    val afterFirst = nCached // the shared grams frame only
    assert(afterFirst <= 1,
      s"first keep1 access must not persist the covered frame (found $afterFirst entries)")
    SparkEntry.queries("l_dup_spans_keep1_apply")(spark, TestSpark.sfDir).collect()
    val afterSecond = nCached
    assert(afterSecond === afterFirst + 1,
      "second keep1 access must persist the covered frame exactly once")
    SparkEntry.queries("l_dup_spans_keep1")(spark, TestSpark.sfDir).collect()
    assert(nCached === afterSecond, "third access must reuse the cached frame")
    spark.catalog.clearCache()
    LlmOps.dupSpanKeep1MemoReset()
  }

  test("URL canonicalization cancels every planted noise axis and nothing else") {
    val rows = LlmOps.withCanonicalUrl(LlmOps.docUrls(Tables.documents(spark, d)))
      .select(col("doc_id"), col("source"), col("url"), col("url_canon"), col("domain"))
      .collect()
    val canonById = rows.map(r => r.getLong(0) -> r.getString(3)).toMap
    rows.foreach { r =>
      val (id, src, canon, dom) =
        (r.getLong(0), r.getString(1), r.getString(3), r.getString(4))
      // full independent reconstruction: scheme by parity, lowercased
      // host, no www/port/utm/fragment, trailing slash gone
      val expected = (if (id % 2 == 0) "https" else "http") +
        s"://${src.toLowerCase}.example.com/a/${id % 400}?id=${id % 400}"
      assert(canon == expected, s"doc $id: $canon != $expected (raw ${r.getString(2)})")
      assert(dom == s"${src.toLowerCase}.example.com", s"doc $id domain $dom")
    }
    // duplicate identity: doc d and d+400 canonicalize EQUAL (the pair
    // differs in www/port/case/utm/fragment noise only)...
    (0L until 100L).foreach { id =>
      assert(canonById(id) == canonById(id + 400), s"dup pair $id split") }
    // ...and nothing else collides: exactly URL_KEY_MOD distinct pages
    assert(rows.map(_.getString(3)).distinct.length == 400,
      "spurious canonical collision beyond the planted key")
  }

  test("URL canonicalization property: noise-invariant and idempotent on random URLs") {
    // randomized evidence beyond the planted fixture: for a random
    // logical page (host, path, query param), EVERY noise combination a
    // crawler sees (scheme/host case, www., explicit default port,
    // utm_* params before/after the real param, fragment, trailing
    // slash) must canonicalize to the SAME string, and the canonical
    // form must be a fixed point of the ladder.
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val hostGen = Gen.chooseNum(2, 10).flatMap(n =>
      Gen.listOfN(n, Gen.alphaLowerChar).map(_.mkString + ".example.org"))
    val segGen = Gen.chooseNum(1, 8).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))
    val raws = (0 until 60).flatMap { seed =>
      val p = Gen.Parameters.default
      val host = hostGen.apply(p, Seed(seed.toLong)).get
      val path = segGen.apply(p, Seed((seed + 101).toLong)).get
      val param = segGen.apply(p, Seed((seed + 202).toLong)).get
      val https = seed % 2 == 0
      val scheme = if (https) "https" else "http"
      val expected = s"$scheme://$host/$path?id=$param"
      // 8 noise variants of the same logical page
      val variants = for {
        www <- Seq("", "WWW.")
        port <- Seq("", if (https) ":443" else ":80")
        utm <- Seq("?utm_source=x&id=" + param, "?id=" + param + "&utm_medium=m")
      } yield (expected,
        s"${if (seed % 3 == 0) scheme.toUpperCase else scheme}://$www${
          if (seed % 5 == 0) host.toUpperCase else host}$port/$path$utm#f$seed")
      variants
    }
    val got = LlmOps.withCanonicalUrl(
        raws.map(_._2).toDF("url").withColumn("doc_id", lit(0L)))
      .select(org.apache.spark.sql.functions.col("url_canon")).as[String].collect()
    raws.map(_._1).zip(got).foreach { case (want, canon) =>
      assert(canon == want, s"canonicalization diverged: $canon != $want") }
    // fixed point: canonicalizing the canonical form changes nothing
    val twice = LlmOps.withCanonicalUrl(
        got.toSeq.toDF("url").withColumn("doc_id", lit(0L)))
      .select(org.apache.spark.sql.functions.col("url_canon")).as[String].collect()
    assert(twice.toSeq == got.toSeq, "canonicalization is not idempotent")
  }

  test("BPE learner equality property: local == distributed on random corpora") {
    // the fixture equality test pins K=24/128 on one corpus; this pins
    // the pair-count + argmax tie-break agreement on 10 RANDOM corpora
    // (adversarial repeated-character words, heavy count ties) written
    // as real documents tables and trained through BOTH paths end-to-end
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val wordGen = Gen.chooseNum(1, 9).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
    for (c <- 0 until 10) {
      val p = Gen.Parameters.default
      val words = (0 until 40).map(i =>
        wordGen.apply(p, Seed((c * 1000 + i).toLong)).get)
      val docs = words.grouped(8).zipWithIndex.map { case (ws, i) =>
        (i.toLong, ws.mkString(" "), "en", s"src$i", ws.mkString(" ").length.toLong)
      }.toSeq
      val dir = graft.streaming.StreamingOps.tmp(s"bpe-prop-$c-")
      docs.toDF("doc_id", "text", "lang", "source", "n_chars")
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      val loc = LlmOps.bpeTrainCompute(spark, dir, rounds = 12)
      sys.props("graft.bpe.distributed") = "1"
      val dist =
        try LlmOps.bpeTrainCompute(spark, dir, rounds = 12)
        finally sys.props.remove("graft.bpe.distributed")
      assert(loc == dist, s"corpus $c (${words.take(6)}...): local $loc != distributed $dist")
    }
  }

  test("domain cap: two-phase skew-safe selection equals the one-phase window") {
    val scored = LlmOps.domainQuality(Tables.documents(spark, d))
    val got = LlmOps.domainCapSelect(scored).collect().map(_.toSeq).toSeq
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("domain")).orderBy(col("quality").desc, col("doc_id"))
    val ref = scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("domain"), col("rk"), col("doc_id"), col("quality"))
      .orderBy(col("domain"), col("rk")).collect().map(_.toSeq).toSeq
    assert(got == ref, "two-phase top-N diverged from the plain window")
    assert(got.groupBy(_.head).forall(_._2.length <= 5), "cap violated")
    assert(got.nonEmpty, "fixture produced no capped domains — proves nothing")
  }

  test("token packing composes the BPE encode counts with correct running totals") {
    val pack = run("l_pack_tokens").collect()
    val enc = run("l_bpe_encode").select("doc_id", "n_bpe_tokens").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pack.length == enc.size, "packing must place every encoded doc")
    pack.foreach { r =>
      assert(r.getLong(3) == enc(r.getLong(0)),
        s"doc ${r.getLong(0)}: pack count ${r.getLong(3)} != encode ${enc(r.getLong(0))}") }
    // per bucket: tokens_before is the doc_id-ordered running sum and
    // bin its 4096-capacity quotient
    pack.groupBy(_.getLong(1)).foreach { case (bucket, rows) =>
      var acc = 0L
      rows.sortBy(_.getLong(0)).foreach { r =>
        assert(r.getLong(4) == acc, s"bucket $bucket doc ${r.getLong(0)}: tokens_before")
        assert(r.getLong(2) == acc / 4096L, s"bucket $bucket doc ${r.getLong(0)}: bin")
        acc += r.getLong(3)
      }
    }
  }

  test("BPE training: deterministic merges with non-increasing pair counts") {
    val m1 = run("l_bpe_train").collect()
    // ≤, not ==: training legitimately SATURATES below BPE_ROUNDS when
    // no pair remains (a raised GRAFT_BPE_ROUNDS or a smaller fixture —
    // r18 ADVICE). Exactness is pinned below on an explicit small round
    // count the fixture cannot saturate at.
    assert(m1.length <= LlmOps.BPE_ROUNDS, "at most one row per merge round")
    assert(m1.nonEmpty, "fixture trained zero merges — proves nothing")
    // pinned-rounds exactness: the fixture has far more than 8 merge
    // opportunities, so an 8-round train must return exactly 8 rows
    assert(LlmOps.bpeTrainCompute(spark, TestSpark.sfDir, rounds = 8).length == 8,
      "pinned 8-round training must not saturate on this fixture")
    // merged form is the pair's concatenation
    m1.foreach(r => assert(r.getString(3) == r.getString(1) + r.getString(2)))
    // the winning count can never grow: a pair created by a merge occurs
    // at most as often as the merge itself, and existing pairs only lose
    // occurrences — a violation means the merge fold corrupted a word
    val counts = m1.map(_.getLong(4)).toSeq
    assert(counts == counts.sorted(Ordering[Long].reverse),
      s"pair counts increased across rounds: $counts")
    assert(counts.last > 0, "fixture produced no repeated pairs — proves nothing")
    // training twice is bit-identical (argmax ties break deterministically)
    val m2 = run("l_bpe_train").collect()
    assert(m1.map(_.toSeq).toSeq == m2.map(_.toSeq).toSeq)
  }

  test("BPE local merge learning is bit-identical to the distributed loop") {
    // the local learner (the production train path — see bpeTrainCompute)
    // and the distributed loop share the BpeKernels fold; this pins that
    // the pair count + argmax tie-break agree too, both in the steady
    // state (K=24) and THROUGH SATURATION (K=128 — the sf0.001 fixture
    // exhausts its pairs below 128, so both paths must stop at the same
    // round with the same final merge)
    for (k <- Seq(24, 128)) {
      val loc = LlmOps.bpeTrainCompute(spark, TestSpark.sfDir, rounds = k)
      sys.props("graft.bpe.distributed") = "1"
      val dist =
        try LlmOps.bpeTrainCompute(spark, TestSpark.sfDir, rounds = k)
        finally sys.props.remove("graft.bpe.distributed")
      assert(loc == dist, s"local/distributed learners diverged at K=$k")
      if (k == 128) assert(loc.length < 128,
        "K=128 was expected to SATURATE on this fixture — raise K or shrink it")
    }
  }

  test("BPE greedy merge kernel: identical-symbol runs merge left-to-right") {
    // the r17 ADVICE divergence: a two-pass string replace turns
    // 'aaaaaa' under merge (a,a) into [aa,a,aa,a]; the reference greedy
    // pass yields [aa,aa,aa]. The kernel must produce the reference
    // shape — floor(n/2) merged tokens + (n mod 2) singletons + </w>.
    import org.apache.spark.unsafe.types.UTF8String
    def u(s: String) = UTF8String.fromString(s)
    def count(w: String, merges: Seq[(String, String)]): Long =
      graft.functions.BpeKernels.tokenCount(u(w),
        merges.map(p => u(p._1)).toArray, merges.map(p => u(p._2)).toArray,
        merges.map(p => u(p._1 + p._2)).toArray)
    val aa = Seq(("a", "a"))
    // n=4..7: tokens = floor(n/2) + (n%2) + 1 (</w>)
    assert(count("aaaa", aa) == 3L)   // [aa,aa,</w>]
    assert(count("aaaaa", aa) == 4L)  // [aa,aa,a,</w>]
    assert(count("aaaaaa", aa) == 4L) // [aa,aa,aa,</w>] — two-pass replace said 5
    assert(count("aaaaaaa", aa) == 5L)
    // merges apply in learned order, each one greedy pass
    assert(count("abab", Seq(("a", "b"), ("ab", "ab"))) == 2L) // [abab,</w>]
    assert(count("abab", Seq(("ab", "ab"), ("a", "b"))) == 3L) // round 1 no-op
    // OOV encode: unseen word encodes from its own characters + merges
    assert(count("zzq", Seq(("a", "a"))) == 4L) // [z,z,q,</w>]
    assert(count("", Seq(("a", "a"))) == 1L)    // bare </w>
    // suffix merge uses the marker
    assert(count("ba", Seq(("a", "</w>"))) == 2L) // [b,a</w>]
  }

  test("BPE streaming scorer encodes out-of-vocabulary words from characters") {
    // r17 ADVICE: the old vocab-join scorer silently DROPPED words the
    // training corpus never saw. A frame with a fabricated OOV word must
    // count it (chars + </w> minus whatever learned merges apply).
    import spark.implicits._
    val scorer = LlmOps.bpeScorer(spark, d)
    val frame = Seq((900001L, "zqxjv kwpy")).toDF("doc_id", "text")
    val out = scorer(frame).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(1) == 2L, "both OOV words must be counted")
    // zqxjv→≤6 tokens, kwpy→≤5; ≥1 token each; merges can only shrink
    val k = r.getLong(2)
    assert(k >= 2L && k <= 11L, s"OOV token count out of range: $k")
  }

  test("BPE kernel property: matches an independent greedy reference on random inputs") {
    // randomized evidence for the r17-ADVICE fix: the codegen kernel's
    // in-place compaction fold vs a naive list-based Sennrich greedy
    // pass (different implementation style, same contract), over words
    // with adversarial repeated-character runs and merges drawn from the
    // word's own alphabet (so they actually fire)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import org.apache.spark.unsafe.types.UTF8String
    def refTokens(word: String, merges: Seq[(String, String)]): List[String] = {
      def pass(syms: List[String], a: String, b: String): List[String] = syms match {
        case x :: y :: rest if x == a && y == b => (a + b) :: pass(rest, a, b)
        case x :: rest => x :: pass(rest, a, b)
        case Nil => Nil
      }
      merges.foldLeft(word.map(_.toString).toList :+ "</w>") {
        case (s, (a, b)) => pass(s, a, b)
      }
    }
    val wordGen = Gen.chooseNum(0, 14).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', '.', '!')).map(_.mkString))
    val symGen = Gen.oneOf("a", "b", ".", "!", "aa", "ab", "..", "</w>", "a</w>")
    val mergesGen = Gen.chooseNum(0, 6).flatMap(k =>
      Gen.listOfN(k, Gen.zip(symGen, symGen)))
    def u(s: String) = UTF8String.fromString(s)
    var checked = 0
    for (seed <- 0 until 500) {
      val p = Gen.Parameters.default
      val word = wordGen.apply(p, Seed(seed.toLong)).getOrElse("")
      val merges = mergesGen.apply(p, Seed((seed + 7919).toLong)).getOrElse(Nil)
      val want = refTokens(word, merges)
      val gotN = graft.functions.BpeKernels.tokenCount(u(word),
        merges.map(m => u(m._1)).toArray, merges.map(m => u(m._2)).toArray,
        merges.map(m => u(m._1 + m._2)).toArray)
      val gotToks = graft.functions.BpeKernels.tokens(u(word),
        merges.map(m => u(m._1)).toArray, merges.map(m => u(m._2)).toArray,
        merges.map(m => u(m._1 + m._2)).toArray)
      val gotList = (0 until gotToks.numElements())
        .map(i => gotToks.getUTF8String(i).toString).toList
      assert(gotList == want && gotN == want.length.toLong,
        s"word='$word' merges=$merges: kernel=$gotList (n=$gotN) ref=$want")
      checked += 1
    }
    assert(checked == 500)
  }

  test("BPE training saturates at pair exhaustion instead of failing") {
    // reference semantics: the learn loop BREAKS when no adjacent pair
    // remains (K caps the merge count, it is not a row quota). At
    // saturation every corpus word is a single token, so encoding any
    // corpus word with the saturated model yields exactly 1 token.
    import org.apache.spark.sql.functions.{col, explode, length, lower, split}
    val sat = LlmOps.bpeTrainCompute(spark, d, rounds = 100000)
    assert(sat.nonEmpty && sat.length < 100000,
      s"fixture must saturate under 100000 merges, got ${sat.length}")
    // deterministic: same saturated model on a second run
    val sat2 = LlmOps.bpeTrainCompute(spark, d, rounds = 100000)
    assert(sat == sat2)
    val merges = sat.map(t => (t._2, t._3))
    val maxTok = Tables.documents(spark, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(graft.functions.BpeExprs.tokenCount(col("w"), merges).as("k"))
      .agg(org.apache.spark.sql.functions.max(col("k"))).first().getLong(0)
    assert(maxTok == 1L,
      s"saturated model must encode every corpus word to 1 token, max was $maxTok")
  }

  test("BPE vocab: occurrence mass equals the encode rows' total token count") {
    // the vocabulary export and the per-doc encode are two views of ONE
    // tokenization: sum(n_occurrences) over the vocab must equal
    // sum(n_bpe_tokens) over the docs, and every token is non-empty with
    // positive counts
    val vocab = run("l_bpe_vocab").collect()
    assert(vocab.nonEmpty)
    vocab.foreach { r =>
      assert(r.getString(0).nonEmpty && r.getLong(1) > 0 && r.getLong(2) > 0)
    }
    val vocabMass = vocab.map(_.getLong(1)).sum
    val encodeMass = run("l_bpe_encode").collect().map(_.getLong(2)).sum
    assert(vocabMass == encodeMass,
      s"vocab occurrence mass $vocabMass != encode token total $encodeMass")
    // the end-of-word marker family is represented (every word ends in
    // </w> or a merged token containing it)
    assert(vocab.exists(_.getString(0).contains("</w>")))
  }

  test("BPE encode: merges only ever shrink a word's token count") {
    // per doc: chars+1 per word is the round-0 token count (chars + the
    // </w> marker); K merges can only reduce it, and never below 1
    val enc = run("l_bpe_encode").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val base = LlmOps.queries("l_text_stats")(spark, d).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap // n_tokens (words)
    assert(enc.nonEmpty && enc.keySet.subsetOf(base.keySet))
    enc.foreach { case (id, (nw, nb)) =>
      assert(nb >= nw, s"doc $id: fewer BPE tokens ($nb) than words ($nw)")
    }
    // the merges actually compressed: total BPE tokens strictly under
    // the exact round-0 total (per word: chars + the </w> marker), which
    // only an applied merge can achieve
    import org.apache.spark.sql.functions.{col, explode, length, lit, lower, split, sum}
    val r0tot = Tables.documents(spark, d)
      .select(explode(split(lower(col("text")), " ")).as("w"))
      .filter(length(col("w")) > 0)
      .agg(sum(length(col("w")).cast("long") + lit(1L)))
      .first().getLong(0)
    val totBpe = enc.values.map(_._2).sum
    assert(totBpe < r0tot,
      s"no merge ever applied at encode time ($totBpe !< $r0tot)")
  }
}
