package graft

import org.apache.spark.sql.functions._

import graft.operators.{EventOps, Graph, Similarity, Sketches, TextOps}

/** Round-10 frontier operators: CMS join-size estimation, SQ8
  * quantization recall, time-weighted averages, k-core peeling, and
  * chi-square token drift (q181-q185). Each test pins the semantic
  * contract the DuckDB oracle replays.
  */
class FrontierOpsSpec extends SparkSuite {
  import spark.implicits._

  test("cmsJoinSize upper-bounds the true join size and is exact sans collisions") {
    // keys with counts 3, 2, 1 → self-join size 9 + 4 + 1 = 14; width
    // 1024 with 3 keys makes collisions (same hash48 cell in all 4
    // rows) essentially impossible, so the estimate is exact
    val df = Seq("a", "a", "a", "b", "b", "c").toDF("k")
    val est = Sketches.cmsJoinSize(df, col("k"), df, col("k"), 4, 1024)
      .as[Long].head()
    assert(est == 14L)
    // disjoint key sets → every cell product pairs a zero → estimate 0
    // (unless a collision inflates it; impossible here for the same
    // reason); inner join on cells yields NO rows → min over empty is
    // null-safe only if groupBy(r) produced rows — assert the join form
    val other = Seq("x", "y").toDF("k")
    val cross = Sketches.cmsJoinSize(df, col("k"), other, col("k"), 4, 1024)
      .as[Option[Long]].collect()
    assert(cross.isEmpty || cross.head.forall(_ == 0L),
      "disjoint sides must estimate 0 pairs (or produce no cells at all)")
  }

  test("sq8Recall is 100% when quantization preserves the ranking") {
    // orthogonal-ish integer vectors whose SQ8 codes keep the exact
    // order: base of 6, queries = first 2; with k=2 the approx and
    // exact top-2 coincide because dot-product gaps are huge vs the
    // 255-level quantization error
    val rows = Seq(
      (0L, Array(10.0f, 0.0f, 0.0f)),
      (1L, Array(9.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 10.0f, 0.0f)),
      (3L, Array(0.0f, 9.0f, 1.0f)),
      (4L, Array(0.0f, 0.0f, 10.0f)),
      (5L, Array(1.0f, 0.0f, 9.0f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.sq8Recall(rows, rows.filter(col("vec_id") < 2),
        "vec_id", "embedding", k = 2)
      .orderBy("query_id")
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((0L, 2L, 100L), (1L, 2L, 100L)))
  }

  test("timeWeightedAvg integrates last-observation-carried-forward") {
    // user 1: value 1.00 for 10s then 3.00 for 30s over a 40s span →
    // TWA = (100·10e6 + 300·30e6) / 40e6 = 250 cents; the final event's
    // value never contributes (no interval after it)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val e = Seq(
      (1L, ts(0), 1.00, 10L), (1L, ts(10), 3.00, 11L), (1L, ts(40), 9.99, 12L),
      (2L, ts(0), 5.00, 20L) // single event → no span → excluded
    ).toDF("user_id", "ts", "value", "event_id")
    val out = EventOps.timeWeightedAvg(e, "user_id", "ts", "value", "event_id")
      .orderBy("key").as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 40L, 250L)))
  }

  test("kCore peels low-degree fringe round by round") {
    // a 4-clique (1-2-3-4, degree 3 each) with a pendant path 4-5-6:
    // round 1 drops 6 (deg 1) — 5 keeps deg 2 < 3 → dropped too;
    // round 2: clique intact, all degree 3 (edge 4-5 gone)
    val edges = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (4L, 5L), (5L, 6L)
    ).toDF("src", "dst")
    val out = Graph.kCore(edges, k = 3, rounds = 2)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
  }

  test("sq8Rerank reproduces the exact ranking when the screen keeps it") {
    // screenK = full corpus → the rerank IS the exact cosine ranking
    val rows = Seq(
      (0L, Array(10.0f, 0.0f, 0.0f)),
      (1L, Array(9.0f, 1.0f, 0.0f)),
      (2L, Array(0.0f, 10.0f, 0.0f)),
      (3L, Array(8.0f, 2.0f, 0.0f)),
      (4L, Array(0.0f, 0.0f, 10.0f))
    ).toDF("vec_id", "embedding")
    val qs = rows.filter(col("vec_id") === 0)
    val exact = Similarity.cosineTopK(rows, qs, "vec_id", "embedding", 3)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect().toSeq
    val two = Similarity.sq8Rerank(rows, qs, "vec_id", "embedding",
        k = 3, screenK = 4)
      .orderBy("rank").as[(Long, Long, Long, Double)].collect().toSeq
    assert(two == exact,
      "with screenK covering the corpus, rerank must equal the exact top-k")
  }

  test("rateAnomaly standardizes against the key's own hour distribution") {
    // type A: counts 1, 1, 4 over three hours → mean 2, pop-var 2 →
    // z = (c-2)/sqrt(2); type B: constant counts → zero variance → dropped
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:30:00")
    def ts(h: Int, i: Int) =
      new java.sql.Timestamp(base.getTime + h * 3600000L + i * 1000L)
    val rows = (Seq.tabulate(1)(i => ("A", ts(0, i))) ++
      Seq.tabulate(1)(i => ("A", ts(1, i))) ++
      Seq.tabulate(4)(i => ("A", ts(2, i))) ++
      Seq.tabulate(2)(i => ("B", ts(0, i))) ++
      Seq.tabulate(2)(i => ("B", ts(1, i)))).toDF("event_type", "ts")
    val out = EventOps.rateAnomaly(rows, "event_type", "ts")
      .orderBy("key", "bucket")
      .as[(String, String, Long, Double)].collect().toSeq
    assert(out.map(_._1).forall(_ == "A"), "zero-variance keys are dropped")
    val z = (c: Long) => BigDecimal((c - 2.0) / math.sqrt(2.0))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(r => (r._3, r._4)) == Seq((1L, z(1)), (1L, z(1)), (4L, z(4))))
  }

  test("valueTrend recovers an exact linear slope") {
    // y = 2.00 + 0.50·x cents over x = 0, 10, 20 seconds → slope 0.5
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val e = Seq(
      ("A", ts(0), 0.02), ("A", ts(10), 0.07), ("A", ts(20), 0.12),
      ("B", ts(0), 1.00) // single point → no slope → dropped
    ).toDF("event_type", "ts", "value")
    val out = EventOps.valueTrend(e, "event_type", "ts", "value")
      .as[(String, Long, Double)].collect().toSeq
    assert(out == Seq(("A", 3L, 0.5)))
  }

  test("contingencyResiduals matches the closed-form 2x2 expectations") {
    // cells: (x,p)=2 (x,q)=1 (y,p)=1 → ra(x)=3, ra(y)=1, cb(p)=3,
    // cb(q)=1, N=4; e(x,p)=9/4=2.25, resid=(2-2.25)/sqrt(2.25)=-1/6
    val df = Seq(("x", "p"), ("x", "p"), ("x", "q"), ("y", "p"))
      .toDF("lang", "source")
    val out = graft.operators.Stats
      .contingencyResiduals(df, col("lang"), col("source"))
      .orderBy("a", "b")
      .as[(String, String, Long, Double, Double)].collect().toSeq
    assert(out.head == (("x", "p", 2L, 2.25,
      BigDecimal(-0.25 / 1.5).setScale(6,
        BigDecimal.RoundingMode.HALF_UP).toDouble)))
    assert(out.map(t => (t._1, t._2)) == Seq(("x", "p"), ("x", "q"), ("y", "p")))
  }

  test("kAnonymity flags equivalence classes under k") {
    val df = Seq(("en", "web"), ("en", "web"), ("en", "web"),
      ("en", "book"), ("fr", "web")).toDF("lang", "source")
    val out = graft.operators.Curate
      .kAnonymity(df, Seq(col("lang"), col("source")), k = 2L)
      .orderBy("lang", "source")
      .as[(String, String, Long, Long)].collect().toSeq
    assert(out == Seq(("en", "book", 1L, 1L), ("en", "web", 3L, 0L),
      ("fr", "web", 1L, 1L)))
  }

  test("temporalSplit cuts the span exactly and counts key overlap") {
    // span = 100 s: train < 60 s, embargo [60, 65), test >= 65 s.
    // key 1 is train-only, key 2 spans train and test, key 3 test-only,
    // key 4 embargo-only (contributes to no overlap)
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    def ts(s: Long) = new java.sql.Timestamp(base.getTime + s * 1000)
    val e = Seq((1L, ts(0)), (2L, ts(30)), (4L, ts(62)), (2L, ts(70)),
      (3L, ts(100))).toDF("user_id", "ts")
    val out = graft.operators.Curate
      .temporalSplit(e, col("ts"), col("user_id"), 6, 1)
      .as[(Long, Long, Long, Long)].head()
    assert(out == ((2L, 1L, 2L, 1L)))
  }

  test("labelNoise counts neighborhood label disagreement") {
    // three tight "a" vectors + two tight "b" vectors; query the "a"
    // outlier relabeled "b": its k=2 neighbors are both "a" → 2 diff
    val rows = Seq(
      (0L, Array(10.0f, 0.0f), "b"), // mislabeled: sits in the a-cluster
      (1L, Array(9.8f, 0.2f), "a"),
      (2L, Array(9.9f, 0.1f), "a"),
      (3L, Array(0.0f, 10.0f), "b"),
      (4L, Array(0.1f, 9.9f), "b")
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelNoise(rows, rows.filter(col("vec_id") === 0),
        "vec_id", "embedding", "label", k = 2)
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(out == Seq((0L, "b", 2L, 100L)))
  }

  test("CmsStore: merged part stores estimate exactly like one full sketch") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cms").toString
    // ContentGate.tag fingerprints idCol NUMERICALLY — keep a long id
    val df = Seq.tabulate(300)(i => (i.toLong, s"t${i % 17}")).toDF("id", "k")
    val a = df.filter(col("id") % 2 === 0)
    val b = df.filter(col("id") % 2 === 1)
    Sketches.CmsStore.ensure(a, col("k"), col("id"), 4, 256, s"$dir/a")
    Sketches.CmsStore.ensure(b, col("k"), col("id"), 4, 256, s"$dir/b")
    val probes = (0 until 17).map(i => s"t$i") :+ "absent"
    val merged = Sketches.CmsStore
      .estimateFrom(spark, Seq(s"$dir/a", s"$dir/b"), probes, 4, 256)
      .orderBy("key").as[(String, Long)].collect().toSeq
    val full = Sketches.countMinEstimate(
        Sketches.countMin(df, col("k"), 4, 256), probes, 4, 256)
      .orderBy("key").as[(String, Long)].collect().toSeq
    assert(merged == full, "cell-wise store merge must equal the one-shot sketch")
  }

  test("linearAttribution splits ppm credit equally across in-window touches") {
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(minAgo: Long) = new java.sql.Timestamp(base.getTime - minAgo * 60000)
    val e = Seq(
      // conversion at t0 with 3 touches inside the hour (2 view, 1 click)
      (1L, "view", ts(50), 1L), (1L, "view", ts(40), 2L),
      (1L, "click", ts(10), 3L), (1L, "purchase", ts(0), 4L),
      // touch outside the window never earns credit
      (1L, "signup", ts(90), 5L),
      // conversion with no in-window touch contributes nothing
      (2L, "purchase", ts(0), 6L)
    ).toDF("user_id", "event_type", "ts", "event_id")
    val out = graft.operators.EventOps.linearAttribution(
        e, "user_id", "event_type", "ts", "purchase", 3600L * 1000000L)
      .orderBy("channel").as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(("click", 1L, 333333L), ("view", 2L, 666666L)))
  }

  test("differenceHash sets bits by horizontal neighbor comparison") {
    // 9x8 image = the sample grid itself; luma increases strictly with x
    // in every row -> all 64 bits set; constant image -> no bits
    import graft.operators.Multimodal
    def png(f: (Int, Int) => Int): Array[Byte] = {
      val im = new java.awt.image.BufferedImage(9, 8,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) im.setRGB(x, y, f(x, y))
      val o = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(im, "png", o); o.toByteArray
    }
    val asc = Multimodal.differenceHash(
      Multimodal.MediaRecord(1L, png((x, _) => x * 20 << 16), "image/png", 0L)).get
    assert(asc.ph_hi == 0xFFFFFFFFL && asc.ph_lo == 0xFFFFFFFFL,
      s"ascending rows must set all 64 bits, got ${asc.ph_hi}/${asc.ph_lo}")
    val flat = Multimodal.differenceHash(
      Multimodal.MediaRecord(2L, png((_, _) => 0x808080), "image/png", 0L)).get
    assert(flat.ph_hi == 0L && flat.ph_lo == 0L)
  }

  test("ksDrift computes the exact scaled ECDF supremum gap") {
    // x: {1,1,2} (n=3), y: {2,3} (n=2) — grid 1,2,3:
    // cum_x = 2,3,3; cum_y = 0,1,2
    // D_scaled = max(|2·2−0·3|, |3·2−1·3|, |3·2−2·3|) = 4
    // d_ppm = 4·10⁶ div 6 = 666666; identical ECDFs → 0
    val df = Seq(("x", 1L), ("x", 1L), ("x", 2L), ("y", 2L), ("y", 3L),
      ("z", 1L), ("z", 1L), ("z", 2L)).toDF("g", "v")
    val out = graft.operators.Stats.ksDrift(df, col("g"), col("v"))
      .orderBy("group_a", "group_b")
      .as[(String, String, Long, Long, Long)].collect().toSeq
    assert(out.head == (("x", "y", 3L, 2L, 666666L)))
    assert(out.find(t => t._1 == "x" && t._2 == "z").get._5 == 0L,
      "identical distributions must have d_ppm 0")
  }

  test("tokenDrift computes the 2x2 chi-square on closed-form counts") {
    // slice 0: "a a b"  → o(a)=2, o(b)=1, n1=3
    // slice 1: "a b b b" → o(a)=1, o(b)=3, n2=4
    val docs = Seq((0L, "a a b"), (1L, "a b b b")).toDF("doc_id", "text")
    val out = TextOps.tokenDrift(docs, col("doc_id") % 2, "text", minCount = 1L)
      .orderBy("term").as[(String, Long, Long, Double)].collect().toSeq
    // chi2(a): d = 2*4 - 1*3 = 5; 5*5*7 / 3 / 4 / 3 / 4 = 175/144
    val expA = BigDecimal(5.0 * 5.0 * 7.0 / 3.0 / 4.0 / 3.0 / 4.0)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.map(_._1) == Seq("a", "b"))
    assert(out(0)._2 == 2L && out(0)._3 == 1L)
    assert(math.abs(out(0)._4 - expA) < 1e-9)
    // the 2x2 statistic is symmetric in the token's complement: same χ²
    assert(math.abs(out(0)._4 - out(1)._4) < 1e-9)
  }
}
