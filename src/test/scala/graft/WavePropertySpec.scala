package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, EventOps, Graph, Stats}

/** Randomized-corpus properties for the wave-5..13 operators: each test
  * replays the operator's contract with an INDEPENDENT driver-side
  * reference implementation over seeded random inputs — the
  * beyond-the-one-fixture guarantee the single-corpus oracle queries
  * cannot give (losslessness of the prefix-filter candidate rule, the
  * sweep-line peak, rank-based selections, the Gini identity).
  */
class WavePropertySpec extends SparkSuite {
  import spark.implicits._

  private def round6(num: Double): Double =
    BigDecimal(num).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("prefixFilterPairs equals the all-pairs reference on random corpora") {
    for (trial <- 0 until 4; tPpm <- Seq(300000L, 600000L)) {
      val rnd = new scala.util.Random(1000 + trial)
      // small shingle alphabet (20 symbols) over 18 docs of 3-9
      // shingles → dense overlap structure incl. boundary jaccards
      val docs = (1L to 18L).map { id =>
        val n = 3 + rnd.nextInt(7)
        id -> Seq.fill(n)(s"s${rnd.nextInt(20)}").distinct
      }
      val sh = docs.flatMap { case (id, ss) => ss.map(id -> _) }
        .toDF("id", "shingle")
      val got = Dedup.prefixFilterPairs(sh, tPpm, persist = false)
        .orderBy("id_a", "id_b")
        .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
      val sets = docs.toMap.map { case (k, v) => k -> v.toSet }
      val expected = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        inter = (sets(a) & sets(b)).size.toLong if inter > 0
        sza = sets(a).size.toLong; szb = sets(b).size.toLong
        jac = inter * 1000000L / (sza + szb - inter) if jac >= tPpm
      } yield (a, b, inter, sza, szb, jac)).sortBy(t => (t._1, t._2))
      assert(got == expected,
        s"trial $trial t=$tPpm: prefix filter diverged from all-pairs")
    }
  }

  test("peakConcurrency equals the brute sweep on random intervals") {
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(2000 + trial)
      val iv = (1 to 40).map { _ =>
        val s = rnd.nextInt(100).toLong
        ("k", s, s + 1 + rnd.nextInt(30).toLong)
      }
      val got = EventOps.peakConcurrency(iv.toDF("key0", "s", "e"),
          "key0", "s", "e")
        .as[(String, Long, Long, Long)].head()
      // reference: net deltas per instant, accumulate in ts order
      val net = iv.flatMap { case (_, s, e) => Seq(s -> 1L, e -> -1L) }
        .groupBy(_._1).map { case (t, ds) => t -> ds.map(_._2).sum }
        .toSeq.sortBy(_._1)
      var cur = 0L; var peak = -1L; var peakTs = -1L
      net.foreach { case (t, d) =>
        cur += d
        if (cur > peak) { peak = cur; peakTs = t }
      }
      assert(got == (("k", iv.size.toLong, peak, peakTs)), s"trial $trial")
    }
  }

  test("cusumChangePoint matches the reference argmax on random series") {
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(3000 + trial)
      val buckets = (1L to 12L).map(k => k -> (1L + rnd.nextInt(20)))
      val rows = buckets.flatMap { case (k, c) =>
        Seq.fill(c.toInt)(("g", k)) }
      val got = Stats.cusumChangePoint(
          rows.toDF("grp", "day").withColumn("one", lit(1L)),
          col("grp"), col("day"), col("one"))
        .as[(String, Long, Long, Long, Long)].head()
      val n = buckets.size.toLong
      val s = buckets.map(_._2.toLong).sum
      var p = 0L
      val ds = buckets.zipWithIndex.map { case ((k, c), i) =>
        p += c; (k, math.abs(n * p - (i + 1) * s))
      }
      val dMax = ds.map(_._2).max
      val kStar = ds.filter(_._2 == dMax).map(_._1).min
      val ppm = 1000000L * dMax / (n * s)
      assert(got == (("g", n, s, kStar, ppm)), s"trial $trial")
    }
  }

  test("paretoCoverage matches the reference on random unit masses") {
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(4000 + trial)
      val units = (1 to 12).map(u => s"u$u" -> (1L + rnd.nextInt(30)))
      val rows = units.flatMap { case (u, c) =>
        Seq.fill(c.toInt)(("g", u)) }
      val got = Stats.paretoCoverage(rows.toDF("g0", "u0"), col("g0"),
          col("u0"))
        .as[(String, Long, Long, Long, Long)].head()
      val tot = units.map(_._2).sum
      val ranked = units.sortBy { case (u, c) => (-c, u) }
      var cum = 0L; var u50 = 0L; var u90 = 0L
      ranked.zipWithIndex.foreach { case ((_, c), i) =>
        cum += c
        if (u50 == 0L && cum * 2 >= tot) u50 = i + 1
        if (u90 == 0L && cum * 10 >= tot * 9) u90 = i + 1
      }
      assert(got == (("g", units.size.toLong, tot, u50, u90)),
        s"trial $trial")
    }
  }

  test("giniConcentration equals the mean-absolute-difference identity") {
    for (trial <- 0 until 5) {
      val rnd = new scala.util.Random(5000 + trial)
      val units = (1 to 10).map(u => s"u$u" -> (1L + rnd.nextInt(25)))
      val rows = units.flatMap { case (u, c) =>
        Seq.fill(c.toInt)(("g", u)) }
      val got = Stats.giniConcentration(rows.toDF("g0", "u0"), col("g0"),
          col("u0"))
        .as[(String, Long, Long, Double)].head()._4
      val xs = units.map(_._2.toDouble)
      val n = xs.size; val s = xs.sum
      val mad = (for (a <- xs; b <- xs) yield math.abs(a - b)).sum
      // Σ|xi−xj| / (2n·Σx) is the same quantity as the ranked form
      assert(got == round6(mad / (2 * n * s)), s"trial $trial")
    }
  }

  test("hits conserves L1 mass up to per-node floor loss each round") {
    val rnd = new scala.util.Random(6000)
    val edges = (1 to 60).map(_ =>
      (rnd.nextInt(8).toLong, 100L + rnd.nextInt(8).toLong))
      .toDF("src", "dst")
    val out = Graph.hits(edges, iters = 2, persist = false)
      .as[(Long, String, Long)].collect().toSeq
    val scale = 1000000000000L
    for (kind <- Seq("auth", "hub")) {
      val scores = out.filter(_._2 == kind).map(_._3)
      assert(scores.forall(_ >= 0L))
      val total = scores.sum
      // each normalized score floors away < 1 unit
      assert(total <= scale && total > scale - scores.size,
        s"$kind L1 mass $total out of band")
    }
  }
}
