package graft

import org.apache.spark.sql.functions._

import graft.operators.Curate

/** Curation operators must be deterministic functions of content — the
  * same dataset comes out for any partitioning, twice.
  */
class CurateSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Tables.documents(spark, "/root/testdata/sf0.001")

  test("hashSplit assigns every row, and assignment is partition-invariant") {
    val splits = Seq(("train", 80), ("val", 10), ("test", 10))
    val a = Curate.hashSplit(docs.repartition(7), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Curate.hashSplit(docs.repartition(3), col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a == b)
    assert(a.size == docs.count())
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    // 80/10/10 within loose tolerance on 500 docs
    val train = a.values.count(_ == "train").toDouble / a.size
    assert(train > 0.7 && train < 0.9, s"train fraction $train")
  }

  test("stratifiedSample is a deterministic subset honoring per-stratum rates") {
    val rate = when(col("lang") === "en", 50).otherwise(10)
    val s1 = Curate.stratifiedSample(docs, col("doc_id"), rate)
      .select("doc_id").as[Long].collect().toSet
    val s2 = Curate.stratifiedSample(docs.repartition(5), col("doc_id"), rate)
      .select("doc_id").as[Long].collect().toSet
    assert(s1 == s2)
    assert(s1.nonEmpty && s1.size < docs.count())
    // en sampled more aggressively than the rest
    val byLang = docs.filter(col("doc_id").isin(s1.toSeq: _*))
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    val totals = docs.groupBy("lang").count().as[(String, Long)].collect().toMap
    val enRate = byLang.getOrElse("en", 0L).toDouble / totals("en")
    val deRate = byLang.getOrElse("de", 0L).toDouble / totals("de")
    assert(enRate > deRate)
  }

  test("quotaSample: exact quotas, partition-invariant, stable under growth") {
    val a = Curate.quotaSample(docs.repartition(7), Seq("lang"), col("doc_id"), 10)
      .as[(String, Long)].collect().toSet
    val b = Curate.quotaSample(docs.repartition(3), Seq("lang"), col("doc_id"), 10)
      .as[(String, Long)].collect().toSet
    assert(a == b)
    val perLang = a.groupBy(_._1).view.mapValues(_.size).toMap
    assert(perLang.values.forall(_ == 10), perLang.toString)
    // growth stability: sampling a SUBSET can only differ by rows the
    // removed data had claimed — every kept id of the full sample that
    // survives the filter is still kept in the subset's sample
    val half = docs.filter(col("doc_id") % 2 === 0)
    val sub = Curate.quotaSample(half, Seq("lang"), col("doc_id"), 10)
      .as[(String, Long)].collect().toSet
    assert(a.filter(_._2 % 2 == 0).subsetOf(sub))
  }

  test("adaptiveQualityGate keeps exactly the rows at or above each group's percentile") {
    // group a: scores 1..10 → p25 threshold = 3 (cum 3·100 ≥ 10·25) → keep 3..10
    // group b: scores all 7 → threshold 7 → keep everything
    // group c: 5,5,9 → cum(5)=2, 2·100 ≥ 3·25 → thr 5 → keep all
    val rows = (1 to 10).map(i => ("a", i.toLong, s"a$i")) ++
      (1 to 4).map(i => ("b", 7L, s"b$i")) ++
      Seq(("c", 5L, "c1"), ("c", 5L, "c2"), ("c", 9L, "c3"))
    val df = rows.toDF("g", "score", "id")
    val kept = Curate.adaptiveQualityGate(df, Seq("g"), col("score"), p = 25)
      .select("id", "thr").as[(String, Long)].collect().toMap
    assert(kept.keySet ==
      ((3 to 10).map(i => s"a$i") ++ (1 to 4).map(i => s"b$i") ++
        Seq("c1", "c2", "c3")).toSet)
    assert(kept("a3") == 3L && kept("b1") == 7L && kept("c3") == 5L)
    // partition-invariant: the kept set is a function of content only
    val kept2 = Curate.adaptiveQualityGate(
      df.repartition(7), Seq("g"), col("score"), p = 25)
      .select("id").as[String].collect().toSet
    assert(kept2 == kept.keySet)
  }

  test("compactionPlan: keeps exactly the at-target files, bins fill to target") {
    val t = 100L
    val files = Seq(
      ("p1", "a", 40L), ("p1", "b", 40L), ("p1", "c", 40L), ("p1", "d", 99L),
      ("p1", "e", 100L), ("p1", "f", 250L),
      ("p2", "g", 10L), ("p2", "h", 10L)
    ).toDF("part", "file", "size")
    val plan = graft.operators.Layout.compactionPlan(
        files, Seq("part"), col("file"), col("size"), t)
      .as[(String, String, Long, String, Option[Long])].collect().toSeq
    assert(plan.size == 8, "every file appears exactly once")
    val keeps = plan.filter(_._4 == "keep").map(_._2).toSet
    assert(keeps == Set("e", "f"), "keeps are exactly the files >= target")
    assert(plan.filter(_._4 == "keep").forall(_._5.isEmpty))
    // cum-div binning: p1 smalls a(0),b(0),c(0: cum 80),d(cum 120 -> bin 1)
    val p1bins = plan.filter(p => p._1 == "p1" && p._4 == "rewrite")
      .map(p => p._2 -> p._5.get).toMap
    assert(p1bins == Map("a" -> 0L, "b" -> 0L, "c" -> 0L, "d" -> 1L))
    // every non-final bin prefix reaches the target; every bin < 2x target
    for ((part, rows) <- plan.filter(_._4 == "rewrite").groupBy(_._1)) {
      val byBin = rows.groupBy(_._5.get).toSeq.sortBy(_._1)
        .map { case (b, rs) => (b, rs.map(_._3).sum) }
      byBin.zipWithIndex.dropRight(1).foreach { case ((b, _), i) =>
        val prefix = byBin.take(i + 1).map(_._2).sum
        assert(prefix >= (b + 1) * t, s"$part bin $b prefix $prefix under target")
      }
      byBin.foreach { case (b, sz) =>
        assert(sz < 2 * t, s"$part bin $b overfull: $sz") }
    }
  }

  test("leakageAwareSplit keeps every near-dup cluster in one split") {
    val d = docs.select(col("doc_id"), col("text"))
    val corpus = d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 5000L).as("doc_id"), col("text")))
    val fp = corpus.select(col("doc_id"), md5(col("text").cast("binary")).as("fp"))
    val pairs = fp.as("a").join(fp.as("b"), "fp")
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"))
    val splits = Seq(("train", 80), ("val", 10), ("test", 10))
    val out = Curate.leakageAwareSplit(corpus, col("doc_id"), pairs, splits)
      .cache()
    // no component straddles splits
    val mixed = out.groupBy("rep")
      .agg(countDistinct(col("split")).as("ns"))
      .filter(col("ns") > 1).count()
    assert(mixed == 0L)
    val bySplit = out.select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    // every planted dup follows its original — even when the original's
    // own hash would have sent the copy elsewhere
    bySplit.keys.filter(_ >= 5000L).foreach { dup =>
      assert(bySplit(dup) == bySplit(dup - 5000L), s"dup $dup strayed") }
    // singletons keep the plain hashSplit verdict (rep == self)
    val plain = Curate.hashSplit(corpus, col("doc_id"), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    bySplit.keys.filter(id => id < 5000L && id % 10 != 0).foreach { id =>
      assert(bySplit(id) == plain(id), s"singleton $id diverged") }
    out.unpersist()
  }

  test("budgetTrim equals the global claim-what-fits rule, mid-bucket cut included") {
    // priorities collide heavily so the cut lands inside a bucket and the
    // per-bucket window must reproduce global doc_id tiebreaking
    val rows = (1L to 50L).map(id => (id, (id % 5) * 10L, 7L))
    val df = rows.toDF("id", "pri", "cost")
    val budget = 100L
    // brute force: global (pri desc, id asc) prefix
    val expect = rows.sortBy { case (id, p, _) => (-p, id) }
      .scanLeft((0L, 0L, 0L, 0L)) { case ((_, _, _, cum), (id, p, c)) =>
        (id, p, c, cum + c) }
      .tail.filter { case (_, _, c, cumAfter) => cumAfter - c < budget }
      .map(_._1).toSet
    val got = graft.operators.Curate.budgetTrim(
        df, col("id"), col("pri"), col("cost"), budget)
      .select("id").as[Long].collect().toSet
    assert(got == expect, s"got $got expect $expect")
    // last kept row may overshoot, but claimed-before is always < budget
    val before = graft.operators.Curate.budgetTrim(
        df, col("id"), col("pri"), col("cost"), budget)
      .agg(max("cost_before")).as[Long].head()
    assert(before < budget)
  }

  test("mixToBudget hits every source target exactly, up- and downsampling") {
    val weights = Seq("src0" -> 1L, "src1" -> 1L, "src2" -> 8L)
    val out = Curate.mixToBudget(docs, "source", col("doc_id"),
      weights, budget = 100L, shards = 16).cache()
    val bySource = out.groupBy("source")
      .agg(count(lit(1)).as("n"), sum(col("copies")).as("tot"))
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    // targets: (wt*100) div 10 → src0=10, src1=10, src2=80
    assert(bySource("src0")._2 == 10L)
    assert(bySource("src1")._2 == 10L)
    assert(bySource("src2")._2 == 80L)
    // unweighted sources are dropped entirely
    assert(bySource.keySet == Set("src0", "src1", "src2"))
    val avail = docs.filter(col("source") === "src2").count()
    if (avail < 80) // upsampled source: every doc present, copies ≥ 1
      assert(bySource("src2")._1 == avail)
    out.unpersist()
  }

  test("mixToBudget is partition- and shard-count-invariant per rank order") {
    val weights = Seq("src0" -> 1L, "src3" -> 3L)
    def run(df: org.apache.spark.sql.DataFrame, shards: Int) =
      Curate.mixToBudget(df, "source", col("doc_id"), weights, 40L, shards)
        .select("source", "doc_id", "copies")
        .as[(String, Long, Long)].collect().toSet
    // same shard count, different partitioning → identical dataset
    assert(run(docs.repartition(13), 16) == run(docs.repartition(2), 16))
    // different shard count → same per-source totals (order differs)
    val a = run(docs, 16).groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val b = run(docs, 64).groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    assert(a == b)
  }

  test("packSequences invariants: offsets bounded, shard layout contiguous") {
    val packed = Curate.packSequences(docs, "doc_id",
      size(graft.functions.Portable.tokens(col("text"))), 2048L, 4).cache()
    assert(packed.filter(col("bin_offset") >= 2048L || col("bin_offset") < 0).count() == 0)
    assert(packed.count() == docs.count())
    // within a shard, walking ids in order, offsets advance by n_tok mod capacity
    val rows = packed.orderBy("shard", "doc_id")
      .select("shard", "bin", "bin_offset", "n_tok")
      .as[(Long, Long, Long, Long)].collect()
    rows.groupBy(_._1).foreach { case (shard, rs) =>
      var cum = 0L
      rs.foreach { case (_, bin, off, n) =>
        assert(off == cum % 2048L, s"shard $shard")
        assert(bin == shard * 1000000L + cum / 2048L, s"shard $shard")
        cum += n
      }
    }
    packed.unpersist()
  }

  test("sqrtBalancedQuota: tail gets more than proportional, head less; budget respected") {
    // head stratum 400 rows, tail stratum 25 rows, budget 100
    val df = ((1L to 400L).map(i => ("head", i)) ++
      (1L to 25L).map(i => ("tail", 1000L + i))).toDF("lang", "id")
    val out = Curate.sqrtBalancedQuota(df, Seq("lang"), col("id"), budget = 100L)
      .as[(String, Long, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    val headQ = byLang("head").head._3
    val tailQ = byLang("tail").head._3
    // w = isqrt: 20 and 5 → quotas 80 and 20
    assert(headQ == 80L && tailQ == 20L, s"quotas $headQ/$tailQ")
    // selection honors the quota exactly (strata are larger than quotas)
    assert(byLang("head").length == 80 && byLang("tail").length == 20)
    // proportional would give tail (25/425)·100 ≈ 5 — sqrt gives it 4×
    assert(tailQ > 100L * 25L / 425L)
    // selected ids are the smallest hashes — deterministic across runs
    val again = Curate.sqrtBalancedQuota(df, Seq("lang"), col("id"), budget = 100L)
      .as[(String, Long, Long, Long)].collect().toSet
    assert(again == out.toSet)
  }

  test("epochShuffle: each epoch is a full permutation, epochs reorder, positions dense") {
    val docs = (1L to 200L).toDF("id")
    val out = Curate.epochShuffle(docs, col("id"), epochs = 2, shards = 4)
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == 400)
    // every key appears exactly once per epoch
    (0L to 1L).foreach { e =>
      assert(out.filter(_._1 == e).map(_._4).toSet.size == 200, s"epoch $e")
    }
    // positions are dense 0..n-1 within each (epoch, shard)
    out.groupBy(r => (r._1, r._2)).foreach { case ((e, sh), rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"epoch $e shard $sh")
    }
    // the two epochs produce different orders (some key changes shard or pos)
    val coord = out.map(r => (r._1, r._4) -> (r._2, r._3)).toMap
    assert((1L to 200L).exists(k =>
      coord((0L, k.toString)) != coord((1L, k.toString))))
    // shards are roughly balanced: no shard holds more than half an epoch
    out.groupBy(r => (r._1, r._2)).values.foreach(rows =>
      assert(rows.length < 100, s"skewed shard: ${rows.length}"))
  }

  test("packingReport: decile accounting is exact; totals cover every doc") {
    val packed = Curate.packSequences(docs, "doc_id",
      size(graft.functions.Portable.tokens(col("text"))),
      capacity = 2048L, shards = 8)
    val rep = Curate.packingReport(packed, 2048L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(rep.forall(r => r._1 >= 0 && r._1 <= 10))
    // every document and token lands in exactly one bin
    val nDocs = docs.count()
    val nTok = packed.agg(sum(col("n_tok"))).as[Long].head()
    assert(rep.map(_._3).sum == nDocs)
    assert(rep.map(_._4).sum == nTok)
    // hand case: two docs of 3 tokens in one shard, capacity 4 -> the
    // second doc STARTS in bin 0 (cum_before=3 < 4) so bin 0 overfills
    // to 6 tokens (decile 10) — the straddle contract
    val tiny = Seq((1L, "a b c"), (2L, "d e f")).toDF("doc_id", "text")
    val tp = Curate.packSequences(tiny, "doc_id",
      size(graft.functions.Portable.tokens(col("text"))),
      capacity = 4L, shards = 1)
    val tr = Curate.packingReport(tp, 4L)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(tr == Seq((10L, 1L, 2L, 6L)), s"got $tr")
  }

  test("dropAudit: gate priority quality > exact_dup > contaminated > pass") {
    val good = "the cat and the dog walked to a house in town today ok fine"
    val bench = "a quick brown fox jumps over the lazy dog of the town in time"
    val corpus = Seq(
      (1L, good),        // pass (owner of its dup family)
      (2L, good),        // exact_dup of doc 1
      (3L, "x y z"),     // quality: too few tokens
      (4L, bench),       // contaminated (matches the benchmark set)
      (5L, "1 2 3 4 5 6 7 8 9 10 11 12")  // quality: all digits
    ).toDF("doc_id", "text")
    val out = Curate.dropAudit(corpus, "doc_id", "text",
        Seq(bench).toDF("text"), minGopher = 4)
      .orderBy("id").as[(Long, Long, String)].collect().toSeq
    assert(out.map(r => r._1 -> r._3) == Seq(1L -> "pass", 2L -> "exact_dup",
      3L -> "quality", 4L -> "contaminated", 5L -> "quality"), s"got $out")
    // a benchmark doc that ALSO fails quality reports quality (priority)
    val out2 = Curate.dropAudit(corpus, "doc_id", "text",
        Seq("x y z").toDF("text"), minGopher = 4)
      .orderBy("id").as[(Long, Long, String)].collect().toSeq
    assert(out2.find(_._1 == 3L).get._3 == "quality")
  }
}
