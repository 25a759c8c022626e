package graft

import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.{Sketches, TextOps}

/** The native codegen'd hash expressions must agree exactly with the
  * composed built-in formulations they replace — on real corpus data and
  * on edge inputs (empty strings, unicode, nulls).
  */
class NativeHashesSpec extends SparkSuite {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("Hash48 matches the md5/substring/conv chain on document tokens") {
    val toks = Tables.documents(spark, sf)
      .select(explode(Portable.tokens(col("text"))).as("t"))
    val diff = toks.select(
        Portable.hash48(col("t")).as("fast"),
        Portable.hash48Chain(col("t")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("Hash48 edge inputs: empty, unicode, null") {
    val df = Seq(Some(""), Some("héllo wörld ✓"), Some("a"), None)
      .toDF("s")
    val rows = df.select(
      Portable.hash48(col("s")).as("fast"),
      Portable.hash48Chain(col("s")).as("ref")).collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getLong(0) == r.getLong(1))
    }
  }

  test("RollingHash matches the aggregate(split(...)) fold on documents") {
    val diff = Tables.documents(spark, sf)
      .select(
        TextOps.rollingHash(col("text")).as("fast"),
        TextOps.rollingHashHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(diff.count() == 0)
  }

  test("RollingHash edge inputs match the HOF form") {
    val df = Seq(Some(""), Some("a"), Some("ab"), Some("héllo ✓ wörld"), None)
      .toDF("s")
    val rows = df.select(
      TextOps.rollingHash(col("s")).as("fast"),
      TextOps.rollingHashHof(col("s")).as("ref")).collect()
    rows.foreach { r =>
      if (r.isNullAt(1)) assert(r.isNullAt(0))
      else assert(r.getLong(0) == r.getLong(1), s"row $r")
    }
  }

  test("GraftExtensions exposes hash48 and rolling_hash to plain SQL") {
    val s2 = org.apache.spark.sql.graft.Bridge.sessionWithExtensions(
      spark.sparkContext, new GraftExtensions()(_))
    val r = s2.sql(
      """SELECT hash48('abc') AS h, rolling_hash('abc') AS rh,
        |  rolling_hash('abc', 131, 1000000007) AS rh2""".stripMargin)
      .collect().head
    val exp = spark.sql("SELECT 'abc' AS s")
      .select(Portable.hash48(col("s")), TextOps.rollingHash(col("s")))
      .collect().head
    assert(r.getLong(0) == exp.getLong(0))
    assert(r.getLong(1) == exp.getLong(1))
    assert(r.getLong(2) == exp.getLong(1))
    val n = s2.sql("SELECT nfc_normalize('café') AS a").collect().head
    assert(n.getString(0) == "café", "SQL nfc must compose e+U+0301")
    val fl = s2.sql(
      "SELECT floor_log2(1024L) AS a, floor_log2(0L) AS b").collect().head
    assert(fl.getInt(0) == 10 && fl.getInt(1) == 0)
  }

  test("NfcNormalize composes decomposed forms, keeps NFC text byte-identical") {
    import graft.functions.NfcNormalize
    val df = Seq(
      (1L, "café île"),   // decomposed é, î
      (2L, "café île"),     // precomposed
      (3L, "plain ascii"),
      (4L, "")).toDF("id", "t")
      .select(col("id"), NfcNormalize(col("t")).as("n"), col("t"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (r.getString(1), r.getString(2))).toMap
    assert(rows(1L)._1 == rows(2L)._1, "NFC must unify both spellings")
    assert(rows(2L)._1 == rows(2L)._2, "already-NFC text unchanged")
    assert(rows(3L)._1 == "plain ascii" && rows(4L)._1 == "")
    // agrees with java.text.Normalizer on the decomposed row
    assert(rows(1L)._1 == java.text.Normalizer.normalize(
      rows(1L)._2, java.text.Normalizer.Form.NFC))
  }

  test("bounded min-k KMV estimates identical to the window formulation") {
    val li = Tables.lineitem(spark, sf)
    val fast = Sketches.kmvDistinct(li, Seq("l_returnflag"), col("l_partkey"), 64)
    val ref = Sketches.kmvDistinctViaWindow(
      li, Seq("l_returnflag"), col("l_partkey"), 64)
    val j = fast.withColumnRenamed("est_distinct", "a")
      .join(ref.withColumnRenamed("est_distinct", "b"), "l_returnflag")
    assert(j.count() == 3)
    assert(j.filter(col("a") =!= col("b")).count() == 0)
  }

  test("KMV sketches merge to EXACTLY the full-scan estimate") {
    val li = Tables.lineitem(spark, sf)
    val whole = Sketches.kmvDistinct(li, Seq("l_returnflag"), col("l_partkey"), 64)
    // shard the data arbitrarily, sketch each shard, merge the sketches
    val shardA = li.filter(col("l_orderkey") % 2 === 0)
    val shardB = li.filter(col("l_orderkey") % 2 =!= 0)
    val merged = Sketches.kmvMerge(
      Sketches.kmvSketch(shardA, Seq("l_returnflag"), col("l_partkey"), 64)
        .unionByName(
          Sketches.kmvSketch(shardB, Seq("l_returnflag"), col("l_partkey"), 64)),
      Seq("l_returnflag"), 64)
    val j = whole.withColumnRenamed("est_distinct", "a")
      .join(merged.withColumnRenamed("est_distinct", "b"), "l_returnflag")
    assert(j.count() == 3)
    assert(j.filter(col("a") =!= col("b")).count() == 0)
  }

  test("logHist sketch: shard merge == full scan; quantiles within the 1/16 relative bound") {
    val li = Tables.lineitem(spark, sf)
    val cents = round(col("l_extendedprice") * 100).cast("long")
    val whole = Sketches.logHistSketch(li, Seq("l_returnflag"), cents)
    val merged = Sketches.logHistMerge(
      Sketches.logHistSketch(li.filter(col("l_orderkey") % 2 === 0),
          Seq("l_returnflag"), cents)
        .unionByName(Sketches.logHistSketch(
          li.filter(col("l_orderkey") % 2 =!= 0), Seq("l_returnflag"), cents)),
      Seq("l_returnflag"))
    assert(whole.exceptAll(merged).count() == 0 &&
      merged.exceptAll(whole).count() == 0,
      "shard sketches must merge to exactly the full-scan sketch")
    // bucket count bounded by the value domain, not the row count
    assert(whole.count() <= 600 * 3)

    // every estimate brackets the exact percentile: est <= exact <= est*17/16
    val est = Sketches.logHistQuantiles(whole, Seq("l_returnflag"),
        Seq(50, 90, 99)).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val exact = li.select(col("l_returnflag").as("g"), cents.as("v"))
      .collect().groupBy(_.getString(0))
      .map { case (g, rows) =>
        val vs = rows.map(_.getLong(1)).sorted
        g -> Seq(50, 90, 99).map(p =>
          p -> vs((((vs.length.toLong * p) + 99) / 100 - 1).toInt.max(0))).toMap
      }
    for ((g, byP) <- exact; (p, ex) <- byP) {
      val e = est((g, p.toLong))
      assert(e <= ex && ex <= e + e / 16 + 1,
        s"$g p$p: est $e must bracket exact $ex within 1/16")
    }
  }

  test("kmvJaccardMatrix is EXACT below k and tracks true Jaccard above it") {
    // below k: sets {a,b,c} vs {b,c,d} vs {x} — exact cells
    val small = Seq(
      ("A", "a"), ("A", "b"), ("A", "c"),
      ("B", "b"), ("B", "c"), ("B", "d"),
      ("C", "x")).toDF("source", "v")
    val got = Sketches.kmvJaccardMatrix(small, "source", col("v"), k = 128)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got(("A", "B")) == (2L, 4L, 500000L), "J(A,B) = 2/4 exactly")
    assert(got(("A", "C")) == (0L, 4L, 0L))
    assert(got(("B", "C")) == (0L, 4L, 0L))

    // above k: 2000 vs 2000 values sharing 1000 → true J = 1/3; the
    // k=128 estimate must land within ±0.12 absolute (3+ sigma)
    val big = spark.range(2000).selectExpr("'P' AS source", "CAST(id AS STRING) AS v")
      .unionAll(spark.range(1000, 3000)
        .selectExpr("'Q' AS source", "CAST(id AS STRING) AS v"))
    val est = Sketches.kmvJaccardMatrix(big, "source", col("v"), k = 128)
      .collect().head.getLong(4) / 1e6
    assert(math.abs(est - 1.0 / 3.0) < 0.12, s"estimate $est vs 0.333")
    // determinism: rerun bit-identical
    val est2 = Sketches.kmvJaccardMatrix(big, "source", col("v"), k = 128)
      .collect().head.getLong(4) / 1e6
    assert(est == est2)
  }

  test("HLL register sketches merge to EXACTLY the full-scan estimate") {
    val li = Tables.lineitem(spark, sf)
    val whole = Sketches.hllDistinct(li, Seq("l_returnflag"), col("l_partkey"))
    val shardA = li.filter(col("l_orderkey") % 2 === 0)
    val shardB = li.filter(col("l_orderkey") % 2 =!= 0)
    val merged = Sketches.hllMerge(
      Sketches.hllSketch(shardA, Seq("l_returnflag"), col("l_partkey"))
        .unionByName(
          Sketches.hllSketch(shardB, Seq("l_returnflag"), col("l_partkey"))),
      Seq("l_returnflag"))
    val j = whole.withColumnRenamed("est_distinct", "a")
      .join(merged.withColumnRenamed("est_distinct", "b"), "l_returnflag")
    assert(j.count() == 3)
    assert(j.filter(col("a") =!= col("b")).count() == 0)
  }

  test("HLL estimate is duplicate-insensitive and inside the error band") {
    val n = 100000L
    val ids = spark.range(n).select(lit("g").as("g"), col("id"))
    val est = Sketches.hllDistinct(ids, Seq("g"), col("id"))
      .collect().head.getLong(1)
    // p=9 → relative standard error 1.04/√512 ≈ 4.6%; allow 3σ ≈ 14%
    assert(math.abs(est - n).toDouble / n < 0.14, s"est $est vs true $n")
    val doubled = Sketches.hllDistinct(
      ids.unionByName(ids), Seq("g"), col("id"))
      .collect().head.getLong(1)
    assert(doubled == est, "duplicates must not move the estimate")
  }

  test("min-k KMV exact-count branch for small groups (n_distinct < k)") {
    val small = Seq(("g", 1L), ("g", 2L), ("g", 2L), ("h", 9L)).toDF("g", "v")
    val got = Sketches.kmvDistinct(small, Seq("g"), col("v"), 64)
      .orderBy("g").collect()
    assert(got.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("g", 2.0), ("h", 1.0)))
  }

  test("FloorLog2Capped == the 39-term comparison sum on every edge and random Long") {
    import graft.functions.FloorLog2Capped
    val edges = Seq(Long.MinValue, -1L, 0L, 1L, 2L, 3L, 31L, 32L, 33L,
      (1L << 39) - 1, 1L << 39, (1L << 39) + 1, 1L << 40, Long.MaxValue)
    // deterministic pseudo-random longs (no Random: rerun-stable)
    val rnd = Iterator.iterate(0x9E3779B97F4A7C15L) { h =>
      var x = h; x ^= x << 13; x ^= x >>> 7; x ^= x << 17; x
    }.take(500).toSeq
    val df = (edges ++ rnd).toDF("v")
    val spec = (1 to 39)
      .map(k => when(col("v") >= lit(1L << k), lit(1)).otherwise(lit(0)))
      .reduce(_ + _)
    val bad = df.select(col("v"), FloorLog2Capped(col("v")).as("native"),
        spec.as("spec"))
      .filter(col("native") =!= col("spec"))
      .collect()
    assert(bad.isEmpty, s"diverged: ${bad.take(5).mkString(",")}")
    // interpreted eval path agrees with codegen (collect of a literal)
    val one = df.filter(col("v") === 32L)
      .select(FloorLog2Capped(col("v"))).as[Int].head()
    assert(one == 5)
  }
}
