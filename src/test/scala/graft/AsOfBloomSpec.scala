package graft

import org.apache.spark.sql.functions._

import graft.operators.{AsOf, Bloom}

/** Properties of the round-4 operators: the as-of join must agree with
  * the naive range-join + rank formulation (the executable definition of
  * "most recent right row at-or-before"), and the Bloom filter must have
  * zero false negatives with a sane false-positive rate.
  */
class AsOfBloomSpec extends SparkSuite {

  test("asof join matches the naive range-join formulation, incl. no-match rows") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L),
      (2L, 50L, 103L), (3L, 7L, 104L))
      .toDF("k", "ord", "lid")
    val right = Seq(
      (1L, 10L, 200L), (1L, 15L, 201L), (1L, 1L, 202L),
      (2L, 60L, 203L), (4L, 1L, 204L))
      .toDF("k", "ord", "rid")

    val got = AsOf.joinAsOf(left, right, Seq("k"), "ord")
      .select(col("lid"), col("asof.rid").as("rid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    // naive: all right rows with ord <= left.ord, keep the max (ord, rid)
    val naive = left.as("l")
      .join(right.as("r"), col("l.k") === col("r.k") &&
        col("r.ord") <= col("l.ord"), "left")
      .groupBy(col("l.lid"))
      .agg(max(struct(col("r.ord"), col("r.rid"))).as("m"))
      .select(col("lid"), col("m.rid"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap

    assert(got == naive)
    // spot values: equal ord matches (lid 100 -> rid 200, ord 10 <= 10);
    // lid 102 (ord 5) sees only ord 1; key 3 has no right rows at all
    assert(got(100L).contains(200L))
    assert(got(102L).contains(202L))
    assert(got(104L).isEmpty)
  }

  test("asof ties among right rows break deterministically (max right row)") {
    import spark.implicits._
    val left = Seq((1L, 10L, 100L)).toDF("k", "ord", "lid")
    val right = Seq((1L, 10L, 200L), (1L, 10L, 201L)).toDF("k", "ord", "rid")
    val got = AsOf.joinAsOf(left, right, Seq("k"), "ord")
      .select(col("asof.rid")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(201L)) // max struct (ord, rid) wins
  }

  test("bloom filter: no false negatives; false positives bounded") {
    import spark.implicits._
    val k = 5; val bits = 262144
    val members = (0 until 200).map(i => s"member_$i").toDF("v")
    val bloom = Bloom.build(members, col("v"), k, bits)

    val inHits = members.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom"), col("v"), k, bits))
      .count()
    assert(inHits == 200L, "a built value tested negative (impossible for a bloom filter)")

    val outsiders = (0 until 5000).map(i => s"outsider_$i").toDF("v")
    val fp = outsiders.crossJoin(broadcast(bloom))
      .filter(Bloom.mightContain(col("bloom"), col("v"), k, bits))
      .count()
    // 200 values * 5 hashes in 2^18 bits -> theoretical fp ~ (1000/262144)^5
    // ≈ 8e-13; anything beyond a stray handful means broken bit math
    assert(fp <= 2L, s"false-positive count $fp out of 5000 is way off design")
  }

  test("count-min estimates dominate true counts; absent keys estimate >= 0") {
    import spark.implicits._
    import graft.operators.Sketches
    val depth = 4; val width = 256
    val stream = (Seq.fill(50)("apple") ++ Seq.fill(20)("pear") ++
      (0 until 300).map(i => s"noise_$i")).toDF("k")
    val sketch = Sketches.countMin(stream, col("k"), depth, width)
    val est = Sketches.countMinEstimate(sketch,
        Seq("apple", "pear", "absent"), depth, width)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(est("apple") >= 50L) // CMS never underestimates
    assert(est("pear") >= 20L)
    assert(est("absent") >= 0L)
    // with 370 items in 4x256 cells, overestimates stay small
    assert(est("apple") <= 60L && est("pear") <= 30L && est("absent") <= 10L)
  }

  test("bloom word array is deterministic and position-set equivalent") {
    import spark.implicits._
    val k = 3; val bits = 256
    val vals = Seq("a", "b", "c").toDF("v")
    val words1 = Bloom.build(vals, col("v"), k, bits)
      .collect()(0).getSeq[Long](0)
    val words2 = Bloom.build(vals, col("v"), k, bits)
      .collect()(0).getSeq[Long](0)
    assert(words1 == words2)
    // reconstruct the set bits and compare against directly-computed positions
    val setBits = words1.zipWithIndex.flatMap { case (w, wi) =>
      (0 until 64).collect { case b if (w >> b & 1L) == 1L => wi * 64 + b }
    }.toSet
    val expected = vals.select(explode(Bloom.positions(col("v"), k, bits)))
      .collect().map(_.getInt(0)).toSet
    assert(setBits == expected)
  }
}
