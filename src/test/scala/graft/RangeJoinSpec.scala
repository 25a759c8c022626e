package graft

import org.apache.spark.sql.functions._
import graft.operators.RangeJoin

class RangeJoinSpec extends SparkSuite {
  import spark.implicits._

  private def pts(xs: (Long, Long)*) = xs.toDF("pid", "pt")
  private def ivs(xs: (Long, Long, Long)*) = xs.toDF("iid", "s", "e")

  private def pairs(p: org.apache.spark.sql.DataFrame,
      i: org.apache.spark.sql.DataFrame, w: Long): Set[(Long, Long)] =
    RangeJoin.pointInInterval(p, "pt", i, "s", "e", w)
      .select("pid", "iid").as[(Long, Long)].collect().toSet

  test("bounds are inclusive on both ends") {
    val p = pts((1L, 100L), (2L, 200L), (3L, 99L), (4L, 201L))
    val i = ivs((10L, 100L, 200L))
    assert(pairs(p, i, 50L) == Set((1L, 10L), (2L, 10L)))
  }

  test("intervals spanning many buckets match points in every bucket, once") {
    // interval covers buckets 0..10 at width 10; points inside land in
    // different buckets; each (point, interval) pair must appear exactly once
    val p = pts((1L, 5L), (2L, 55L), (3L, 99L), (4L, 105L))
    val i = ivs((20L, 3L, 101L))
    val out = RangeJoin.pointInInterval(pts((1L, 5L), (2L, 55L), (3L, 99L)),
      "pt", i, "s", "e", 10L)
    assert(out.count() == out.select("pid", "iid").distinct().count())
    assert(pairs(p, i, 10L) == Set((1L, 20L), (2L, 20L), (3L, 20L)))
  }

  test("overlapping intervals each claim the shared points") {
    val p = pts((1L, 50L))
    val i = ivs((30L, 0L, 60L), (31L, 40L, 100L), (32L, 51L, 99L))
    assert(pairs(p, i, 7L) == Set((1L, 30L), (1L, 31L)))
  }

  test("intervalOverlap: touching endpoints overlap; disjoint do not; pairs unique") {
    val a = Seq((1L, 0L, 10L), (2L, 50L, 60L), (3L, 100L, 200L))
      .toDF("ida", "sa", "ea")
    val b = Seq((7L, 10L, 20L), (8L, 61L, 70L), (9L, 150L, 160L),
      (10L, 0L, 300L)).toDF("idb", "sb", "eb")
    val out = RangeJoin.intervalOverlap(a, "sa", "ea", b, "sb", "eb", 7L)
    assert(out.count() == out.select("ida", "idb").distinct().count())
    val pairs = out.select("ida", "idb").as[(Long, Long)].collect().toSet
    // (1,7): touch at 10 → overlap; (2,8): gap of 1 → none; (3,9): nested;
    // (10): spans everything → overlaps all three
    assert(pairs == Set((1L, 7L), (3L, 9L), (1L, 10L), (2L, 10L), (3L, 10L)))
  }

  test("bucket width much larger than spans still correct") {
    val p = pts((1L, 50L), (2L, 5000L))
    val i = ivs((40L, 40L, 60L), (41L, 4999L, 5001L))
    assert(pairs(p, i, 1000000L) == Set((1L, 40L), (2L, 41L)))
  }
}
