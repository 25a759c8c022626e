package graft

import graft.engine.Scd

/** SCD-2 validity runs from stacked snapshot versions: updates split
  * runs, deletes close them, reinserts open fresh ones, and untouched
  * rows collapse to a single [first, null) run.
  */
class ScdSpec extends SparkSuite {
  import spark.implicits._

  test("scd2 emits one run per unbroken value stretch") {
    // pk 1: constant across v0-v2           → one run [0, null)
    // pk 2: value changes at v1             → [0,1), [1,null)
    // pk 3: deleted at v1, reinserted at v2 → [0,1), [2,null)
    // pk 4: appears first at v2             → [2,null)
    val stacked = Seq(
      (0L, 1L, "a"), (1L, 1L, "a"), (2L, 1L, "a"),
      (0L, 2L, "x"), (1L, 2L, "y"), (2L, 2L, "y"),
      (0L, 3L, "d"), (2L, 3L, "d"),
      (2L, 4L, "n")
    ).toDF("ver", "pk", "v")
    val out = Scd.scd2(stacked, "ver", Seq("pk"), Seq("v"))
      .orderBy("pk", "ver_from")
      .as[(Long, String, Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, "a", 0L, None),
      (2L, "x", 0L, Some(1L)),
      (2L, "y", 1L, None),
      (3L, "d", 0L, Some(1L)),
      (3L, "d", 2L, None),
      (4L, "n", 2L, None)))
  }

  test("scd2 null values are tracked null-safely") {
    val stacked = Seq(
      (0L, 1L, Option.empty[String]), (1L, 1L, Some("v")), (2L, 1L, None)
    ).toDF("ver", "pk", "v")
    val out = Scd.scd2(stacked, "ver", Seq("pk"), Seq("v"))
      .orderBy("ver_from")
      .as[(Long, Option[String], Long, Option[Long])].collect().toSeq
    assert(out == Seq(
      (1L, None, 0L, Some(1L)),
      (1L, Some("v"), 1L, Some(2L)),
      (1L, None, 2L, None)))
  }
}
