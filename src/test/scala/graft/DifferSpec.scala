package graft

import graft.engine.Differ

/** DataFrame-level diff operator (typed/native mode). */
class DifferSpec extends SparkSuite {
  import spark.implicits._

  test("diff classifies INSERT/UPDATE/DELETE with null-safe comparison") {
    val prod = Seq((1, Some("a")), (2, Some("b")), (4, None: Option[String]))
      .toDF("id", "v")
    val backup = Seq((1, Some("a")), (2, Some("B")), (3, Some("c")))
      .toDF("id", "v")
    val got = Differ.diffOps(prod, backup, Seq("id"))
      .collect().map(r => (r.getInt(0), r.getString(1))).toSet
    assert(got == Set((4, "INSERT"), (2, "UPDATE"), (3, "DELETE")))
  }

  test("null == null is not an UPDATE (reference NULL semantics)") {
    val prod = Seq((1, None: Option[String])).toDF("id", "v")
    val backup = Seq((1, None: Option[String])).toDF("id", "v")
    assert(Differ.diffOps(prod, backup, Seq("id")).count() == 0)
  }

  test("composite key diff") {
    val prod = Seq((1, 1, "x"), (1, 2, "y")).toDF("a", "b", "v")
    val backup = Seq((1, 1, "x"), (1, 2, "z"), (2, 1, "w")).toDF("a", "b", "v")
    val got = Differ.diffOps(prod, backup, Seq("a", "b"))
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getString(2))).toSet
    assert(got == Set(((1, 2), "UPDATE"), ((2, 1), "DELETE")))
  }

  test("catalogDiff: CREATE and DROP sets") {
    val p = Seq("a", "b").toDF("table")
    val b = Seq("b", "c").toDF("table")
    val got = Differ.catalogDiff(p, b).collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(got == Set(("a", "CREATE"), ("c", "DROP")))
  }
}
