package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.Ivm

/** Incremental view maintenance == direct recompute, across every delta
  * shape: inserts, deletes, value updates, group-migrating updates,
  * whole-group disappearance, and null values.
  */
class IvmSpec extends SparkSuite {
  import spark.implicits._

  private def direct(t: DataFrame) =
    t.groupBy(col("g2").as("g"))
      .agg(count(lit(1)).as("n"), sum(col("v").cast("long")).as("s"))

  private def maintained(oldT: DataFrame, newT: DataFrame) =
    Ivm.maintainedAgg(oldT, newT, Seq("pk"), col("g2"), col("v"))

  private def assertSame(oldT: DataFrame, newT: DataFrame): Unit = {
    val m = maintained(oldT, newT).orderBy("g")
      .as[(String, Long, Option[Long])].collect().toSeq
    val d = direct(newT).orderBy("g")
      .as[(String, Long, Option[Long])].collect().toSeq
    assert(m == d)
  }

  test("maintenance equals recompute for inserts, deletes, and updates") {
    val oldT = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L), (4L, "c", 40L)
    ).toDF("pk", "g2", "v")
    val newT = Seq(
      (1L, "a", 10L),  // unchanged
      (2L, "a", 25L),  // value update
      (3L, "c", 30L),  // group migration b → c (b disappears entirely)
      (5L, "d", 50L)   // insert into a new group; pk 4 deleted
    ).toDF("pk", "g2", "v")
    assertSame(oldT, newT)
    // group b is gone from the maintained view, not left with n=0
    val groups = maintained(oldT, newT).select("g").as[String].collect()
    assert(!groups.contains("b"))
  }

  test("null values maintain exactly (count moves, sum ignores nulls)") {
    val oldT = Seq((1L, "a", Some(10L)), (2L, "a", None))
      .toDF("pk", "g2", "v")
    val newT = Seq((1L, "a", None), (2L, "a", Some(7L)), (3L, "a", None))
      .toDF("pk", "g2", "v")
    assertSame(oldT, newT)
  }

  test("empty delta leaves the view bit-identical") {
    val t = Seq((1L, "a", 10L), (2L, "b", 20L)).toDF("pk", "g2", "v")
    val delta = Ivm.aggDeltas(t, t, Seq("pk"), col("g2"), col("v"))
    assert(delta.count() == 0) // unchanged rows filtered before shuffle
    assertSame(t, t)
  }

  test("delta frame is O(changed rows), two contributions per update") {
    val oldT = (1L to 100L).map(i => (i, s"g${i % 5}", i)).toDF("pk", "g2", "v")
    val newT = (1L to 100L)
      .map(i => (i, s"g${i % 5}", if (i <= 3) i + 1000 else i))
      .toDF("pk", "g2", "v")
    val delta = Ivm.aggDeltas(oldT, newT, Seq("pk"), col("g2"), col("v"))
    assert(delta.count() == 6) // 3 updates × (remove + add)
    assertSame(oldT, newT)
  }
}
