package graft

import org.apache.spark.sql.functions._

import graft.operators.Quality

/** Data-quality rules: one-scan multi-rule counting, null-hostile
  * predicate semantics, referential orphan counts.
  */
class QualitySpec extends SparkSuite {
  import spark.implicits._

  test("checkRules counts violations per rule in one aggregate, nulls violate") {
    val df = Seq(
      (1L, Some(5.0)), (2L, Some(-1.0)), (3L, None), (4L, Some(2.0))
    ).toDF("id", "v")
    val out = Quality.checkRules(df, Seq(
        "v_positive" -> (col("v") > 0.0),
        "id_small" -> (col("id") <= 3L)))
      .orderBy("rule")
      .as[(String, Long, Long, Double)].collect().toSeq
    // v_positive: -1.0 violates, null violates → 2; id_small: id=4 → 1
    assert(out == Seq(
      ("id_small", 4L, 1L, 0.25),
      ("v_positive", 4L, 2L, 0.5)))
  }

  test("checkReferential counts orphan fact rows") {
    val fact = Seq((1L, "a"), (2L, "b"), (2L, "c"), (9L, "d")).toDF("k", "x")
    val dim = Seq(1L, 2L).toDF("dk")
    val out = Quality.checkReferential("fk", fact, col("k"), dim, col("dk"))
      .as[(String, Long, Long, Double)].head()
    assert(out == (("fk", 4L, 1L, 0.25)))
  }
}
