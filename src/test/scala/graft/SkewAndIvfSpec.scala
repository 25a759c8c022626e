package graft

import org.apache.spark.sql.functions._

import graft.operators.{Similarity, Skew}

class SkewAndIvfSpec extends SparkSuite {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("salted count/sum aggregation matches plain aggregation") {
    val li = Tables.lineitem(spark, dir)
      .withColumn("qty_c", round(col("l_quantity") * 100).cast("long"))
    val plain = li.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"), sum(col("qty_c")).as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Skew.saltedCountSum(li, Seq("l_returnflag"), Some("qty_c"))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("salted join matches plain join, hot key split across salts") {
    val fact = Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("k"), col("l_quantity"))
    val dim = Tables.supplier(spark, dir)
      .select(col("s_suppkey").as("k"), col("s_name"))
    val plain = fact.join(dim, "k").count()
    assert(Skew.saltedJoin(fact, dim, "k").count() == plain)
  }

  test("ivf top-k achieves >=80% recall@5 and returns only true base rows") {
    val e = Tables.embeddings(spark, dir)
    val q = e.filter(col("vec_id") < 20)
    val brute = Similarity.cosineTopK(e, q, "vec_id", "embedding", 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = Similarity.ivfTopK(e, q, "vec_id", "embedding", 5,
      nlist = 16, nprobe = 8)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val recall = (ivf & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"recall=$recall")
  }
}
