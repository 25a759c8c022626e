package graft

import org.apache.spark.sql.functions._
import graft.operators.Cluster

class ClusterSpec extends SparkSuite {
  import spark.implicits._

  test("kmeansLloyd separates two obvious blobs regardless of seeding") {
    // ids 1-4 near (0,0), ids 5-8 near (10,10); seeds are ids 1 and 2 —
    // both in the same blob — so only the distributed UPDATE step can
    // migrate a centroid across
    val df = Seq(
      (1L, Array(0.0f, 0.1f)), (2L, Array(0.1f, 0.0f)),
      (3L, Array(0.0f, 0.0f)), (4L, Array(0.1f, 0.1f)),
      (5L, Array(10.0f, 10.1f)), (6L, Array(10.1f, 10.0f)),
      (7L, Array(10.0f, 10.0f)), (8L, Array(10.1f, 10.1f)))
      .toDF("id", "v")
    val out = Cluster.kmeansLloyd(df, "id", "v", k = 2, iters = 4)
      .select("id", "cluster").as[(Long, Int)].collect().toMap
    assert(Set(1L, 2L, 3L, 4L).map(out) != Set(0, 1),
      "blob A split across clusters: " + out)
    assert(out(1L) != out(5L), "blobs merged: " + out)
    assert(Set(5L, 6L, 7L, 8L).map(out).size == 1)
  }

  test("identical vectors share a cluster; dist is exact integer 0") {
    val df = Seq(
      (1L, Array(0.25f, -0.25f)), (2L, Array(0.25f, -0.25f)),
      (3L, Array(-0.4f, 0.4f)))
      .toDF("id", "v")
    val rows = Cluster.kmeansLloyd(df, "id", "v", k = 2, iters = 2)
      .orderBy("id").as[(Long, Int, Long)].collect()
    assert(rows(0)._2 == rows(1)._2)
    assert(rows(0)._3 == 0L && rows(1)._3 == 0L)
  }

  test("kmeansLloyd is deterministic across runs and partitionings") {
    val e = Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = Cluster.kmeansLloyd(e, "vec_id", "embedding", k = 4, iters = 2)
      .orderBy("id").collect().toSeq
    val b = Cluster.kmeansLloyd(e.repartition(7), "vec_id", "embedding",
        k = 4, iters = 2)
      .orderBy("id").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }
}
