package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.operators.AsOf
import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{AsOfMatch, ProbeRow, RefRow}

/** Streaming as-of join: watermark-correct nearest-predecessor matching —
  * the stream output must equal the batch AsOf.joinAsOf on the same rows,
  * including under out-of-order arrival across micro-batches.
  */
class StreamingAsOfSpec extends SparkSuite {
  import spark.implicits._

  private def ts(minutes: Long) = new Timestamp(60000L * minutes)

  test("streaming as-of equals batch joinAsOf, out-of-order within the watermark") {
    implicit val s: org.apache.spark.sql.SparkSession = spark
    val refs = Seq(
      RefRow("a", ts(1), "r1"), RefRow("a", ts(5), "r5"), RefRow("a", ts(3), "r3"),
      RefRow("b", ts(2), "s2"), RefRow("b", ts(8), "s8"))
    val probes = Seq(
      ProbeRow("a", ts(2), 1), ProbeRow("a", ts(5), 2), ProbeRow("a", ts(4), 3),
      ProbeRow("b", ts(1), 4), ProbeRow("b", ts(9), 5), ProbeRow("c", ts(3), 6))

    val pIn = MemoryStream[ProbeRow](spark)
    val rIn = MemoryStream[RefRow](spark)
    // delay must cover the test's max out-of-orderness: batch 1 reaches
    // event time 9:00, batch 2 still delivers rows from 1:00
    val q = StreamingAsOf.asOfStream(pIn.toDS(), rIn.toDS(), delay = "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("asof_out").start()
    try {
      // batch 1: part of each side, deliberately not time-ordered
      rIn.addData(RefRow("a", ts(5), "r5"), RefRow("b", ts(2), "s2"))
      pIn.addData(ProbeRow("a", ts(2), 1), ProbeRow("b", ts(9), 5))
      q.processAllAvailable()
      // batch 2: late rows still inside the 10-minute watermark delay,
      // plus the rest
      rIn.addData(RefRow("a", ts(1), "r1"), RefRow("a", ts(3), "r3"),
        RefRow("b", ts(8), "s8"))
      pIn.addData(ProbeRow("a", ts(5), 2), ProbeRow("a", ts(4), 3),
        ProbeRow("b", ts(1), 4), ProbeRow("c", ts(3), 6))
      q.processAllAvailable()
      // sentinels: push the watermark far past every real row so all
      // pending probes drain (sentinel probe itself stays pending)
      rIn.addData(RefRow("zz", ts(1000), "flush"))
      pIn.addData(ProbeRow("zz", ts(1000), -1))
      q.processAllAvailable()
      // one more advance so EventTimeTimeout fires for quiet keys
      rIn.addData(RefRow("zz", ts(2000), "flush2"))
      pIn.addData(ProbeRow("zz", ts(2000), -2))
      q.processAllAvailable()

      val got = spark.table("asof_out").as[AsOfMatch].collect()
        .filter(_.id >= 0).sortBy(_.id)

      val expected = AsOf.joinAsOf(
          probes.toDF(), refs.toDF(), Seq("key"), "ts")
        .select(col("id"), col("key"), col("ts"),
          col("asof.ts").as("refTs"), col("asof.value").as("refValue"))
        .as[(Long, String, Timestamp, Option[Timestamp], Option[String])]
        .collect().sortBy(_._1)
        .map(e => AsOfMatch(e._2, e._1, e._3, e._4, e._5))

      assert(got.toSeq == expected.toSeq,
        s"stream=${got.mkString(";")} batch=${expected.mkString(";")}")
      // sanity on the semantics themselves
      val m1 = got.find(_.id == 1).get   // probe a@2 → ref a@1
      assert(m1.refValue.contains("r1"))
      val m2 = got.find(_.id == 2).get   // probe a@5 → ref a@5 (inclusive)
      assert(m2.refValue.contains("r5"))
      val m6 = got.find(_.id == 6).get   // key c: no refs → left-outer null
      assert(m6.refValue.isEmpty && m6.refTs.isEmpty)
    } finally q.stop()
  }
}
