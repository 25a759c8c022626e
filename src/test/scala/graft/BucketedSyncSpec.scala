package graft

import java.nio.file.Files

import graft.engine.{BucketedSync, SyncJob}

/** The bucketed fast-path must classify identically to the streaming
  * sync core AND plan its diff join without a single shuffle exchange.
  */
class BucketedSyncSpec extends SparkSuite {

  private def tmpFile(text: String): String = {
    val p = Files.createTempFile("bsync", ".sql")
    Files.write(p, text.getBytes("UTF-8"))
    p.toString
  }

  private val ddl =
    """CREATE TABLE `t` (
      |  `id` INT(11),
      |  `s` VARCHAR(255),
      |  PRIMARY KEY (`id`)
      |) ENGINE=InnoDB;
      |CREATE TABLE `u` (
      |  `id` INT(11),
      |  `v` BIGINT,
      |  PRIMARY KEY (`id`)
      |) ENGINE=InnoDB;
      |""".stripMargin

  private val prod = ddl +
    "INSERT INTO `t` (`id`, `s`) VALUES\n(1, 'a'),\n(2, 'b'),\n(4, 'new');\n" +
    "INSERT INTO `u` (`id`, `v`) VALUES\n(1, 10),\n(2, 20);\n"
  private val backup = ddl +
    "INSERT INTO `t` (`id`, `s`) VALUES\n(1, 'a'),\n(2, 'CHANGED'),\n(3, 'gone');\n" +
    "INSERT INTO `u` (`id`, `v`) VALUES\n(1, 10),\n(2, 99);\n"

  test("bucketed diff matches SyncJob.run op-for-op and plans exchange-free") {
    val (pf, bf) = (tmpFile(prod), tmpFile(backup))
    BucketedSync.snapshot(spark, pf, "bsync_prod", buckets = 4)
    BucketedSync.snapshot(spark, bf, "bsync_backup", buckets = 4)
    val diff = BucketedSync.diff(spark, "bsync_prod", "bsync_backup")

    val plan = diff.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"diff plan has a shuffle:\n$plan")

    val got = diff.select("table", "pk", "op").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    val ref = new SyncJob(spark).run(pf, bf).ops
      .map(o => (o.table, o.pk, o.op)).toSet
    assert(got == ref)
    assert(got == Set(
      ("t", "2", "UPDATE"), ("t", "3", "DELETE"), ("t", "4", "INSERT"),
      ("u", "2", "UPDATE")))
  }

  test("diffChanged skips unchanged tables yet matches the full diff op-for-op") {
    // t differs between the dumps, u is identical — the digest pre-filter
    // must name ONLY t, and the filtered rediff must still equal diff
    val prod2 = ddl +
      "INSERT INTO `t` (`id`, `s`) VALUES\n(1, 'a'),\n(2, 'b');\n" +
      "INSERT INTO `u` (`id`, `v`) VALUES\n(1, 10),\n(2, 20);\n"
    val backup2 = ddl +
      "INSERT INTO `t` (`id`, `s`) VALUES\n(1, 'a'),\n(2, 'OLD');\n" +
      "INSERT INTO `u` (`id`, `v`) VALUES\n(1, 10),\n(2, 20);\n"
    val (pf, bf) = (tmpFile(prod2), tmpFile(backup2))
    BucketedSync.snapshot(spark, pf, "bsync_ch_prod", buckets = 4)
    BucketedSync.snapshot(spark, bf, "bsync_ch_backup", buckets = 4)
    val fast = BucketedSync.diffChanged(spark, "bsync_ch_prod", "bsync_ch_backup")
    val full = BucketedSync.diff(spark, "bsync_ch_prod", "bsync_ch_backup")
    def ops(df: org.apache.spark.sql.DataFrame) =
      df.select("table", "pk", "op").collect()
        .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    assert(ops(fast) == ops(full))
    assert(ops(fast) == Set(("t", "2", "UPDATE")))
    // the pre-filter restricted the rediff to t: u never enters the scan
    val plan = fast.queryExecution.executedPlan.toString
    assert(plan.contains("table#") || plan.contains("isnotnull"),
      "sanity: plan rendered")
    assert(!plan.contains("Exchange"),
      s"filtered rediff lost the exchange-free plan:\n$plan")
  }

  test("tables present in only one snapshot yield NO row ops (DDL concern)") {
    val extraDdl =
      """CREATE TABLE `w` (
        |  `id` INT(11),
        |  `x` BIGINT,
        |  PRIMARY KEY (`id`)
        |) ENGINE=InnoDB;
        |""".stripMargin
    val prod2 = prod + extraDdl +
      "INSERT INTO `w` (`id`, `x`) VALUES\n(1, 7),\n(2, 8);\n"
    val (pf, bf) = (tmpFile(prod2), tmpFile(backup))
    BucketedSync.snapshot(spark, pf, "bsync_prod2", buckets = 4)
    BucketedSync.snapshot(spark, bf, "bsync_backup2", buckets = 4)
    val got = BucketedSync.diff(spark, "bsync_prod2", "bsync_backup2")
      .select("table", "pk", "op").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSet
    // `w` exists only in prod: CREATE-section territory, zero row ops —
    // exactly how SyncJob classifies it
    assert(!got.exists(_._1 == "w"))
    val ref = new SyncJob(spark).run(pf, bf).ops
      .map(o => (o.table, o.pk, o.op)).toSet
    assert(got == ref)
  }
}
