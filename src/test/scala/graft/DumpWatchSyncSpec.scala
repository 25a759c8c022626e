package graft

import java.nio.file.{Files, Paths}

import graft.streaming.DumpWatchSync

/** Dump-directory watcher: arriving dumps produce net ops vs the
  * previous snapshot, and the snapshot advances.
  */
class DumpWatchSyncSpec extends SparkSuite {

  private def ddl = """CREATE TABLE `t` (
                      |  `id` INT,
                      |  `v` INT,
                      |  PRIMARY KEY (`id`)
                      |) ENGINE=InnoDB;
                      |""".stripMargin

  test("arriving dumps emit incremental INSERT/UPDATE/DELETE ops") {
    val watchDir = Files.createTempDirectory("graft-watch")
    val stateDir = Files.createTempDirectory("graft-state").toString

    val q = DumpWatchSync.start(spark, watchDir.toString, stateDir)
    try {
      // arrival 1: baseline dump — everything is an INSERT vs empty state
      Files.write(watchDir.resolve("dump1.sql"),
        (ddl + "INSERT INTO `t` (`id`, `v`) VALUES\n(1, 10),\n(2, 20),\n(3, 30);\n")
          .getBytes("UTF-8"))
      q.processAllAvailable()

      // arrival 2: 1 updated, 3 deleted, 4 inserted
      Files.write(watchDir.resolve("dump2.sql"),
        (ddl + "INSERT INTO `t` (`id`, `v`) VALUES\n(1, 11),\n(2, 20),\n(4, 40);\n")
          .getBytes("UTF-8"))
      q.processAllAvailable()

      val ops = spark.read.parquet(s"$stateDir/ops")
        .collect()
        .map(r => (r.getAs[String]("pk"), r.getAs[String]("op"),
          r.getAs[Long]("batch_id")))
        .toSet
      val batch1 = ops.filter(_._3 == 0).map(t => (t._1, t._2))
      val batch2 = ops.filter(_._3 == 1).map(t => (t._1, t._2))
      assert(batch1 == Set(("1", "INSERT"), ("2", "INSERT"), ("3", "INSERT")))
      assert(batch2 == Set(("1", "UPDATE"), ("3", "DELETE"), ("4", "INSERT")))

      // snapshot advanced to the latest dump's records
      val latest = new String(Files.readAllBytes(Paths.get(stateDir, "LATEST")), "UTF-8")
      val snap = spark.read.parquet(s"$stateDir/$latest")
        .collect().map(_.getAs[String]("pk")).toSet
      assert(snap == Set("1", "2", "4"))
    } finally q.stop()
  }
}
