package graft

import java.nio.file.Files

import graft.engine.SyncJob
import graft.report.SummaryReporter

/** Console summary parity: SummaryReporter.render must reproduce the
  * reference's print_summary output (sync.py:439-506) byte-for-byte on
  * the golden dump pair (fixture captured from the unmodified reference).
  */
class SummaryReporterSpec extends SparkSuite {

  test("summary matches the reference's console output on the sf0.001 pair") {
    def res(name: String): String = {
      val in = getClass.getResourceAsStream(s"/refdumps/$name")
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    }
    def tmp(content: String) = {
      val p = Files.createTempFile("graft-sum", ".sql")
      Files.write(p, content.getBytes("UTF-8")); p
    }
    val outcome = new SyncJob(spark).run(
      tmp(res("prod_sf0.001.sql")).toString,
      tmp(res("backup_sf0.001.sql")).toString)
    val got = SummaryReporter.render(outcome)
      .split("\n").dropWhile(_.isEmpty).mkString("\n").stripLineEnd
    val expected = res("summary_sf0.001.txt").stripLineEnd
    assert(got == expected)
  }
}
