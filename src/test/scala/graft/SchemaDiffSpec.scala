package graft

import java.nio.file.Files

import graft.engine.SchemaDiff
import graft.engine.SchemaDiff.SchemaChange

/** Column-level schema evolution: added/dropped/retyped columns and PK
  * redefinitions between two dumps — the DDL dimension the reference
  * collapses to whole-table CREATE/DROP.
  */
class SchemaDiffSpec extends SparkSuite {

  private def tmpFile(text: String): String = {
    val p = Files.createTempFile("schemadiff", ".sql")
    Files.write(p, text.getBytes("UTF-8"))
    p.toString
  }

  private val prodDdl =
    """CREATE TABLE `t` (
      |  `id` INT(11),
      |  `name` VARCHAR(255),
      |  `score` DOUBLE,
      |  `added_col` BIGINT,
      |  PRIMARY KEY (`id`)
      |) ENGINE=InnoDB;
      |CREATE TABLE `only_prod` (
      |  `id` INT(11),
      |  PRIMARY KEY (`id`)
      |) ENGINE=InnoDB;
      |""".stripMargin

  private val backupDdl =
    """CREATE TABLE `t` (
      |  `id` INT(11),
      |  `name` TEXT,
      |  `score` DOUBLE,
      |  `dropped_col` DATETIME,
      |  PRIMARY KEY (`name`)
      |) ENGINE=InnoDB;
      |""".stripMargin

  test("schema diff reports added/dropped/retyped columns and pk changes") {
    val got = SchemaDiff.diffDumps(spark, tmpFile(prodDdl), tmpFile(backupDdl))
    assert(got == Seq(
      SchemaChange("t", "added_col", "column_added", Some("BIGINT"), None),
      SchemaChange("t", "dropped_col", "column_dropped", None, Some("DATETIME")),
      SchemaChange("t", "name", "column_retyped",
        Some("VARCHAR(255)"), Some("TEXT")),
      SchemaChange("t", "id", "pk_changed", Some("id"), Some("name"))),
      s"got: $got")
    // only_prod is a CREATE/DROP concern — never a column change here
    assert(!got.exists(_.table == "only_prod"))
  }

  test("identical dumps report no schema changes") {
    val f = tmpFile(prodDdl)
    assert(SchemaDiff.diffDumps(spark, f, f).isEmpty)
  }
}
