package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.TableMeta
import graft.parse.DumpParser

/** Tokenizer/grammar edge cases lifted from the reference's state machine
  * (FIXTURES.md §B; citations into /root/reference/sync.py).
  */
class DumpParserSpec extends AnyFunSuite {

  // -------------------------------------------------- splitValues
  test("splitValues: basic comma split, whitespace trimmed, quotes retained") {
    assert(DumpParser.splitValues("1, 'abc', NULL, 2.5") ==
      Seq("1", "'abc'", "NULL", "2.5"))
  }

  test("splitValues: commas inside quoted strings are not separators") {
    assert(DumpParser.splitValues("1, 'a, b', \"c, d\"") ==
      Seq("1", "'a, b'", "\"c, d\""))
  }

  test("splitValues: SQL doubled-quote escape stays in the value (sync.py:146-148)") {
    assert(DumpParser.splitValues("'O''Brien', 2") == Seq("'O''Brien'", "2"))
    assert(DumpParser.splitValues("\"say \"\"hi\"\"\", 1") ==
      Seq("\"say \"\"hi\"\"\"", "1"))
  }

  test("splitValues: trailing empty field dropped, inner empties kept (sync.py:155)") {
    assert(DumpParser.splitValues("1, , 2, ") == Seq("1", "", "2"))
  }

  test("splitValues: NULL vs 'NULL' vs empty string stay distinct tokens") {
    assert(DumpParser.splitValues("NULL, 'NULL', ''") ==
      Seq("NULL", "'NULL'", "''"))
  }

  // -------------------------------------------------- splitValueSets
  test("splitValueSets: multiple rows") {
    assert(DumpParser.splitValueSets("(1, 'a'),\n(2, 'b')") ==
      List("1, 'a'", "2, 'b'"))
  }

  test("splitValueSets: ')' inside a string does not truncate the row (fixes sync.py:111-112)") {
    assert(DumpParser.splitValueSets("(1, 'a)b'), (2, 'c(d')") ==
      List("1, 'a)b'", "2, 'c(d'"))
  }

  // -------------------------------------------------- DDL
  private def meta(ddl: String): Option[TableMeta] = DumpParser.parseCreate(ddl)

  test("parseCreate: standard table with explicit single-column PK (sync.py:91-95)") {
    val m = meta(
      """CREATE TABLE `t` (
        |  `id` BIGINT,
        |  `name` VARCHAR(255),
        |  PRIMARY KEY (`id`)
        |) ENGINE=InnoDB""".stripMargin).get
    assert(m.columns == Seq("id", "name"))
    assert(m.pkCols == Seq("id"))
    assert(m.createStmt.endsWith("ENGINE=InnoDB;"))
  }

  test("parseCreate: composite PK falls through the chain to 'id' (sync.py:91-104)") {
    val m = meta(
      """CREATE TABLE `t` (
        |  `a` INT,
        |  `b` INT,
        |  PRIMARY KEY (`a`,`b`)
        |) ENGINE=InnoDB""".stripMargin).get
    assert(m.pkCols == Seq("id"))
  }

  test("parseCreate: AUTO_INCREMENT column when no single-col PK (sync.py:97-102)") {
    val m = meta(
      """CREATE TABLE `t` (
        |  `seq` INT AUTO_INCREMENT,
        |  `v` INT
        |) ENGINE=MyISAM""".stripMargin).get
    assert(m.pkCols == Seq("seq"))
  }

  test("parseCreate: neither PK nor AUTO_INCREMENT defaults to 'id' (sync.py:104)") {
    val m = meta(
      """CREATE TABLE `t` (
        |  `x` INT,
        |  `y` INT
        |) ENGINE=InnoDB""".stripMargin).get
    assert(m.pkCols == Seq("id"))
  }

  test("parseCreate: KEY/UNIQUE/PRIMARY KEY lines are not columns (sync.py:81-85)") {
    val m = meta(
      """CREATE TABLE `t` (
        |  `id` INT,
        |  `v` INT,
        |  PRIMARY KEY (`id`),
        |  KEY `idx_v` (`v`),
        |  UNIQUE KEY `uv` (`v`)
        |) ENGINE=InnoDB""".stripMargin).get
    assert(m.columns == Seq("id", "v"))
  }

  test("parseCreate: rejects CREATE without ENGINE terminator (sync.py:34)") {
    assert(meta("CREATE TABLE `t` (\n  `id` INT\n)").isEmpty)
  }

  // -------------------------------------------------- DML
  test("parseInsert: requires explicit column list (sync.py:55)") {
    assert(DumpParser.parseInsert("INSERT INTO `t` (`a`) VALUES (1)").isDefined)
    assert(DumpParser.parseInsert("INSERT INTO `t` VALUES (1)").isEmpty)
  }

  test("pkString: positional projection, pipe-joined") {
    val m = TableMeta("t", IndexedSeq("a", "b", "c"), IndexedSeq("b"), "")
    assert(DumpParser.pkString(IndexedSeq("1", "'x'", "2"), m) == "'x'")
    val m2 = m.copy(pkCols = IndexedSeq("a", "c"))
    assert(DumpParser.pkString(IndexedSeq("1", "'x'", "2"), m2) == "1|2")
  }

  test("pkString: PK column missing from columns keys on first value (sync.py:169-171)") {
    val m = TableMeta("t", IndexedSeq("a", "b"), IndexedSeq("id"), "")
    assert(DumpParser.pkString(IndexedSeq("7", "'x'"), m) == "7")
  }

  test("pkString: PK index past the row's end contributes nothing") {
    val m = TableMeta("t", IndexedSeq("a", "b", "c"), IndexedSeq("c"), "")
    assert(DumpParser.pkString(IndexedSeq("1", "2"), m) == "")
  }

  test("rawInsert omits the column list (sync.py:69)") {
    assert(DumpParser.rawInsert("t", Seq("1", "'a'")) ==
      "INSERT INTO `t` VALUES (1, 'a');")
  }

  test("parseCatalog preserves statement order") {
    val cat = DumpParser.parseCatalog(Iterator(
      "CREATE TABLE `b` (\n  `id` INT\n) ENGINE=X",
      "not a create",
      "CREATE TABLE `a` (\n  `id` INT\n) ENGINE=X"))
    assert(cat.keys.toSeq == Seq("b", "a"))
  }
}
