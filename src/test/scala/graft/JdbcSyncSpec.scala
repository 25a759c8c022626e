package graft

import java.sql.DriverManager

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.sources.JdbcSync

/** JDBC source/sink against embedded Derby (in-memory, on Spark's own
  * classpath) — proves the pluggable-driver path works offline; real
  * servers only need their connector jar dropped on the classpath.
  */
class JdbcSyncSpec extends SparkSuite {
  import spark.implicits._

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def exec(sqls: String*): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try sqls.foreach(st.executeUpdate) finally st.close()
    } finally conn.close()
  }

  test("partitioned jdbc load reads a seeded table") {
    exec("CREATE TABLE users (id INT PRIMARY KEY, name VARCHAR(50))")
    exec((1 to 20).map(i => s"INSERT INTO users VALUES ($i, 'user_$i')"): _*)
    val df = JdbcSync.load(spark, url, "users",
      partition = Some(("id", 1L, 20L, 4)))
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == 20)
    assert(df.filter(col("id") === 7).select("name").as[String].head() == "user_7")
  }

  test("jdbc save round-trips a DataFrame") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    JdbcSync.save(df, url, "kv", SaveMode.Overwrite)
    val back = JdbcSync.load(spark, url, "kv")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(back == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("applyScript executes a backtick sync script against an ANSI target") {
    exec("CREATE TABLE accounts (id INT PRIMARY KEY, balance INT, owner VARCHAR(50))",
      "INSERT INTO accounts VALUES (1, 100, 'alice')",
      "INSERT INTO accounts VALUES (2, 200, 'bob')",
      "INSERT INTO accounts VALUES (3, 300, 'carol')")
    // the shape SyncSqlGenerator emits: comments, blanks, backtick idents.
    // Derby folds unquoted identifiers to uppercase but quoted ones are
    // case-sensitive, so the requoted script must name them uppercase.
    val script =
      """-- SQL Sync Script - Full CRUD Support
        |-- Generated on: T
        |
        |-- DELETE Records
        |-- ===============
        |DELETE FROM `ACCOUNTS` WHERE `ID` = 3;
        |
        |-- UPDATE Records
        |UPDATE `ACCOUNTS` SET `BALANCE` = 150, `OWNER` = 'al''ice`s' WHERE `ID` = 1;
        |
        |-- INSERT Missing Records
        |INSERT INTO `ACCOUNTS` (`ID`, `BALANCE`, `OWNER`) VALUES (4, 400, 'dave');""".stripMargin
    val n = JdbcSync.applyScript(url, script, identifierQuote = "\"")
    assert(n == 3)
    val state = JdbcSync.load(spark, url, "accounts")
      .as[(Int, Int, String)].collect().sortBy(_._1).toSeq
    assert(state == Seq((1, 150, "al'ice`s"), (2, 200, "bob"), (4, 400, "dave")))
  }

  test("MySQL escape table translates to ANSI; scanners honor backslash escapes") {
    // the documented MySQL string-literal escape table (default
    // sql_mode): each row is (mysql literal body, ANSI literal body)
    val table = Seq(
      ("O\\'Brien", "O''Brien"),          // \' → ''
      ("say \\\"hi\\\"", "say \"hi\""),   // \" → "
      ("a\\\\b", "a\\b"),                 // \\ → \
      ("tab\\there", "tab\there"),        // \t → TAB
      ("line\\nbreak", "line\nbreak"),    // \n → LF
      ("cr\\rhere", "cr\rhere"),          // \r → CR
      ("bell\\bback", "bell\bback"),      // \b → BS
      ("nul\\0end", "nul\u0000end"),      // \0 → NUL
      ("sub\\Zend", "sub\u001Aend"),      // \Z → SUB
      ("100\\%", "100\\%"),               // \% kept verbatim
      ("a\\_b", "a\\_b"),                 // \_ kept verbatim
      ("w\\xy", "wxy"),                   // unknown: backslash dropped
      ("it''s", "it''s"))                 // '' passes through
    table.foreach { case (mysql, ansi) =>
      assert(JdbcSync.translateLiteralsToAnsi(s"X = '$mysql'") == s"X = '$ansi'",
        s"escape row '$mysql'")
    }
    // a \' inside a literal must neither end the string for the
    // splitter (the ; and ` inside are literal bytes) nor get requoted
    val stmt = "UPDATE `t` SET `v` = 'a\\'; `fake`' WHERE `id` = 1;"
    assert(JdbcSync.statements(stmt, backslashEscapes = true) == Seq(stmt))
    assert(JdbcSync.requoteIdentifiers(stmt.stripSuffix(";"), "\"",
      backslashEscapes = true) ==
      "UPDATE \"t\" SET \"v\" = 'a\\'; `fake`' WHERE \"id\" = 1")
    // ...whereas the old ''-only scan would have split/requoted wrongly
    assert(JdbcSync.statements(stmt).size != 1 ||
      JdbcSync.requoteIdentifiers(stmt, "\"").contains("\"fake\""))
  }

  test("applyScript round-trips MySQL-escaped values onto an ANSI target") {
    // the reference's native dialect writes values with backslash
    // escapes; applying such a script to Derby must land the same BYTES
    // a MySQL apply would — the full quote/backslash/control-char
    // gauntlet rides UPDATE and INSERT through the dialect hop
    exec("CREATE TABLE people (id INT PRIMARY KEY, name VARCHAR(60))",
      "INSERT INTO people VALUES (1, 'placeholder')",
      "INSERT INTO people VALUES (2, 'bob')")
    val script =
      """-- SQL Sync Script - Full CRUD Support
        |
        |-- UPDATE Records
        |UPDATE `PEOPLE` SET `NAME` = 'O\'Brien; `x` \\ ''done''' WHERE `ID` = 1;
        |
        |-- INSERT Missing Records
        |INSERT INTO `PEOPLE` (`ID`, `NAME`) VALUES (3, 'tab\there 100\% a\_b');
        |INSERT INTO `PEOPLE` (`ID`, `NAME`) VALUES (4, 'line\nbreak \Zsub');""".stripMargin
    val n = JdbcSync.applyScript(url, script, identifierQuote = "\"",
      mysqlEscapes = true)
    assert(n == 3)
    val state = JdbcSync.load(spark, url, "people")
      .as[(Int, String)].collect().sortBy(_._1).toSeq
    assert(state == Seq(
      (1, "O'Brien; `x` \\ 'done'"),
      (2, "bob"),
      (3, "tab\there 100\\% a\\_b"),
      (4, "line\nbreak \u001Asub")))
  }

  test("partitioned jdbc read pushes filters and prunes columns to the source") {
    exec("CREATE TABLE events_j (id INT PRIMARY KEY, kind VARCHAR(20), v INT)")
    exec((1 to 50).map(i =>
      s"INSERT INTO events_j VALUES ($i, 'k${i % 3}', ${i * 10})"): _*)
    val df = JdbcSync.load(spark, url, "events_j",
        partition = Some(("id", 1L, 50L, 4)))
      .filter(col("id") > 40)
      .select("v")
    // the filter must reach the JDBC source as a pushed predicate (it
    // becomes part of the remote WHERE clause), and the select list
    // must prune to the requested columns — a JDBC scan that ships
    // every row/column of a remote table defeats the partitioned read
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("GreaterThan(ID,40)"),
      s"filter not pushed to JDBC source:\n$plan")
    assert(plan.contains("ReadSchema: struct<V: int") ||
      !plan.contains("KIND"),
      s"column pruning missed (KIND still read):\n$plan")
    // range partitioning holds through the pushdown
    assert(df.rdd.getNumPartitions == 4)
    assert(df.as[Int].collect().sorted.toSeq == (41 to 50).map(_ * 10))
  }
}
