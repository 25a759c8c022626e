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
