package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink for the sync engine (SURVEY §2.2 scans row) — the
  * path that applies a generated sync script to a live database, which is
  * the reference's implied deployment (sync.py:587-595 writes a script
  * *for* MySQL).
  *
  * Driver plumbing is pluggable through the standard `java.sql.Driver`
  * ServiceLoader: any driver jar dropped on the classpath (e.g.
  * `mysql-connector-j.jar` next to the Spark jars, or `--jars` on
  * spark-submit) is picked up by `DriverManager`/Spark from the URL alone;
  * pass `driver` in `props` to force a specific class. Tested offline
  * against embedded Derby (on Spark's own classpath).
  */
object JdbcSync {

  /** Distributed JDBC table read. `partition` = (column, lower, upper,
    * numPartitions) splits the scan into range-parallel queries — without
    * it the read is a single executor task, which is wrong for any table
    * that matters at scale.
    */
  def load(spark: SparkSession, url: String, table: String,
      props: Map[String, String] = Map.empty,
      partition: Option[(String, Long, Long, Int)] = None): DataFrame = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    partition match {
      case Some((colName, lower, upper, n)) =>
        spark.read.jdbc(url, table, colName, lower, upper, n, p)
      case None =>
        spark.read.jdbc(url, table, p)
    }
  }

  /** Distributed JDBC table write (one connection per partition,
    * batched inserts handled by Spark's JDBC sink).
    */
  def save(df: DataFrame, url: String, table: String,
      mode: SaveMode = SaveMode.ErrorIfExists,
      props: Map[String, String] = Map.empty): Unit = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    df.write.mode(mode).jdbc(url, table, p)
  }

  /** Split a sync script into executable statements: comment-only lines
    * (`-- …`) and blank lines between statements are dropped; anything
    * else accumulates until a line ends with `;` OUTSIDE a single-quoted
    * literal — the quote state (with `''` escapes) is tracked across
    * lines, so a literal containing raw newlines and a `;`-terminated
    * line does not split the statement mid-string. (A `''` escape split
    * exactly across a line boundary is not representable in SQL text and
    * is not handled.)
    *
    * `backslashEscapes = true` additionally honors MySQL's default
    * string-literal escaping (the reference's native dialect, where
    * `\'` does NOT close the literal): a backslash inside a string
    * consumes the next character, including the newline when the
    * backslash ends a line.
    */
  def statements(script: String,
      backslashEscapes: Boolean = false): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inString = false
    script.split("\n", -1).foreach { line =>
      val t = line.trim
      if (cur.isEmpty && !inString && (t.isEmpty || t.startsWith("--"))) ()
      else {
        if (cur.nonEmpty) cur.append('\n')
        cur.append(line)
        var i = 0
        while (i < line.length) {
          val c = line.charAt(i)
          if (inString) {
            if (backslashEscapes && c == '\\') {
              // consumes the next char; when the backslash ends the
              // line, the escaped char is the newline the split already
              // removed — scanning just resumes on the next line
              i += 1
            } else if (c == '\'') {
              if (i + 1 < line.length && line.charAt(i + 1) == '\'') i += 1
              else inString = false
            }
          } else if (c == '\'') inString = true
          i += 1
        }
        if (!inString && t.endsWith(";")) { out += cur.result(); cur.clear() }
      }
    }
    if (cur.nonEmpty) out += cur.result()
    out.result()
  }

  /** Re-quote MySQL backtick identifiers for an ANSI target: backticks
    * *outside* single-quoted string literals become `quote`. Values in
    * the script are raw SQL literals and may legitimately contain
    * backticks, so the scan is quote-aware (`''` escapes stay inside the
    * literal; with `backslashEscapes`, MySQL's `\'` does too).
    */
  def requoteIdentifiers(stmt: String, quote: String,
      backslashEscapes: Boolean = false): String = {
    if (quote == "`") stmt
    else {
      val sb = new StringBuilder(stmt.length)
      var inString = false
      var i = 0
      while (i < stmt.length) {
        val c = stmt.charAt(i)
        if (inString) {
          sb.append(c)
          if (backslashEscapes && c == '\\') {
            if (i + 1 < stmt.length) { sb.append(stmt.charAt(i + 1)); i += 1 }
          } else if (c == '\'')
            // '' escape: consume the second quote and stay in-string
            if (i + 1 < stmt.length && stmt.charAt(i + 1) == '\'') {
              sb.append('\''); i += 1
            } else inString = false
        } else c match {
          case '\'' => inString = true; sb.append(c)
          case '`' => sb.append(quote)
          case _ => sb.append(c)
        }
        i += 1
      }
      sb.result()
    }
  }

  /** Rewrite MySQL-escaped string literals to ANSI form, leaving
    * everything outside literals untouched — the step that makes a
    * script generated from a MySQL dump executable on an ANSI engine
    * (Derby, Postgres with standard_conforming_strings) whose only
    * in-string escape is `''`.
    *
    * The documented MySQL escape table (default sql_mode, i.e.
    * NO_BACKSLASH_ESCAPES off):
    *   `\'` → `''`    (quote, re-escaped the ANSI way)
    *   `\"` → `"`     (double quote, no escape needed in a '…' literal)
    *   `\\` → `\`     (literal backslash)
    *   `\0` `\b` `\n` `\r` `\t` `\Z` → the raw control character
    *     (NUL, backspace, LF, CR, TAB, SUB) — ANSI literals carry raw
    *     control characters directly
    *   `\%` `\_` → kept VERBATIM (two characters): MySQL evaluates
    *     them to `\%`/`\_` so pattern-match contexts can escape
    *     wildcards; re-emitting them preserves those bytes
    *   `\x` (anything else) → `x` (MySQL drops the backslash)
    * A bare `''` escape inside the literal is already ANSI and passes
    * through unchanged.
    */
  def translateLiteralsToAnsi(stmt: String): String = {
    val sb = new StringBuilder(stmt.length)
    var inString = false
    var i = 0
    while (i < stmt.length) {
      val c = stmt.charAt(i)
      if (inString) {
        if (c == '\\' && i + 1 < stmt.length) {
          stmt.charAt(i + 1) match {
            case '\'' => sb.append("''")
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '0' => sb.append('\u0000')
            case 'b' => sb.append('\b')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'Z' => sb.append('\u001A')
            case w @ ('%' | '_') => sb.append('\\').append(w)
            case other => sb.append(other)
          }
          i += 1
        } else {
          sb.append(c)
          if (c == '\'')
            if (i + 1 < stmt.length && stmt.charAt(i + 1) == '\'') {
              sb.append('\''); i += 1
            } else inString = false
        }
      } else {
        sb.append(c)
        if (c == '\'') inString = true
      }
      i += 1
    }
    sb.result()
  }

  /** Apply a generated sync script over one JDBC connection in script
    * order (order is correctness-relevant: DROP → CREATE → DELETE →
    * UPDATE → INSERT), executeBatch-ed in chunks. `identifierQuote`
    * rewrites backtick identifiers for non-MySQL targets;
    * `mysqlEscapes = true` declares the script's string literals use
    * MySQL backslash escaping and (for ANSI targets) rewrites them via
    * [[translateLiteralsToAnsi]] so the applied values match the
    * production bytes. Returns the number of statements executed.
    *
    * Atomicity caveat: the single transaction holds only on engines
    * without implicit DDL commits. On MySQL — the reference's stated
    * target — every DROP/CREATE TABLE implicitly commits, so a mid-script
    * failure of a script WITH table-structure sections leaves the
    * committed DDL plus any DML batches executed before it. DML-only
    * scripts (no missing/extra tables) roll back as one unit everywhere.
    * For a restartable DDL-bearing apply, split the script at section
    * banners and re-run from the failed section: DROP IF EXISTS and the
    * PK-keyed DELETE/UPDATE statements re-run cleanly; the INSERT section
    * is plain INSERTs and must resume from the failing statement (or use
    * [[graft.engine.Differ.mergeApply]] for a set-wise idempotent apply).
    *
    * This is intentionally a single-connection driver-side apply: a sync
    * script is a serializable change-set whose statement order must be
    * preserved, not a bulk load — for bulk data movement use [[save]].
    */
  def applyScript(url: String, script: String,
      props: Map[String, String] = Map.empty,
      identifierQuote: String = "`", batchSize: Int = 1000,
      mysqlEscapes: Boolean = false): Int = {
    val p = new Properties()
    props.foreach { case (k, v) => p.setProperty(k, v) }
    val conn = DriverManager.getConnection(url, p)
    try {
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        var n = 0
        var inBatch = 0
        // mysqlEscapes: the script's string literals use MySQL backslash
        // escaping (the reference's native dump dialect) — scan them
        // backslash-aware, and when the TARGET is ANSI (non-backtick
        // quote) also rewrite the literals to ANSI form so `\'`-bearing
        // values survive the dialect hop byte-for-byte
        statements(script, mysqlEscapes).foreach { raw =>
          val requoted = requoteIdentifiers(raw.trim.stripSuffix(";"),
            identifierQuote, mysqlEscapes)
          st.addBatch(
            if (mysqlEscapes && identifierQuote != "`")
              translateLiteralsToAnsi(requoted)
            else requoted)
          n += 1; inBatch += 1
          if (inBatch >= batchSize) { st.executeBatch(); inBatch = 0 }
        }
        if (inBatch > 0) st.executeBatch()
        conn.commit()
        n
      } finally st.close()
    } finally conn.close()
  }
}
