package graft.engine

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.TableMeta
import graft.sources.DumpSource

/** Typed "native mode" for dump data (SURVEY §1.4/§7 step 6): where the
  * reference — and the byte-parity compat engine — treat every dump value
  * as a raw quoted string (sync.py:74-87 discards the CREATE TABLE type
  * tokens), typed mode maps those tokens to Spark types and emits real
  * Long/Double/Decimal/Date/Timestamp columns. That is what lets dump
  * data join against typed JDBC/parquet tables, take range predicates
  * (with pushdown once persisted), and diff with proper value semantics
  * ('1' == 1, trailing-zero decimals) instead of raw-string equality.
  *
  * Compat mode is unchanged — typed mode is a parallel read path over the
  * same statement scan and record frames, so golden byte-parity output
  * still comes from the string pipeline.
  *
  * Scale: the per-table snapshot is a projection over the (table, pk)
  * record frame — same single shuffle as the compat path; casts are
  * per-row column expressions inside whole-stage codegen.
  */
object TypedMode {

  /** MySQL type token (as [[graft.parse.DumpParser.extractColumnTypes]]
    * normalizes it, e.g. "INT(11)", "DECIMAL(10,2)") → Spark type.
    * Unknown tokens stay strings — never lossy.
    */
  def sparkType(token: String): DataType = {
    val t = token.toUpperCase(Locale.ROOT)
    val base = t.takeWhile(_ != '(')
    base match {
      case "TINYINT" | "SMALLINT" | "MEDIUMINT" | "INT" | "INTEGER" |
           "BIGINT" | "YEAR" => LongType
      case "DECIMAL" | "NUMERIC" =>
        val args = t.dropWhile(_ != '(').stripPrefix("(").stripSuffix(")")
        args.split(',') match {
          case Array(p, s) => DecimalType(p.trim.toInt, s.trim.toInt)
          case Array(p) if p.nonEmpty => DecimalType(p.trim.toInt, 0)
          case _ => DecimalType(10, 0)
        }
      case "FLOAT" | "DOUBLE" | "REAL" => DoubleType
      case "DATE" => DateType
      // MySQL DATETIME is wall-clock (no zone) → TIMESTAMP_NTZ;
      // MySQL TIMESTAMP is UTC-normalized → session-zoned TimestampType
      case "DATETIME" => TimestampNTZType
      case "TIMESTAMP" => TimestampType
      case _ => StringType // VARCHAR/CHAR/TEXT/BLOB/ENUM/unparsed
    }
  }

  /** Typed schema of a parsed table (string for columns whose type token
    * is missing).
    */
  def schemaOf(meta: TableMeta): StructType =
    StructType(meta.columns.zipWithIndex.map { case (c, i) =>
      val tok = if (i < meta.colTypes.length) meta.colTypes(i) else ""
      StructField(c, if (tok.isEmpty) StringType else sparkType(tok))
    })

  /** Dump-literal string → SQL value: unquote 'x'/"x" (collapsing the
    * doubled-quote escape the tokenizer preserves), bare NULL → null.
    * Pure built-in expressions — stays in codegen.
    */
  def unquoted(v: Column): Column = {
    def stripped(q: String): Column =
      regexp_replace(v.substr(lit(2), length(v) - 2), q + q, q)
    when(v === "NULL", lit(null).cast(StringType))
      .when(length(v) >= 2 && v.startsWith("'") && v.endsWith("'"), stripped("'"))
      .when(length(v) >= 2 && v.startsWith("\"") && v.endsWith("\""), stripped("\""))
      .otherwise(v)
  }

  /** Typed projection of one table from a compat record frame
    * ([[SyncJob.records]] output filtered to `meta.name`): positional
    * value → unquote → cast to the declared type.
    */
  def typedTable(records: DataFrame, meta: TableMeta): DataFrame = {
    val fields = schemaOf(meta).fields
    val cols = fields.zipWithIndex.map { case (f, i) =>
      unquoted(col("vals").getItem(i)).cast(f.dataType).as(f.name)
    }
    records.filter(col("table") === meta.name).select(cols.toIndexedSeq: _*)
  }

  /** Parse a whole dump into typed per-table DataFrames (one statement
    * scan, one record shuffle; each table is a filtered projection).
    */
  def typedSnapshot(spark: SparkSession, dumpPath: String)
      : Map[String, DataFrame] = {
    val job = new SyncJob(spark)
    val stmts = DumpSource.statements(spark, dumpPath)
    val cat = job.catalog(stmts)
    val recs = job.records(stmts, cat)
    cat.map { case (name, meta) => name -> typedTable(recs, meta) }
  }

  /** Typed diff of two snapshots of one table: full-outer join on the PK
    * columns, null-safe comparison of every non-PK column with its real
    * type semantics. Output: pk columns + op + p_/b_ prefixed values.
    * Single shuffle on the PK — the same plan shape as the compat diff.
    */
  def typedDiff(prod: DataFrame, backup: DataFrame,
      pkCols: Seq[String]): DataFrame = {
    val valCols = prod.columns.filterNot(pkCols.contains).toSeq
    val p = prod.select(
      pkCols.map(col) ++ valCols.map(c => col(c).as(s"p_$c")) :+
        lit(true).as("p_present"): _*)
    val b = backup.select(
      pkCols.map(col) ++ valCols.map(c => col(c).as(s"b_$c")) :+
        lit(true).as("b_present"): _*)
    val changed = valCols.map(c => !(col(s"p_$c") <=> col(s"b_$c")))
      .reduce(_ || _)
    p.join(b, pkCols, "full_outer")
      .withColumn("op",
        when(col("b_present").isNull, Differ.OP_INSERT)
          .when(col("p_present").isNull, Differ.OP_DELETE)
          .when(changed, Differ.OP_UPDATE))
      .filter(col("op").isNotNull)
      .drop("p_present", "b_present")
  }
}
