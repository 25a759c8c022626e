package graft.tools

import java.nio.file.{Files, Path, Paths}
import java.time.format.DateTimeFormatter
import java.time.ZoneOffset

import org.apache.spark.sql.{Row, SparkSession}

import graft.Tables

/** Deterministic MySQL-dump pair generator from the parquet testdata —
  * the checked-in replacement for the survey session's ad-hoc generator
  * (FIXTURES.md §B). Used by Bench to time the sync core on inputs shaped
  * like the reference's (multi-row INSERTs of 100, `) ENGINE=InnoDB;`
  * CREATEs, single-column PRIMARY KEY).
  *
  * The backup dump perturbs the prod rows without any RNG:
  *  - row index ≡ 0 (mod 20) dropped   → INSERTs needed (5%)
  *  - row index ≡ 1 (mod 20) modified  → UPDATEs needed (5%)
  *  - extras appended past max PK      → DELETEs needed (5%)
  */
object DumpGen {

  /** Bump when the generated dump format/perturbation changes — or the
    * driver regenerates /root/testdata (round 8: ns/ms timestamps became
    * µs) — so cached bench dump pairs regenerate instead of silently
    * drifting.
    */
  val FormatVersion = 3

  val TablePks: Seq[(String, String)] = Seq(
    "customer" -> "c_custkey", "orders" -> "o_orderkey",
    "lineitem" -> "l_orderkey", "nation" -> "n_nationkey",
    "region" -> "r_regionkey", "supplier" -> "s_suppkey",
    "part" -> "p_partkey")

  private val TsFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    .withZone(ZoneOffset.UTC)

  private val LdtFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")

  def sqlLit(v: Any): String = v match {
    case null => "NULL"
    case s: String => "'" + s.replace("'", "''") + "'"
    case t: java.sql.Timestamp => "'" + TsFmt.format(t.toInstant) + "'"
    case t: java.time.LocalDateTime => "'" + LdtFmt.format(t) + "'" // NTZ columns
    case d: java.sql.Date => "'" + d.toString + "'"
    case d: java.time.LocalDate => "'" + d.toString + "'"
    case d: Double => d.toString
    case x => x.toString
  }

  private def ddl(name: String, schema: org.apache.spark.sql.types.StructType,
      pk: String): String = {
    val colLines = schema.fields.map { f =>
      val t = f.dataType.typeName match {
        case "string" => "VARCHAR(255)"
        case s if s.startsWith("timestamp") => "DATETIME"
        case "double" | "float" => "DOUBLE"
        case "date" => "DATE" // sqlLit quotes dates; BIGINT would null them in typed mode
        case _ => "BIGINT"
      }
      s"  `${f.name}` $t,"
    }
    (s"CREATE TABLE `$name` (" +: colLines :+ s"  PRIMARY KEY (`$pk`)" :+
      ") ENGINE=InnoDB;").mkString("\n")
  }

  private def inserts(name: String, cols: Seq[String], rows: Seq[Seq[Any]]): Seq[String] = {
    val collist = cols.map(c => s"`$c`").mkString(", ")
    rows.grouped(100).map { batch =>
      val vals = batch.map(r => "(" + r.map(sqlLit).mkString(", ") + ")")
      s"INSERT INTO `$name` ($collist) VALUES\n" + vals.mkString(",\n") + ";"
    }.toSeq
  }

  /** Single-table dump pair whose backup perturbation is keyed on the PK
    * VALUE (pk%20) instead of the row index, so the expected typed diff
    * is expressible in plain SQL over the source parquet (the driver's
    * DuckDB oracle replays it):
    *  - pk ≡ 0 (mod 20) dropped from backup        → INSERT ops
    *  - pk ≡ 1 (mod 20) first string col MODIFIED  → UPDATE ops
    *  - pk ≡ 2 (mod 20) re-keyed past max PK       → DELETE ops
    *    (new pk = maxPk + rank(pk ascending), deterministic)
    * Cached: returns existing files if both are already present.
    */
  def generatePkKeyed(spark: SparkSession, sfDir: String, outDir: String,
      table: String, pk: String): (Path, Path) = {
    val prodPath = Paths.get(outDir, s"${table}_prod.sql")
    val backupPath = Paths.get(outDir, s"${table}_backup.sql")
    if (Files.exists(prodPath) && Files.exists(backupPath))
      return (prodPath, backupPath)
    Files.createDirectories(Paths.get(outDir))
    val df = Tables.load(spark, sfDir, table)
    val cols = df.columns.toSeq
    val pkIdx = cols.indexOf(pk)
    val rows: Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)
    def pkOf(r: Seq[Any]): Long = r(pkIdx).toString.toLong
    val strIdx = df.schema.fields.indexWhere(f =>
      f.dataType.typeName == "string" && f.name != pk)
    val kept = rows.collect {
      case r if pkOf(r) % 20 != 0 =>
        if (pkOf(r) % 20 == 1 && strIdx >= 0) r.updated(strIdx, "MODIFIED")
        else r
    }
    val maxPk = rows.map(pkOf).max
    val extras = rows.filter(r => pkOf(r) % 20 == 2).sortBy(pkOf)
      .zipWithIndex.map { case (r, j) => r.updated(pkIdx, maxPk + 1 + j) }
    val d = ddl(table, df.schema, pk)
    Files.write(prodPath,
      (d +: inserts(table, cols, rows)).mkString("\n").getBytes("UTF-8"))
    Files.write(backupPath,
      (d +: inserts(table, cols, kept ++ extras)).mkString("\n").getBytes("UTF-8"))
    (prodPath, backupPath)
  }

  /** Write prod/backup dump files for a scale-factor dir; returns the
    * two paths. Generation is driver-side (the dump text is ~1.1× the
    * parquet data — fine at bench scale; the sync engine itself never
    * needs this step on real dumps).
    */
  def generate(spark: SparkSession, sfDir: String, outDir: String): (Path, Path) = {
    Files.createDirectories(Paths.get(outDir))
    val prodParts = Seq.newBuilder[String]
    val backupParts = Seq.newBuilder[String]
    TablePks.foreach { case (name, pk) =>
      val df = Tables.load(spark, sfDir, name)
      val cols = df.columns.toSeq
      val pkIdx = cols.indexOf(pk)
      val rows: Seq[Seq[Any]] = df.collect().toSeq.map(_.toSeq)
      prodParts += (ddl(name, df.schema, pk) +: inserts(name, cols, rows)).mkString("\n")

      val strIdx = df.schema.fields.indexWhere(f =>
        f.dataType.typeName == "string" && f.name != pk)
      val kept = rows.zipWithIndex.collect {
        case (r, i) if i % 20 != 0 =>
          if (i % 20 == 1 && strIdx >= 0) r.updated(strIdx, "MODIFIED") else r
      }
      val maxPk = rows.map(r => r(pkIdx).toString.toLong).max
      val extras = rows.zipWithIndex.collect { case (r, i) if i % 20 == 2 => r }
        .zipWithIndex.map { case (r, j) => r.updated(pkIdx, maxPk + 1 + j) }
      backupParts += (ddl(name, df.schema, pk) +:
        inserts(name, cols, kept ++ extras)).mkString("\n")
    }
    val prodPath = Paths.get(outDir, "prod.sql")
    val backupPath = Paths.get(outDir, "backup.sql")
    Files.write(prodPath, prodParts.result().mkString("\n\n").getBytes("UTF-8"))
    Files.write(backupPath, backupParts.result().mkString("\n\n").getBytes("UTF-8"))
    (prodPath, backupPath)
  }
}
