package graft.model

/** Catalog entry for one dumped table — the engine's equivalent of the
  * reference's `TableInfo` (/root/reference/sync.py:16-22) minus the
  * record map (records live in DataFrames, not driver memory).
  *
  * @param name       table name (`\w+` per the reference's grammar)
  * @param columns    ordered column names; record values match by position
  * @param pkCols     primary-key columns from the reference's fallback
  *                   chain (explicit single-col PK → AUTO_INCREMENT → "id")
  * @param createStmt full CREATE TABLE statement text (with trailing ';')
  * @param colTypes   raw SQL type token per column (e.g. "INT(11)",
  *                   "VARCHAR(255)", "DATETIME") in declaration order —
  *                   the tokens the reference discards (sync.py:74-87
  *                   keeps names only); typed native mode
  *                   ([[graft.engine.TypedMode]]) maps them to Spark types
  */
final case class TableMeta(
    name: String,
    columns: IndexedSeq[String],
    pkCols: IndexedSeq[String],
    createStmt: String,
    colTypes: IndexedSeq[String] = IndexedSeq.empty)

/** One dump statement: byte offset of the statement start within the dump
  * file (global order key, stable across partitioned reads) + text.
  */
final case class Stmt(off: Long, text: String)

/** One parsed INSERT row before dedup. `row` is the value-set index within
  * a multi-row VALUES clause; (off, row) is the global statement position
  * the reference's dict semantics depend on (SURVEY.md §7.4).
  *
  * The replay INSERT text is NOT carried here: it is a pure function of
  * (table, vals) ([[graft.parse.DumpParser.rawInsert]]) and is derived at
  * render time ([[graft.codegen.SyncSqlGenerator.rawInsertCol]]) — carrying
  * it would double the bytes through the dedup window, the diff join, and
  * every persisted snapshot.
  */
final case class InsertRow(
    table: String,
    off: Long,
    row: Int,
    pk: String,
    vals: Seq[String])
