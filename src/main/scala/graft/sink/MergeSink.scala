package graft.sink

import java.sql.{Connection, DriverManager}
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** A merge sink applies one compacted per-table batch (upserts + deletes)
  * atomically to the target table identified by (db, tb).
  *
  * Mirrors the reference's warehouse-as-state design: Spark stays
  * stateless per batch; the target table is the materialized state, and
  * idempotency comes from delete-by-key-then-insert-latest
  * (src/glue_pg_redshift_cdc.py:179-190).
  */
trait MergeSink {
  /** @param batch compacted slice: exactly one row per key
    * @param keyCol equality merge key column name
    * @param opCol  op column; rows with op == deleteMarker remove keys
    */
  def merge(db: String, tb: String, batch: DataFrame,
            keyCol: String, opCol: String, deleteMarker: String): Unit

  /** Exactly-once variant: apply the batch only if (pipelineId, batchId,
    * target) has not been applied before. The default forwards to
    * [[merge]] — at-least-once delivery, which the delete-then-insert
    * merge already makes idempotent for REPLAYS OF THE SAME DATA; sinks
    * with a transactional ledger (see [[JdbcMergeSink]]) also protect
    * against a replayed batch id carrying DIFFERENT data (foreachBatch's
    * contract after a checkpoint restore).
    */
  def mergeOnce(pipelineId: String, batchId: Long,
                db: String, tb: String, batch: DataFrame,
                keyCol: String, opCol: String, deleteMarker: String): Unit =
    merge(db, tb, batch, keyCol, opCol, deleteMarker)
}

/** Warehouse SQL dialect for the stage-table merge transaction. */
trait MergeDialect {
  def stageName(db: String, tb: String): String = s"stage_${db}_$tb"
  def targetName(db: String, tb: String): String = s"${db}_$tb"
  /** Statements creating the target iff absent, given an existing stage. */
  def createTarget(target: String, stage: String, cols: Seq[String]): Seq[String]
  /** The transactional merge: delete matched keys, insert non-deletes. */
  def mergeStatements(target: String, stage: String, key: String,
                      insertCols: Seq[String], opCol: String,
                      deleteMarker: String): Seq[String]
}

/** Redshift-flavored SQL — the reference's exact strategy (K1-K4):
  * `DELETE ... USING`, sortkey DDL, `DROP` of the per-batch stage.
  */
object RedshiftDialect extends MergeDialect {
  def createTarget(target: String, stage: String, cols: Seq[String]): Seq[String] =
    Seq(MergeSql.createLike(target, stage, sortKey = Some("ts_date")))
  def mergeStatements(target: String, stage: String, key: String,
                      insertCols: Seq[String], opCol: String,
                      deleteMarker: String): Seq[String] =
    MergeSql.deleteInsertMerge(target, stage, key, insertCols, opCol, deleteMarker)
}

/** Portable ANSI dialect (works on embedded Derby in tests, and any
  * JDBC engine without DELETE..USING): same delete-then-insert
  * semantics via an IN-subquery. Column identifiers are double-quoted
  * to match the Spark JDBC writer's quoted (case-preserving) column
  * DDL; table names stay unquoted, as the writer emits them.
  */
object AnsiDialect extends MergeDialect {
  private def q(id: String) = "\"" + id + "\""
  def createTarget(target: String, stage: String, cols: Seq[String]): Seq[String] =
    Seq(s"CREATE TABLE $target AS SELECT * FROM $stage WITH NO DATA")
  def mergeStatements(target: String, stage: String, key: String,
                      insertCols: Seq[String], opCol: String,
                      deleteMarker: String): Seq[String] = Seq(
    // CASTs let the comparison work even when the writer mapped strings
    // to a non-comparable type (Derby: CLOB)
    s"DELETE FROM $target WHERE CAST(${q(key)} AS VARCHAR(512)) IN " +
      s"(SELECT CAST(${q(key)} AS VARCHAR(512)) FROM $stage)",
    s"INSERT INTO $target (${insertCols.map(q).mkString(", ")}) " +
      s"SELECT ${insertCols.map(q).mkString(", ")} FROM $stage " +
      s"WHERE CAST(${q(opCol)} AS VARCHAR(64)) <> '$deleteMarker'",
    s"DROP TABLE $stage")
}

/** JDBC merge sink: write the batch to a stage table with the Spark JDBC
  * writer (parallel executors → one table), then run the merge
  * transaction on a single driver connection — the portable equivalent
  * of the reference's S3-COPY + postactions path (K1,
  * src/glue_pg_redshift_cdc.py:192-203).
  */
final class JdbcMergeSink(url: String, props: Properties,
                          dialect: MergeDialect) extends MergeSink {

  private def withConnection[A](f: Connection => A): A = {
    val conn = DriverManager.getConnection(url, props)
    try f(conn) finally conn.close()
  }

  /** Table-existence probe (K5) via JDBC metadata — replaces the
    * reference's `pg_tables` catalog query
    * (src/glue_pg_redshift_cdc.py:104-114).
    */
  def tableExists(conn: Connection, name: String): Boolean = {
    val rs = conn.getMetaData.getTables(null, null, name.toUpperCase, null)
    try rs.next() finally rs.close()
    // Derby upper-cases unquoted identifiers; Redshift lower-cases.
  } || {
    val rs = conn.getMetaData.getTables(null, null, name, null)
    try rs.next() finally rs.close()
  }

  def merge(db: String, tb: String, batch: DataFrame,
            keyCol: String, opCol: String, deleteMarker: String): Unit =
    mergeImpl(None, db, tb, batch, keyCol, opCol, deleteMarker)

  /** Ledger-gated exactly-once: the applied-batch record commits IN THE
    * SAME TRANSACTION as the merge, so "applied" and "marked applied"
    * cannot diverge; a replayed (pipeline, batch, target) is skipped
    * even if the recomputed batch differs (non-deterministic upstream).
    */
  override def mergeOnce(pipelineId: String, batchId: Long,
                         db: String, tb: String, batch: DataFrame,
                         keyCol: String, opCol: String, deleteMarker: String): Unit =
    mergeImpl(Some((pipelineId, batchId)), db, tb, batch, keyCol, opCol, deleteMarker)

  private val LedgerTable = "graft_applied_batches"

  private def ensureLedger(conn: Connection): Unit =
    if (!tableExists(conn, LedgerTable)) {
      val st = conn.createStatement()
      // per-table merges run CONCURRENTLY on the driver pool: two threads
      // can both miss the probe on the very first batch and race the
      // CREATE — the loser's failure is benign iff the table now exists
      try st.executeUpdate(
        s"""CREATE TABLE $LedgerTable (
           |  pipeline_id VARCHAR(128) NOT NULL,
           |  batch_id BIGINT NOT NULL,
           |  target VARCHAR(256) NOT NULL,
           |  PRIMARY KEY (pipeline_id, batch_id, target))""".stripMargin)
      catch {
        case e: java.sql.SQLException =>
          if (!tableExists(conn, LedgerTable)) throw e
      } finally st.close()
    }

  private def alreadyApplied(conn: Connection, pid: String, bid: Long,
                             target: String): Boolean = {
    val ps = conn.prepareStatement(
      s"SELECT 1 FROM $LedgerTable WHERE pipeline_id = ? AND batch_id = ? AND target = ?")
    try {
      ps.setString(1, pid); ps.setLong(2, bid); ps.setString(3, target)
      val rs = ps.executeQuery()
      try rs.next() finally rs.close()
    } finally ps.close()
  }

  private def mergeImpl(once: Option[(String, Long)], db: String, tb: String,
                        batch: DataFrame, keyCol: String, opCol: String,
                        deleteMarker: String): Unit = {
    val stage = dialect.stageName(db, tb)
    val target = dialect.targetName(db, tb)
    // 0. replay probe BEFORE the (expensive) stage write
    once.foreach { case (pid, bid) =>
      val skip = withConnection { conn =>
        conn.setAutoCommit(true); ensureLedger(conn)
        alreadyApplied(conn, pid, bid, target)
      }
      if (skip) return
    }
    // 1. stage write (executors, parallel inserts)
    batch.write.mode(SaveMode.Overwrite).jdbc(url, stage, props)
    // 2. merge transaction (driver connection)
    withConnection { conn =>
      conn.setAutoCommit(false)
      val st = conn.createStatement()
      try {
        if (!tableExists(conn, target))
          dialect.createTarget(target, stage, batch.columns.toSeq).foreach(st.executeUpdate)
        val insertCols = batch.columns.toSeq // op column kept for audit? no:
        // the reference excludes op_type from the insert list (P13,
        // src/glue_pg_redshift_cdc.py:174-175) — but then filters on it in
        // the WHERE; we keep op in the stage and insert all columns except it.
        dialect.mergeStatements(target, stage, keyCol,
          insertCols.filterNot(_ == opCol), opCol, deleteMarker)
          .foreach(st.executeUpdate)
        once.foreach { case (pid, bid) =>
          // the PRIMARY KEY makes a concurrent duplicate apply fail the
          // transaction rather than double-apply
          val ps = conn.prepareStatement(
            s"INSERT INTO $LedgerTable (pipeline_id, batch_id, target) VALUES (?, ?, ?)")
          try { ps.setString(1, pid); ps.setLong(2, bid); ps.setString(3, target); ps.executeUpdate() }
          finally ps.close()
        }
        conn.commit()
      } catch {
        case e: Throwable => conn.rollback(); throw e
      } finally st.close()
    }
  }
}

/** Parquet-directory merge sink for tests and file-based deployments:
  * target state lives at `<root>/<db>/<tb>`; each batch rewrites the
  * table via anti-join + union ([[Merge.applyBatch]]) into a temp dir,
  * then swaps. At real scale the same semantics come from a
  * transactional table format; the plan shape (broadcast anti-join)
  * is already the scalable one.
  */
final class ParquetMergeSink(rootDir: String) extends MergeSink {

  def targetPath(db: String, tb: String) = s"$rootDir/$db/$tb"

  def merge(db: String, tb: String, batch: DataFrame,
            keyCol: String, opCol: String, deleteMarker: String): Unit = {
    val spark = batch.sparkSession
    val path = new org.apache.hadoop.fs.Path(targetPath(db, tb))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val inserts = batch.filter(col(opCol) =!= deleteMarker).drop(opCol)
    val next =
      if (fs.exists(path)) {
        val target = spark.read.parquet(path.toString)
        target.join(broadcast(batch.select(col(keyCol))), Seq(keyCol), "left_anti")
          .unionByName(inserts)
      } else inserts
    val tmp = new org.apache.hadoop.fs.Path(s"$rootDir/.tmp/${db}_$tb")
    next.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    if (fs.exists(path)) fs.delete(path, true)
    fs.mkdirs(path.getParent)
    fs.rename(tmp, path)
  }
}
