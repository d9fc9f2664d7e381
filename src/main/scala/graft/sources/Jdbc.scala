package graft.sources

import graft.adt.{Delete, Select}
import graft.exec.SqlRenderer
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._
import java.sql.{Connection, DriverManager, PreparedStatement}

/** JDBC source/sink/DDL executor (reference S8/S9/S13/S14,
  * fabrix-sql/src/executor/ec.rs). Reads push the whole rendered Select down
  * as a subquery (the DB optimizes, like the reference's sea-query path);
  * writes follow the SaveStrategy state machine with a staged, swap-committed
  * Replace and a dialect-native batched Upsert executed per partition —
  * distributed where Spark can be, transactional where only the driver can
  * be (SURVEY §4 transactionality row).
  */
final class JdbcExecutor(url: String, dialect: Dialect) {

  def this(url: String) = this(url, Dialect.infer(url))

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  // -------------------------------------------------------- introspection --

  /** Quoted identifiers preserve case, so metadata lookups try the exact
    * name first, then the dialect's unquoted-normalized (upper) form.
    */
  private def metaLookup[A](name: String)(f: (Connection, String) => Option[A]): Option[A] =
    withConn { c => f(c, name).orElse(f(c, name.toUpperCase)) }

  /** S13: information-schema-equivalent via JDBC DatabaseMetaData. */
  def tableExists(name: String): Boolean =
    metaLookup(name) { (c, n) =>
      val rs = c.getMetaData.getTables(null, null, n, Array("TABLE"))
      try { if (rs.next()) Some(()) else None } finally rs.close()
    }.isDefined

  def listTables(): Seq[String] = withConn { c =>
    val rs = c.getMetaData.getTables(null, null, "%", Array("TABLE"))
    val b = Seq.newBuilder[String]
    while (rs.next()) b += rs.getString("TABLE_NAME")
    rs.close(); b.result().sorted
  }

  def tableSchema(name: String): Seq[(String, String)] =
    metaLookup(name) { (c, n) =>
      val rs = c.getMetaData.getColumns(null, null, n, "%")
      val b = Seq.newBuilder[(String, String)]
      while (rs.next()) b += ((rs.getString("COLUMN_NAME"), rs.getString("TYPE_NAME")))
      rs.close()
      val r = b.result()
      if (r.nonEmpty) Some(r) else None
    }.getOrElse(Nil)

  /** Table schema as Spark StructType via the dialect's read-side type map
    * (X5 — the reference's per-driver type-tag registry, types.rs:127-210).
    * Decimal precision/scale come from COLUMN_SIZE/DECIMAL_DIGITS (JDBC
    * metadata reports a bare "DECIMAL" type name).
    */
  def tableSchemaSpark(name: String): StructType =
    metaLookup(name) { (c, n) =>
      val rs = c.getMetaData.getColumns(null, null, n, "%")
      val b = Seq.newBuilder[StructField]
      while (rs.next()) {
        val tn = rs.getString("TYPE_NAME").toUpperCase
        val full =
          if ((tn == "DECIMAL" || tn == "NUMERIC") && !tn.contains("("))
            s"$tn(${rs.getInt("COLUMN_SIZE")},${rs.getInt("DECIMAL_DIGITS")})"
          else tn
        b += StructField(rs.getString("COLUMN_NAME"), dialect.sparkTypeFor(full), nullable = true)
      }
      rs.close()
      val r = b.result()
      if (r.nonEmpty) Some(StructType(r)) else None
    }.getOrElse(StructType(Nil))

  /** S13: get_primary_key (query_ddl.rs:201-243). */
  def primaryKey(name: String): Option[String] =
    metaLookup(name) { (c, n) =>
      val rs = c.getMetaData.getPrimaryKeys(null, null, n)
      val r = if (rs.next()) Some(rs.getString("COLUMN_NAME")) else None
      rs.close(); r
    }

  // ------------------------------------------------------------------ DDL --

  def execute(sql: String): Unit = withConn { c =>
    val st = c.createStatement(); try st.execute(sql) finally st.close()
  }

  /** Identifier quoting: table/column names can originate from untrusted
    * file headers (XlIngest → write), so EVERY rendered statement passes
    * them through dialect.quote — never raw interpolation.
    */
  private def q(ident: String): String = dialect.quote(ident)

  /** S14 create table; `pk` column gets PRIMARY KEY. */
  def createTable(name: String, schema: StructType, pk: Option[String] = None): Unit = {
    val cols = schema.fields.map { f =>
      val pkc = if (pk.contains(f.name)) " PRIMARY KEY" else ""
      val nn = if (!f.nullable && !pk.contains(f.name)) " NOT NULL" else ""
      s"${q(f.name)} ${dialect.typeName(f.dataType)}$pkc$nn"
    }
    execute(s"CREATE TABLE ${q(name)} (${cols.mkString(", ")})")
  }

  def dropTable(name: String): Unit = execute(s"DROP TABLE ${q(name)}")
  def truncate(name: String): Unit = execute(s"TRUNCATE TABLE ${q(name)}")
  def renameTable(oldName: String, newName: String): Unit =
    dialect match {
      case Dialect.Derby => execute(s"RENAME TABLE ${q(oldName)} TO ${q(newName)}")
      case _ => execute(s"ALTER TABLE ${q(oldName)} RENAME TO ${q(newName)}")
    }
  def createIndex(table: String, column: String, indexName: String): Unit =
    execute(s"CREATE INDEX ${q(indexName)} ON ${q(table)} (${q(column)})")
  def dropIndex(indexName: String): Unit = execute(s"DROP INDEX ${q(indexName)}")

  // S14 rest: ALTER TABLE column verbs (sql_adt.rs:424-441, mutation_ddl.rs:36-63)

  def addColumn(table: String, column: String, dt: DataType, nullable: Boolean = true): Unit = {
    val nn = if (nullable) "" else " NOT NULL"
    execute(s"ALTER TABLE ${q(table)} ADD COLUMN ${q(column)} ${dialect.typeName(dt)}$nn")
  }

  def dropColumn(table: String, column: String): Unit =
    execute(s"ALTER TABLE ${q(table)} DROP COLUMN ${q(column)}")

  def modifyColumn(table: String, column: String, dt: DataType): Unit =
    execute(dialect.modifyColumnSql(table, column, dialect.typeName(dt)))

  // S14 rest: foreign keys with referential actions (sql_adt.rs:189-211,
  // mutation_ddl.rs:64-143)

  def addForeignKey(table: String, fkName: String, column: String,
                    refTable: String, refColumn: String,
                    onDelete: Option[FkAction] = None,
                    onUpdate: Option[FkAction] = None): Unit = {
    val od = onDelete.map(a => s" ON DELETE ${a.sql}").getOrElse("")
    val ou = onUpdate.map(a => s" ON UPDATE ${a.sql}").getOrElse("")
    execute(s"ALTER TABLE ${q(table)} ADD CONSTRAINT ${q(fkName)} " +
      s"FOREIGN KEY (${q(column)}) REFERENCES ${q(refTable)} (${q(refColumn)})$od$ou")
  }

  def dropForeignKey(table: String, fkName: String): Unit =
    execute(dialect.dropForeignKeySql(table, fkName))

  // ----------------------------------------------------------------- read --

  /** Numeric MIN/MAX bounds of a column, for partitioned reads. */
  private def columnBounds(table: String, column: String): Option[(Long, Long)] =
    withConn { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(
          s"SELECT MIN(${q(column)}), MAX(${q(column)}) FROM ${q(table)}")
        try {
          if (!rs.next()) None
          else {
            val lo = rs.getLong(1); val loNull = rs.wasNull()
            val hi = rs.getLong(2); val hiNull = rs.wasNull()
            if (loNull || hiNull) None else Some((lo, hi))
          }
        } finally rs.close()
      } catch { case _: java.sql.SQLException => None } // non-numeric column
      finally st.close()
    }

  /** Table read, partitioned across connections when a numeric partition
    * column is available (explicit, else the introspected PK): Spark splits
    * [lo, hi] into `numPartitions` range predicates, one connection each —
    * without this every table read funnels through ONE connection on one
    * task, the classic JDBC-source bottleneck at scale.
    */
  def readTable(spark: SparkSession, name: String,
                partitionColumn: Option[String] = None,
                numPartitions: Int = 8): DataFrame = {
    val base = spark.read.format("jdbc").option("url", url).option("dbtable", q(name))
    val pc = partitionColumn.orElse(primaryKey(name))
    pc.flatMap(c => columnBounds(name, c).map((c, _))) match {
      case Some((c, (lo, hi))) if hi > lo && numPartitions > 1 =>
        base
          .option("partitionColumn", c)
          .option("lowerBound", lo)
          .option("upperBound", hi + 1) // upperBound is exclusive in the stride math
          .option("numPartitions", math.min(numPartitions.toLong, hi - lo + 1).toString)
          .load()
      case _ => base.load()
    }
  }

  /** S8: full Select pushdown — render and ship as a subquery; the DB plans
    * scan/filter/join/agg exactly like the reference's executor path.
    */
  def select(spark: SparkSession, sel: Select): DataFrame = {
    val sql = SqlRenderer.select(sel, dialect)
    spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", s"($sql) GRAFT_SUB")
      .load()
  }

  /** X4: custom row decoder hook (reference fetch_all_cst_prc_fn,
    * fabrix-sql/src/executor/loader.rs:121): run arbitrary SQL and decode
    * each row with a caller-supplied function. Driver-side single connection
    * by design, exactly like the reference's loader — for distributed reads
    * use [[readTable]]/[[select]].
    */
  def fetchAllCustom[A](sql: String)(decode: java.sql.ResultSet => A): Vector[A] =
    withConn { c =>
      val st = c.createStatement()
      try {
        val rs = st.executeQuery(sql)
        try {
          val b = Vector.newBuilder[A]
          while (rs.next()) b += decode(rs)
          b.result()
        } finally rs.close()
      } finally st.close()
    }

  /** Pushdown Delete (DELETE WHERE) — driver-side statement like the
    * reference (mutation_dml.rs delete).
    */
  def delete(del: Delete): Int = withConn { c =>
    val st = c.createStatement()
    try st.executeUpdate(SqlRenderer.delete(del)) finally st.close()
  }

  // ---------------------------------------------------------------- write --

  def write(df: DataFrame, table: String, strategy: SaveStrategy): Unit = strategy match {
    case SaveStrategy.FailIfExists =>
      if (tableExists(table)) throw new IllegalStateException(s"table $table already exists")
      createTable(table, df.schema)
      appendInto(df, table)

    case SaveStrategy.Append =>
      if (!tableExists(table)) createTable(table, df.schema)
      appendInto(df, table)

    case SaveStrategy.Replace =>
      // staged replace: distributed insert into a staging table, then a
      // single-transaction drop+rename swap on the driver — readers never
      // see a partial table (ec.rs:602-651 semantics at cluster scale)
      val staging = s"${table}_GRAFT_STAGING"
      if (tableExists(staging)) dropTable(staging)
      createTable(staging, df.schema)
      appendInto(df, staging)
      val hadTable = tableExists(table)
      withConn { c =>
        c.setAutoCommit(false)
        val st = c.createStatement()
        try {
          if (hadTable) st.execute(s"DROP TABLE ${q(table)}")
          dialect match {
            case Dialect.Derby => st.execute(s"RENAME TABLE ${q(staging)} TO ${q(table)}")
            case _ => st.execute(s"ALTER TABLE ${q(staging)} RENAME TO ${q(table)}")
          }
          c.commit()
        } catch { case e: Throwable => c.rollback(); throw e }
        finally st.close()
      }

    case SaveStrategy.Upsert(pk) =>
      if (!tableExists(table)) { createTable(table, df.schema, Some(pk)); appendInto(df, table) }
      else {
        val cols = df.schema.fieldNames.toSeq
        val types = df.schema.fields.map(f => dialect.typeName(f.dataType)).toSeq
        dialect.upsertSql(table, cols, types, pk) match {
          case Some(sql) =>
            // dialect-native single-statement upsert, batched per partition
            val schema = df.schema
            val u = url
            val reps = sql.count(_ == '?') / schema.size
            df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
              val c = DriverManager.getConnection(u)
              try {
                c.setAutoCommit(false)
                val ps = c.prepareStatement(sql)
                var n = 0
                rows.foreach { r =>
                  var off = 0
                  (0 until reps).foreach { _ =>
                    JdbcExecutor.bindRow(ps, r, schema, off); off += schema.size
                  }
                  ps.addBatch(); n += 1
                  if (n % 500 == 0) ps.executeBatch()
                }
                ps.executeBatch(); c.commit(); ps.close()
              } catch { case e: Throwable => c.rollback(); throw e }
              finally c.close()
            }
          case None =>
            // the reference's physical plan (ec.rs:518-538) distributed:
            // existing-id semi/anti split, then batched INSERT + UPDATE
            val spark = df.sparkSession
            val existingIds = readTable(spark, table).select(pk)
            val cond = df(pk) === existingIds(pk)
            val inserts = df.join(existingIds, cond, "left_anti")
            val updates = df.join(existingIds, cond, "left_semi")
            appendInto(inserts, table)
            batchedUpdate(updates, table, pk)
        }
      }
  }

  /** Batched UPDATE … SET non-pk = ? WHERE pk = ? (the reference emits one
    * UPDATE per row, mutation_dml.rs:44-84; ours batches them per partition).
    */
  private def batchedUpdate(df: DataFrame, table: String, pk: String): Unit = {
    val schema = df.schema
    val nonPk = schema.fields.filter(_.name != pk)
    val sets = nonPk.map(f => s"${q(f.name)} = ?").mkString(", ")
    val sql = s"UPDATE ${q(table)} SET $sets WHERE ${q(pk)} = ?"
    // bind order: non-pk fields then pk — build a reordered projection
    val reordered = df.select((nonPk.map(f => df(f.name)) :+ df(pk)).toIndexedSeq: _*)
    val bindSchema = reordered.schema
    val u = url
    reordered.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val c = DriverManager.getConnection(u)
      try {
        c.setAutoCommit(false)
        val ps = c.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          JdbcExecutor.bindRow(ps, r, bindSchema, 0)
          ps.addBatch(); n += 1
          if (n % 500 == 0) ps.executeBatch()
        }
        ps.executeBatch(); c.commit(); ps.close()
      } catch { case e: Throwable => c.rollback(); throw e }
      finally c.close()
    }
  }

  /** Distributed batched INSERT (per-partition connections, one transaction
    * per partition). Delivery is AT-LEAST-ONCE under task/stage retry: a
    * partition that committed before a retry re-inserts its rows. Callers
    * needing exactly-once should write through [[SaveStrategy.Upsert]] on a
    * PK'd table (idempotent) or Replace (staged swap, all-or-nothing).
    */
  private def appendInto(df: DataFrame, table: String): Unit = {
    val schema = df.schema
    val cols = schema.fieldNames.map(q).mkString(", ")
    val ph = schema.fieldNames.map(_ => "?").mkString(", ")
    val sql = s"INSERT INTO ${q(table)} ($cols) VALUES ($ph)"
    val u = url
    df.foreachPartition { (rows: Iterator[org.apache.spark.sql.Row]) =>
      val c = DriverManager.getConnection(u)
      try {
        c.setAutoCommit(false)
        val ps = c.prepareStatement(sql)
        var n = 0
        rows.foreach { r =>
          JdbcExecutor.bindRow(ps, r, schema, 0)
          ps.addBatch(); n += 1
          if (n % 500 == 0) ps.executeBatch()
        }
        ps.executeBatch(); c.commit(); ps.close()
      } catch { case e: Throwable => c.rollback(); throw e }
      finally c.close()
    }
  }
}

object JdbcExecutor {
  private[sources] def bindRow(ps: PreparedStatement, r: org.apache.spark.sql.Row,
                               schema: StructType, offset: Int): Unit = {
    schema.fields.zipWithIndex.foreach { case (f, i) =>
      val v = r.get(i)
      val idx = offset + i + 1
      if (v == null) ps.setNull(idx, java.sql.Types.NULL)
      else f.dataType match {
        case BooleanType      => ps.setBoolean(idx, v.asInstanceOf[Boolean])
        case ByteType         => ps.setByte(idx, v.asInstanceOf[Byte])
        case ShortType        => ps.setShort(idx, v.asInstanceOf[Short])
        case IntegerType      => ps.setInt(idx, v.asInstanceOf[Int])
        case LongType         => ps.setLong(idx, v.asInstanceOf[Long])
        case FloatType        => ps.setFloat(idx, v.asInstanceOf[Float])
        case DoubleType       => ps.setDouble(idx, v.asInstanceOf[Double])
        case StringType       => ps.setString(idx, v.toString)
        case DateType         => ps.setDate(idx, v match {
          case d: java.sql.Date => d
          case d: java.time.LocalDate => java.sql.Date.valueOf(d)
        })
        case TimestampType | TimestampNTZType => ps.setTimestamp(idx, v match {
          case t: java.sql.Timestamp => t
          case t: java.time.LocalDateTime => java.sql.Timestamp.valueOf(t)
          case t: java.time.Instant => java.sql.Timestamp.from(t)
        })
        case _: DecimalType   => ps.setBigDecimal(idx, v.asInstanceOf[java.math.BigDecimal])
        case BinaryType       => ps.setBytes(idx, v.asInstanceOf[Array[Byte]])
        case other => throw new IllegalArgumentException(s"unsupported JDBC bind type $other")
      }
    }
  }
}
