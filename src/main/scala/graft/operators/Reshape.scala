package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide↔long reshaping — `pivot` (spread a category column into one column
  * per value) and `unpivot`/melt (stack measure columns into (name, value)
  * rows). The report/feature-matrix layer over the aggregate family.
  *
  * Pivot REQUIRES the value list (`values`) up front: Spark's
  * list-free overload runs a driver-side distinct scan to discover it —
  * a hidden extra pass over the corpus and a nondeterministic column
  * order at 100 TB. With the list pinned, pivot compiles to ONE partial-
  * agg'd group-by whose aggregate buffer holds |values| slots per group
  * (the conditional-aggregation plan a warehouse writes by hand) — no
  * extra shuffle, no Expand, deterministic column order.
  *
  * Unpivot is Spark's native `unpivot` — an Expand of |measures| rows per
  * input row in the scan stage, no shuffle at all.
  *
  * Reference scope note: the reference's Polars layer owns pivot/melt as
  * frame ops; its query AST (select/filter/join/agg) does not expose
  * them — extension surface beside the A1-A3 aggregate family.
  */
object Reshape {

  /** One row per `groupCols` tuple, one column per pinned pivot value
    * (named by the value for a single aggregate, `value_alias` for
    * several — Spark's naming).
    */
  def pivotAgg(df: DataFrame, groupCols: Seq[String], pivotCol: String,
               values: Seq[String], aggExprs: Seq[Column]): DataFrame = {
    require(groupCols.nonEmpty && values.nonEmpty && aggExprs.nonEmpty,
      "pivot needs group columns, pinned pivot values, and at least one aggregate")
    df.groupBy(groupCols.map(col): _*).pivot(pivotCol, values)
      .agg(aggExprs.head, aggExprs.tail: _*)
  }

  /** Long form of `measureCols`: one (`nameCol`, `valueCol`) row per
    * measure per input row (Spark native unpivot — scan-stage Expand,
    * zero shuffle). Measures are cast to a common type by Spark; pass
    * same-typed measures when exactness matters.
    */
  def unpivot(df: DataFrame, idCols: Seq[String], measureCols: Seq[String],
              nameCol: String = "metric", valueCol: String = "value"): DataFrame = {
    require(measureCols.nonEmpty, "unpivot needs measure columns")
    df.unpivot(idCols.map(col).toArray, measureCols.map(col).toArray, nameCol, valueCol)
  }
}
