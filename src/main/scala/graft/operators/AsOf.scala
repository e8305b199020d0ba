package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (most-recent-prior) join: attach to each left row the latest right
  * row with `right.ts <= left.ts` on the same key — the "which click
  * preceded this purchase" / "which model version was live at this event"
  * lookup a training-data event pipeline needs constantly.
  *
  * Spark has no native as-of operator, and the naive encodings both fail at
  * scale: a range join (`l.key = r.key AND r.ts <= l.ts` + max-per-left)
  * explodes to |left|×|right-per-key| intermediate rows, and a windowed
  * range frame can't carry payload columns. This implementation is the
  * union-scan form: tag both sides, union, ONE shuffle on the key, then a
  * running `last(right_payload, ignoreNulls)` over (ts, side) ordering
  * pulls the newest right row onto every left row in a single sorted pass —
  * cost O(|left|+|right|) rows through one exchange, payload carried as a
  * struct. Right rows sort before left rows at equal ts, making the match
  * inclusive (`<=`), the same tie rule as DuckDB/kdb ASOF JOIN.
  *
  * Ties: multiple right rows on the same (key, ts) make "the latest"
  * ambiguous — callers must pre-dedup the right side to one row per
  * (key, ts) (e.g. `groupBy(key, ts).agg(max(...))`), or the surviving row
  * is pick-order dependent. Skewed keys inherit the usual window-skew
  * remedy (AQE; or pre-salt the key and as-of within salt buckets when one
  * key dominates).
  */
object AsOf {

  /** Left rows joined to the newest right row at-or-before their `tsCol`.
    *
    * @param keyCols   equality keys present on both sides
    * @param tsCol     ordering column present on both sides (any orderable
    *                  type; for the nanos fixture pass microsecond longs,
    *                  never raw timestamps — see EventQueries notes)
    * @param rightCols right payload columns to attach, emitted as
    *                  `prefix+name`; `prefix+tsCol` (the matched row's ts)
    *                  is attached too
    * @param inner     true drops left rows with no prior right row (ASOF
    *                  inner join); false keeps them with null payload
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
               tsCol: String, rightCols: Seq[String], prefix: String = "asof_",
               inner: Boolean = true): DataFrame = {
    val leftPayload = left.columns.toSeq.diff(keyCols :+ tsCol)
    val rStruct = struct((tsCol +: rightCols).map(col): _*)
    val rStructType = right.select(rStruct).schema.head.dataType

    val common = keyCols.map(col) :+ col(tsCol)
    val l2 = left.select(common ++ Seq(lit(1).as("__side"),
      lit(null).cast(rStructType).as("__r")) ++ leftPayload.map(col): _*)
    val r2 = right.select(common ++ Seq(lit(0).as("__side"), rStruct.as("__r")) ++
      leftPayload.map(n => lit(null).cast(left.schema(n).dataType).as(n)): _*)

    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = l2.unionByName(r2)
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val filtered = if (inner) matched.filter(col("__m").isNotNull) else matched
    filtered.select(
      (keyCols :+ tsCol).map(col) ++ leftPayload.map(col) ++
        (tsCol +: rightCols).map(c => col("__m").getField(c).as(prefix + c)): _*)
  }
}
