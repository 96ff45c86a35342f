package graft.spark

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time joins for epoch-dependent enrichment (the 14-param helmert /
  * deformation-epoch story from SURVEY.md §2.9): each left row picks the
  * LATEST right row with rightTime <= leftTime for its key.
  *
  * Scale design: implemented as union + per-key ordered window with a
  * last-non-null carry-forward — ONE hash shuffle on the key, no range
  * cross-product, no per-row binary search over a broadcast (so the right
  * side may be arbitrarily large, and key skew composes with the salting
  * helpers). This is the classic big-data as-of join plan; Spark has no
  * native ASOF operator.
  */
object TemporalJoins {

  /** As-of join: left(keyCol, leftTimeCol, ...) x right(keyCol,
    * rightTimeCol, state...) -> left rows + the latest state columns with
    * rightTime <= leftTime (inclusive). Left rows with no prior state are
    * dropped (inner semantics). Right's non-key columns must not clash with
    * left's. Times are compared as epoch longs (timestamps cast).
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTimeCol: String, rightTimeCol: String): DataFrame = {
    val stateCols = right.columns.filter(_ != keyCol).toSeq
    val payload = left.columns.filter(_ != keyCol).toSeq
    val stateType = right.select(stateCols.map(col): _*).schema

    val l = left.select(
      Seq(col(keyCol), col(leftTimeCol).cast("long").as("__t"), lit(1).as("__tag"),
        lit(null).cast(stateType).as("__state")) ++ payload.map(col): _*)
    val r = right.select(
      Seq(col(keyCol), col(rightTimeCol).cast("long").as("__t"), lit(0).as("__tag"),
        struct(stateCols.map(col): _*).as("__state")) ++
        payload.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // state rows (__tag 0) sort before event rows at equal time: inclusive
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__t"), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__s", last(col("__state"), ignoreNulls = true).over(w))
      .where(col("__tag") === 1 && col("__s").isNotNull)
      .select(Seq(col(keyCol)) ++ payload.map(col) ++
        stateCols.map(c => col(s"__s.$c").as(c)): _*)
  }

  /** Gap-based sessionization: a user's event stream splits into sessions
    * wherever the gap to the previous event exceeds `gapSeconds`. ONE hash
    * shuffle on the key, two stacked windows (lag + running sum) — no
    * self-join, no range explosion; key skew composes with the salting
    * helpers. `tieCol` makes the within-user ordering total so the
    * running sum is deterministic (equal-time events never open a session,
    * so segmentation itself is tie-order-independent). `timeCol` may be a
    * numeric epoch or a timestamp — it is cast to epoch seconds
    * internally, and the output keeps the original column untouched.
    * Adds `session_seq` (1-based per user). */
  def sessionize(events: DataFrame, keyCol: String, timeCol: String,
                 gapSeconds: Long, tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("__ts"), col(tieCol))
    events
      .withColumn("__ts", col(timeCol).cast("long"))
      .withColumn("__prev", lag(col("__ts"), 1).over(w))
      .withColumn("__new", when(col("__prev").isNull ||
        col("__ts") - col("__prev") > gapSeconds, 1).otherwise(0))
      .withColumn("session_seq", sum(col("__new"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__ts", "__prev", "__new")
  }
}
