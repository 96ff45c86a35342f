package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Runtime skew mitigation: the engine's manual salted join
  * (SpatialJoins.saltCells, PlanCheck-pinned) is the plan-time answer to a
  * hot cell; this spec demonstrates the runtime alternative the north rule
  * also calls for — AQE's skew-join splitting a hot shuffle partition
  * without any manual salting — and that it changes the plan, not the
  * rows. */
class AqeSkewSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("aqe-skew")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("AQE splits the hot cell's shuffle partition at runtime") {
    import spark.implicits._
    // 80% of the fact rows land on one hot cell, with enough payload bytes
    // per row that the hot partition trips the skew thresholds
    val facts = spark.range(0, 60000)
      .select(
        when(col("id") % 5 < 4, lit(7L)).otherwise(col("id") % 90 + 100).as("cell_id"),
        concat(lit("payload-"), lpad(col("id").cast("string"), 64, "x")).as(
          "payload"))
    val cells = spark.range(0, 200).select(
      col("id").as("cell_id"), (col("id") * 10).as("cell_rank"))

    val joined = facts.join(cells, "cell_id")
    // materialize THIS query execution so its adaptive plan is final
    val rows = joined.collect()
    assert(rows.length == 60000, s"row identity broken: ${rows.length}")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(300))
    assert(plan.contains("skew=true"),
      "AQE did not mark the skewed join:\n" + plan.take(2000))

    // the split must not duplicate or drop hot-cell rows
    val hot = rows.count(_.getLong(0) == 7L)
    assert(hot == 48000, s"hot-cell rows: $hot")
  }
}
