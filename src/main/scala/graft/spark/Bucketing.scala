package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Co-located joins via bucketed tables: both sides pre-hashed into the
  * same bucket layout on the join key, so repeated joins read
  * exchange-free — THE way to amortize the shuffle for a 100 TB fact
  * table that is joined on the same key by many downstream queries
  * (dedup-cluster lookups, span joins, snapshot diffs).
  *
  * Write once with `writeBucketed` (hash-bucketed + in-bucket sorted, so
  * the join is also sort-merge-ready without a sort), then every
  * `spark.table(a).join(spark.table(b), key)` plans with zero Exchange on
  * the bucketed key — asserted by BucketingSpec against the physical plan.
  * Bucket count is a layout decision: pick ~(table size / 128 MB) at write
  * time; both sides must share the count for the exchange-free path.
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, keyCol: String,
                    buckets: Int, sortAlso: Seq[String] = Nil): Unit = {
    val w = df.write.format("parquet").mode("overwrite")
      .bucketBy(buckets, keyCol)
    (if (sortAlso.nonEmpty) w.sortBy(keyCol, sortAlso: _*) else w.sortBy(keyCol))
      .saveAsTable(table)
  }

  /** join two same-bucket-layout tables on the bucketed key. */
  def colocatedJoin(spark: SparkSession, tableA: String, tableB: String,
                    keyCol: String): DataFrame =
    spark.table(tableA).join(spark.table(tableB), keyCol)

  /** true when the executed physical plan contains no shuffle exchange —
    * the property the bucketed layout buys. Exchanges are inserted by
    * EnsureRequirements during executedPlan preparation (sparkPlan is too
    * early to see them); run with AQE disabled for a deterministic answer,
    * else the adaptive initial plan is inspected. */
  def isExchangeFree(df: DataFrame): Boolean = {
    val executed = df.queryExecution.executedPlan
    val plan = executed match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.initialPlan
      case p => p
    }
    plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }.isEmpty
  }
}
