package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: the join on the bucketed key must plan with
  * zero Exchange and return exactly the plain join's rows; a join on a
  * NON-bucketed key must still shuffle (so the assertion is meaningful). */
class BucketingSpec extends AnyFunSuite {
  private val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.warehouse.dir", wh)
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  test("same-layout bucketed tables join exchange-free with identical rows") {
    val docs = (0L until 5000L).map(i => (i, s"text $i", (i % 97).toInt))
      .toDF("doc_id", "text", "shard")
    val scores = (0L until 5000L by 2).map(i => (i, i * 0.5))
      .toDF("doc_id", "score")
    Bucketing.writeBucketed(docs, "b_docs", "doc_id", buckets = 8)
    Bucketing.writeBucketed(scores, "b_scores", "doc_id", buckets = 8)

    val joined = Bucketing.colocatedJoin(spark, "b_docs", "b_scores", "doc_id")
    assert(Bucketing.isExchangeFree(joined),
      s"expected no Exchange:\n${joined.queryExecution.sparkPlan}")

    val expected = docs.join(scores, "doc_id")
      .select("doc_id", "score").orderBy("doc_id").collect().toSeq
    val got = joined.select("doc_id", "score").orderBy("doc_id").collect().toSeq
    assert(got == expected)
  }

  test("a join on a non-bucketed key still shuffles (assertion is not vacuous)") {
    val j = spark.table("b_docs").alias("a")
      .join(spark.table("b_docs").alias("b"), col("a.shard") === col("b.shard"))
    assert(!Bucketing.isExchangeFree(j))
  }
}
