package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins: the join on the bucketed key must plan with
  * zero Exchange and return exactly the plain join's rows; a join on a
  * NON-bucketed key must still shuffle (so the assertion is meaningful). */
class BucketingSpec extends AnyFunSuite {
  // the suite may inherit another spec's shared session (getOrCreate), so
  // table state is cleaned explicitly rather than via a custom warehouse
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  /** drop the table and remove any stale on-disk location left by a prior
    * JVM (the in-memory catalog forgets tables, the directory survives). */
  private def freshTable(name: String): String = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = spark.conf.get("spark.sql.warehouse.dir")
      .stripPrefix("file:")
    val dir = java.nio.file.Paths.get(wh, name)
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    name
  }

  test("same-layout bucketed tables join exchange-free with identical rows") {
    val docs = (0L until 5000L).map(i => (i, s"text $i", (i % 97).toInt))
      .toDF("doc_id", "text", "shard")
    val scores = (0L until 5000L by 2).map(i => (i, i * 0.5))
      .toDF("doc_id", "score")
    Bucketing.writeBucketed(docs, freshTable("b_docs"), "doc_id", buckets = 8)
    Bucketing.writeBucketed(scores, freshTable("b_scores"), "doc_id", buckets = 8)

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
