package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** connectedComponents vs a plain union-find oracle, plus the chain case
  * that exercises multi-round propagation and the iteration cap. */
class ClusterSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  import spark.implicits._

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    for ((a, b) <- edges) {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    parent.keys.map(k => k -> find(k)).toMap
  }

  test("connectedComponents matches union-find on a random pair graph") {
    val rnd = new scala.util.Random(42)
    // 60 nodes, 55 random edges -> a mix of singleton-free components
    val edges = (1 to 55).map { _ =>
      val a = rnd.nextInt(60).toLong
      val b = rnd.nextInt(60).toLong
      (math.min(a, b), math.max(a, b))
    }.filter(e => e._1 != e._2).distinct
    val expected = unionFind(edges)
    val got = TrainingOps.connectedComponents(edges.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("a 15-node chain converges to one cluster (multi-round propagation)") {
    val chain = (0L until 14L).map(i => (i, i + 1))
    val got = TrainingOps.connectedComponents(chain.toDF("doc_a", "doc_b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(got.length == 15 && got.forall(_._2 == 0L))
  }

  test("dedupClustersShared: every injected near-dup lands in its twin's cluster") {
    val docs = (0L until 40L).map(i =>
      (i, s"alpha beta gamma delta epsilon zeta token$i end of document"))
      .toDF("doc_id", "text")
    val dups = docs.where($"doc_id" % 4 === 0)
      .withColumn("doc_id", $"doc_id" + 1000)
      .withColumn("text", concat($"text", lit(" extra")))
    val out = TrainingOps.dedupClustersShared(docs.unionByName(dups),
      numHashes = 16, bands = 4, threshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // each twin pair (i, i+1000) must share a cluster labelled by min id
    for (i <- 0L until 40L by 4) {
      assert(out.contains(i) && out.contains(i + 1000), s"doc $i pair missing")
      assert(out(i) == out(i + 1000), s"doc $i and twin in different clusters")
    }
  }
}
