package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints formatted plans for the headline queries and asserts the
  * scale-critical properties: parquet filter/column pushdown, broadcast
  * joins for small dims, whole-stage codegen coverage. */
object PlanCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .appName("graft-plan-check")
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "32")
      // static plans for inspection: AQE wraps stages in leaf nodes that
      // hide codegen spans from collect()
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

    var misses = 0
    def check(name: String)(df: org.apache.spark.sql.DataFrame)(
        wants: (String, String => Boolean)*): Unit = {
      val finalPlan = df.queryExecution.executedPlan
      val plan = finalPlan.toString
      val wsc = finalPlan.collect {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
      }.size
      println(s"===== $name =====")
      println(s"  whole-stage-codegen spans: $wsc")
      (("whole-stage codegen active" -> ((_: String) => wsc > 0)) +: wants).foreach {
        case (label, pred) =>
          val ok = pred(plan)
          if (!ok) misses += 1
          println(s"  [${if (ok) "OK" else "MISS"}] $label")
      }
    }

    /** engine-wide anti-pattern gate: no ScalaUDF / python-eval anywhere in
      * any driver query plan — every kernel must be a codegen-able
      * Catalyst expression. */
    def udfCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect { case n =>
        n.expressions.flatMap(_.collect {
          case u: org.apache.spark.sql.catalyst.expressions.ScalaUDF => u
          case p: org.apache.spark.sql.catalyst.expressions.PythonUDF => p
        })
      }.flatten.size

    /** companion gate: no typed-object serialization fence either —
      * mapPartitions/map on a Dataset hides imperative per-row code behind
      * DeserializeToObject/SerializeFromObject nodes that break whole-stage
      * codegen exactly like a ScalaUDF but without a ScalaUDF node; every
      * binary→struct kernel must be a Catalyst expression instead. */
    def objFenceCount(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.analyzed.collect {
        case n: org.apache.spark.sql.catalyst.plans.logical.ObjectProducer => n
        case n: org.apache.spark.sql.catalyst.plans.logical.ObjectConsumer => n
      }.size

    val queries = graft.SparkEntry.queries
    def q(name: String) = queries(name)(spark, dir)

    check("q1_agg")(q("q1_agg"))(
      "parquet scan with ReadSchema" -> (_.contains("ReadSchema")),
      "partial aggregation (map-side combine)" -> (p => p.contains("partial") || p.contains("HashAggregate")),
      "scan present" -> (_.contains("Scan")))
    check("q3_join")(q("q3_join"))(
      "broadcast join for small side" -> (_.contains("BroadcastHashJoin")),
      "pushed filters reach scan" -> (_.contains("PushedFilters: [")),
      "scan present" -> (_.contains("Scan")))
    check("geo_utm_zone")(q("geo_utm_zone"))(
      "no shuffle for per-row transform" -> (p => !p.contains("Exchange") || p.contains("HashAggregate")))
    check("geo_pip")(q("geo_pip"))(
      "broadcast of polygon cover" -> (_.contains("Broadcast")),
      "scan present" -> (_.contains("Scan")))
    check("geo_knn")(q("geo_knn"))(
      "ring-cell equi-join" -> (p => p.contains("Join") || p.contains("join")),
      "windowed top-k" -> (_.contains("Window")))
    check("dedup_minhash")(q("dedup_minhash"))(
      "shuffle on band bucket only" -> (_.contains("Exchange")),
      "scan present" -> (_.contains("Scan")))
    check("ann_lsh")(q("ann_lsh"))(
      "bucket equi-join" -> (p => p.contains("Join")),
      "scan present" -> (_.contains("Scan")))
    check("ann_index")(q("ann_index"))(
      "static partition filters prune the index scan" ->
        (p => "PartitionFilters: \\[[^\\]]".r.findFirstIn(p).isDefined),
      "bucket equi-join" -> (p => p.contains("Join")),
      "no cross product" -> (p => !p.contains("CartesianProduct")))
    check("ann_ivf")(q("ann_ivf"))(
      "cluster-id equi-join (no cross product on corpus)" -> (p => p.contains("Join")),
      "nearest-centroid assignment is a map-side argmax aggregate (max_by), " +
        "not a window over nlist x N rows" -> (p =>
          p.contains("max_by") && "partial_max_by|max_by.*\\bmerge".r.findFirstIn(p).isDefined),
      "windowed top-k" -> (_.contains("Window")))
    check("geo_utm_native")(q("geo_utm_native"))(
      "no shuffle for per-row zone dispatch" -> (p => !p.contains("Exchange") || p.contains("TakeOrdered")))
    check("q_asof")(q("q_asof"))(
      "single window carry-forward (no range join)" -> (p =>
        p.contains("Window") && !p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop")))
    check("media_features")(q("media_features"))(
      "scan present" -> (_.contains("Scan")))
    check("docs_spans")(q("docs_spans"))(
      "generate (span explode) stays in the plan" -> (_.contains("Generate")),
      "scan present" -> (_.contains("Scan")))
    check("geo_hexbin")(q("geo_hexbin"))(
      "partial aggregation (map-side combine)" -> (_.contains("HashAggregate")),
      "scan present" -> (_.contains("Scan")))
    check("geo_hot_salted")(q("geo_hot_salted"))(
      "shuffled hash join (not broadcast: salting must spread reducers)" ->
        (_.contains("ShuffledHashJoin")),
      "salt_id participates in the join keys" -> (_.contains("salt_id")),
      "no cross product" -> (p => !p.contains("CartesianProduct")))
    check("text_decontam")(q("text_decontam"))(
      "eval set broadcasts (corpus never shuffles for the probe)" ->
        (_.contains("BroadcastHashJoin")),
      "no cross product" -> (p => !p.contains("CartesianProduct")),
      "window explode stays in the plan" -> (_.contains("Generate")))
    check("q_mixture")(q("q_mixture"))(
      "rates broadcast + map-side filter" -> (_.contains("BroadcastHashJoin")),
      "no cross product" -> (p => !p.contains("CartesianProduct")))
    check("dedup_embedding")(q("dedup_embedding"))(
      "bucket equi-join" -> (p => p.contains("Join")),
      "no cross product" -> (p => !p.contains("CartesianProduct")))

    println("===== engine-wide UDF + object-fence gate =====")
    (queries.keys.toSeq.sorted :+ "entry").foreach { name =>
      val df = if (name == "entry") graft.SparkEntry.entry(spark) else q(name)
      val n = udfCount(df)
      val f = objFenceCount(df)
      if (n > 0 || f > 0) misses += 1
      println(s"  [${if (n == 0 && f == 0) "OK" else "MISS"}] $name: " +
        s"$n UDF node(s), $f object-fence node(s)")
    }

    // one full formatted plan for the record
    println("===== geo_pip formatted =====")
    q("geo_pip").explain("formatted")
    spark.stop()
    if (misses > 0) {
      println(s"PLANCHECK FAILED: $misses miss(es)")
      sys.exit(1)
    }
    println("PLANCHECK OK")
  }
}
