package graft.pipeline

import java.nio.file.Files

import graft.SparkSpec
import graft.examples.TrainingPipelineDemo

/** The composed curation pipeline: every stage monotonically shrinks
  * the corpus, nothing is lost between dedup and the written splits,
  * and re-runs are deterministic.
  */
class TrainingPipelineDemoSpec extends SparkSpec {

  test("stage counts are monotone and splits partition the survivors") {
    val out = Files.createTempDirectory("graft-demo").toString
    val counts = TrainingPipelineDemo.run(spark, "/root/testdata/sf0.001", out).toMap
    assert(counts("input") > 0)
    assert(counts("quality-gate") <= counts("input"))
    assert(counts("exact-dedup") <= counts("quality-gate"))
    assert(counts("near-dup-keep-best") <= counts("exact-dedup"))
    assert(counts("decontaminated") <= counts("near-dup-keep-best"))
    assert(counts("source-capped") <= counts("decontaminated"))
    // splits are a partition of the capped survivors
    assert(counts("written-splits") == counts("source-capped"))
    // packing produced at least one full context-window stream
    assert(counts("context-windows") > 0)
    // every train doc got a curriculum schedule slot
    val train = spark.read.parquet(s"$out/train").count()
    assert(counts("scheduled-train-docs") == train)
  }

  test("the SQL source-cap stage rides the k-bounded aggregate, not a window") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val ids = TrainingPipelineDemo.sourceCapIds(spark, docs, k = 20)
    ids.collect()
    val p = ids.queryExecution.executedPlan.toString
    assert(p.contains("partial_graft_topk"), s"no map-side partial top-k:\n$p")
    assert(p.contains("ObjectHashAggregate"), s"not an object-hash aggregate:\n$p")
    assert(!p.contains("Window"), s"source cap fell back to a window rank:\n$p")
  }

  test("the pipeline is deterministic across runs") {
    val a = TrainingPipelineDemo.run(spark, "/root/testdata/sf0.001",
      Files.createTempDirectory("graft-demo-a").toString)
    val b = TrainingPipelineDemo.run(spark, "/root/testdata/sf0.001",
      Files.createTempDirectory("graft-demo-b").toString)
    assert(a == b)
  }
}
