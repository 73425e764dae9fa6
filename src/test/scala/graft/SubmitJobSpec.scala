package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import Harness.spark

/** The spark-submit entry point end-to-end on local dirs: outputs written,
  * exit codes, resume skip. (Harness's session is what getOrCreate returns
  * in-JVM, so SubmitJob.run drives the same engine the cluster job would.) */
class SubmitJobSpec extends AnyFunSuite {

  test("SubmitJob validates, writes outputs, gates exit code, resumes") {
    val dir = java.nio.file.Files.createTempDirectory("graft-submit").toString
    graft.data.SequenceGen.sequences(spark, 20000L, 4)
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/input")
    graft.data.SequenceGen.dimSources(spark)
      .write.mode("overwrite").parquet(s"$dir/dim")

    val args = Array(
      "--input", s"$dir/input", "--dim", s"$dir/dim",
      "--out", s"$dir/out", "--store", s"$dir/store")

    // generated data has injected violations → exit 1, outputs present
    assert(SubmitJob.run(args) == 1)
    val verdicts = spark.read.parquet(s"$dir/out/verdicts")
    assert(verdicts.where(!col("pass")).count() > 0)
    assert(spark.read.parquet(s"$dir/out/violations").count() > 0)
    val verdictCount = verdicts.count()

    // second invocation: everything checkpointed → nothing to do, exit 0,
    // outputs NOT duplicated
    assert(SubmitJob.run(args) == 0)
    assert(spark.read.parquet(s"$dir/out/verdicts").count() == verdictCount)

    // bad usage
    assert(SubmitJob.run(Array("--input", "x")) == 2)
  }
}
