package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.run.{Suite, Validation}
import graft.spec.SpecParser
import graft.stats.MetricsStore

/** The deployable north-star job — the `spark-submit` entry point the north
  * rule names:
  *
  * {{{
  * spark-submit --class graft.SubmitJob graft.jar \
  *   --input  /data/sequences      (parquet/Iceberg dir, hive-partitioned by --part) \
  *   --dim    /data/dim_sources    (dimension table for referential integrity) \
  *   --out    /data/validation     (verdicts/ + violations/ written here) \
  *   --store  /data/metrics        (checkpointed state: resume skips validated parts) \
  *  [--spec   /conf/spec.json]     (defaults to the tokenized-sequence spec) \
  *  [--part   part] [--kl 0.05]
  * }}}
  *
  * Cluster sizing is spark-submit's business (`--num-executors` N or 4N —
  * the scaling-efficiency protocol in BASELINE.md); this job is
  * shape-agnostic: shuffle counts are O(partitions × checks), the
  * referential dimension broadcasts, dedup is salted, and a killed run
  * resumes from the metrics store (results are written BEFORE state is
  * marked complete — Suite.resumableRun's ordering contract).
  *
  * Exit code: 0 = all constraints passed (or nothing left to validate),
  * 1 = violations found, 2 = bad usage.
  */
object SubmitJob {

  def main(args: Array[String]): Unit = sys.exit(run(args))

  def run(args: Array[String]): Int = {
    val opts = parseArgs(args)
    val required = Seq("input", "dim", "out", "store")
    val missing = required.filterNot(opts.contains)
    if (missing.nonEmpty) {
      System.err.println(s"missing required args: ${missing.map("--" + _).mkString(" ")}")
      return 2
    }
    val spark = SparkSession.builder()
      .appName("graft-validate")
      .config("spark.sql.extensions", "graft.ext.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()

    val cfg = Suite.Config(
      part = opts.getOrElse("part", "part"),
      klThreshold = opts.get("kl").map(_.toDouble).getOrElse(0.05))
    val spec = opts.get("spec")
      .map(SpecParser.parseFile)
      .getOrElse(SpecParser.parse(graft.data.SequenceGen.SeqSpecJson))
    val out = opts("out")

    val sink: Validation => Unit = { v =>
      v.verdicts.write.mode("append").parquet(s"$out/verdicts")
      v.violations.write.mode("append").parquet(s"$out/violations")
    }

    Suite.resumableRun(
      spark.read.parquet(opts("input")),
      spark.read.parquet(opts("dim")),
      MetricsStore(opts("store")),
      spec, cfg, sink = sink) match {
      case None =>
        println("graft: nothing to validate (all partitions checkpointed)")
        0
      case Some(_) =>
        // gate on THIS run's persisted verdicts (the sink already ran)
        val failed = spark.read.parquet(s"$out/verdicts")
          .where(!col("pass")).count()
        println(s"graft: run complete, $failed failing (part, constraint) verdicts")
        if (failed == 0) 0 else 1
    }
  }

  private def parseArgs(args: Array[String]): Map[String, String] =
    args.sliding(2, 2).collect {
      case Array(k, v) if k.startsWith("--") => k.drop(2) -> v
    }.toMap
}
