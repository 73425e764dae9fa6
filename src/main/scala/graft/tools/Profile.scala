package graft.tools

import org.apache.spark.sql.functions._

/** Per-branch timing of the suite at a given row count. */
object Profile {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val spark = ScalingBench.session(32)
    import graft.data.SequenceGen
    import graft.dataset.CrossRow
    import graft.drift.Drift
    import graft.run.Validator
    import graft.spec.SpecParser

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: ${ts.map(t => f"$t%.2f").mkString(" ")} s")
    }

    val df = spark.read.parquet(graft.Bench.ensureParquet(spark, rows))
    val dim = SequenceGen.dimSources(spark)
    val spec = SpecParser.parse(SequenceGen.SeqSpecJson)

    time("warmup-small") { graft.run.Suite.onGenerated(spark, 20000).verdicts.count() }
    time("gen-only count") { df.agg(count(lit(1))).collect() }
    time("gen-only sum n_tok") { df.agg(sum("n_tok")).collect() }
    time("gen+tokens sum size") { df.agg(sum(size(col("tokens")))).collect() }
    time("row-checks verdicts") {
      Validator.validate(df, spec, "doc_id", Some("part")).verdicts.agg(sum("violations")).collect()
    }
    time("row-checks violations") {
      Validator.validate(df, spec, "doc_id", Some("part")).violations.count()
    }
    time("uniqueness") {
      CrossRow.uniqueness(df).verdicts.agg(sum("violations")).collect()
    }
    time("referential") {
      CrossRow.referential(df, "source", dim, "source").verdicts.agg(sum("violations")).collect()
    }
    time("drift n_tok") {
      Drift.validation(df, Drift.widthBucket(col("n_tok"), 8.0), "n_tok", 0.05)
        .verdicts.agg(sum("violations")).collect()
    }
    time("drift source") {
      Drift.validation(df, col("source"), "source", 0.05)
        .verdicts.agg(sum("violations")).collect()
    }
    val stats = StageStats.attach(spark)
    time("full suite") { stats.reset(); graft.Bench.runSuite(spark, rows) }
    println(stats.report(32))
    spark.stop()
  }
}
