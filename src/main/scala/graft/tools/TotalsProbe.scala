package graft.tools

import org.apache.spark.sql.functions._

/** Interleaved A/B behind Suite's cube-derived verdict totals: the RETIRED
  * wiring (eager driver-collected `partTotalsLiteral` — one full extra
  * table scan before the job starts) vs the shipped form (totals
  * re-aggregated from the drift cube, sharing its exchange). The retired
  * shape is inlined verbatim so the measured claim stays reproducible. */
object TotalsProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = ScalingBench.session(32)
    val df = spark.read.parquet(graft.Bench.ensureParquet(spark, rows))
    val dim = graft.data.SequenceGen.dimSources(spark)
    val spec = graft.spec.SpecParser.parse(graft.data.SequenceGen.SeqSpecJson)
    import graft.dataset.CrossRow
    import graft.drift.Drift
    import graft.run.{Suite, Validator}

    // warmup (JIT + codegen + readers)
    Suite.onGenerated(spark, 50000).verdicts.agg(sum("violations")).collect()

    // RETIRED pre-cube-totals suite wiring (Suite.validateSequences as of
    // commit e32aa80): literal totals + standalone multiValidation
    def retired(): Unit = {
      val consistency = CrossRow.consistency(
        "n_tok=size(tokens)", col("n_tok") === size(col("tokens")), col("n_tok"))
      val totals = Some(CrossRow.partTotalsLiteral(df, "part"))
      val row = Validator.validate(df, spec, "doc_id", Some("part"), Vector(consistency))
      val uniq = CrossRow.uniqueness(df, "doc_id", "part", totals = totals)
      val ref = CrossRow.referential(df, "source", dim, "source", "doc_id", "part",
        totals = totals)
      val drifts = Drift.multiValidation(df, Seq(
        ("n_tok", Drift.widthBucket(col("n_tok"), 8.0), 0.05),
        ("source", col("source"), 0.05)), "part")
      (Seq(row, uniq, ref) ++ drifts).map(_.verdicts).reduce(_ unionByName _)
        .agg(sum(col("violations"))).collect()
    }
    def shipped(): Unit = {
      Suite.validateSequences(df, dim).verdicts.agg(sum(col("violations"))).collect()
    }

    val reps = 3
    val (a, b) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    (0 until reps).foreach { r =>
      val t0 = System.nanoTime(); retired(); a(r) = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); shipped(); b(r) = (System.nanoTime() - t1) / 1e9
    }
    println(f"[totals] suite literal-totals (retired): ${a.map(t => f"$t%.2f").mkString(" ")} s  min=${a.min}%.2f")
    println(f"[totals] suite cube-totals (shipped):    ${b.map(t => f"$t%.2f").mkString(" ")} s  min=${b.min}%.2f")
    spark.stop()
  }
}
