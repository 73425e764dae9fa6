package graft.tools

import org.apache.spark.sql.functions._

/** Interleaved A/B behind the post-e32aa80 suite fusions (checkpointed
  * shared cube, cube-derived totals, referential verdicts from cube): the
  * RETIRED wiring (eager driver-collected `partTotalsLiteral` extra scan,
  * un-checkpointed cube re-aggregated per drift dim, row-level referential
  * verdicts) vs the shipped `Suite.validateSequences`. The retired shape
  * is inlined verbatim so the measured claim stays reproducible. */
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
    // commit e32aa80): literal totals, row-level referential verdicts, and
    // the UN-checkpointed cube re-aggregated per drift dim (today's
    // Drift.multiValidation checkpoints the cube, so it is inlined here
    // without the checkpoint to match what e32aa80 actually ran)
    def retired(): Unit = {
      val consistency = CrossRow.consistency(
        "n_tok=size(tokens)", col("n_tok") === size(col("tokens")), col("n_tok"))
      val totals = Some(CrossRow.partTotalsLiteral(df, "part"))
      val row = Validator.validate(df, spec, "doc_id", Some("part"), Vector(consistency))
      val uniq = CrossRow.uniqueness(df, "doc_id", "part", totals = totals)
      val ref = CrossRow.referential(df, "source", dim, "source", "doc_id", "part",
        totals = totals)
      val dims = Seq(
        ("n_tok", Drift.widthBucket(col("n_tok"), 8.0), 0.05),
        ("source", col("source"), 0.05))
      val drifts = Drift.multiValidationFromCube(Drift.cube(df, dims, "part"), dims)
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
