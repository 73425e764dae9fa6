package graft.tools

import org.apache.spark.sql.functions._

/** A/B behind `CrossRow.duplicateKeys`' single-exchange rewrite: the
  * RETIRED explicit-salt formulation (materialized `spark_partition_id()`
  * column → a (key, salt) exchange for groups that are already
  * partition-local) vs the shipped form. The retired shape is inlined here
  * verbatim so the 8.4 s → 5.1 s / 663 → 342 CPU-s claim in
  * BASELINE.md/NOTES_r3.md stays reproducible after the production code
  * moved on. */
object UniqProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(10000000L)
    val spark = ScalingBench.session(32)
    val dir = graft.Bench.ensureParquet(spark, rows)
    val df = spark.read.parquet(dir)
    val stats = StageStats.attach(spark)

    def time(name: String)(f: => Unit): Unit = {
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[uniq] $name: ${ts.map(t => f"$t%.2f").mkString(" ")} s")
    }

    // RETIRED pre-rewrite shape: explicit salt column, (key, salt) exchange
    stats.reset()
    time("two-stage salted (retired shape)") {
      val hashed = df.select(col("doc_id"), xxhash64(col("doc_id")).as("_kh"))
      val partial = hashed.select(col("_kh"))
        .withColumn("_salt", spark_partition_id())
        .groupBy(col("_kh"), col("_salt"))
        .agg(count(lit(1)).as("_pc"))
      val dupHashes = partial.groupBy(col("_kh"))
        .agg(sum(col("_pc")).as("_hc"))
        .where(col("_hc") > 1)
        .select(col("_kh"))
      hashed.join(dupHashes, Seq("_kh"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 1).count()
    }
    println(stats.report(32))

    // shipped single-exchange form (what CrossRow.duplicateKeys compiles to)
    stats.reset()
    time("single-exchange (shipped)") {
      graft.dataset.CrossRow.duplicateKeys(df, "doc_id").count()
    }
    println(stats.report(32))

    // -- second pair: the r3 late-round verdict-path fusion -----------------
    // RETIRED unfused uniqueness: detection + exact recount + a THIRD scan
    // joining the dup key set back to the rows (what `uniqueness` compiled
    // to before dupCandidates). Interleaved with the shipped fused form;
    // fresh frames per rep so the fused path pays its localCheckpoint.
    def retiredVerdicts(): Unit = {
      val dups = graft.dataset.CrossRow.duplicateKeys(df, "doc_id")
      val violations = df.select(col("part"), col("doc_id")).join(dups, Seq("doc_id"))
      graft.dataset.CrossRow.verdictsFromViolations(
          graft.dataset.CrossRow.partTotals(df, "part"), violations,
          1000, "dataset/unique:doc_id")
        .agg(sum(col("violations"))).collect()
    }
    def shippedVerdicts(): Unit = {
      graft.dataset.CrossRow.uniqueness(df)
        .verdicts.agg(sum(col("violations"))).collect()
    }
    val reps = 3
    val (a, b) = (Array.fill(reps)(0.0), Array.fill(reps)(0.0))
    (0 until reps).foreach { r =>
      val t0 = System.nanoTime(); retiredVerdicts(); a(r) = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime(); shippedVerdicts(); b(r) = (System.nanoTime() - t1) / 1e9
    }
    println(f"[uniq] verdicts unfused (retired): ${a.map(t => f"$t%.2f").mkString(" ")} s  min=${a.min}%.2f")
    println(f"[uniq] verdicts fused (shipped):   ${b.map(t => f"$t%.2f").mkString(" ")} s  min=${b.min}%.2f")
    spark.stop()
  }
}
