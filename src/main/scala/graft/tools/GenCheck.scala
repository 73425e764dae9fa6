package graft.tools

import org.apache.spark.sql.functions._

/** One-shot parity check: the current generator must reproduce EXACTLY the
  * bytes of a previously generated bench table (order-insensitive full-row
  * hash + count). Usage: `runMain graft.tools.GenCheck <rows> <numParts>`. */
object GenCheck {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(50000L)
    val numParts = args.lift(1).map(_.toInt).getOrElse(16)
    val spark = ScalingBench.session(8)
    val dir = s"/tmp/graft_bench/seq_${rows}_$numParts"
    def sig(df: org.apache.spark.sql.DataFrame) =
      df.select(xxhash64(col("doc_id"), col("tokens"), col("n_tok"),
          col("source"), col("part")).as("h"))
        .agg(count(lit(1)), sum(pmod(col("h"), lit(1000003L))),
          sum(pmod(col("h"), lit(999983L))), sum(pmod(col("h"), lit(7919L))))
        .collect()(0).toSeq
    val old = sig(spark.read.parquet(dir))
    val neu = sig(graft.data.SequenceGen.sequences(spark, rows, numParts))
    println(s"[gencheck] old=$old new=$neu ${if (old == neu) "IDENTICAL" else "DIFFER"}")
    spark.stop()
    if (old != neu) sys.exit(1)
  }
}
