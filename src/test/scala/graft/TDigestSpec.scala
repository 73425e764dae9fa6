package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.stats.{TDigest, TDigestAgg}

import Harness.spark

/** t-digest sketch: local accuracy, merge associativity, Spark aggregation. */
class TDigestSpec extends AnyFunSuite {

  test("local digest: quantiles of uniform data within 1% of exact") {
    val rnd = new scala.util.Random(42)
    val data = Array.fill(100000)(rnd.nextDouble() * 1000)
    val td = new TDigest()
    data.foreach(td.add)
    val sorted = data.sorted
    Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99).foreach { q =>
      val exact = sorted(((data.length - 1) * q).toInt)
      val est = td.quantile(q)
      assert(math.abs(est - exact) / 1000 < 0.01, s"q=$q exact=$exact est=$est")
    }
    assert(td.centroidCount < 200) // bounded by compression, not data size
  }

  test("merge equals single-pass (partition-parallel correctness)") {
    val rnd = new scala.util.Random(7)
    val data = Array.fill(50000)(rnd.nextGaussian() * 100)
    val whole = new TDigest(); data.foreach(whole.add)
    val parts = data.grouped(7000).map { chunk =>
      val t = new TDigest(); chunk.foreach(t.add); t
    }
    val merged = parts.reduce((a, b) => a.merge(b))
    Seq(0.1, 0.5, 0.9).foreach { q =>
      assert(math.abs(merged.quantile(q) - whole.quantile(q)) < 10.0,
        s"q=$q merged=${merged.quantile(q)} whole=${whole.quantile(q)}")
    }
    assert(merged.size == data.length)
  }

  test("checkpointed digest state: merge of per-partition sketches == table-level quantiles") {
    // the metrics-store path: partitionStats emits one digest STATE per
    // partition; merging those states must reproduce whole-table quantiles
    // without re-reading data (the north star's checkpointed mergeable state)
    val df = graft.data.SequenceGen.sequences(spark, 20000L, 4)
    val stats = graft.stats.Metrics.partitionStats(df)
    val merged = graft.stats.Metrics.mergedDigest(stats, "n_tok_tdigest")
    assert(merged.size == 20000.0, "merged weight = total rows")
    val exact = df.selectExpr("percentile(n_tok, array(0.5, 0.95))")
      .collect()(0).getSeq[Double](0)
    Seq(0.5 -> exact(0), 0.95 -> exact(1)).foreach { case (q, x) =>
      val e = merged.quantile(q)
      assert(math.abs(e - x) <= math.max(3.0, x * 0.05), s"q=$q merged=$e exact=$x")
    }
    // round-trip through parquet (the actual checkpoint medium)
    val dir = java.nio.file.Files.createTempDirectory("graft-td").toString
    stats.write.mode("overwrite").parquet(dir)
    val reread = graft.stats.Metrics.mergedDigest(spark.read.parquet(dir), "n_tok_tdigest")
    assert(math.abs(reread.quantile(0.5) - merged.quantile(0.5)) < 1e-9)
  }

  test("Spark UDAF: per-partition quantiles close to exact percentile") {
    val df = graft.data.SequenceGen.sequences(spark, 20000L, 4)
    val tdq = TDigestAgg.tdigestQuantiles(0.5, 0.95)
    val rows = df.groupBy(col("part"))
      .agg(tdq(col("n_tok").cast("double")).as("td"),
           expr("percentile(n_tok, array(0.5, 0.95))").as("exact"))
      .collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val td = r.getSeq[Double](1)
      val exact = r.getSeq[Double](2)
      td.zip(exact).foreach { case (e, x) =>
        assert(math.abs(e - x) <= math.max(3.0, x * 0.05), s"td=$e exact=$x in ${r.getString(0)}")
      }
    }
  }
}
