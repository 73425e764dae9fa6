package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Stage-level accounting: wall vs summed task time per stage — separates
  * "not enough parallel work" from "serial driver time" when tuning the
  * scaling efficiency (BASELINE.md protocol). */
final class StageStats extends SparkListener {
  final case class Row(id: Int, name: String, wallMs: Long, taskMs: Long, tasks: Int)
  val rows: mutable.ArrayBuffer[Row] = mutable.ArrayBuffer.empty

  override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
    val info = sc.stageInfo
    val wall = (for {s <- info.submissionTime; c <- info.completionTime} yield c - s).getOrElse(0L)
    rows += Row(info.stageId, info.name.takeWhile(_ != '\n').take(60),
      wall, info.taskMetrics.executorRunTime, info.numTasks)
  }

  def reset(): Unit = rows.clear()

  def report(cores: Int): String = {
    val totalWall = rows.map(_.wallMs).sum
    val totalTask = rows.map(_.taskMs).sum
    val lines = rows.sortBy(-_.wallMs).take(15).map { r =>
      f"  stage ${r.id}%4d ${r.name}%-60s wall=${r.wallMs / 1000.0}%6.2fs task=${r.taskMs / 1000.0}%8.2fs tasks=${r.tasks}%4d par=${if (r.wallMs > 0) r.taskMs.toDouble / r.wallMs else 0.0}%5.1f"
    }
    f"stages=${rows.size} sum_stage_wall=${totalWall / 1000.0}%.2fs sum_task_time=${totalTask / 1000.0}%.2fs avg_parallelism=${if (totalWall > 0) totalTask.toDouble / totalWall else 0.0}%.1f (cores=$cores)\n" +
      lines.mkString("\n")
  }
}

object StageStats {
  def attach(spark: SparkSession): StageStats = {
    val l = new StageStats
    spark.sparkContext.addSparkListener(l)
    l
  }
}
