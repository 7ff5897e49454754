package graft.ops

import org.apache.spark.sql.{Dataset, SparkSession}

/** External-process row streaming — Hadoop Streaming's PipeMapper /
  * PipeReducer (contrib/streaming/.../PipeMapper.java:35,
  * PipeReducer.java:38): fork a user command per task, stream rows to its
  * stdin, re-parse its stdout lines as records.
  *
  * Spark-native shape: `Dataset.mapPartitions` forking one process per
  * partition (the reference forks one per task — same granularity), a
  * writer thread feeding stdin so producer and consumer can't deadlock on
  * pipe buffers, and the stdout line iterator as the partition output.
  * Narrow (no shuffle); at 100 TB the process spawn cost amortizes over a
  * whole partition, exactly like the reference's per-task fork.
  */
object PipeOps {

  def pipe(ds: Dataset[String], command: Seq[String]): Dataset[String] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.mapPartitions { rows =>
      if (!rows.hasNext) Iterator.empty
      else {
        val proc = new ProcessBuilder(command: _*)
          .redirectErrorStream(false).start()
        val writer = new Thread(() => {
          val out = new java.io.PrintWriter(proc.getOutputStream)
          try rows.foreach(out.println) finally out.close()
        })
        writer.setDaemon(true)
        writer.start()
        val src = scala.io.Source.fromInputStream(proc.getInputStream)
        src.getLines()
      }
    }
  }
}
