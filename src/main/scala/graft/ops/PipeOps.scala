package graft.ops

import org.apache.spark.TaskContext
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
  *
  * Failure semantics match the reference's PipeMapper: stderr is drained
  * on its own thread (a chatty child can't deadlock the task on a full OS
  * pipe buffer), a nonzero exit fails the task rather than silently
  * truncating output, and the child is destroyed on task completion even
  * if the output iterator was never drained (e.g. under a limit).
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
        Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] {
          _ => if (proc.isAlive) proc.destroyForcibly()
        })
        // Drain stderr continuously, keeping a bounded tail for diagnostics.
        val errTail = new java.util.concurrent.ConcurrentLinkedQueue[String]()
        val drainer = new Thread(() => {
          val src = scala.io.Source.fromInputStream(proc.getErrorStream)
          try src.getLines().foreach { l =>
            errTail.add(l)
            while (errTail.size > 20) errTail.poll()
          } catch { case _: java.io.IOException => () }
          finally src.close()
        })
        drainer.setDaemon(true)
        drainer.start()
        val writer = new Thread(() => {
          val out = new java.io.PrintWriter(proc.getOutputStream)
          try rows.foreach(out.println)
          catch { case _: Exception => () } // child died early; exit check reports it
          finally out.close()
        })
        writer.setDaemon(true)
        writer.start()
        val lines =
          scala.io.Source.fromInputStream(proc.getInputStream).getLines()
        new Iterator[String] {
          def hasNext: Boolean = {
            val h = lines.hasNext
            if (!h) {
              val rc = proc.waitFor()
              if (rc != 0) {
                val tail = {
                  val it = errTail.iterator(); val sb = new StringBuilder
                  while (it.hasNext) { sb ++= it.next(); sb += '\n' }
                  sb.result()
                }
                throw new java.io.IOException(
                  s"pipe command '${command.mkString(" ")}' exited $rc" +
                  (if (tail.nonEmpty) s"; stderr tail:\n$tail" else ""))
              }
            }
            h
          }
          def next(): String = lines.next()
        }
      }
    }
  }
}
