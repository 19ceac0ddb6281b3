package graft

import org.apache.spark.sql.SparkSession
import graft.engine.{JobRunner, KV, PipeRunner}
import graft.sources.Sdfs

/** Reference-compatible command shell (reference README.md:53-92 command
  * surface) over the engine. One command per input line on stdin, or a
  * single command via args.
  *
  *   put <local> <name>          get <name> <local>      delete <name>
  *   ls <name>                   store
  *   maple <exe|builtin:wc|builtin:rwlg> <num> <prefix> <srcDir>
  *   juice <exe|builtin:wc|builtin:rwlg> <num> <prefix> <dest> <del=0|1>
  *
  * Cluster verbs of the reference (join/leave/list/id) are no-ops here —
  * membership is the cluster manager's job (SURVEY.md §1.4). External
  * executables follow the pipe contract (lines on stdin, `key,value` on
  * stdout); the two builtin apps match the reference's shipped ones.
  * `num_tasks` is accepted for CLI compat but Spark sizes tasks itself
  * (reference's count-based splitting is D2, superseded).
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val warehouse = sys.env.getOrElse("GRAFT_WAREHOUSE", "target/graft-warehouse")
    val preExisting = SparkSession.getActiveSession.isDefined
    val builder = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.ui.enabled", "false")
    graft.core.Tables.sessionDefaults.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sdfs = new Sdfs(spark, warehouse)
    val runner = new JobRunner(spark, sdfs)
    // `@file` runs a command script (robust under sbt, which intercepts
    // stdin); bare args run one command; otherwise read stdin
    val in: Iterator[String] =
      if (args.length == 1 && args(0).startsWith("@"))
        scala.io.Source.fromFile(args(0).drop(1)).getLines()
      else if (args.nonEmpty) Iterator(args.mkString(" "))
      else scala.io.Source.stdin.getLines()
    in.map(_.trim).filter(_.nonEmpty).takeWhile(_ != "exit").foreach { line =>
      try run(spark, sdfs, runner, line.split("\\s+").toSeq)
      catch { case e: Throwable => println(s"error: ${e.getMessage}") }
    }
    if (!preExisting) spark.stop() // keep a caller's (e.g. test) session alive
  }

  private def run(spark: SparkSession, sdfs: Sdfs, runner: JobRunner,
                  cmd: Seq[String]): Unit = {
    import spark.implicits._
    cmd match {
      case Seq("put", local, name) =>
        sdfs.put(spark.read.textFile(local), name); println(s"put $name")
      case Seq("get", name, local) =>
        val lines = sdfs.get(name).collect()
        java.nio.file.Files.write(java.nio.file.Paths.get(local),
          lines.mkString("\n").getBytes("UTF-8"))
        println(s"got ${lines.length} lines")
      case Seq("delete", name) => println(s"deleted=${sdfs.delete(name)}")
      case Seq("ls", name)     => println(sdfs.ls(name).mkString(" "))
      case Seq("store")        => println(sdfs.store().mkString(" "))
      case Seq("maple", exe, _num, prefix, srcDir) =>
        val n = runner.submit(runner.MapleJob(s"${sdfsPath(sdfs, srcDir)}",
          mapleFn(spark, exe), prefix))
        println(s"maple done, $n intermediate pairs")
      case Seq("juice", exe, _num, prefix, dest, del) =>
        val n = runner.submit(runner.JuiceJob(prefix, juiceFn(spark, exe),
          s"${sdfsPath(sdfs, dest)}", deleteInput = del == "1"))
        println(s"juice done, $n output lines")
      case Seq(v @ ("join" | "leave" | "list" | "id")) =>
        println(s"$v: no-op (cluster membership is managed by Spark)")
      case other => println(s"unknown command: ${other.mkString(" ")}")
    }
  }

  private def sdfsPath(sdfs: Sdfs, name: String): String = {
    val wh = sys.env.getOrElse("GRAFT_WAREHOUSE", "target/graft-warehouse")
    s"$wh/$name"
  }

  /** builtin:wc / builtin:rwlg run in-JVM; anything else is an external
    * executable on the pipe contract. */
  private def mapleFn(spark: SparkSession, exe: String): graft.engine.MapleJuice.MapleFn =
    exe match {
      case "builtin:wc" =>
        ls => ls.flatMap(_.split("\\s+")).filter(_.nonEmpty).map(w => KV(w, "1"))
      case "builtin:rwlg" =>
        ls => ls.flatMap { l =>
          val i = l.indexOf(',')
          if (i < 0) Iterator.empty
          else Iterator.single(KV(l.substring(i + 1), l.substring(0, i)))
        }
      case _ =>
        // external exe handled via PipeRunner at the Dataset level is the
        // fast path; inside a MapleFn we spawn per-partition processes
        ls => {
          val pb = new ProcessBuilder(exe)
          pb.redirectErrorStream(true)
          val p = pb.start()
          val out = new java.io.PrintWriter(p.getOutputStream)
          ls.foreach(out.println)
          out.close()
          val res = scala.io.Source.fromInputStream(p.getInputStream)
            .getLines().flatMap { line =>
              val i = line.indexOf(',')
              if (i < 0) None
              else Some(KV(line.substring(0, i), line.substring(i + 1)))
            }.toVector
          p.waitFor()
          res.iterator
        }
    }

  private def juiceFn(spark: SparkSession, exe: String): graft.engine.MapleJuice.JuiceFn =
    exe match {
      case "builtin:wc" =>
        (k, vs) => Iterator.single(KV(k, vs.map(_.toLong).sum.toString))
      case "builtin:rwlg" =>
        (k, vs) => Iterator.single(KV(k, vs.toSet.toSeq.sorted.mkString(",")))
      case _ =>
        (k, vs) => {
          val tmp = java.nio.file.Files.createTempFile("graft_juice", ".txt")
          java.nio.file.Files.write(tmp, vs.mkString("\n").getBytes("UTF-8"))
          // reference juice contract: exe(key, valuesFile) → key,value lines
          val p = new ProcessBuilder(exe, k, tmp.toString).start()
          val res = scala.io.Source.fromInputStream(p.getInputStream)
            .getLines().flatMap { line =>
              val i = line.indexOf(',')
              if (i < 0) None
              else Some(KV(line.substring(0, i), line.substring(i + 1)))
            }.toVector
          p.waitFor()
          java.nio.file.Files.deleteIfExists(tmp)
          res.iterator
        }
    }
}
