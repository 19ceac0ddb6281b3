package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, Dataset, SaveMode, SparkSession}

/** Storage facade with the reference's SDFS verb surface (SURVEY.md §2.2
  * S1–S7: put/get/delete/ls/store/get-dir/get-part-dir) re-expressed over
  * the Hadoop FileSystem API + Spark readers.
  *
  * What is deliberately NOT rebuilt (SURVEY.md §1.4): replica placement,
  * write/read quorums, timestamp freshness, re-replication, membership —
  * reference `src/SDFSServer.java:168-183,370,523,952-959,1052-1148` — all
  * of that is the filesystem's and cluster manager's job in a Spark
  * deployment. The facade keeps the *user-visible* contract: named files
  * and prefix-directories of text lines, plus the engine-native parquet
  * table forms.
  *
  * The reference forbids `_` and `-` in SDFS names because `_` delimits its
  * UDP messages (README.md:140, `src/SDFSServer.java:744`) and rewrites `/`
  * in keys to `-` (`src/SDFSServer.java:815-819`). The facade preserves the
  * key-sanitization rule for per-key compat output but drops the name
  * restrictions — there is no message protocol to protect.
  */
class Sdfs(spark: SparkSession, warehouse: String) {

  private def fs: FileSystem =
    new Path(warehouse).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def resolve(name: String): Path = new Path(warehouse, name)

  /** S1 `put`: store local text lines under an SDFS name. Last write wins —
    * the reference's update semantics (max-timestamp replica read). */
  def put(lines: Dataset[String], name: String): Unit =
    lines.write.mode(SaveMode.Overwrite).text(resolve(name).toString)

  /** S1 `put` with the reference's recent-update confirmation guard
    * (`src/SDFSServer.java:402-421`): a put over a file written within the
    * last 60 s is a likely concurrent-update conflict, so the write only
    * proceeds if `confirm` agrees — the reference prompts the user and
    * aborts after 30 s of silence; the default here is the same
    * reject-unless-confirmed. Returns true iff the write happened.
    * Semantics stay last-write-wins (the guard is conflict DETECTION
    * sugar on top, exactly like the reference's interactive prompt). */
  def putGuarded(lines: Dataset[String], name: String,
                 confirm: () => Boolean = () => false): Boolean = {
    val p = resolve(name)
    val recentlyUpdated = fs.exists(p) && {
      val age = System.currentTimeMillis() - fs.getFileStatus(p).getModificationTime
      // negative age (future mtime — clock skew on a shared FS) counts as
      // recent: the reference prompts for ANY duration <= 60 s, signed
      // (inclusive bound — SDFSServer.java:412 uses `duration <= 60000`)
      age <= 60000L
    }
    if (recentlyUpdated && !confirm()) false
    else { put(lines, name); true }
  }

  /** S1 variant: engine-native table put (parquet — columnar, splittable). */
  def putTable(df: DataFrame, name: String): Unit =
    df.write.mode(SaveMode.Overwrite).parquet(resolve(name).toString)

  /** S2 `get`: read one named file's lines. */
  def get(name: String): Dataset[String] =
    spark.read.textFile(resolve(name).toString)

  def getTable(name: String): DataFrame =
    spark.read.parquet(resolve(name).toString)

  /** S3 `delete`. */
  def delete(name: String): Boolean = fs.delete(resolve(name), true)

  /** S4 `ls`: does the file exist / where (block locations replace the
    * reference's replica list). */
  def ls(name: String): Seq[String] = {
    val p = resolve(name)
    if (!fs.exists(p)) Seq.empty
    else fs.listStatus(p).toSeq.map(s => s.getPath.getName)
  }

  /** S5 `store`: list everything in the warehouse root. */
  def store(): Seq[String] =
    if (!fs.exists(new Path(warehouse))) Seq.empty
    else fs.listStatus(new Path(warehouse)).toSeq.map(_.getPath.getName).sorted

  /** S6 `get-dir`: read every file under a prefix directory as one Dataset
    * (the reference's Maple input form, one job = one directory).
    * Recursive: `put` materializes each name as a directory of part files. */
  def getDir(dir: String): Dataset[String] =
    spark.read.option("recursiveFileLookup", "true")
      .textFile(resolve(dir).toString)

  /** S7 `get_part_dir`: read a named subset of a directory — Spark plans
    * only the requested files (partition pruning by path). */
  def getPartDir(dir: String, names: Seq[String]): Dataset[String] = {
    val paths = names.map(n => new Path(resolve(dir), n).toString)
    spark.read.textFile(paths: _*)
  }

  /** Reference key→filename sanitization (`/`→`-`,
    * `src/SDFSServer.java:815-819`) for per-key compat output. */
  def sanitizeKey(key: String): String = key.replace('/', '-')

  /** Per-key intermediate materialization — the reference's shuffle form
    * (one file per distinct key, `prefix_K`). O(distinct keys) files: compat
    * mode ONLY, never the engine default at scale (SURVEY.md §7.4). */
  def putPerKeyCompat(kvs: Dataset[graft.engine.KV], prefix: String): Unit = {
    import org.apache.spark.sql.functions._
    kvs.toDF("key", "value")
      .withColumn("key", regexp_replace(col("key"), "/", "-"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("key")
      .text(resolve(prefix).toString)
  }
}
