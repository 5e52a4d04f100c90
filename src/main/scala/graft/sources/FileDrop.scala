package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{RunLog, RunStatus}
import graft.state.LogStore

/** File-drop ingestion driver — S8's consumption side (reference:
  * extractors/ingest_files.py:22-178). The IMAP fetch is out-of-engine (a
  * mail client, not a query engine); what remains engine-relevant is the
  * capability the reference builds around it: files LAND in a drop
  * directory, each configured source CLAIMS files by filename pattern,
  * the same file is never processed twice (the reference's
  * `os.path.isfile` stamp check, ingest_files.py:57-62), and claimed
  * files are appended to the lake.
  *
  * The processed-file manifest is keyed (name, size, mtime): a re-dropped
  * file with the same name but new content is reprocessed, a bit-identical
  * re-list is not. Write-then-commit ordering makes a crash between lake
  * append and manifest commit re-process that batch — at-least-once, the
  * latest-row view dedups (same contract as the ingestion spine).
  *
  * Spark-first note: for a CONTINUOUSLY-fed directory the native answer is
  * Structured Streaming's file source, whose checkpointed file log is this
  * manifest built in (see EventsStream). This batch driver covers the
  * reference's scheduled-pull shape: run, claim, load, exit. Directory
  * listing + manifest diff are driver-side (file COUNTS are driver-scale
  * metadata even at 100 TB of file *bytes*); the data path — read, lake
  * append — is fully distributed.
  */
final case class FileDropSpec(
    name: String, pattern: String, format: String = "csv",
    options: Map[String, String] = Map("header" -> "true"),
    schemaDdl: Option[String] = None, ingestionId: Long = 0L)

final case class DropFile(path: String, name: String, size: Long, mtime: Long)

final class FileDropSource(spark: SparkSession, dropDir: String, manifestPath: String) {
  import spark.implicits._

  private def fs = new Path(dropDir)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Files in the drop directory whose NAME matches the spec's pattern. */
  def listMatching(spec: FileDropSpec): Seq[DropFile] = {
    val p = new Path(dropDir)
    if (!fs.exists(p)) return Nil
    val re = spec.pattern.r
    fs.listStatus(p).toSeq.filter(_.isFile)
      .map(s => DropFile(s.getPath.toString, s.getPath.getName, s.getLen, s.getModificationTime))
      .filter(f => re.pattern.matcher(f.name).matches())
      .sortBy(_.name)
  }

  /** Missing manifest = nothing processed yet. Existence is probed via
    * Hadoop FS, not by exception type — see LogStore.read for why (the
    * missing-path error class varies with session state).
    */
  def manifest(): DataFrame = {
    val mp = new Path(manifestPath)
    val mfs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def empty = Seq.empty[(String, String, Long, Long, String)]
      .toDF("source", "name", "size", "mtime", "processed_at")
    if (!mfs.exists(mp)) empty
    else try spark.read.parquet(manifestPath)
    catch { case _: org.apache.spark.sql.AnalysisException => empty }
  }

  /** Matching files not yet claimed by this source — a `left_anti` join
    * of the (driver-scale) drop listing against the manifest, so the
    * manifest side never collects to the driver: a years-old manifest of
    * millions of processed files stays distributed, and only the pending
    * claim list (bounded by the current drop listing, which a scheduled
    * pull needs driver-side anyway to read and commit) comes back.
    */
  def pending(spec: FileDropSpec): Seq[DropFile] = {
    val listed = listMatching(spec)
    if (listed.isEmpty) return Nil
    pendingDf(spec, listed).as[DropFile].collect().toSeq.sortBy(_.name)
  }

  private[sources] def pendingDf(spec: FileDropSpec, listed: Seq[DropFile]): DataFrame = {
    val done = manifest().filter(col("source") === spec.name)
      .select(col("name"), col("size"), col("mtime"))
    listed.toDF()
      .join(done, Seq("name", "size", "mtime"), "left_anti")
      .select(col("path"), col("name"), col("size"), col("mtime"))
  }

  /** One DataFrame over the claimed files, `source_file` attached for
    * lineage (which drop produced each lake row).
    */
  def read(spec: FileDropSpec, files: Seq[DropFile]): DataFrame = {
    val r0 = spark.read.format(spec.format).options(spec.options)
    val r = spec.schemaDdl.fold(r0)(r0.schema)
    r.load(files.map(_.path): _*).withColumn("source_file", input_file_name())
  }

  /** Record files as processed (locked append — same shared-staging-area
    * discipline as LogStore.append; see SCALE.md expression notes).
    */
  def commit(spec: FileDropSpec, files: Seq[DropFile]): Unit =
    FileDropSource.lockFor(manifestPath).synchronized {
      files.map(f => (spec.name, f.name, f.size, f.mtime, LogStore.now()))
        .toDF("source", "name", "size", "mtime", "processed_at")
        .write.mode(SaveMode.Append).parquet(manifestPath)
    }

  /** Claim → load → commit, one scheduled pull. Returns the claimed
    * files (empty = nothing new; no lake write, no log row).
    */
  def runOnce(spec: FileDropSpec, lakePath: String,
              logStore: Option[LogStore] = None): Seq[DropFile] = {
    val files = pending(spec)
    if (files.isEmpty) return Nil
    val df = read(spec, files)
    df.write.mode(SaveMode.Append).parquet(lakePath)
    // Re-stat before committing: a file overwritten IN PLACE between the
    // listing and the load was read with its NEW content — stamping the
    // stale claim-time (size, mtime) would make the next pull re-claim
    // (new stat ∉ manifest) and double-load it. Recording the post-load
    // stat closes that; an overwrite DURING the load remains the
    // documented at-least-once window (latest-row view dedups).
    val stamped = files.map { f =>
      val p = new Path(f.path)
      if (fs.exists(p)) {
        val s = fs.getFileStatus(p)
        f.copy(size = s.getLen, mtime = s.getModificationTime)
      } else f // vanished after load: keep the claim-time stat
    }
    commit(spec, stamped)
    logStore.foreach(_.append(Seq(RunLog(spec.ingestionId, RunStatus.Success,
      "", "", files.size.toLong, 0L,
      s"file-drop: ${files.size} files claimed by ${spec.name}", LogStore.now()))))
    files
  }
}

object FileDropSource {
  private val locks = new java.util.concurrent.ConcurrentHashMap[String, Object]()
  private def lockFor(path: String): Object =
    locks.computeIfAbsent(path, _ => new Object)

  /** Report-URL extraction — the engine-side half of the reference's
    * mail-body step (extractors/ingest_files.py:123-141: strip CRLF,
    * then regex the href of the anchor after a marker comment). Given a
    * column of HTML bodies, returns the first href following `marker`
    * (null when absent). Pure codegen column (`regexp_extract`), no UDF
    * — with this, the only out-of-engine step left in the S8 pipeline
    * is the network fetch itself.
    */
  def reportUrl(body: org.apache.spark.sql.Column,
                marker: String = "<!-- CTA OUTLOOK END-->"): org.apache.spark.sql.Column = {
    val cleaned = regexp_replace(body, "\\r\\n", "")
    // href value: optionally quoted, terminated by quote/space/'>'
    val re = java.util.regex.Pattern.quote(marker) + "\\s*<a\\s+href=[\"']?([^\"' >]+)"
    val url = regexp_extract(cleaned, re, 1)
    when(url =!= "", url)
  }

  /** Every href in an HTML body, in document order — the generalized
    * form (the reference hard-codes one marker; an audit over a mailbox
    * dump wants them all). `regexp_extract_all` stays codegen.
    */
  def allUrls(body: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_extract_all(regexp_replace(body, "\\r\\n", ""),
      lit("<a\\s+href=[\"']?([^\"' >]+)"), lit(1))
}
