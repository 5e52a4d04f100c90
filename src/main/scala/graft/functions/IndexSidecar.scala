package graft.functions

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** The ONE content-addressed sidecar discipline all three index
  * families share (r11 ADVICE/verdict item 7: AnnIndex, MarginIndex
  * and VecIndex each hand-rolled the same tmp-write → delete → rename
  * → slurp sequence; the atomic-publish rules now live here, each
  * family keeps only its own render/parse).
  *
  * Contract: a sidecar is `_graft_<prefix>_meta.<md5-12>.json` beside
  * the table — content-addressed, so writing is IDEMPOTENT (same meta
  * → same path, same bytes; re-landing after a crash is harmless) and
  * a sidecar is UNREFERENCED until a commit lands rows whose `__qz`
  * stat carries its hash (the pairing [[AnnIndex.currentMetaHash]]
  * resolves). Publish is tmp + rename so a reader never sees a torn
  * file; rebuild is therefore one replacing conflict-checked commit,
  * never a mutable canonical sidecar.
  */
private[functions] object IndexSidecar {

  def hash(rendered: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(rendered.getBytes("UTF-8"))
    d.take(6).map(b => f"$b%02x").mkString
  }

  def path(table: String, prefix: String, h: String): Path =
    new Path(s"$table/_graft_${prefix}_meta.$h.json")

  private def fsFor(spark: SparkSession, table: String) =
    new Path(table).getFileSystem(spark.sessionState.newHadoopConf())

  /** Atomically publish `rendered` at its content address; returns the
    * hash the committing rows must carry in [[AnnIndex.QzCol]].
    */
  def write(spark: SparkSession, table: String, prefix: String,
            rendered: String): String = {
    val fs = fsFor(spark, table)
    val h = hash(rendered)
    val tmp = new Path(s"$table/._graft_${prefix}_meta.$h.json.tmp")
    val out = fs.create(tmp, true)
    try out.write(rendered.getBytes("UTF-8")) finally out.close()
    fs.delete(path(table, prefix, h), false)
    require(fs.rename(tmp, path(table, prefix, h)),
      s"$prefix meta rename failed for $table")
    h
  }

  /** Slurp the sidecar at `h` (callers parse their own schema). */
  def read(spark: SparkSession, table: String, prefix: String,
           h: String): String = {
    val fs = fsFor(spark, table)
    val in = fs.open(path(table, prefix, h))
    try {
      val bytes = new java.io.ByteArrayOutputStream()
      val buf = new Array[Byte](8192)
      var n = in.read(buf)
      while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
      bytes.toString("UTF-8")
    } finally in.close()
  }
}
