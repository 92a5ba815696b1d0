package graft.core

import java.io.{InputStream, OutputStream}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

/** All executor/driver file I/O goes through the Hadoop FileSystem API so
  * the pipeline behaves identically on local-FS (tests, local[N]) and on a
  * real cluster filesystem (HDFS, S3A, GCS): grid reads, tile sink writes,
  * and the checkpoint commit log all resolve their FileSystem from the
  * path's scheme. Plain paths (no scheme) resolve to the default FS, which
  * in local mode is file://. */
object Fs {

  /** Hadoop configuration honoring Spark's `spark.hadoop.*` overrides:
    * executors have no active SparkSession, but SparkEnv carries the
    * SparkConf, so credentials/endpoints configured via spark-submit reach
    * the sink/commit/grid I/O on every node. */
  private def conf: Configuration = {
    val c = new Configuration()
    val env = org.apache.spark.SparkEnv.get
    if (env != null) {
      env.conf.getAll.foreach { case (k, v) =>
        if (k.startsWith("spark.hadoop.")) c.set(k.stripPrefix("spark.hadoop."), v)
      }
    }
    c
  }

  def fs(path: String): FileSystem = {
    new Path(path).getFileSystem(conf) match {
      // local FS: use the raw (checksum-free) variant — sink outputs are
      // consumer-facing files (osmium etc.) and the commit log relies on
      // exact directory listings, so no .crc sidecars. getRaw avoids
      // mutating checksum flags on the JVM-wide cached FileSystem.
      case l: org.apache.hadoop.fs.LocalFileSystem => l.getRaw
      case other => other
    }
  }

  def create(path: String): OutputStream = fs(path).create(new Path(path), true)

  def open(path: String): InputStream = fs(path).open(new Path(path))

  def readAllBytes(path: String): Array[Byte] = {
    val p = new Path(path)
    val f = fs(path)
    val len = f.getFileStatus(p).getLen
    require(len <= Int.MaxValue, s"$path too large to buffer: $len bytes")
    val buf = new Array[Byte](len.toInt)
    val in = f.open(p)
    try in.readFully(0L, buf)
    finally in.close()
    buf
  }

  def readString(path: String): String =
    new String(readAllBytes(path), java.nio.charset.StandardCharsets.UTF_8)

  def writeString(path: String, s: String): Unit = {
    val out = create(path)
    try out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  def mkdirs(path: String): Unit = {
    val p = new Path(path)
    fs(path).mkdirs(p)
  }

  def exists(path: String): Boolean = {
    val p = new Path(path)
    fs(path).exists(p)
  }

  /** File length, or -1 when absent / not a file. */
  def fileLength(path: String): Long = {
    val p = new Path(path)
    val f = fs(path)
    if (!f.exists(p)) return -1L
    val st = f.getFileStatus(p)
    if (st.isFile) st.getLen else -1L
  }

  def delete(path: String): Boolean = {
    val p = new Path(path)
    fs(path).delete(p, false)
  }

  /** Atomic-as-the-FS-allows rename (HDFS: atomic; S3A: copy+delete). */
  def rename(src: String, dst: String): Unit = {
    val s = new Path(src)
    val d = new Path(dst)
    val f = fs(src)
    f.delete(d, false)
    if (!f.rename(s, d)) throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  /** Publish rename that never deletes an existing destination: local FS
    * rename atomically replaces (same content in publish races, no
    * deleted-file window); HDFS-style FSes fail on an existing dst, which
    * callers treat as "another publisher won" after validating dst. The
    * delete-then-rename `rename` above is for paths that INTEND replace
    * (commit logs); using it for cache publishes opens a window where a
    * concurrently-published valid file is deleted. */
  def renameNoClobber(src: String, dst: String): Unit = {
    val f = fs(src)
    if (!f.rename(new Path(src), new Path(dst)))
      throw new java.io.IOException(s"rename $src -> $dst failed")
  }

  /** Build-once cache-dir publish: if `dest` already carries the marker
    * file, reuse it; otherwise populate a caller-unique stage dir, drop
    * the marker, and publish with a no-clobber rename (the loser of a
    * concurrent race discards its stage and reads the winner's identical
    * content). Stale partial dirs from crashed runs are cleared first.
    * Shared by every "derive a table once per input, reuse across runs"
    * site (q18's clustered table, q54's WARC framing). */
  def publishOnce(dest: String, stageSuffix: String, marker: String = "_SUCCESS")(
      populate: String => Unit): Unit = {
    if (exists(s"$dest/$marker")) return
    if (exists(dest)) delete(dest)
    val stage = s"$dest.$stageSuffix.stage"
    populate(stage)
    if (!exists(s"$stage/$marker")) writeString(s"$stage/$marker", "ok")
    try renameNoClobber(stage, dest)
    catch { case _: java.io.IOException => delete(stage) }
  }

  /** Non-recursive file listing (names only). */
  def listFiles(dir: String): Seq[String] = {
    val p = new Path(dir)
    val f = fs(dir)
    if (!f.exists(p)) return Nil
    f.listStatus(p).toSeq.filter(_.isFile).map(_.getPath.toString)
  }

  /** Non-recursive listing with lengths from the SAME listStatus round
    * trip (per-file fileLength() calls re-stat each path — O(n) RPCs an
    * object-store listing already answered). */
  def listFilesWithLen(dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val f = fs(dir)
    if (!f.exists(p)) return Nil
    f.listStatus(p).toSeq.filter(_.isFile).map(s => (s.getPath.toString, s.getLen))
  }
}
