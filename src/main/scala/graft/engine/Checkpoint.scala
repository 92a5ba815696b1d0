package graft.engine

import graft.core.Fs

/** Per-partition (= per-tile) commit log + metrics/lineage tables, making
  * the pipeline resumable: a tile whose commit record exists is skipped on
  * re-run, and id offsets are rebuilt from committed counts so a resumed
  * run produces byte-identical output to a fresh one.
  *
  * This re-expresses the reference's "one output file per forked tile
  * worker" model (/root/reference/pyhgtmap/hgt/processor.py:196-265) with
  * the durable commit semantics the north rule requires (idempotent task
  * re-runs; skip committed partitions on restart).
  */
object Checkpoint {

  final case class Commit(
      key: String, tileIdx: Int, nodes: Long, ways: Long, file: String, ms: Long)

  def commitsDir(outDir: String): String = s"$outDir/_commits"

  private def fmt(c: Commit): String =
    s"""{"key":"${c.key}","tileIdx":${c.tileIdx},"nodes":${c.nodes},"ways":${c.ways},""" +
      s""""file":"${c.file}","ms":${c.ms}}"""

  private val Pat =
    """\{"key":"([^"]*)","tileIdx":(\d+),"nodes":(\d+),"ways":(\d+),"file":"([^"]*)","ms":(\d+)\}""".r

  def parse(line: String): Option[Commit] = line.trim match {
    case Pat(k, t, n, w, f, ms) => Some(Commit(k, t.toInt, n.toLong, w.toLong, f, ms.toLong))
    case _ => None
  }

  /** Executor-side durable commit: write tmp + rename, via the Hadoop
    * FileSystem API so executors commit to the shared cluster FS (HDFS
    * rename is atomic; object stores degrade to copy+delete, still safe
    * here because each tile has exactly one writer per attempt and the
    * record content is idempotent). */
  def writeCommit(outDir: String, c: Commit): Unit = {
    val dir = commitsDir(outDir)
    Fs.mkdirs(dir)
    val tmp = s"$dir/.${c.key}_${c.tileIdx}.tmp"
    Fs.writeString(tmp, fmt(c) + "\n")
    Fs.rename(tmp, s"$dir/${c.key}_${c.tileIdx}.json")
  }

  /** Driver-side: all committed tiles. */
  def readCommits(outDir: String): Seq[Commit] = {
    Fs.listFiles(commitsDir(outDir))
      .filter(_.endsWith(".json"))
      .flatMap(p => parse(Fs.readString(p)))
  }

  def deleteCommit(outDir: String, key: String, tileIdx: Int): Boolean = {
    val p = s"${commitsDir(outDir)}/${key}_$tileIdx.json"
    Fs.exists(p) && Fs.delete(p)
  }
}
