package graft.engine

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

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

  /** Executor-side durable commit: write tmp + atomic rename. */
  def writeCommit(outDir: String, c: Commit): Unit = {
    val dir = Paths.get(commitsDir(outDir))
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".${c.key}_${c.tileIdx}.tmp")
    Files.writeString(tmp, fmt(c) + "\n")
    Files.move(tmp, dir.resolve(s"${c.key}_${c.tileIdx}.json"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Driver-side: all committed tiles. */
  def readCommits(outDir: String): Seq[Commit] = {
    val dir = Paths.get(commitsDir(outDir))
    if (!Files.isDirectory(dir)) return Nil
    Files.list(dir).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .flatMap(p => parse(Files.readString(p)))
      .toSeq
  }

  def deleteCommit(outDir: String, key: String, tileIdx: Int): Boolean =
    Files.deleteIfExists(Paths.get(commitsDir(outDir), s"${key}_$tileIdx.json"))
}
