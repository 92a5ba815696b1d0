package graft.synth

/** Deterministic synthetic SRTM tiles (the zero-egress replacement for the
  * reference's download sources, SURVEY.md §2.1 S8): seeded sum of 2-D
  * sinusoids + hash noise, int16-clamped, big-endian .hgt layout. */
object SynthDem {

  /** Elevation field for tile (lat0, lon0) at grid position (r, c). */
  def elevation(lat0: Int, lon0: Int, r: Int, c: Int, side: Int): Short = {
    val u = c.toDouble / (side - 1)
    val v = r.toDouble / (side - 1)
    val base =
      600.0 + 500.0 * math.sin(3.1 * u + 0.7 * lon0) * math.cos(2.3 * v + 0.3 * lat0) +
        300.0 * math.sin(9.7 * u + 1.1) * math.sin(7.3 * v + 0.5) +
        120.0 * math.cos(23.0 * u) * math.sin(19.0 * v)
    val noise = (Pages.mix((r.toLong * side + c) * 31 + lat0 * 7 + lon0) % 21L) - 10L
    val z = base + noise
    math.max(-1000, math.min(8000, math.round(z))).toShort
  }

  /** Write key.hgt (side x side big-endian int16) under dir; idempotent. */
  def writeHgt(dir: String, lat0: Int, lon0: Int, side: Int = 1201): String = {
    val key = graft.core.Hgt.tileKey(lat0, lon0)
    val path = s"$dir/$key.hgt"
    if (!graft.core.Fs.exists(path)) {
      graft.core.Fs.mkdirs(dir)
      val bytes = new Array[Byte](side * side * 2)
      var i = 0
      var r = 0
      while (r < side) {
        var c = 0
        while (c < side) {
          val z = elevation(lat0, lon0, r, c, side)
          bytes(i) = (z >> 8).toByte
          bytes(i + 1) = (z & 0xff).toByte
          i += 2
          c += 1
        }
        r += 1
      }
      // per-attempt unique tmp + tolerant publish: concurrent writers of
      // the same key (parallel bench/verify runs sharing a cache) must
      // not truncate each other's in-flight tmp or crash on a lost move —
      // the same hardening ArchiveSource/UriTemplateSource carry
      val tmp = s"$dir/.$key.${java.util.UUID.randomUUID().toString.take(8)}.tmp"
      graft.core.Fs.writeBytes(tmp, bytes)
      // the tmp name is per-attempt unique, so the only benign failure is
      // a concurrent writer having published identical content first
      // (local FS atomically replaces with identical bytes; HDFS-style
      // FSes refuse, validated below) — anything else (vanished dir, ...)
      // must surface, not be swallowed
      try graft.core.Fs.renameNoClobber(tmp, path)
      catch {
        case ex: java.io.IOException =>
          graft.core.Fs.delete(tmp)
          if (!graft.core.Fs.exists(path)) throw ex
      }
    }
    path
  }
}
