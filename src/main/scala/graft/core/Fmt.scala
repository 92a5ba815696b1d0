package graft.core

/** Locale-independent formatting for every byte-contract surface (OSM
  * XML coordinates, tile filenames, xyz dumps, .poly area strings, bench
  * JSON). Scala's `f` interpolator uses the JVM DEFAULT locale: on a
  * comma-decimal host (de_DE, fr_FR, ...) it prints `43,1234567`,
  * corrupting output that must parse as dot-decimal everywhere — the
  * same failure class the sinks already fixed for timestamps with
  * Locale.ROOT. Route all such formatting through here. */
object Fmt {
  def apply(fmt: String, args: Any*): String =
    String.format(java.util.Locale.ROOT, fmt, args.map(_.asInstanceOf[AnyRef]): _*)
}
