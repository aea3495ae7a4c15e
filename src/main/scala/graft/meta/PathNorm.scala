package graft.meta

/** One canonical local-path normalization for the whole engine — the
  * previous three near-copies (table staging, streaming appId, DELETE's
  * per-file attribution) had already started to diverge on opaque URIs
  * and URI-hostile characters. */
object PathNorm {

  /** Strip a file: scheme down to the local path; non-file URIs and
    * URI-hostile inputs pass through unchanged. */
  def stripFileScheme(p: String): String =
    if (p.startsWith("file:"))
      try Option(new java.net.URI(p).getPath).getOrElse(p)
      catch { case _: Exception => p }
    else p

  /** Canonical absolute form for comparing local paths from different
    * producers (user-supplied roots with trailing slashes or relative
    * segments vs. input_file_name() URIs): scheme stripped, resolved
    * against the working directory, dot-segments removed. Non-local URIs
    * (s3a://…) pass through scheme-stripped only. */
  def canonical(p: String): String = {
    val raw = stripFileScheme(p)
    if (raw.contains(":/")) raw // non-local URI: no filesystem resolution
    else
      try java.nio.file.Paths.get(raw).toAbsolutePath.normalize.toString
      catch { case _: Exception => raw }
  }
}
