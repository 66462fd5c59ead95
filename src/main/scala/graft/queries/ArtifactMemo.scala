package graft.queries

/** Per-data-dir write-once temp artifacts for queries that exercise a
  * persisted-store / maintained-layout path (signature stores, LSH code
  * stores, compacted and Z-ordered layout copies): the first call per
  * (scope, key) writes the artifact, every later call reuses it — bench
  * reruns measure the read path, exactly as production amortizes
  * maintenance over a cadence instead of paying it per query.
  *
  * The write lambda must leave a committed artifact at the path it is
  * given. A throwing write is NOT cached (computeIfAbsent records no
  * mapping on exception), so a failed write retries on the next call
  * instead of poisoning the process with a path that never became
  * readable.
  */
private[queries] object ArtifactMemo {
  private val paths =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  def dirFor(scope: String, key: String)(write: String => Unit): String =
    paths.computeIfAbsent(scope + "|" + key, _ => {
      val p = java.nio.file.Files
        .createTempDirectory(s"graft-$scope-").toString + "/data"
      write(p)
      p
    })
}
