package graft

import java.nio.file.{Files, Path, Paths}
import java.util.Comparator

/** Registry for the run-scoped parquet assets (minhash signatures,
  * dup-pair ledger, component labels, per-doc xent, term frequencies,
  * unified ledger, phash/mediafeat) that the query layer materialises
  * once per (run, dir) under `java.io.tmpdir`.
  *
  * Before round 10 these were never deleted — each run leaked a
  * corpus-sized tokenized snapshot on disk (the term-frequency asset
  * is the full (doc_id, source, token, m) explode, the largest of
  * them). `File.deleteOnExit` can't remove a non-empty parquet
  * DIRECTORY, so every asset path registers here and one JVM shutdown
  * hook deletes the trees recursively. At lake scale the equivalent
  * assets live under an object-store run prefix with a TTL/lifecycle
  * rule; the tmpdir hook is that lifecycle rule scaled to one node
  * (see SCALE.md, run-scoped assets).
  */
object RunAssets {

  private val paths = new java.util.concurrent.ConcurrentLinkedQueue[String]()

  /** Register a run-scoped asset path for end-of-JVM cleanup; returns
    * the path so call sites can register inline. */
  def register(p: String): String = { paths.add(p); p }

  /** Registered-and-not-yet-deleted asset paths (for specs). */
  def registered: Seq[String] = {
    val it = paths.iterator(); val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Recursively delete every registered asset tree. Idempotent;
    * invoked by the JVM shutdown hook ONLY — the asset-path memo maps
    * in the query layer still point at these paths, so draining the
    * registry mid-session would break every later asset read. */
  def cleanup(): Unit = {
    var p = paths.poll()
    while (p != null) {
      deleteTree(Paths.get(p))
      p = paths.poll()
    }
  }

  /** Delete ONE registered tree and forget it — the spec-safe surface
    * (a mid-session global cleanup would invalidate other suites'
    * memoized asset paths). */
  private[graft] def drop(p: String): Unit = {
    paths.remove(p)
    deleteTree(Paths.get(p))
  }

  private def deleteTree(root: Path): Unit =
    if (Files.exists(root)) {
      val walk = Files.walk(root)
      try {
        walk.sorted(Comparator.reverseOrder[Path]())
          .forEach(f => Files.deleteIfExists(f))
      } finally walk.close()
    }

  Runtime.getRuntime.addShutdownHook(new Thread(() => cleanup(),
    "graft-run-assets-cleanup"))
}
