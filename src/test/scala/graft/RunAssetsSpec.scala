package graft

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** The run-scoped asset lifecycle (round-10 ADVICE): every tmpdir
  * parquet asset registers for end-of-JVM cleanup, and cleanup removes
  * the whole directory tree (parquet assets are directories, which
  * `deleteOnExit` cannot remove non-empty).
  */
class RunAssetsSpec extends AnyFunSuite {

  // NOTE: specs exercise the single-path `drop`, never the global
  // `cleanup()` — that drain belongs to the JVM shutdown hook alone,
  // because other suites' memoized asset paths must stay readable for
  // the rest of the test JVM's life.

  test("drop recursively deletes a registered asset tree") {
    val root = Files.createTempDirectory("graft-assets-spec")
    val inner = Files.createDirectory(root.resolve("part"))
    Files.writeString(inner.resolve("data.bin"), "x")
    RunAssets.register(root.toString)
    assert(RunAssets.registered.contains(root.toString))
    RunAssets.drop(root.toString)
    assert(!Files.exists(root))
    assert(!RunAssets.registered.contains(root.toString))
  }

  test("drop is idempotent and tolerates already-missing paths") {
    val ghost = Paths.get(System.getProperty("java.io.tmpdir"),
      "graft-assets-spec-never-created.parquet")
    RunAssets.register(ghost.toString)
    RunAssets.drop(ghost.toString)
    RunAssets.drop(ghost.toString)
    assert(!Files.exists(ghost))
  }

  test("the query-layer asset builders route through the registry") {
    val spark = SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    // no size-delta assertion: the asset is memoized per (run, dir), so
    // another suite may already have built (and registered) it
    graft.queries.TextDedup.termFreqAsset(spark, dir).count()
    val after = RunAssets.registered
    assert(after.exists(_.contains("graft-tf-")), after.mkString(", "))
  }
}
