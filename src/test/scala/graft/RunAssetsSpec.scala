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

  test("the shutdown hook deletes every registration — observed from a " +
      "probe JVM (r12 verdict, directive 6)") {
    // in-JVM tests can only exercise drop(); whether the HOOK fires and
    // removes registered trees is observable only from outside. Launch
    // a bare probe JVM (RunAssets has no Spark dependency), let it exit
    // normally, and assert its registered trees are gone.
    val java = s"${System.getProperty("java.home")}/bin/java"
    val p = new ProcessBuilder(java, "-cp",
      System.getProperty("java.class.path"), "graft.RunAssetsHookProbe")
      .redirectErrorStream(true).start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    val code = p.waitFor()
    assert(code == 0, s"probe exited $code:\n$out")
    val paths = out.linesIterator.filter(_.contains("graft-hookprobe"))
      .toSeq
    assert(paths.size == 2, s"probe printed: $out")
    paths.foreach(pth => assert(!Files.exists(Paths.get(pth)),
      s"shutdown hook left $pth behind"))
  }

  test("gated winnow queries are asset-build-order independent: " +
      "reversed first-touch order yields identical results") {
    // the d32b 7s-vs-34s spread between the r12 sf10 batteries was
    // first-touch ACCOUNTING (who pays the asset build), never answer
    // drift — this pins the second half: two copies of the same corpus,
    // assets forced in opposite orders, byte-identical query results.
    val spark = SparkTestSession.spark
    import graft.queries.TextDedup
    val src = Paths.get("/root/testdata/sf0.001/documents.parquet")
    def mkCopy(tag: String): String = {
      val d = Files.createTempDirectory(s"graft-order-$tag")
      // the driver writes single-FILE parquet; keep directory support
      // in case the fixture layout ever changes
      if (Files.isDirectory(src)) {
        val tgt = Files.createDirectory(d.resolve("documents.parquet"))
        Files.list(src).forEach(f =>
          Files.copy(f, tgt.resolve(f.getFileName.toString)))
      } else Files.copy(src, d.resolve("documents.parquet"))
      d.toString
    }
    val dirA = mkCopy("a")
    val dirB = mkCopy("b")
    def run(dir: String, names: Seq[String]): Map[String, Seq[String]] =
      names.map { n =>
        val df = n match {
          case "d30" => TextDedup.d30Winnowing(spark, dir)
          case "d9w" => TextDedup.d9wContainmentWinnow(spark, dir)
          case "pairs" => TextDedup.winnowPairs(spark, dir)
            .orderBy("id_a", "id_b")
          case "labels" => TextDedup.winnowLabels(spark, dir)
            .orderBy("doc_id")
        }
        n -> df.collect().map(_.toString).toSeq
      }.toMap
    val order = Seq("d30", "d9w", "pairs", "labels")
    val a = run(dirA, order)
    val b = run(dirB, order.reverse)
    order.foreach(n => assert(a(n) == b(n),
      s"$n drifts under reversed asset build order"))
    assert(a("pairs").nonEmpty && a("labels").nonEmpty)
  }
}
