package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The staged-mirror no-reuse contract (round-12 verdict #2): every
  * mirror artifact must live in a `Files.createTempDirectory` path
  * unique per JVM, created through [[StagedArtifacts.tempDir]], with NO
  * env/property override that could let a second JVM find a first JVM's
  * bytes — cross-run result caching is prohibited, and these assertions
  * keep the choke point honest at `sbt test` time.
  */
class MirrorContractSpec extends AnyFunSuite {

  private def read(path: String): String = {
    val src = scala.io.Source.fromFile(new java.io.File(path), "UTF-8")
    try src.mkString finally src.close()
  }

  test("StagedArtifacts.tempDir is createTempDirectory with no override") {
    val src = read("src/main/scala/graft/operators/StagedArtifacts.scala")
    assert(src.contains("Files.createTempDirectory"),
      "StagedArtifacts no longer allocates per-JVM temp dirs")
    Seq("sys.env", "getenv", "getProperty").foreach { needle =>
      assert(!src.contains(needle),
        s"StagedArtifacts reads '$needle' — a path override would let a " +
          "second JVM reuse a first JVM's mirror bytes (prohibited " +
          "cross-run caching)")
    }
  }

  test("every mirror build site allocates through StagedArtifacts.tempDir") {
    val sites = Seq(
      "src/main/scala/graft/queries/Relational.scala" -> "graft-copairs-",
      "src/main/scala/graft/queries/TextQueries.scala" -> "graft-lsh-",
      "src/main/scala/graft/queries/TextQueries.scala" -> "graft-shpairs-",
      "src/main/scala/graft/queries/TextQueries.scala" -> "graft-bgscores-",
      "src/main/scala/graft/queries/SimilarityQueries.scala" -> "graft-ivfpq-")
    sites.foreach { case (file, prefix) =>
      val src = read(file)
      assert(src.contains(s"""StagedArtifacts.tempDir("$prefix")"""),
        s"$file no longer stages '$prefix' through StagedArtifacts.tempDir")
    }
    // no mirror dir may bypass the registry (unregistered dirs escape
    // both the build timer and the exit-time cleanup)
    Seq("src/main/scala/graft/queries/Relational.scala",
        "src/main/scala/graft/queries/TextQueries.scala",
        "src/main/scala/graft/queries/SimilarityQueries.scala")
      .foreach { file =>
        assert(!read(file).contains("createTempDirectory"),
          s"$file allocates a temp dir outside StagedArtifacts")
      }
  }

  test("mirror sources read no environment (no reuse side-channel)") {
    val dirs = Seq("src/main/scala/graft/queries",
      "src/main/scala/graft/operators")
    dirs.foreach { d =>
      new java.io.File(d).listFiles().filter(_.getName.endsWith(".scala"))
        .foreach { f =>
          val src = read(f.getPath)
          Seq("sys.env", "getenv").foreach { needle =>
            assert(!src.contains(needle),
              s"${f.getPath} reads '$needle' — query/operator code must " +
                "take no environment input (mirror paths would become " +
                "cross-JVM reusable)")
          }
        }
    }
  }

  test("build timer accumulates and reports") {
    val before = StagedArtifacts.buildSeconds.getOrElse("spec-probe", 0.0)
    val r = StagedArtifacts.timed("spec-probe") { Thread.sleep(15); 42 }
    assert(r == 42)
    val after = StagedArtifacts.buildSeconds("spec-probe")
    assert(after - before >= 0.010,
      s"timed() did not accumulate: $before -> $after")
  }
}
