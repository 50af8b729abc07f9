package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

/** FixtureCache: the build-once/atomic-publish discipline behind the
  * steady-state model/index fixtures (ADVICE r9 — concurrent Bench +
  * test JVMs must never tear a published artifact). */
class FixtureCacheSpec extends AnyFunSuite {

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft-fixture-cache").toString
    s"$d/artifact"
  }

  test("ensure builds exactly once across concurrent threads") {
    val root = freshRoot()
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 8).map { _ =>
      new Thread(() => {
        FixtureCache.ensure(root) { tmp =>
          builds.incrementAndGet()
          Files.createDirectories(Paths.get(tmp))
          Files.writeString(Paths.get(s"$tmp/data"), "payload")
          Thread.sleep(50) // widen the race window
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get == 1, "build ran more than once")
    assert(Files.readString(Paths.get(s"$root/data")) == "payload")
    assert(Files.exists(Paths.get(s"$root/_READY")))
  }

  test("a crashed build leaves no root; the next ensure rebuilds") {
    val root = freshRoot()
    intercept[RuntimeException] {
      FixtureCache.ensure(root) { tmp =>
        Files.createDirectories(Paths.get(tmp))
        Files.writeString(Paths.get(s"$tmp/data"), "torn")
        throw new RuntimeException("simulated build crash")
      }
    }
    // the torn attempt must NOT be visible as a published root
    assert(!Files.exists(Paths.get(s"$root/_READY")))
    FixtureCache.ensure(root) { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(s"$tmp/data"), "good")
    }
    assert(Files.readString(Paths.get(s"$root/data")) == "good")
  }

  test("ensureSidecar publishes into an existing root, marker last") {
    val root = freshRoot()
    FixtureCache.ensure(root) { tmp =>
      Files.createDirectories(Paths.get(tmp))
      Files.writeString(Paths.get(s"$tmp/data"), "base")
    }
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val threads = (1 to 4).map { _ =>
      new Thread(() => {
        FixtureCache.ensureSidecar(root, "side", "_SIDE_READY") { tmp =>
          builds.incrementAndGet()
          Files.createDirectories(Paths.get(tmp))
          Files.writeString(Paths.get(s"$tmp/extra"), "sidecar")
        }
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    assert(builds.get == 1)
    assert(Files.readString(Paths.get(s"$root/side/extra")) == "sidecar")
    assert(Files.exists(Paths.get(s"$root/_SIDE_READY")))
  }

  test("fingerprint changes when a file's length or mtime changes") {
    val dir = Files.createTempDirectory("graft-fp")
    val f = dir.resolve("part-0.parquet")
    Files.writeString(f, "aaaa")
    val fp1 = FixtureCache.fingerprint(dir.toString)
    assert(fp1.length == 16 && fp1.matches("[0-9a-f]+"))
    Files.writeString(f, "aaaabbbb")
    val fp2 = FixtureCache.fingerprint(dir.toString)
    assert(fp1 != fp2)
    // same-length rewrite: mtime still moves it
    Files.writeString(f, "ccccdddd")
    Files.setLastModifiedTime(f,
      java.nio.file.attribute.FileTime.fromMillis(
        System.currentTimeMillis() + 5000))
    assert(FixtureCache.fingerprint(dir.toString) != fp2)
  }
}
