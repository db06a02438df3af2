package graft

import org.scalatest.funsuite.AnyFunSuite

/**
 * Pins the input-sized AQE initial-partition rule (Sessions.initialPartitions):
 * never below cores, grows one partition per ~8 MB of on-disk input
 * (≈64 MB post-expansion for pair-generating stages), capped at 16x cores.
 * The rule exists because a fixed wide ceiling taxed every small-scale
 * shuffle (+105 s across the sf0.1 surface, bench/BENCH_LOCAL_r08b vs r08)
 * while a fixed narrow one overflowed per-task memory at sf10.
 */
class SessionsSpec extends AnyFunSuite {
  private val MB = 1L << 20

  test("small inputs never start wider than the core count") {
    assert(Sessions.initialPartitions(32, 0L) === 32)
    assert(Sessions.initialPartitions(32, 15 * MB) === 32)   // ~sf0.1
    assert(Sessions.initialPartitions(32, 154 * MB) === 32)  // ~sf1
    assert(Sessions.initialPartitions(4, 15 * MB) === 4)
  }

  test("large inputs widen by ~8 MB per partition within the 16x cap") {
    assert(Sessions.initialPartitions(32, 1536 * MB) === 192) // ~sf10
    assert(Sessions.initialPartitions(32, 100L * 1024 * MB) === 512) // capped
    assert(Sessions.initialPartitions(8, 1536 * MB) === 128)  // 16x cap binds
  }

  test("dirBytes sums a directory tree and is 0 for a missing path") {
    val d = java.nio.file.Files.createTempDirectory("graft-sessions").toFile
    val f = new java.io.File(d, "x.bin")
    java.nio.file.Files.write(f.toPath, Array.fill[Byte](1024)(1))
    val sub = new java.io.File(d, "sub"); sub.mkdirs()
    java.nio.file.Files.write(new java.io.File(sub, "y.bin").toPath,
      Array.fill[Byte](512)(2))
    assert(Sessions.dirBytes(d.getAbsolutePath) === 1536L)
    assert(Sessions.dirBytes(d.getAbsolutePath + "-nope") === 0L)
  }
}
