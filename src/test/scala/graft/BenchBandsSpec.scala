package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench band parser against the round-16 regression class:
  * the driver's BENCH_r*.json artifacts wrap the bench line in an
  * escaped "tail" STRING, so per-query entries read `\"name\":1.23` on
  * disk. A regex requiring unescaped quotes matches ZERO entries across
  * every artifact — silently disabling the band-aware outlier re-probe
  * while the code claims it. These tests parse the REAL committed
  * artifacts, not synthetic fixtures.
  */
class BenchBandsSpec extends AnyFunSuite {

  private val repoRoot = sys.props.getOrElse("user.dir", ".")

  test("parseBands recovers per-query medians from real BENCH_r*.json artifacts") {
    val bands = Bench.parseBands(repoRoot)
    // 16 committed artifacts, ~187 queries each — an empty or near-empty
    // map means the escaped-quote form stopped matching again.
    assert(bands.size > 50, s"expected >50 banded queries, got ${bands.size}")
    // Queries present in many rounds must have a band; values are
    // positive seconds in a sane range.
    val expected = Seq("lake_upsert_merge", "stream_cdc_replicate", "dedup_minhash")
    expected.foreach { q =>
      assert(bands.contains(q), s"missing band for $q")
      assert(bands(q) > 0.0 && bands(q) < 600.0, s"implausible band for $q: ${bands(q)}")
    }
  }

  test("parseBands excludes artifact metadata keys") {
    val bands = Bench.parseBands(repoRoot)
    Seq("sf", "variance", "value", "n", "rc", "cpus", "omitted").foreach { k =>
      assert(!bands.contains(k), s"metadata key $k leaked into bands")
    }
  }

  test("parseBands matches both escaped and unescaped entry forms") {
    val dir = java.nio.file.Files.createTempDirectory("bench-bands").toFile
    try {
      // Escaped form (driver tail wrapper) and raw form (direct bench line).
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r98.json"),
        """{"n":98,"tail":"{\"qa\":1.50,\"qb\":2.00,\"variance\":1.40}"}""")
      java.nio.file.Files.writeString(dir.toPath.resolve("BENCH_r99.json"),
        """{"queries":{"qa":2.50},"variance":1.40,"value":2.50,"sf":"x"}""")
      val bands = Bench.parseBands(dir.getAbsolutePath)
      assert(bands.get("qa").contains(2.0)) // median of 1.50 and 2.50
      assert(bands.get("qb").contains(2.0))
      assert(!bands.contains("variance"))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("parseBands degrades to empty on a missing directory") {
    assert(Bench.parseBands("/nonexistent/graft/bands").isEmpty)
  }
}
