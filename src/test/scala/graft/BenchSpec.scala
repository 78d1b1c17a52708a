package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver machine-parses a bounded (2,000-char) tail of Bench's
  * stdout: the final line must ALWAYS fit, for the real registry, at any
  * plausible timing magnitude — that is the whole point of the compact
  * line (rounds 1–2 shipped a ~4.4 KB line the driver could never see). */
class BenchSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted

  test("compact bench line fits the driver tail window at realistic timings") {
    val results = names.map(_ -> 1.234567) // typical sub-10s medians
    val line = Bench.compactLine(12.3456, 98.7654, results, "/root/testdata/sf0.1", 5)
    assert(line.length <= Bench.MaxLineChars, s"line is ${line.length} chars")
    assert(line.contains("\"queries\":{"), "per-query medians should fit at this scale")
    assert(!line.contains("cold_queries"), "cold map belongs in BENCH.json only")
    assert(!line.contains("\n"))
  }

  test("per-query medians keep at least 1-decimal precision in the tail line") {
    // r5 decision, amended at 182 queries: the key ladder (qNN → bare
    // registry number) and the n_failed:0 elision kept 2 decimals to
    // ~176 queries; past that the arithmetic is unforgiving (~11 chars
    // per 2-decimal entry × registry > window), so the tail guarantees
    // 1 decimal (100 ms) — the driver's cross-round per-query signal
    // survives — and FULL 3-decimal medians live in BENCH.json, which is
    // committed in-repo every round. What must NEVER happen silently is
    // losing the per-query map from the tail entirely (headroom at 1
    // decimal: ~205 queries; revisit the encoding before crossing it).
    assert(names.size >= 94, s"registry shrank to ${names.size} queries")
    val results = names.map(_ -> 1.234567)
    val line = Bench.compactLine(12.3456, 98.7654, results, "/root/testdata/sf0.1", 5)
    assert(line.length <= Bench.MaxLineChars, s"line is ${line.length} chars")
    assert(line.contains("\":1.2"),
      s"per-query precision fell below 1 decimal at ${names.size} queries " +
        s"(line is ${line.length} chars)")
    assert(line.contains("\"queries\":{"),
      s"per-query map fell out of the tail at ${names.size} queries")
  }

  test("compact bench line degrades but still fits at adversarial timings") {
    val results = names.map(_ -> 3599.999999) // hour-long queries
    val line = Bench.compactLine(99999.9, 99999.9, results, "/root/testdata/sf0.1", 5)
    assert(line.length <= Bench.MaxLineChars, s"line is ${line.length} chars")
    assert(line.startsWith("{\"metric\":\"total\",\"value\":"))
  }

  test("compact line is valid minimal JSON shape with failed queries") {
    val results = names.map(_ -> -1.0)
    val line = Bench.compactLine(0.0, -0.0, results, "sf", 1)
    assert(line.length <= Bench.MaxLineChars)
    assert(line.contains("\"value\":0"))
    assert(line.contains(":-1")) // failed queries keep their -1 marker
  }
}
