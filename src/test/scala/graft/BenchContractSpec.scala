package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench emission contract: the driver parses a bounded ~2000-char
  * stdout tail and records the LAST line. Round 7 lost its bench record
  * ("parsed": null) because the final line outgrew that window; the
  * summary is now built through one guarded function so the failure mode
  * is a loud bench error at emit time, never a silently-unparsed round.
  */
class BenchContractSpec extends AnyFunSuite {

  test("the compact summary fits the tail budget with realistic values") {
    val line = Bench.compactSummary(
      total = 28.424242424242, minTotal = 24.808080808080,
      nQueries = 63, nErrors = 0, runs = 3, sfDir = "/root/testdata/sf0.1")
    assert(line.length <= 512)
    // and it stays a single line (a wrapped line would split the tail parse)
    assert(!line.contains("\n"))
    assert(line.startsWith("{\"metric\":\"total\"") && line.endsWith("}"))
  }

  test("a summary that could overflow the tail window fails loudly") {
    val huge = "x" * 600
    val e = intercept[IllegalArgumentException] {
      Bench.compactSummary(1.0, 1.0, 63, 0, 3, sfDir = huge)
    }
    assert(e.getMessage.contains("stdout tail"))
  }

  test("the README headline quotes the artifact of record, not a stale pair") {
    // Rounds 14 AND 15 both shipped a README whose quoted closing pair
    // contradicted the driver-written BENCH.json (the file the README
    // itself names as the record). This pin re-derives the five headline
    // numbers from BENCH.json/DUCKBENCH.json and requires them verbatim
    // in the paragraph that declares the record.
    def read(p: String): String =
      new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)), "UTF-8")
    def num(src: String, key: String): Double =
      ("\"" + key + "\"\\s*:\\s*([0-9][0-9.]*)").r.findFirstMatchIn(src)
        .map(_.group(1).toDouble)
        .getOrElse(fail(s"$key missing from artifact"))
    val benchLine = read("BENCH.json").linesIterator
      .find(_.contains("min_total"))
      .getOrElse(fail("BENCH.json has no compact summary line"))
    val mean = num(benchLine, "value")
    val min = num(benchLine, "min_total")
    val duck = num(read("DUCKBENCH.json"), "value")
    val readme = read("README.md").linesIterator.toVector
    val i = readme.indexWhere(_.contains("artifact of record"))
    assert(i >= 0, "README lost its 'artifact of record' headline")
    val para = readme.slice(i - 2, i + 8).mkString(" ")
    for (s <- Seq(f"$mean%.1f s mean", f"$min%.1f s min", f"$duck%.1f s",
        f"${mean / duck}%.2f× mean", f"${min / duck}%.2f× min"))
      assert(para.contains(s),
        s"README headline drifted from the artifact: expected '$s' in: $para")
  }

  test("the startup guard rejects an over-long sfDir with worst-width fields") {
    // mirrors Bench.main's fail-fast call: the widest plausible numeric
    // fields plus a just-under-budget sfDir must still fit, so the guard
    // only trips on genuinely oversized paths — and a 600-char path trips
    // it BEFORE any query would have run
    val wide = Bench.compactSummary(99999.999999999999, 99999.999999999999,
      nQueries = 9999, nErrors = 9999, runs = 333, sfDir = "/root/testdata/sf0.1")
    assert(wide.length <= 512)
  }
}
