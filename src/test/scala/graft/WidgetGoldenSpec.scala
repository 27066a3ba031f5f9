package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** End-to-end drift gate for the widget JSON contract (SURVEY §3.1;
  * reference shapes widget.py:134-307): each of the five result kinds
  * — frame, bbox frame-major, track, video, and group=True contiguous
  * — is produced by a sandbox-style pipeline over the sf0.001 fixture
  * and byte-compared against its COMMITTED golden file. Any field
  * rename, ordering change, number-formatting change or envelope edit
  * fails here with a readable first-divergence pointer. Regenerate
  * deliberately with `sbt "Test/runMain graft.GenGolden"`. */
class WidgetGoldenSpec extends SparkSpec {

  private def golden(name: String): String =
    new String(Files.readAllBytes(
      Paths.get(s"src/test/resources/golden/$name.json")),
      StandardCharsets.UTF_8).stripLineEnd

  test("all five widget shapes byte-match their committed goldens") {
    WidgetGoldenFixtures.shapes(spark).foreach { case (name, actual) =>
      val expect = golden(name)
      if (actual != expect) {
        val i = actual.zip(expect).indexWhere { case (a, b) => a != b }
        val at = if (i < 0) math.min(actual.length, expect.length) else i
        fail(s"$name drifted at char $at: " +
          s"...${actual.slice(math.max(0, at - 40), at + 40)}... vs golden " +
          s"...${expect.slice(math.max(0, at - 40), at + 40)}...")
      }
    }
  }
}
