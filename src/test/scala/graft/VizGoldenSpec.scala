package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.viz.HistogramWithExamples._

/** Golden-output pin for the HTML emitter — the display contract must
  * not drift silently (the reference pins its plots with golden
  * HTML/PNG fixtures, ref: oarphpy_test/test_plotting.py:74-100).
  *
  * Regenerate after an INTENTIONAL emitter change with
  * `sbt -Dgraft.regenGoldens=true test` and review the diff like code.
  */
class VizGoldenSpec extends AnyFunSuite {

  private val goldenPath =
    java.nio.file.Paths.get("src/test/resources/golden/histogram_with_examples.html")

  /** Fixed Result covering the emitter's branches: multiple pivots, an
    * empty bucket, HTML-escapable example text, and the U+0001
    * NULL-pivot sentinel (display-stripped). */
  private def fixture: Result = {
    val nullPivot = "null"
    Result("l_extendedprice", Seq(
      Bucket("A", 0, 0.0, 10.0, 5, Seq("Row(1, <tag> & \"quote\")", "Row(2)")),
      Bucket("A", 1, 10.0, 20.0, 0, Nil),
      Bucket("A", 2, 20.0, 30.0, 12, Seq("Row(3)")),
      Bucket(nullPivot, 0, 0.0, 10.0, 2, Seq("Row(4, null pivot)")),
      Bucket(nullPivot, 1, 10.0, 20.0, 7, Nil),
      Bucket(nullPivot, 2, 20.0, 30.0, 1, Nil)))
  }

  test("toHtml matches the committed golden byte-for-byte") {
    val html = toHtml(fixture)
    if (sys.props.get("graft.regenGoldens").contains("true")) {
      java.nio.file.Files.writeString(goldenPath, html)
      info(s"regenerated $goldenPath")
    }
    val golden = new String(
      getClass.getResourceAsStream("/golden/histogram_with_examples.html")
        .readAllBytes(), "UTF-8")
    assert(html == golden,
      "HTML emitter output drifted from the golden; if intentional, " +
        "regenerate with -Dgraft.regenGoldens=true and review the diff")
  }

  test("emitted HTML carries the information contract") {
    val html = toHtml(fixture)
    // one rect per bucket, with count in the tooltip
    assert(html.sliding(5).count(_ == "<rect") == 6)
    assert(html.contains(": 12<"))
    // escaping: raw example text never appears unescaped
    assert(!html.contains("<tag>") && html.contains("&lt;tag&gt;"))
    // the sentinel control char is display-stripped
    assert(!html.contains(""))
    // legend + drill-down targets exist for both pivots
    assert(html.contains("leg-p0") && html.contains("leg-p1"))
    assert(html.contains("ex-p0-b0") && html.contains("ex-p1-b0"))
  }

  test("interaction contract: tap drill-down + legend toggle are wired") {
    val html = toHtml(fixture)
    // every bar is tappable and carries its example-target id
    // (reference tap-tool contract, oarphpy/plotting.py:305-365)
    assert(html.contains("""onclick="drill(this)""""))
    assert(html.contains("data-ex=\"ex-p0-b0\""))
    // the handlers are defined inline (self-contained, no CDN)
    assert(html.contains("function drill(") && html.contains("function toggle("))
    // legend entries toggle their pivot's bars
    assert(html.contains("onclick=\"toggle(0)\"") &&
      html.contains("onclick=\"toggle(1)\""))
    // drill highlights + scrolls to the bucket's example block
    assert(html.contains("classList.add('hit')") &&
      html.contains("scrollIntoView"))
  }
}
