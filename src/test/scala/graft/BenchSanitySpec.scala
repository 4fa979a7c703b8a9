package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import scala.jdk.CollectionConverters._

/** Pins the bench artifact contract: the driver's round gate and the judge
  * both read BENCH_r*.json, so its shape must not drift silently. The JSON
  * line is rendered by `Bench.renderJson` (pure — no Spark session, no
  * query runs), fed here with synthetic timings for the REAL registry, and
  * parsed back with Jackson:
  *   - it is one valid JSON object SHORT ENOUGH for the driver's bounded
  *     tail capture (round-6 lesson: two full-precision per-query maps
  *     grew the line to ~6 KB and BENCH_r06.json physically lost `value`
  *     and half the per-query numbers);
  *   - `queries` keys are exactly the registry names, each valued
  *     `[min,max]` over the three runs (read rule: max/min ≫ 1 ⇒
  *     host-contended row, trust min);
  *   - the scalar summary fields — failed, calibration_sec, value, sf —
  *     sit at the END of the line so front-truncation costs least;
  *   - a failed query reports -1, never a partial time.
  */
class BenchSanitySpec extends AnyFunSuite with Matchers {

  private val mapper = new ObjectMapper()

  private def render(samples: Seq[(String, Seq[Double])]) =
    Bench.renderJson(samples, calibration = Seq(0.21, 0.32, 0.19),
      ivfTrain = 1.5, probeOnly = 0.8, sfDir = "/root/testdata/sf0.1")

  test("artifact is one JSON object keyed by the registry, sized for tail capture") {
    val names = SparkEntry.defs.map(_.name)
    names.distinct.size shouldBe names.size // registry names must be unique
    val samples = names.zipWithIndex.map { case (n, i) =>
      val base = 0.1 + i * 0.001
      n -> Seq(base + 0.02, base, base + 0.01)
    }
    val line = render(samples)
    line.linesIterator.size shouldBe 1 // driver greps ONE line
    // tail-capture budget: the r6 line (~6.2 KB) lost its front half; the
    // merged [min,max] map at %.3f must keep the whole line safely under
    // the observed ~4 KB window even with double-digit timings.
    line.getBytes("UTF-8").length should be < 4096
    val root = mapper.readTree(line)
    root.get("metric").asText() shouldBe "total"
    root.get("unit").asText() shouldBe "sec"
    root.get("runs").asInt() shouldBe 3
    val qKeys = root.get("queries").fieldNames().asScala.toSeq
    qKeys shouldBe names
    names.zipWithIndex.foreach { case (n, i) =>
      val expMin = 0.1 + i * 0.001
      val row = root.get("queries").get(n)
      row.isArray shouldBe true
      row.size shouldBe 2
      row.get(0).asDouble() should be <= row.get(1).asDouble()
      row.get(0).asDouble() shouldBe expMin +- 5e-4 // %.3f rendering
    }
    root.get("value").asDouble() shouldBe samples.map(_._2.min).sum +- 5e-3
    root.get("failed").asInt() shouldBe 0
    val calib = root.get("calibration_sec")
    calib.isArray shouldBe true
    calib.size shouldBe 3
    root.get("calibration_job").asText() shouldBe "range64M-xxhash64-xor"
    root.get("ivf_train_sec").asDouble() shouldBe 1.5 +- 1e-9
    root.get("x03_probe_only_sec").asDouble() shouldBe 0.8 +- 1e-9
    // summary fields ride at the END of the line (truncation-from-the-
    // front must cost the least-diagnostic bytes first)
    val idxQueries = line.indexOf("\"queries\"")
    Seq("\"failed\"", "\"calibration_sec\"", "\"value\"", "\"sf\"").foreach { f =>
      line.lastIndexOf(f) should be > idxQueries
      line.lastIndexOf(f) should be > line.indexOf("]]}") // past the query map
    }
  }

  test("a failed query reports -1 and is excluded from the total") {
    val samples = Seq("ok_q" -> Seq(0.5, 0.4, 0.6), "bad_q" -> Seq(-1.0))
    val root = mapper.readTree(render(samples))
    val bad = root.get("queries").get("bad_q")
    bad.get(0).asDouble() shouldBe -1.0 +- 1e-3
    root.get("failed").asInt() shouldBe 1
    root.get("value").asDouble() shouldBe 0.4 +- 1e-6
  }
}
