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
  *   - it is one valid JSON object;
  *   - `queries` and `spread` keys are exactly the registry names;
  *   - every spread row carries min ≤ max (min-of-3 read rule: max/min ≫ 1
  *     ⇒ host-contended row, trust min);
  *   - `calibration_sec` samples ride in the artifact;
  *   - a failed query reports -1, never a partial time.
  */
class BenchSanitySpec extends AnyFunSuite with Matchers {

  private val mapper = new ObjectMapper()

  private def render(samples: Seq[(String, Seq[Double])]) =
    Bench.renderJson(samples, calibration = Seq(0.21, 0.32, 0.19),
      ivfBuild = 1.5, probeOnly = 0.8, sfDir = "/root/testdata/sf0.1")

  test("artifact is one JSON object with queries+spread keyed by the registry") {
    val names = SparkEntry.defs.map(_.name)
    names.distinct.size shouldBe names.size // registry names must be unique
    val samples = names.zipWithIndex.map { case (n, i) =>
      val base = 0.1 + i * 0.001
      n -> Seq(base + 0.02, base, base + 0.01)
    }
    val line = render(samples)
    line.linesIterator.size shouldBe 1 // driver greps ONE line
    val root = mapper.readTree(line)
    root.get("metric").asText() shouldBe "total"
    root.get("unit").asText() shouldBe "sec"
    root.get("runs").asInt() shouldBe 3
    val qKeys = root.get("queries").fieldNames().asScala.toSeq
    val sKeys = root.get("spread").fieldNames().asScala.toSeq
    qKeys shouldBe names
    sKeys shouldBe names
    // queries carries the min; spread carries min/max with min <= max
    names.zipWithIndex.foreach { case (n, i) =>
      val expMin = 0.1 + i * 0.001
      root.get("queries").get(n).asDouble() shouldBe expMin +- 1e-9
      val row = root.get("spread").get(n)
      row.get("min").asDouble() should be <= row.get("max").asDouble()
      row.get("min").asDouble() shouldBe expMin +- 5e-4 // %.3f rendering
    }
    root.get("value").asDouble() shouldBe samples.map(_._2.min).sum +- 1e-6
    root.get("failed").asInt() shouldBe 0
    val calib = root.get("calibration_sec")
    calib.isArray shouldBe true
    calib.size shouldBe 3
    root.get("calibration_job").asText() shouldBe "range64M-xxhash64-xor"
    root.get("x17_index_build_sec").asDouble() shouldBe 1.5 +- 1e-9
    root.get("x03_probe_only_sec").asDouble() shouldBe 0.8 +- 1e-9
  }

  test("a failed query reports -1 and is excluded from the total") {
    val samples = Seq("ok_q" -> Seq(0.5, 0.4, 0.6), "bad_q" -> Seq(-1.0))
    val root = mapper.readTree(render(samples))
    root.get("queries").get("bad_q").asDouble() shouldBe -1.0 +- 1e-9
    root.get("failed").asInt() shouldBe 1
    root.get("value").asDouble() shouldBe 0.4 +- 1e-6
    root.get("spread").get("bad_q").get("min").asDouble() shouldBe -1.0 +- 1e-3
  }
}
