package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import graft.pipeline.JaccardPipeline

/** Primary oracle: byte-for-byte parity with the reference's committed
  * golden outputs (`results-1dn/&lt;size&gt;/output_jaccard/part-r-00000`;
  * 1-DN and 3-DN outputs are identical per reference README).
  */
class JaccardGoldenSpec extends SparkSpec {

  private val ref = "/root/reference"

  private def golden(name: String): Vector[String] =
    Files.readAllLines(
      Paths.get(s"$ref/results-1dn/$name/output_jaccard/part-r-00000"))
      .asScala.toVector

  private def check(name: String): Unit = {
    val got = JaccardPipeline.goldenLines(spark, s"$ref/datasets/$name.txt").toVector
    val want = golden(name)
    assert(got.length == want.length,
      s"$name: row count ${got.length} != golden ${want.length}")
    val firstDiff = got.zip(want).indexWhere { case (g, w) => g != w }
    assert(firstDiff == -1,
      s"$name: first diff at line ${firstDiff + 1}: got='${got.lift(firstDiff)}' want='${want.lift(firstDiff)}'")
  }

  test("small corpus matches golden output byte-for-byte")(check("small"))
  test("medium corpus matches golden output byte-for-byte")(check("medium"))
  test("large corpus matches golden output byte-for-byte")(check("large"))
}
