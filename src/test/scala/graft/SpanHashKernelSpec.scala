package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{GraftFunctions, SketchKernels}

/** Value-pins the native rolling span-hash kernel (`graft_span_hashes`):
  * the O(1)-per-position rolling update must equal a direct Horner
  * evaluation of the same polynomial at every position, window equality
  * must be word-wise (no join-boundary collisions), and the SQL-text
  * registration must run the same kernel as the Column API.
  */
class SpanHashKernelSpec extends SparkSpec {

  private def kernel(ws: Seq[String], w: Int): Seq[Long] =
    SketchKernels.spanHashes(
      new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any]), w)
      .toLongArray().toSeq

  /** Direct (non-rolling) Horner evaluation of the same polynomial —
    * the spec's independent reimplementation of the hash definition.
    */
  private def direct(ws: Seq[String], w: Int): Seq[Long] =
    if (ws.length < w) Seq.empty
    else (0 to ws.length - w).map { p =>
      ws.slice(p, p + w).foldLeft(0L)((acc, word) =>
        acc * SketchKernels.SpanHashBase +
          SketchKernels.wordHash64(UTF8String.fromString(word)))
    }

  test("rolling update equals direct Horner evaluation at every position") {
    val word = Gen.oneOf("red", "blue", "green", "a", "ab", "b", "x0")
    val prop = Prop.forAll(
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word)),
      Gen.chooseNum(1, 9)) { (ws, w) => kernel(ws, w) == direct(ws, w) }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
  }

  test("equal windows hash equal; boundary re-splits hash differently") {
    val h = kernel(Seq("a", "b", "c", "a", "b"), 2)
    assert(h.length == 4)
    assert(h(0) == h(3)) // ["a","b"] twice
    assert(h.distinct.length == 3)
    // word-wise equality: ["ab","c"] vs ["a","bc"] must NOT collide the
    // way md5(array_join(..., "")) would
    assert(kernel(Seq("ab", "c"), 2) != kernel(Seq("a", "bc"), 2))
    // short input and width-1 edges
    assert(kernel(Seq("a"), 2).isEmpty)
    assert(kernel(Seq.empty, 3).isEmpty)
    assert(kernel(Seq("a", "b", "a"), 1).distinct.length == 2)
  }

  private def kernel2(ws: Seq[String], w: Int): Seq[Long] =
    SketchKernels.spanHashes2(
      new GenericArrayData(ws.map(UTF8String.fromString).toArray[Any]), w)
      .toLongArray().toSeq

  private def direct2(ws: Seq[String], w: Int): Seq[Long] =
    if (ws.length < w) Seq.empty
    else (0 to ws.length - w).map { p =>
      ws.slice(p, p + w).foldLeft(0L)((acc, word) =>
        acc * SketchKernels.SpanHashBase2 +
          SketchKernels.wordHash64b(
            SketchKernels.wordHash64(UTF8String.fromString(word))))
    }

  test("second stream: rolling equals its own Horner replica and " +
    "diverges from stream 1") {
    val word = Gen.oneOf("red", "blue", "green", "a", "ab", "b", "x0")
    val prop = Prop.forAll(
      Gen.chooseNum(0, 40).flatMap(n => Gen.listOfN(n, word)),
      Gen.chooseNum(1, 9)) { (ws, w) => kernel2(ws, w) == direct2(ws, w) }
    val r = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(r.passed, r.status.toString)
    // the two streams must not be the same function (the pair is the
    // 128-bit cross-document key)
    val ws = Seq("a", "b", "c", "a", "b")
    assert(kernel(ws, 2) != kernel2(ws, 2))
    // but equal windows still agree WITHIN each stream
    assert(kernel2(ws, 2)(0) == kernel2(ws, 2)(3))
  }

  test("SQL-text registration runs the same kernel as the Column API") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = Seq(Seq("a", "b", "c", "a", "b")).toDF("ws")
    val api = df.select(GraftFunctions.spanHashes(col("ws"), 2))
      .as[Seq[Long]].head()
    val sql = spark.sql(
      "SELECT graft_span_hashes(array('a','b','c','a','b'), 2)")
      .as[Seq[Long]].head()
    assert(api == sql)
    assert(api == kernel(Seq("a", "b", "c", "a", "b"), 2))
    // the second stream's registration gates the same way
    val api2 = df.select(GraftFunctions.spanHashes2(col("ws"), 2))
      .as[Seq[Long]].head()
    val sql2 = spark.sql(
      "SELECT graft_span_hashes2(array('a','b','c','a','b'), 2)")
      .as[Seq[Long]].head()
    assert(api2 == sql2)
    assert(api2 == kernel2(Seq("a", "b", "c", "a", "b"), 2))
  }
}
