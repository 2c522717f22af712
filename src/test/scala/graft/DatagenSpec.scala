package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.MessageDigest

import org.scalatest.funsuite.AnyFunSuite

/** Byte parity of the corpus regenerator with the reference datasets
  * (`/root/reference/datagen.py`, `random.Random(6190)`): the embedded
  * md5s keep the gate self-contained; when the reference checkout is
  * present the bytes are also diffed directly.
  */
class DatagenSpec extends AnyFunSuite {

  private def md5(s: String): String =
    MessageDigest.getInstance("MD5")
      .digest(s.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  private lazy val all = Datagen.generateAll()

  test("regenerated datasets match the reference checksums byte-for-byte") {
    // md5sum of /root/reference/datasets/*.txt, pinned
    assert(md5(all("small")) === "aeda0d003ceabbd538a585c4f4b3ab33")
    assert(md5(all("medium")) === "2eaa2a0b50bbe7ebc70f942606ec7a13")
    assert(md5(all("large")) === "966e0b4769273140148a7acb1b92975a")
  }

  test("bytes equal the reference files when the checkout is present") {
    val dir = Paths.get("/root/reference/datasets")
    assume(Files.isDirectory(dir), "reference checkout not present")
    for (name <- Seq("small", "medium", "large")) {
      val want = new String(
        Files.readAllBytes(dir.resolve(s"$name.txt")),
        StandardCharsets.UTF_8)
      assert(all(name) === want, s"$name.txt differs")
    }
  }

  test("documents are shaped as the goldens expect") {
    val lines = all("small").split("\n", -1).init
    assert(lines.length === 50)
    assert(lines.head.startsWith("Document1 "))
    assert(lines.last.startsWith("Document50 "))
    // 200 tokens after the doc id, lowercase w-prefixed vocabulary
    val toks = lines.head.split(" ").drop(1)
    assert(toks.length === 200)
    assert(toks.forall(_.matches("w\\d{3}")))
  }
}
