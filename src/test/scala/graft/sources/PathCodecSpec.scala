package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Path-identity normalization: `absNorm` is the identity key behind
  * vacuum/clone file matching AND COPY INTO's exactly-once ledger id —
  * a scheme-qualified store path must normalize with pure string math
  * (java.nio would prepend the driver's CWD, minting a different id
  * per working directory and double-loading the same file). */
class PathCodecSpec extends AnyFunSuite {

  test("scheme-qualified paths never absorb the driver's cwd") {
    val cwd = new java.io.File(".").getAbsoluteFile.getParent
    Seq("s3a://bucket/data/f.parquet", "hdfs://nn:8020/wh/t/f.parquet",
        "gs://b/k", "abfss://c@acct.dfs.core.windows.net/p/f").foreach { p =>
      val n = PathCodec.absNorm(p)
      assert(!n.contains(cwd), s"$p normalized to cwd-dependent $n")
      assert(n.takeWhile(_ != ':') == p.takeWhile(_ != ':'),
        s"scheme lost: $p -> $n")
    }
  }

  test("scheme-qualified segment normalization is pure string math") {
    assert(PathCodec.absNorm("s3a://bucket/a/../b//c/./f.parquet") ==
      "s3a://bucket/b/c/f.parquet")
    assert(PathCodec.absNorm("s3a://bucket/a/b/") == "s3a://bucket/a/b")
    // '..' at the root stays at the root (can't climb above the bucket)
    assert(PathCodec.absNorm("s3a://bucket/../x") == "s3a://bucket/x")
    // authority-only path roots at the bucket
    assert(PathCodec.absNorm("s3a://bucket") == "s3a://bucket/")
    // single-slash scheme form (file:/x — no authority)
    assert(PathCodec.absNorm("file:/tmp/a/../b") == "file:/tmp/b")
  }

  test("local paths keep java.nio semantics (absolute + normalized)") {
    assert(PathCodec.absNorm("/x/../y") == "/y")
    assert(PathCodec.absNorm("/a/b/./c") == "/a/b/c")
    // relative local paths still absolutize against the cwd
    val cwd = java.nio.file.Paths.get("").toAbsolutePath.toString
    assert(PathCodec.absNorm("rel/f").startsWith(cwd))
  }

  test("the same store object mints the same COPY INTO ledger id") {
    // two spellings of one object → one id (exactly-once depends on it)
    assert(PathCodec.absNorm("s3a://b/stage/../in/f.json") ==
      PathCodec.absNorm("s3a://b/in//f.json"))
  }
}
