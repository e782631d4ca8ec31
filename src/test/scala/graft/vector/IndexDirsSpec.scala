package graft.vector

import org.scalatest.funsuite.AnyFunSuite

/** The persisted-index homes: deployment-knob override, per-user
  * fallback, and key sanitization (COVERAGE "persisted-index
  * placement" adjudication).
  */
class IndexDirsSpec extends AnyFunSuite {

  test("graft.index.root overrides the per-user tmpdir fallback") {
    val prev = sys.props.get("graft.index.root")
    try {
      sys.props("graft.index.root") = "/warehouse/indexes"
      assert(IndexDirs.root == "/warehouse/indexes")
      assert(IndexDirs.ivf("/data/corpus", "id", "vec", 16)
        .startsWith("/warehouse/indexes/ivf-_data_corpus-"))
    } finally prev match {
      case Some(v) => sys.props("graft.index.root") = v
      case None => sys.props -= "graft.index.root"
    }
  }

  test("fallback is per-user under the JVM tmpdir, never a shared dir") {
    val prev = sys.props.get("graft.index.root")
    sys.props -= "graft.index.root"
    try {
      if (sys.env.get("GRAFT_INDEX_ROOT").isEmpty) {
        val root = IndexDirs.root
        assert(root.startsWith(sys.props("java.io.tmpdir")))
        assert(root != sys.props("java.io.tmpdir") + "/graft-index",
          "the round-11 shared /tmp/graft-index let another user " +
            "pre-create or poison a layout")
        assert(root.contains("graft-index-"))
      }
    } finally prev.foreach(v => sys.props("graft.index.root") = v)
  }

  test("dataset keys sanitize to path-safe names, distinct per config") {
    val a = IndexDirs.lsh("/d/sf0.01|x", "vec id", "emb", 8, 8)
    assert(!a.substring(IndexDirs.root.length + 1).exists(
      c => c == '/' || c == '|' || c == ' '),
      s"unsafe chars must be sanitized: $a")
    assert(IndexDirs.lsh("/d", "id", "v", 8, 8) !=
      IndexDirs.lsh("/d", "id", "v", 6, 8),
      "different configs must map to different homes")
    assert(IndexDirs.textDigests("/d", "id", "t", 32, 8, 3) !=
      IndexDirs.textDigests("/d", "id", "t", 32, 4, 3))
  }
}
