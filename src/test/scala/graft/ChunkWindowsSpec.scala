package graft

import org.apache.spark.sql.functions._
import graft.ops.TextAnalysis

/** Sliding-window chunking: exact window math at every boundary —
  * every token covered, the tail never doubled, overlap exact. */
class ChunkWindowsSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, w: Int, s: Int): Seq[(Long, Long, String)] =
    TextAnalysis.chunkWindows(
        Seq((1L, text)).toDF("id", "t"), col("id"), col("t"), w, s)
      .select("chunk_index", "n_tokens", "chunk_text")
      .as[(Long, Long, String)].collect().sortBy(_._1).toSeq

  test("short document yields exactly one (short) chunk") {
    assert(chunksOf("a b c", 5, 3) == Seq((0L, 3L, "a b c")))
    assert(chunksOf("a", 5, 5) == Seq((0L, 1L, "a")))
  }

  test("exact fit yields one chunk, one more token forces a second") {
    assert(chunksOf("a b c d e", 5, 3) == Seq((0L, 5L, "a b c d e")))
    assert(chunksOf("a b c d e f", 5, 3) ==
      Seq((0L, 5L, "a b c d e"), (1L, 3L, "d e f")))
  }

  test("overlap is window minus stride; every token covered once+") {
    val got = chunksOf("t0 t1 t2 t3 t4 t5 t6 t7 t8 t9", 4, 2)
    assert(got == Seq(
      (0L, 4L, "t0 t1 t2 t3"),
      (1L, 4L, "t2 t3 t4 t5"),
      (2L, 4L, "t4 t5 t6 t7"),
      (3L, 4L, "t6 t7 t8 t9")))
    // non-dividing tail: last window short, still starts on a stride
    val odd = chunksOf("t0 t1 t2 t3 t4 t5 t6 t7 t8", 4, 2)
    assert(odd.last == (3L, 3L, "t6 t7 t8"))
    // coverage: the union of all windows is the whole token list
    assert(odd.flatMap(_._3.split(" ")).distinct.size == 9)
  }

  test("stride == window gives disjoint chunks; whitespace docs vanish") {
    assert(chunksOf("a b c d", 2, 2) ==
      Seq((0L, 2L, "a b"), (1L, 2L, "c d")))
    assert(chunksOf("   ", 4, 2).isEmpty)
    // multi-whitespace runs collapse — token boundaries, not characters
    assert(chunksOf("a\n\n b\t c", 4, 2) == Seq((0L, 3L, "a b c")))
  }

  test("refusals: zero window, stride above window") {
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkWindows(Seq((1L, "a")).toDF("id", "t"),
        col("id"), col("t"), 0, 1)
    }
    intercept[IllegalArgumentException] {
      TextAnalysis.chunkWindows(Seq((1L, "a")).toDF("id", "t"),
        col("id"), col("t"), 4, 5)
    }
  }

  test("plan is a pure map+explode — no shuffle") {
    val df = TextAnalysis.chunkWindows(
      Seq((1L, "a b c d e f")).toDF("id", "t"), col("id"), col("t"), 4, 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
