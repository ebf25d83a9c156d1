package graft

import java.nio.file.Files

class QualitySpec extends SparkSpec {
  import spark.implicits._

  /** Build a documents.parquet dir with per-doc unique vocab plus planted
    * shared token runs, and run the production dedup_substring query on it. */
  private def runSubstring(docs: Seq[(Long, String)]): Set[(Long, Long)] = {
    val dir = Files.createTempDirectory("graft-quality").toString
    docs.toDF("doc_id", "text").write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    SparkEntry.queries("dedup_substring")(spark, dir)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def uniq(doc: Long, n: Int): Seq[String] =
    (0 until n).map(j => s"d${doc}t$j")

  test("winnowing recall: every shared run >= 30 tokens is detected, <16 never") {
    val shared30 = (0 until 30).map(j => s"p$j")       // exactly the guarantee bound
    val shared40 = (0 until 40).map(j => s"q$j")
    val shared12 = (0 until 12).map(j => s"r$j")       // below window size 16
    val background = (1L to 20L).map(i => (i, uniq(i, 60).mkString(" ")))
    val planted = Seq(
      (100L, (uniq(100, 25) ++ shared30 ++ uniq(100, 25).map(_ + "x")).mkString(" ")),
      (101L, (uniq(101, 40) ++ shared30 ++ uniq(101, 10).map(_ + "x")).mkString(" ")),
      (102L, (shared40 ++ uniq(102, 30)).mkString(" ")),          // run at doc start
      (103L, (uniq(103, 30) ++ shared40).mkString(" ")),          // run at doc end
      (104L, (uniq(104, 30) ++ shared12 ++ uniq(104, 30).map(_ + "x")).mkString(" ")),
      (105L, (uniq(105, 30) ++ shared12 ++ uniq(105, 30).map(_ + "x")).mkString(" ")))
    val pairs = runSubstring(background ++ planted)
    assert(pairs.contains((100L, 101L)), s"missed 30-token planted dup: $pairs")
    assert(pairs.contains((102L, 103L)), s"missed 40-token planted dup: $pairs")
    assert(!pairs.contains((104L, 105L)),
      "12-token overlap (< window 16) must not produce a pair")
    // per-doc-unique vocab docs can never share a 16-token window
    val fp = pairs -- Set((100L, 101L), (102L, 103L))
    assert(fp.isEmpty, s"false positives: $fp")
  }

  test("winnowing determinism: same input twice gives identical pairs") {
    val docsA = (1L to 10L).map(i => (i, uniq(i, 50).mkString(" "))) ++
      Seq((50L, (0 until 35).map(j => s"s$j").mkString(" ")),
          (51L, ((0 until 35).map(j => s"s$j") ++ uniq(51, 20)).mkString(" ")))
    assert(runSubstring(docsA) == runSubstring(docsA))
  }

  test("short docs (< 16 tokens) flow through without pairing or error") {
    val docs = Seq((1L, "only five tokens right here"), (2L, ""), (3L, "x"),
      (4L, uniq(4, 40).mkString(" ")))
    assert(runSubstring(docs).isEmpty)
  }
}
