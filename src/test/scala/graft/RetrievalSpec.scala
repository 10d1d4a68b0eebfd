package graft

import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Chunker + BM25: the retrieval-side text ops. */
class RetrievalSpec extends SparkSpec {
  import spark.implicits._

  test("chunk: hand example with overlap, short tail, empty doc") {
    val docs = Seq((1L, "a b c d e"), (2L, "x"), (3L, "  "))
      .toDF("doc_id", "text")
    val got = TextAnalysis.chunk(docs, "doc_id", "text",
        chunkSize = 3, overlap = 1)
      .orderBy($"doc", $"chunk_idx")
      .as[(Long, Int, Int, String)].collect().toSeq
    assert(got === Seq(
      (1L, 0, 3, "a b c"), (1L, 1, 3, "c d e"), (1L, 2, 1, "e"),
      (2L, 0, 1, "x")))
  }

  test("chunk covers every token: zero-overlap chunks reassemble the doc") {
    val docs = Tables.load(spark, sf, "documents").limit(100)
    val rebuilt = TextAnalysis.chunk(docs, "doc_id", "text", 32, 0)
      .groupBy($"doc")
      .agg(array_join(sort_array(collect_list(
        struct($"chunk_idx", $"chunk"))).getField("chunk"), " ")
        .as("joined"))
    val orig = docs.select($"doc_id".as("doc"),
      array_join(TextAnalysis.tokens($"text"), " ").as("joined"))
    assert(rebuilt.exceptAll(orig).isEmpty &&
      orig.filter(length($"joined") > 0).exceptAll(rebuilt).isEmpty)
  }

  test("bm25: hand-computed score, zero for absent terms, tf monotone") {
    val docs = Seq((1L, "x x y"), (2L, "z"), (3L, "x y")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25(docs, "doc_id", "text", Seq("x"))
      .orderBy($"doc").as[(Long, Int, Double)].collect().toSeq
    val n = 3.0; val dfx = 2.0; val avgdl = 6.0 / 3
    val idf = math.log(1 + (n - dfx + 0.5) / (dfx + 0.5))
    def s(tf: Double, dl: Double) =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (0.25 + 0.75 * dl / avgdl)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq((1L, 3, s(2, 3)), (2L, 1, 0.0), (3L, 2, s(1, 2))))
    // more matches, same length -> strictly higher score
    assert(got.head._3 > got(2)._3)
  }
}
