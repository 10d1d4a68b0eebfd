package graft

import org.apache.spark.sql.functions._
import graft.llm.{Tensorize, TextAnalysis}

class TensorizeSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed block packing: split, pad, mask") {
    // one packing group so the stream order is just doc order
    val docs = Seq((1L, "a b c"), (2L, "d e")).toDF("doc_id", "text")
    val got = Tensorize.tensorize(docs, "doc_id",
        TextAnalysis.tokens($"text"), seqLen = 4,
        pad = lit("<pad>"), sep = lit("<eos>"), nGroups = 1)
      .orderBy($"window")
      .as[(Long, Seq[String], Int, Seq[Int])].collect().toSeq
    // stream: a b c <eos> d e <eos>  (7 tokens, L=4)
    assert(got === Seq(
      (0L, Seq("a", "b", "c", "<eos>"), 4, Seq(1, 1, 1, 1)),
      (1L, Seq("d", "e", "<eos>", "<pad>"), 3, Seq(1, 1, 1, 0))))
  }

  test("every window except each group's last is exactly full") {
    val docs = Tables.load(spark, sf, "documents")
    val L = 128
    val t = Tensorize.tensorize(docs, "doc_id",
      TextAnalysis.tokens(lower($"text")), L, lit("<pad>"), lit("<eos>"))
    val lastPerGrp = t.withColumn("grp", ($"window" / 4294967296L)
        .cast("long"))
      .groupBy($"grp").agg(max($"window").as("window"))
    val nonLast = t.join(lastPerGrp, Seq("window"), "left_anti")
    assert(nonLast.filter($"n_real" =!= L).count() === 0)
    assert(t.filter(size($"input_ids") =!= L ||
      size($"attention_mask") =!= L).count() === 0)
  }

  test("token conservation: every input token lands in exactly one window") {
    val docs = Tables.load(spark, sf, "documents").limit(200)
    val t = Tensorize.tensorize(docs, "doc_id",
      TextAnalysis.tokens(lower($"text")), 64, lit("<pad>"), lit("<eos>"))
    val packed = t.agg(sum($"n_real")).head.getLong(0)
    val source = docs
      .agg(sum(TextAnalysis.tokenCountWs(lower($"text")) + 1))
      .head.getLong(0)
    assert(packed === source)
    // and the padding accounting is consistent
    val padded = t.select(explode($"attention_mask").as("m"))
      .filter($"m" === 0).count()
    assert(packed + padded === t.count() * 64)
  }
}
