package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType}

/** Fixed-length context-window tensorization — the last-mile operator
  * between a tokenized corpus and a training run: concatenate documents
  * (each terminated by a separator token) into a per-group token
  * stream, chunk it into windows of exactly `seqLen`, and emit the
  * padded `input_ids` + `attention_mask` rows a data loader consumes.
  * GPT-style block packing: documents SPLIT across window boundaries,
  * so every window except each group's last is exactly full — zero
  * padding waste regardless of document-length distribution.
  *
  * Scale shape (same trick as [[TextAnalysis.packShards]]): documents
  * are id-hash bucketed into `nGroups` independent packing groups, so
  * the running-offset window never needs a global single-partition
  * sort; window ids namespace as group·2³² + in-group index. Per-doc
  * work is a map; the only exchanges are the group-partitioned offset
  * window and the per-window segment assembly — and the assembly
  * shuffle carries each token exactly once, which IS the output
  * volume (no operator can do less). A document touching k windows
  * ships k array SLICES, not k copies.
  *
  * Output: (window, input_ids array<tok>, n_real, attention_mask) —
  * deterministic for a given corpus: group = hash(doc id), in-group
  * order = doc id, segment order = stream offset (sort_array on the
  * offset-keyed struct, so collect_list's arrival order never shows).
  */
object Tensorize {

  def tensorize(df: DataFrame, id: String, toks: Column, seqLen: Int,
                pad: Column, sep: Column, nGroups: Int = 16): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive: $seqLen")
    require(nGroups > 0, s"nGroups must be positive: $nGroups")
    val L = lit(seqLen.toLong)
    val w = Window.partitionBy(col("__grp")).orderBy(col("__doc"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // every document contributes at least its separator, so __n >= 1
    // and the explode below never sees an inverted sequence
    val base = df
      .select(col(id).as("__doc"), concat(toks, array(sep)).as("__ts"))
      .withColumn("__grp", pmod(graft.functions.RollingHash(
        concat(lit("pack:"), col("__doc").cast(StringType))),
        lit(nGroups)))
      .withColumn("__n", size(col("__ts")).cast(LongType))
      .withColumn("__s", sum(col("__n")).over(w) - col("__n"))
    // split [s, s+n) at window boundaries: one slice per touched window
    val segStart = greatest(col("__s"), col("__w") * L)
    val segEnd = least(col("__s") + col("__n"), (col("__w") + 1) * L)
    // `div`, not `/`: Spark's `/` on longs is DOUBLE division, and a
    // quotient within an ulp of an integer would truncate into the
    // wrong window at large stream offsets — integer division is exact
    // at every offset
    val segs = base
      .withColumn("__w", explode(sequence(
        expr(s"__s div ${seqLen}L"),
        expr(s"(__s + __n - 1) div ${seqLen}L"))))
      .select(col("__grp"), col("__w"), segStart.as("__o"),
        slice(col("__ts"), (segStart - col("__s") + 1).cast("int"),
          (segEnd - segStart).cast("int")).as("__g"))
    val real = flatten(transform(
      sort_array(collect_list(struct(col("__o"), col("__g")))),
      s => s.getField("__g")))
    segs.groupBy(col("__grp"), col("__w"))
      .agg(real.as("__real"))
      .withColumn("__nr", size(col("__real")))
      .select(
        (col("__grp").cast(LongType) * lit(4294967296L) + col("__w"))
          .as("window"),
        concat(col("__real"),
          array_repeat(pad, lit(seqLen) - col("__nr"))).as("input_ids"),
        col("__nr").as("n_real"),
        concat(array_repeat(lit(1), col("__nr")),
          array_repeat(lit(0), lit(seqLen) - col("__nr")))
          .as("attention_mask"))
  }
}
