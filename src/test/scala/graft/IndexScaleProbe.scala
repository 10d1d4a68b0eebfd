package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Index-size scaling probe for the novelty forms (SURVEY §8.21/§8.23):
  * a FIXED arrival batch tested against signature indexes of growing
  * size — the plan-literal form's cost grows with the index (plan
  * construction/analysis embeds it), the join forms' stay ~flat (the
  * index is data on the other side of an equi-join).
  *
  * r14 (verdict #1 done-criterion): sizes extend to 10M signatures, a
  * SMALL-batch arm exercises the band_pfx partition pruning (the
  * trickle-ingest regime where per-batch index IO is the binding
  * cost), and each table probe reports the index scan's measured
  * partitions/files/bytes — the IO evidence, not just wall time. Two
  * table shapes are timed: the r13-style per-probe cap window and the
  * r14 ingest shape (pre-capped index, windowless + prefix-pruned).
  * Run: `sbt "Test/runMain graft.IndexScaleProbe"` */
object IndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val wh = java.nio.file.Files.createTempDirectory("graft-wh").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      // final physical plans up front: the probe reads scan metrics
      // off the executed DataFrame's plan after the run
      .config("spark.sql.adaptive.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = Tables.load(spark, "/root/testdata/sf0.1", "documents")
      .limit(2000)
    val media = graft.llm.Multimodal.syntheticContentImages(docs)
      .localCheckpoint()
    val mediaSmall = media.limit(50).localCheckpoint()
    // synthetic signature indexes: iid 64-bit values (spread like real
    // perceptual-hash corpora), deterministic
    def idx(n: Int): DataFrame =
      spark.range(n.toLong).select(xxhash64(col("id")).as("sig"))
        .localCheckpoint(false)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    // IO evidence off the executed plan: the index scan's partition /
    // file / byte metrics (static band_pfx pruning shows up here).
    // The timed runs go through the noop WRITE path, which re-plans —
    // so this executes the DataFrame's own plan (collect; results are
    // batch-sized) and reads the metrics that run populated.
    def scanIo(df: DataFrame, table: String): String = {
      import org.apache.spark.sql.execution.FileSourceScanExec
      df.collect()
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec
            if f.tableIdentifier.exists(_.table == table) => f
      }.headOption.map { f =>
        def m(k: String) = f.metrics.get(k).map(_.value.toString)
          .getOrElse("-")
        s"parts=${m("numPartitions")} files=${m("numFiles")} " +
          s"bytes=${m("filesSize")}"
      }.getOrElse("no-scan")
    }
    println(f"[isp] ${"index"}%10s ${"literal"}%8s ${"join"}%8s " +
      f"${"bkt"}%7s ${"capped"}%7s ${"capped50"}%9s  io(capped50)")
    for (n <- Seq(1000, 64000, 1000000, 10000000)) {
      val table = idx(n)
      // literal arm only under the plan-size guard
      val tl: Option[Double] =
        if (n <= graft.streaming.Events.MaxLiteralIndexSigs) {
          val sigs = table.as[Long].collect().toSeq
          def runLit(): Unit = graft.streaming.Events
            .imageNoveltyStream(media, sigs)
            .write.format("noop").mode("overwrite").save()
          runLit() // warm-up
          Some(math.min(time(runLit()), time(runLit())))
        } else None
      def runJoin(): Unit = graft.streaming.Events
        .imageNoveltyJoin(media, table)
        .write.format("noop").mode("overwrite").save()
      runJoin() // warm-up
      val tj = math.min(time(runJoin()), time(runJoin()))
      // table arms: the ingest loop's per-batch probe shapes
      val bktT = s"isp_idx_$n"
      spark.sql(s"DROP TABLE IF EXISTS $bktT")
      graft.streaming.Events.createSignatureIndex(spark, bktT, table,
        "sig")
      val signed = graft.llm.Multimodal.withDhash(media).localCheckpoint()
      val signedSmall = graft.llm.Multimodal.withDhash(mediaSmall)
        .localCheckpoint()
      // r13 shape: per-probe cap window over the table
      def runBkt(): Unit = graft.streaming.Events
        .noveltyBandedJoin(signed, "dhash", spark.table(bktT), 3)
        .write.format("noop").mode("overwrite").save()
      runBkt() // warm-up
      val tb = math.min(time(runBkt()), time(runBkt()))
      // r14 ingest shape: pre-capped index, windowless + prefix-pruned
      def capped(s0: DataFrame): DataFrame = graft.streaming.Events
        .noveltyBandedJoin(s0, "dhash", spark.table(bktT),
          3, maxBucket = Int.MaxValue)
      def runCap(): Unit =
        capped(signed).write.format("noop").mode("overwrite").save()
      runCap() // warm-up
      val tc = math.min(time(runCap()), time(runCap()))
      val smallDf = capped(signedSmall)
      def runCapSmall(): Unit =
        smallDf.write.format("noop").mode("overwrite").save()
      runCapSmall() // warm-up
      val ts = math.min(time(runCapSmall()), time(runCapSmall()))
      val io = scanIo(smallDf, bktT)
      val ioBig = scanIo(capped(signed), bktT)
      spark.sql(s"DROP TABLE IF EXISTS $bktT")
      println(f"[isp] $n%10d ${tl.map(t => f"$t%8.2f").getOrElse("       -")}%s $tj%8.2f $tb%7.2f $tc%7.2f $ts%9.2f  small[$io] big[$ioBig]")
    }

    // ---- key geometry (r14 6th geometry): fixed batches against a
    // growing exact-key index — the probe is one pruned semi/anti join,
    // so time should stay flat and the trickle batch's IO sub-linear
    // (key_pfx partition pruning, 64 string-hash prefixes)
    println(f"[isp:key] ${"index"}%10s ${"big2000"}%8s ${"small50"}%8s  io")
    val keyBatch = spark.range(2000)
      .select(md5(concat(lit("k"), col("id"))).as("k")).localCheckpoint()
    val keyBatchSmall = keyBatch.limit(50).localCheckpoint()
    for (n <- Seq(1000, 64000, 1000000, 10000000)) {
      val kt = s"isp_key_$n"
      spark.sql(s"DROP TABLE IF EXISTS $kt")
      graft.streaming.Events.createKeyIndex(spark, kt,
        spark.range(n.toLong)
          .select(md5(concat(lit("i"), col("id"))).as("k")), "k")
      def probe(b: DataFrame): DataFrame = graft.streaming.Events
        .noveltyKeyExistsJoin(b, "k", spark.table(kt))
      def runBig(): Unit =
        probe(keyBatch).write.format("noop").mode("overwrite").save()
      runBig() // warm-up
      val tb2 = math.min(time(runBig()), time(runBig()))
      val smallDf = probe(keyBatchSmall)
      def runSmall(): Unit =
        smallDf.write.format("noop").mode("overwrite").save()
      runSmall() // warm-up
      val ts2 = math.min(time(runSmall()), time(runSmall()))
      val io = scanIo(smallDf, kt)
      val ioBig = scanIo(probe(keyBatch), kt)
      spark.sql(s"DROP TABLE IF EXISTS $kt")
      println(f"[isp:key] $n%10d $tb2%8.2f $ts2%8.2f  small[$io] big[$ioBig]")
    }
    spark.stop()
  }
}
