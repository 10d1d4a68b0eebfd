package graft

/** JVM-only (no Spark) concurrency probe for the javax.sound PCM decode
  * behind the aFP audio stack — attributes the sf1 probe's superlinear
  * audio-family wall-clock (SURVEY §8.21): if per-decode cost is flat
  * but aggregate throughput stops scaling with threads, the cause is
  * contention inside `AudioSystem.getAudioInputStream`'s provider
  * machinery, not the dedup design. Run:
  * `sbt "Test/runMain graft.AudioDecodeProbe"` */
object AudioDecodeProbe {
  def main(args: Array[String]): Unit = {
    import graft.llm.MediaCodecs
    def payload(id: Long): Array[Byte] = {
      val s = (id % 48).toInt
      val samples = Array.tabulate(1040) { i =>
        val base = (i * (s + 3) + (i % 17) * 41 + s * s) % 509 - 254
        if (id % 5 == 0 && i == 100) base + 512 else base
      }
      if ((id / 48) % 2 == 0) MediaCodecs.encodeWavPcm16(8000, samples)
      else MediaCodecs.encodeAiffPcm16(8000, samples)
    }
    val ps = (0L until 96L).map(payload).toArray
    val N = 20000
    def decodeAll(n: Int,
                  dec: Array[Byte] => Option[Array[Int]]): Long = {
      var acc = 0L
      var i = 0
      while (i < n) {
        acc ^= dec(ps(i % 96)).flatMap(MediaCodecs.afp64).getOrElse(0L)
        i += 1
      }
      acc
    }
    for ((label, dec) <- Seq(
        "jdk " -> (MediaCodecs.decodePcm16Jdk(_)),
        "fast" -> (MediaCodecs.decodePcm16Fast(_)))) {
      decodeAll(5000, dec) // warm-up
      val t1 = System.nanoTime()
      val sink = decodeAll(N, dec)
      val single = (System.nanoTime() - t1) / 1e9
      println(f"[adp] $label 1 thread : $N decodes in $single%6.2f s " +
        f"(${N / single}%.0f/s) [$sink]")
      for (threads <- Seq(4, 32)) {
        val pool =
          java.util.concurrent.Executors.newFixedThreadPool(threads)
        val t0 = System.nanoTime()
        val futs = (0 until threads).map(_ =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = decodeAll(N, dec)
          }))
        futs.foreach(_.get())
        val dt = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        val tput = threads.toLong * N / dt
        println(f"[adp] $label $threads%2d threads: ${threads * N} " +
          f"decodes in $dt%6.2f s ($tput%.0f/s total, " +
          f"${tput / (N / single)}%.1fx single-thread)")
      }
    }
  }
}
