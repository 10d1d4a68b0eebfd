package graft

/** JVM-only concurrency probe for the ImageIO decode behind the dHash
  * stack — [[AudioDecodeProbe]]'s image twin: ImageIO defaults to a
  * DISK-backed ImageInputStream cache (a temp file per decode), so
  * concurrent decodes can serialize on filesystem work exactly like the
  * javax.sound provider lock. Measures decode throughput with the cache
  * on vs off, 1 vs 32 threads. Run:
  * `sbt "Test/runMain graft.ImageDecodeProbe"` */
object ImageDecodeProbe {
  def main(args: Array[String]): Unit = {
    import graft.llm.MediaCodecs
    // the syntheticContentImages payload shapes (PNG + BMP renders)
    def payload(id: Long): Array[Byte] = {
      val img = MediaCodecs.renderImage(18, 16, (id % 64).toInt)
      MediaCodecs.encodeImageIO(img,
        if ((id / 64) % 2 == 0) "png" else "bmp")
    }
    val ps = (0L until 96L).map(payload).toArray
    val N = 20000
    def decodeAll(n: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < n) {
        val img = javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(ps(i % 96)))
        if (img != null) acc ^= MediaCodecs.dhash64(img)
        i += 1
      }
      acc
    }
    for (useCache <- Seq(true, false)) {
      javax.imageio.ImageIO.setUseCache(useCache)
      decodeAll(5000) // warm-up
      val t1 = System.nanoTime()
      val sink = decodeAll(N)
      val single = (System.nanoTime() - t1) / 1e9
      println(f"[idp] cache=$useCache%-5s  1 thread : $N decodes in " +
        f"$single%6.2f s (${N / single}%.0f/s) [$sink]")
      for (threads <- Seq(32)) {
        val pool =
          java.util.concurrent.Executors.newFixedThreadPool(threads)
        val t0 = System.nanoTime()
        val futs = (0 until threads).map(_ =>
          pool.submit(new java.util.concurrent.Callable[Long] {
            def call(): Long = decodeAll(N)
          }))
        futs.foreach(_.get())
        val dt = (System.nanoTime() - t0) / 1e9
        pool.shutdown()
        val tput = threads.toLong * N / dt
        println(f"[idp] cache=$useCache%-5s $threads%2d threads: " +
          f"${threads * N} decodes in $dt%6.2f s ($tput%.0f/s total, " +
          f"${tput / (N / single)}%.1fx single-thread)")
      }
    }
  }
}
