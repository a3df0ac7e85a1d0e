package graft

import graft.kernel.{Extract, ExtractMode}
import graft.sources.DocSynth
import java.util.concurrent.{Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** Pure-JVM (no Spark) kernel scaling probe: isolates whether the extraction
  * kernel itself scales across threads on this box, separating kernel
  * allocation/memory-bandwidth effects from Spark shuffle/scheduler effects.
  */
object KernelScalingProbe {

  private def mkDocs(n: Int): Array[(String, String)] = {
    val words = "spark scala column row table join merge sort filter window stream batch hash key value data".split(' ')
    (0 until n).map { i =>
      val sb = new java.lang.StringBuilder
      var x = i.toLong * 2654435761L
      val len = 40 + (x % 60).toInt.abs
      for (_ <- 0 until len) { x = x * 6364136223846793005L + 1442695040888963407L; sb.append(words(((x >>> 33) % words.length).toInt)).append(' ') }
      (s"d$i", sb.toString)
    }.toArray
  }

  private def run(docs: Array[(String, String)], threads: Int, mode: ExtractMode): Double = {
    val pool = Executors.newFixedThreadPool(threads)
    val idx = new AtomicInteger(0)
    val sink = new java.util.concurrent.atomic.AtomicLong(0)
    val t0 = System.nanoTime()
    val tasks = (0 until threads).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var i = idx.getAndIncrement()
          var acc = 0L
          while (i < docs.length) {
            val d = Extract.extractDoc(DocSynth.synthDoc(docs(i)._1, docs(i)._2), mode)
            acc += d.spans.length
            i = idx.getAndIncrement()
          }
          sink.addAndGet(acc)
        }
      })
    }
    tasks.foreach(_.get())
    pool.shutdown(); pool.awaitTermination(1, TimeUnit.MINUTES)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = sys.env.getOrElse("PROBE_DOCS", "500000").toInt
    val docs = mkDocs(n)
    val mode = ExtractMode.SemanticMode
    run(docs, 8, mode) // warm
    val t8 = (1 to 3).map(_ => run(docs, 8, mode)).min
    val t32 = (1 to 3).map(_ => run(docs, 32, mode)).min
    val eff = (n / t32) / (4.0 * (n / t8))
    println(f"""{"docs":$n,"threads8_sec":$t8%.3f,"tp8":${n / t8}%.1f,"threads32_sec":$t32%.3f,"tp32":${n / t32}%.1f,"kernel_scaling_efficiency":$eff%.3f}""")
  }
}
