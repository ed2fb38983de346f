package graft

/** Fixed-workload host-drift canary for the idle-bench protocol: a
  * deterministic, data-free CPU workload (32 threads × a fixed count of
  * xorshift64* steps — the same thread shape as the `local[32]` bench
  * JVMs) whose wall-clock depends ONLY on the host's available compute.
  * The code never changes between rounds, so its time moving IS host
  * drift, measured — round 18 had to attribute a q9x idle-median rise
  * to a degrading machine via a prose note (EntrySmoke 18 → 49.6 s
  * across one session); `bench_idle.py` now runs this before every
  * bench JVM and commits `canary_s` per run in the artifact, making
  * idle medians self-normalizing across rounds (COVERAGE.md states the
  * rule: a per-query regression smaller than the canary's relative
  * drift is host-attributed, not code-attributed).
  *
  * Prints one JSON line: {"canary_s":<seconds>}. The xor-folded sum is
  * printed too so the JIT cannot elide the loops.
  */
object HostCanary {
  def main(args: Array[String]): Unit = {
    val threads = if (args.length > 0) args(0).toInt else 32
    val stepsPerThread = 400000000L // ~0.5 s/thread on a healthy core
    val acc = new java.util.concurrent.atomic.AtomicLong(0L)
    val t0 = System.nanoTime()
    val pool = (0 until threads).map { t =>
      val th = new Thread(() => {
        var x = 0x9E3779B97F4A7C15L + t
        var i = 0L
        var sum = 0L
        while (i < stepsPerThread) {
          // xorshift64* — 3 xors, 2 shifts, 1 multiply per step: enough
          // ILP-resistant dependency chain that the loop measures the
          // core, not the memory system
          x ^= x >>> 12
          x ^= x << 25
          x ^= x >>> 27
          sum += x * 0x2545F4914F6CDD1DL
          i += 1
        }
        acc.addAndGet(sum)
        ()
      })
      th.start()
      th
    }
    pool.foreach(_.join())
    val s = (System.nanoTime() - t0) / 1e9
    println(f"""{"canary_s":$s%.3f,"threads":$threads,"checksum":${acc.get()}}""")
  }
}
