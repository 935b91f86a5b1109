package graft

/** Deterministic, data-independent CPU/memory calibration kernels — the
  * quantitative host anchor the r14 verdict asked for (task #1): two
  * consecutive rounds attributed +20–30% bench wall to host-side
  * slowdown on qualitative evidence only (flagged={}, plans
  * byte-identical, cpu_wall_ratio down). These kernels run a FIXED
  * amount of work (no timed loops — the work is identical on every
  * host, every round), so their wall time measures the host, not the
  * code. Bench runs them before each sweep and publishes
  * `host_factor` = measured throughput / the committed reference
  * throughput below; `calibrated s/q` = raw s/q × factor converts any
  * box's wall into reference-box seconds, making round-over-round wall
  * numbers comparable again.
  *
  * Three axes, because contention degrades them differently:
  *  - single-thread ALU (`stArithMops`): pure register arithmetic —
  *    degrades only under CPU oversubscription or frequency scaling;
  *  - all-cores ALU (`mtArithMops`): the same kernel on every bench
  *    core — degrades proportionally to external CPU load (the
  *    primary suspect in r13/r14);
  *  - all-cores memory stream (`memGBps`): strided reads over a
  *    256 MiB shared array — degrades under memory-bandwidth
  *    contention even when cores are free (the component
  *    cpu_wall_ratio cannot see: the JVM is "on cpu" while stalled).
  *
  * The composite factor is the GEOMETRIC MEAN of the three ratios:
  * Spark suite time is a product of compute- and bandwidth-bound
  * phases in unknown proportion, and the geomean is the neutral prior
  * that keeps any one axis from dominating.
  */
object HostCalibration {

  /** Reference throughputs, MINTED round 15 on the build box in its
    * then-current state (median of 5 quiet-window runs via
    * `runMain graft.HostCalibration`). All factors are relative to
    * THIS box-state: factor 1.0 = "the box as it was when r15's bench
    * floor was minted", so r15+k rounds can attribute wall drift
    * quantitatively. Re-mint only with a written note — moving the
    * anchor silently re-bases every later round's calibrated numbers.
    */
  val RefStArithMops: Double = 532.0
  val RefMtArithMops: Double = 15600.0
  val RefMemGBps: Double = 48.0

  /** Thread count of the all-cores probes: FIXED at the reference
    * box's 32, never the bench's SPARK_GRAFT_CPUS — the calibration is
    * a HOST probe, and factors are only comparable across rounds if
    * every round runs the identical probe (a 16-thread mt probe reads
    * ~half the 32-thread reference on an idle box and would fake a 2×
    * slowdown). Capped at the machine's processors: fewer cores than
    * the reference IS a slower host for a 32-way bench.
    */
  val RefThreads: Int = 32
  def defaultThreads: Int =
    math.min(Runtime.getRuntime.availableProcessors(), RefThreads)

  // fixed work sizes: ~0.25 s/axis on the reference box — a full
  // 4-point bench session spends ~3 s calibrating, noise next to a
  // 400 s suite
  val ArithIters: Long = 200L * 1000 * 1000
  val MemWords: Int = 1 << 25 // 32 Mi longs = 256 MiB
  val MemPasses: Int = 2

  // published sink defeats dead-code elimination; never read
  @volatile var blackHole: Long = 0L

  /** SplitMix64-style fixed-length mixing loop: pure register ALU,
    * JIT-compiles to a tight loop, result data-independent.
    */
  def mix(seed: Long, iters: Long): Long = {
    var x = seed
    var i = 0L
    while (i < iters) {
      x = x * 6364136223846793005L + 1442695040888963407L
      x ^= (x >>> 33)
      i += 1
    }
    x
  }

  /** Sum a half-open stripe of `arr` `passes` times — sequential reads,
    * memory-bandwidth bound at 256 MiB (far past L3).
    */
  def memSum(arr: Array[Long], lo: Int, hi: Int, passes: Int): Long = {
    var s = 0L
    var p = 0
    while (p < passes) {
      var i = lo
      while (i < hi) { s += arr(i); i += 1 }
      p += 1
    }
    s
  }

  final case class Point(stArithMops: Double, mtArithMops: Double,
                         memGBps: Double) {
    /** Composite host factor vs the committed reference (geomean of
      * the three ratios): 1.0 = reference speed, <1 = slower box.
      */
    def factor: Double = math.cbrt(
      (stArithMops / RefStArithMops) *
        (mtArithMops / RefMtArithMops) *
        (memGBps / RefMemGBps))
    def json: String =
      f"""{"st_arith_mops":$stArithMops%.1f,"mt_arith_mops":$mtArithMops%.1f,"mem_gbps":$memGBps%.2f,"factor":$factor%.4f}"""
  }

  private def runThreads(n: Int)(body: Int => Long): Unit = {
    val sink = new java.util.concurrent.atomic.AtomicLong
    val ts = (0 until n).map { t =>
      val th = new Thread(() => { sink.addAndGet(body(t)); () })
      th.setDaemon(true)
      th.start()
      th
    }
    ts.foreach(_.join())
    blackHole ^= sink.get
  }

  /** One calibration point: warm each kernel briefly (JIT), then time
    * the fixed work — each axis BEST-OF-TWO back-to-back repetitions
    * (a single 32-thread join is quantized by one descheduled straggler;
    * measured 2.6× run-to-run spread on the memory axis at loadavg ~4.
    * Sustained external load slows BOTH repetitions, so the max still
    * witnesses real contention; only one-off stalls are filtered — the
    * same one-sided-noise reasoning as the bench's min-of-sweeps wall).
    * Total ~2 s on the reference box.
    */
  def measure(threads: Int = defaultThreads): Point = {
    val arr = sharedArray
    // kernel warmup (JIT compile); tiny fraction of the measured work
    blackHole ^= mix(42L, ArithIters / 50)
    blackHole ^= memSum(arr, 0, MemWords / 50, 1)

    def best(work: () => Unit, unitsPerRun: Double): Double =
      (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        work()
        unitsPerRun / ((System.nanoTime() - t0) / 1e9)
      }.max

    val st = best(() => { blackHole ^= mix(42L, ArithIters) },
                  ArithIters / 1e6)
    val mt = best(() => runThreads(threads)(t => mix(t + 1L, ArithIters)),
                  threads.toLong * ArithIters / 1e6)
    val stripe = MemWords / threads
    val gbps = best(() => runThreads(threads) { t =>
      val lo = t * stripe
      val hi = if (t == threads - 1) MemWords else lo + stripe
      memSum(arr, lo, hi, MemPasses)
    }, MemWords.toDouble * 8 * MemPasses / 1e9)

    Point(st, mt, gbps)
  }

  // one shared array per JVM: allocation/zeroing is not what we measure
  private lazy val sharedArray: Array[Long] = {
    val a = new Array[Long](MemWords)
    var i = 0
    while (i < MemWords) { a(i) = i * 0x9E3779B97F4A7C15L; i += 1 }
    a
  }

  /** Standalone minting/inspection entry: prints one point per line. */
  def main(args: Array[String]): Unit = {
    val n = args.headOption.flatMap(_.toIntOption).getOrElse(5)
    (1 to n).foreach { i =>
      val p = measure()
      println(s"""{"run":$i,${p.json.drop(1)}""")
    }
  }
}
