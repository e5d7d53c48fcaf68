package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the imperative interpreter
  * (imperative.rs:67-250): random programs over a temp relation —
  * put/rm blocks, %if/%then/%else on query conditions, %ignore_error
  * around failing :insert, and a %loop/%break growth pattern — are
  * mirrored by a naive Set[Long] machine, and the program's final
  * query block must return exactly the model's state. Exercises
  * statement sequencing, condition truthiness, swallowed errors,
  * loop control flow, and temp-relation lifetime in one pass.
  */
class ImperativeFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  sealed trait S
  case class Put(k: Long) extends S
  case class Rm(k: Long) extends S
  case class Ins(k: Long) extends S // :insert under %ignore_error
  case class If(cond: Long, thenB: Seq[S], elseB: Seq[S]) extends S
  case class LoopGrow(lim: Long) extends S

  private def render(s: S): String = s match {
    case Put(k) => s"{ ?[v] <- [[$k]] :put _c {v} }"
    case Rm(k) => s"{ ?[v] <- [[$k]] :rm _c {v} }"
    case Ins(k) => s"%ignore_error { ?[v] <- [[$k]] :insert _c {v} }"
    case If(c, t, e) =>
      s"%if { ?[v] := *_c[v], v >= $c }\n" +
        s"  %then ${t.map(render).mkString(" ")}\n" +
        s"  %else ${e.map(render).mkString(" ")}\n%end"
    case LoopGrow(lim) =>
      s"""%loop
         |  %if { ?[v] := *_c[v], v >= $lim } %then %break %end
         |  { ?[v] := *_c[w], v = w + 1, w < $lim :put _c {v} }
         |%end""".stripMargin
  }

  /** Naive machine; returns None if a LoopGrow would not terminate. */
  private def applyS(set: scala.collection.mutable.Set[Long], s: S): Option[Unit] = s match {
    case Put(k) => set += k; Some(())
    case Rm(k) => set -= k; Some(())
    case Ins(k) => if (!set(k)) set += k; Some(())
    case If(c, t, e) =>
      val b = if (set.exists(_ >= c)) t else e
      b.foldLeft(Option(())) { (acc, st) => acc.flatMap(_ => applyS(set, st)) }
    case LoopGrow(lim) =>
      var iters = 0
      while (!set.exists(_ >= lim)) {
        val grown = set.toSeq.filter(_ < lim).map(_ + 1)
        val before = set.size
        set ++= grown
        iters += 1
        if (set.size == before || iters > 300) return None // would spin forever
      }
      Some(())
  }

  test("random imperative programs ≡ a naive set machine (30 seeds)") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    var ran = 0
    for (seed <- 0 until 30) {
      val rnd = new scala.util.Random(seed * 48611 + 7)
      def leaf(): S = rnd.nextInt(3) match {
        case 0 => Put(rnd.nextInt(12).toLong)
        case 1 => Rm(rnd.nextInt(12).toLong)
        case _ => Ins(rnd.nextInt(12).toLong)
      }
      val stmts: Seq[S] = Put(0L) +: (0 until 5 + rnd.nextInt(5)).map { _ =>
        rnd.nextInt(5) match {
          case 0 => If(rnd.nextInt(12).toLong,
            Seq.fill(1 + rnd.nextInt(2))(leaf()), Seq.fill(rnd.nextInt(2))(leaf()))
          case 1 => LoopGrow((4 + rnd.nextInt(8)).toLong)
          case _ => leaf()
        }
      }
      val model = scala.collection.mutable.Set.empty[Long]
      val terminates = stmts.foldLeft(Option(())) { (acc, st) =>
        acc.flatMap(_ => applyS(model, st)) }.isDefined
      if (terminates) {
        ran += 1
        val prog = "{:create _c {v}}\n" + stmts.map(render).mkString("\n") +
          "\n{ ?[v] := *_c[v] }"
        try {
          val db = new CozoDb(spark)
          val got = db.run(prog).collect().map(_.getLong(0)).toSet
          if (got != model.toSet)
            failures += s"seed $seed:\n$prog\n  got $got\n  want ${model.toSet}"
        } catch {
          case e: Throwable =>
            failures += s"seed $seed THREW ${e.getClass.getSimpleName}: ${e.getMessage}\n$prog"
        }
      }
    }
    assert(ran >= 20, s"too many skipped seeds ($ran ran)") // generator sanity
    assert(failures.isEmpty, s"${failures.length} diverging seeds:\n${failures.take(3).mkString("\n\n")}")
  }
}
