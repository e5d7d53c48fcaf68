package graft.lang

import graft.SparkFixture
import org.scalatest.funsuite.AnyFunSuite

/** Differential fuzz of the keyed mutation sinks (program.rs:195-205,
  * stored.rs:44-207): random op sequences — :put / :insert / :update
  * (each non-key column subset) / :rm / :delete — against a naive
  * Map[key, (a, b)] model, checking both the final relation state and
  * every error branch (insert on existing key, update on missing key —
  * the reference's "key to update does not exist", stored.rs:590-597 —
  * delete on missing key), with state UNCHANGED after a failed op.
  */
class MutationFuzzSpec extends AnyFunSuite {
  lazy val spark = SparkFixture.spark

  test("random put/insert/update/rm/delete sequences match a naive keyed model (25 seeds × 14 ops)") {
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    for (seed <- 0 until 25) {
      val rnd = new scala.util.Random(seed * 30011 + 101)
      val db = new CozoDb(spark)
      db.run(s"?[k, a, b] <- [[0, 0, 0]] :create m$seed {k => a, b}")
      val model = scala.collection.mutable.Map(0L -> ((0L, 0L)))
      val log = scala.collection.mutable.ArrayBuffer.empty[String]
      for (step <- 0 until 14) {
        val k = rnd.nextInt(6).toLong
        val a = rnd.nextInt(100).toLong
        val b = rnd.nextInt(100).toLong
        val op = rnd.nextInt(6)
        val (script, apply): (String, () => Unit) = op match {
          case 0 =>
            (s"?[k, a, b] <- [[$k, $a, $b]] :put m$seed {k => a, b}",
              () => model(k) = ((a, b)))
          case 1 =>
            (s"?[k, a, b] <- [[$k, $a, $b]] :insert m$seed {k => a, b}",
              () => {
                if (model.contains(k)) throw new IllegalStateException("dup")
                model(k) = ((a, b))
              })
          case 2 =>
            (s"?[k, a] <- [[$k, $a]] :update m$seed {k, a}",
              () => {
                if (!model.contains(k)) throw new IllegalStateException("missing")
                model(k) = ((a, model(k)._2))
              })
          case 3 =>
            (s"?[k, b] <- [[$k, $b]] :update m$seed {k, b}",
              () => {
                if (!model.contains(k)) throw new IllegalStateException("missing")
                model(k) = ((model(k)._1, b))
              })
          case 4 =>
            (s"?[k] <- [[$k]] :rm m$seed {k}", () => { model.remove(k); () })
          case _ =>
            (s"?[k] <- [[$k]] :delete m$seed {k}",
              () => {
                if (!model.contains(k)) throw new IllegalStateException("missing")
                model.remove(k); ()
              })
        }
        val modelErr = scala.util.Try(apply()).isFailure
        val dbErr = scala.util.Try(db.run(script)).isFailure
        log += s"$script ${if (modelErr) "[expect-error]" else ""}"
        if (modelErr != dbErr) {
          failures += s"seed $seed step $step: model ${if (modelErr) "errors" else "succeeds"} " +
            s"but db ${if (dbErr) "errors" else "succeeds"}\n  ${log.mkString("\n  ")}"
        }
        val got = db.run(s"?[k, a, b] := *m$seed{k, a, b}").collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
        if (got != model.toMap) {
          failures += s"seed $seed step $step: state diverged\n  got:   $got\n  model: ${model.toMap}\n  ${log.mkString("\n  ")}"
        }
        if (failures.nonEmpty) { /* keep going to next seed */ }
      }
    }
    assert(failures.isEmpty, s"${failures.length} divergences:\n${failures.take(3).mkString("\n\n")}")
  }

  test("update on a missing key errors with the reference's message; state unchanged") {
    val db = new CozoDb(spark)
    db.run("?[k, a, b] <- [[1, 2, 3]] :create um {k => a, b}")
    val e = intercept[Exception](db.run("?[k, a] <- [[9, 7]] :update um {k, a}"))
    assert(e.getMessage.contains("key to update does not exist"))
    assert(db.run("?[k, a, b] := *um{k, a, b}").collect().map(_.toSeq).toSeq ==
      Seq(Seq(1L, 2L, 3L)))
  }
}
