package graft.align

import org.scalatest.funsuite.AnyFunSuite
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Golden parity with the reference staircase fit: fixtures in
  * src/test/resources/staircase_golden.json were produced by running the
  * reference implementation (staircase.py) on 23 synthetic label streams
  * — clean staircases, 15%-noise streams, missing classes, pure noise,
  * tiny domains. Thresholds, uncertainty, boundaries, and per-position
  * predictions must all match exactly.
  */
class StaircaseSpec extends AnyFunSuite {

  private case class Case(name: String, classes: Int, labels: Array[Int],
                          thresholds: Array[Double], uncertainty: Array[Double],
                          boundaries: Array[Double], predict: Array[Int])

  private lazy val cases: Seq[Case] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/staircase_golden.json"), "UTF-8")
    val txt = try src.mkString finally src.close()
    val JArray(arr) = JsonMethods.parse(txt): @unchecked
    arr.map { jv =>
      def ints(f: String) = (jv \ f).asInstanceOf[JArray].arr
        .map(v => v.asInstanceOf[JInt].num.toInt).toArray
      def dbls(f: String) = (jv \ f).asInstanceOf[JArray].arr.map {
        case JDouble(d) => d
        case JInt(n)    => n.toDouble
        case other      => fail(s"unexpected $other")
      }.toArray
      val JString(name) = (jv \ "name"): @unchecked
      val JInt(classes) = (jv \ "classes"): @unchecked
      Case(name, classes.toInt, ints("labels"), dbls("thresholds"),
        dbls("uncertainty"), dbls("boundaries"), ints("predict"))
    }
  }

  test("fixture file loaded with enough coverage") {
    assert(cases.length >= 20)
  }

  test("thresholds, uncertainty, boundaries match the reference run") {
    cases.foreach { c =>
      val fit = Staircase.fit(c.labels, c.classes)
      withClue(s"${c.name} thresholds:") {
        assert(fit.thresholds.toSeq == c.thresholds.toSeq)
      }
      withClue(s"${c.name} uncertainty:") {
        assert(fit.uncertainty.toSeq == c.uncertainty.toSeq)
      }
      withClue(s"${c.name} boundaries:") {
        assert(fit.boundaries.toSeq == c.boundaries.toSeq)
      }
    }
  }

  test("per-position page predictions match the reference run") {
    cases.foreach { c =>
      val fit = Staircase.fit(c.labels, c.classes)
      val got = c.labels.indices.map(fit.predict).toArray
      withClue(s"${c.name} predict:") { assert(got.toSeq == c.predict.toSeq) }
    }
  }

  test("clean staircase recovers exact boundaries") {
    val fit = Staircase.fit(Array.fill(10)(0) ++ Array.fill(10)(1), 2)
    assert(fit.boundaries.toSeq == Seq(9.5))
    assert((0 until 20).map(fit.predict) == (0 until 20).map(i => if (i <= 9) 0 else 1))
  }

  test("monotone output even on adversarial noise") {
    cases.foreach { c =>
      val fit = Staircase.fit(c.labels, c.classes)
      val preds = c.labels.indices.map(fit.predict)
      assert(preds == preds.sorted, s"${c.name}: non-monotone ${preds.mkString(",")}")
    }
  }
}
