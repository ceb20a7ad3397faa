package graft

import org.apache.spark.sql.Row
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.checks._
import graft.model.{ValidationResult, ValidationSuiteResult}

/** ScalaCheck-generator-driven invariants over the check/suite algebra
  * (SURVEY.md §5.2-4). Raw scalacheck (no scalatestplus bridge in the
  * offline cache): fixed-seed sampling keeps runs deterministic, and
  * Spark actions are expensive per case, so sample counts are modest. */
class PropertySpec extends SparkSpec {

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val valueGen: Gen[List[Option[String]]] =
    Gen.choose(1, 30).flatMap(k => Gen.listOfN(k,
      Gen.oneOf(Gen.const(None), Gen.oneOf("x", "y", "z", "bad1", "bad2").map(Some(_)))))

  test("property: unexpected + passing == element_count for InSetCheck") {
    samples(valueGen, 8).foreach { values =>
      val data = df(values.map(v => Row(v.orNull)), "c STRING")
      val r = InSetCheck("c", Seq("x", "y", "z")).run(data)
      val nulls = values.count(_.isEmpty)
      val passing = values.count(v => v.exists(Set("x", "y", "z"))) + nulls
      assert(r.elementCount == values.size.toLong)
      assert(r.unexpectedCount + passing == values.size.toLong)
    }
  }

  test("property: check verdicts are invariant under row permutation") {
    samples(valueGen, 5).foreach { values =>
      val shuffled = new scala.util.Random(7).shuffle(values)
      val a = df(values.map(v => Row(v.orNull)), "c STRING")
      val b = df(shuffled.map(v => Row(v.orNull)), "c STRING")
      val check = InSetCheck("c", Seq("x", "y"))
      val (ra, rb) = (check.run(a), check.run(b))
      assert(ra.status == rb.status)
      assert(ra.unexpectedCount == rb.unexpectedCount)
      assert(ra.partialUnexpectedList == rb.partialUnexpectedList) // sorted sample
    }
  }

  test("property: suite summary counts always sum and agree with details") {
    val resultGen: Gen[List[ValidationResult]] = Gen.listOf(for {
      name <- Gen.identifier.map(_.take(8))
      status <- Gen.oneOf("PASSED", "FAILED", "ERROR")
    } yield ValidationResult(name, status, "msg"))
    samples(resultGen, 40).foreach { results =>
      val s = ValidationSuiteResult.of(results)
      assert(s.passedCount + s.failedCount == s.totalCount)
      assert(s.totalCount == results.size.toLong)
      assert(s.passed == results.forall(_.passed))
      assert(s.failedValidations.size.toLong == s.failedCount)
    }
  }

  test("property: UniqueCheck dup_rows is rows covered by duplicated keys") {
    val keysGen = Gen.choose(1, 25).flatMap(k => Gen.listOfN(k, Gen.chooseNum(0, 5)))
    samples(keysGen, 8).foreach { keys =>
      val data = df(keys.map(k => Row(k.toLong)), "k BIGINT")
      val r = UniqueCheck(Seq("k")).run(data)
      val dupRows = keys.groupBy(identity).values.filter(_.size > 1).map(_.size).sum
      assert(r.unexpectedCount == dupRows.toLong)
      assert(r.passed == (dupRows == 0))
    }
  }
}
