package graft.functions

import graft.SparkSpec

class PacfSpec extends SparkSpec {

  test("PACF of an AR(1) acf is zero beyond lag 1") {
    // AR(1) with phi=.6: acf(k) = .6^k ; pacf = [.6, 0, 0, ...]
    val acf = Seq(0.6, 0.36, 0.216, 0.1296)
    val pacf = Stats.pacfFromAcf(acf)
    assertApprox(pacf(0), 0.6)
    assertApprox(pacf(1), 0.0, 1e-10)
    assertApprox(pacf(2), 0.0, 1e-10)
    assertApprox(pacf(3), 0.0, 1e-10)
  }

  test("PACF lag-2 of an MA-ish acf matches the closed form") {
    // pacf(2) = (rho2 - rho1^2) / (1 - rho1^2)
    val r1 = 0.5; val r2 = 0.2
    val pacf = Stats.pacfFromAcf(Seq(r1, r2))
    assertApprox(pacf(0), r1)
    assertApprox(pacf(1), (r2 - r1 * r1) / (1 - r1 * r1), 1e-12)
  }

  test("empty acf -> empty pacf") {
    assert(Stats.pacfFromAcf(Nil).isEmpty)
  }
}
