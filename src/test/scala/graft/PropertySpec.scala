package graft

import graft.clv.{BetaGeoParams, GammaGammaParams, SpecialFunctions}
import graft.text.TextFunctions
import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

/** Pure-math property tests (SURVEY.md §5.3): model laws and text
  * invariants over generated inputs — no Spark session involved. */
object PropertySpec extends Properties("graft") {

  private val posParam = Gen.choose(0.05, 5.0)
  private val rfmGen = for {
    t <- Gen.choose(1.0, 400.0)
    tx <- Gen.choose(0.0, t)
    x <- Gen.choose(0, 40)
  } yield (x.toDouble, tx, t)

  property("bgnbd.probAlive in [0,1]; E[Y(t)] nonneg & monotone") =
    Prop.forAll(posParam, posParam, posParam, posParam, rfmGen) {
      (r, alpha, a, b, rfm) =>
        (math.abs(a - 1.0) > 1e-3) ==> { // a=1 is the formula's pole
          val p = BetaGeoParams(r, alpha, a, b)
          val (x, tx, t) = rfm
          val pa = p.probAlive(x, tx, t)
          val e1 = p.conditionalExpectedPurchases(13.0, x, tx, t)
          val e2 = p.conditionalExpectedPurchases(52.0, x, tx, t)
          (pa >= 0.0 && pa <= 1.0) :| s"probAlive=$pa" &&
            (e1 >= -1e-9) :| s"e1=$e1" &&
            (e2 >= e1 - 1e-9) :| s"monotone $e1->$e2"
        }
    }

  property("gammagamma.condProfit positive, between prior mean and m̄") =
    Prop.forAll(posParam, Gen.choose(1.2, 8.0), posParam,
      Gen.choose(1, 50), Gen.choose(1.0, 500.0)) { (p, q, v, x, m) =>
      val g = GammaGammaParams(p, q, v)
      val e = g.conditionalExpectedAverageProfit(x.toDouble, m)
      val prior = p * v / (q - 1) // population mean spend
      val lo = math.min(prior, m) - 1e-9
      val hi = math.max(prior, m) + 1e-9
      (e > 0) :| s"E=$e" && (e >= lo && e <= hi) :| s"E=$e not in [$lo,$hi]"
    }

  property("hyp2f1(a,b;c;0) == 1") =
    Prop.forAll(posParam, posParam, posParam) { (a, b, c) =>
      SpecialFunctions.hyp2f1(a, b, c, 0.0) == 1.0
    }

  property("hyp2f1(1,1;2;z) == -ln(1-z)/z") =
    Prop.forAll(Gen.choose(0.01, 0.97)) { z =>
      math.abs(SpecialFunctions.hyp2f1(1, 1, 2, z) -
        (-math.log(1 - z) / z)) < 1e-9
    }

  property("logSumExp dominates max, bounded by max+ln2") =
    Prop.forAll(Gen.choose(-1e6, 700.0), Gen.choose(-1e6, 700.0)) { (x, y) =>
      val l = SpecialFunctions.logSumExp(x, y)
      l >= math.max(x, y) && l <= math.max(x, y) + math.log(2) + 1e-12
    }

  property("qualityScoreLocal in [0,1]") =
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      (s.trim.nonEmpty) ==> {
        val q = TextFunctions.qualityScoreLocal(s)
        q >= 0.0 && q <= 1.0
      }
    }

  property("langIdLocal returns a known code or 'und'") = {
    val codes = TextFunctions.langProfiles.map(_._1).toSet + "und"
    Prop.forAll(Gen.asciiPrintableStr) { s =>
      codes.contains(TextFunctions.langIdLocal(s))
    }
  }
}
