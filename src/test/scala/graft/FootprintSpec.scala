package graft

import graft.functions.Aggs.PocHvaLvaAgg
import org.scalatest.funsuite.AnyFunSuite

/** Hand-computed cases for the greedy value-area expansion
  * (finmlkit/feature/core/volume.py:277-364).
  */
class FootprintSpec extends AnyFunSuite {

  private def run(pairs: (Int, Double)*): (Int, Int, Int) =
    PocHvaLvaAgg.finish(pairs.toMap)

  test("POC/HVA/LVA: symmetric profile expands both sides on ties") {
    // levels 1..5, volumes 1,2,10,2,1 — total 16, thr 10.93
    // cum=10 (poc idx 2); up pair = v(3)+v(4)=3, down pair = v(1)+v(0)=3 — tie:
    // cum=16, hva=min(poc+2, n-1)=4 -> level 5, lva=max(poc-2,0)=0 -> level 1
    assert(run(1 -> 1.0, 2 -> 2.0, 3 -> 10.0, 4 -> 2.0, 5 -> 1.0) == (3, 5, 1))
  }

  test("POC/HVA/LVA: one-sided expansion picks the heavier pair") {
    // levels 1..5, volumes 1,1,10,5,4 — thr = 21*0.6834 = 14.35
    // cum=10; up=5+4=9 > down=1+1=2 -> cum=19, hva=5; done
    assert(run(1 -> 1.0, 2 -> 1.0, 3 -> 10.0, 4 -> 5.0, 5 -> 4.0) == (3, 5, 3))
  }

  test("POC at edge: expansion only has one side") {
    // poc at lowest level; down side exhausted immediately
    // levels 1..4, volumes 10,1,1,1 — thr=8.88, cum=10 already >= thr
    assert(run(1 -> 10.0, 2 -> 1.0, 3 -> 1.0, 4 -> 1.0) == (1, 1, 1))
  }

  test("dense gap handling: missing levels count as zero volume") {
    // levels 1,5 present; dense grid 1..5 with zeros between
    // volumes 10 at 1, 9 at 5; total 19, thr 12.98; cum 10
    // up pair v(2)+v(3)=0, down exhausted (-1) -> up wins (0 > -1):
    // cum 10, hva=level(3)=3, up->4: pair v(4)+... = 0+9=9 -> cum 19 >= thr? after first step cum=10+0=10 < 12.98,
    // second: up pair = v(4)+v(5)... up=4: vols(4)=9? dense idx: levels 1..5 -> idx0..4; poc idx0
    // verify via execution only (documenting expansion path is brittle)
    val (poc, hva, lva) = run(1 -> 10.0, 5 -> 9.0)
    assert(poc == 1 && lva == 1 && hva == 5)
  }

  test("argmax tie picks the lowest level (np.argmax semantics)") {
    val (poc, _, _) = run(2 -> 5.0, 4 -> 5.0, 3 -> 1.0)
    assert(poc == 2)
  }

  private def runPos(pairs: (Int, Double)*): (Int, Int, Int) =
    graft.functions.Aggs.PocHvaLvaPositionalAgg.finish(pairs.toMap)

  test("positional variant strides bucket positions, not the tick grid") {
    // bucket midpoints 10,50,90,130 with vols 2,9,5,1 — array semantics:
    // poc idx 1 (level 50), cum 9, thr 17*0.6834 = 11.62;
    // cu = v[2]+v[3] = 6 > cd = v[0] = 2 -> cum 15 >= thr;
    // hva = levels[min(3,3)] = 130, lva = poc = 50
    assert(runPos(10 -> 2.0, 50 -> 9.0, 90 -> 5.0, 130 -> 1.0) == (50, 130, 50))
    // the dense variant on the same input walks 121 tick levels instead:
    // cu = v[51]+v[52] = 0, cd = v[49]+v[48] = 0 -> tie chains of zeros
    // creep outward two ticks per step — positions, not prices, differ
    val (pocD, hvaD, lvaD) = run(10 -> 2.0, 50 -> 9.0, 90 -> 5.0, 130 -> 1.0)
    assert(pocD == 50 && (hvaD, lvaD) != (130, 50))
  }

  test("positional variant matches dense on a contiguous profile") {
    val pairs = Seq(1 -> 1.0, 2 -> 2.0, 3 -> 10.0, 4 -> 2.0, 5 -> 1.0)
    assert(runPos(pairs: _*) == run(pairs: _*))
  }
}
