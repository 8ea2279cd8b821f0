package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random
import graft.multimodal.MediaOps

/** Property-style invariants for the pure kernels (seeded generators,
  * no Spark session — hundreds of cases per test).
  */
class PropertySpec extends AnyFunSuite {

  private val rnd = new Random(42)

  test("decodeStub: bounds, determinism, feature shape for arbitrary bytes") {
    (0 until 300).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(2048))(rnd.nextInt().toByte)
      val d = MediaOps.decodeStub(7L, bytes)
      assert(d.n_bytes === bytes.length)
      assert(d.width >= 64 && d.width < 1280)
      assert(d.height >= 64 && d.height < 720)
      assert(d.features.length === 8)
      assert(d.features.forall(f => f >= 0f && f < 1f))
      val again = MediaOps.decodeStub(7L, bytes)
      assert(again.width === d.width && again.height === d.height)
      assert(again.features.toSeq === d.features.toSeq)
    }
  }

  test("username validation charset is exactly [a-zA-Z0-9_.-], length 3..50") {
    val svc = new graft.users.UserService(null, "/nonexistent")
    val alnum = ('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++ Seq('_', '.', '-')
    (0 until 300).foreach { _ =>
      val len = rnd.nextInt(60)
      val s = Array.fill(len)(alnum(rnd.nextInt(alnum.length))).mkString
      assert(svc.validUsername(s) === (len >= 3 && len <= 50), s)
    }
    Seq(" ", "!", "@", "/", "\\", "€", "\n", "ü").foreach { ch =>
      assert(!svc.validUsername(s"abc${ch}def"), ch)
    }
  }

  test("tier thresholds: cumulative weights are monotone and complete") {
    // the reference weight table's cumulative cutpoints (imb_rating.py:116–124)
    val cuts = Seq(
      Seq(0.10, 0.50), Seq(0.05, 0.40, 0.85), Seq(0.05, 0.35, 0.75), Seq(0.40, 0.80))
    cuts.foreach { c =>
      assert(c === c.sorted)
      assert(c.forall(x => x > 0 && x < 1))
    }
  }
}
